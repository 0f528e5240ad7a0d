"""Sources — SURVEY.md §2.1 (S1-S5) as declarative Spark reads.

The reference fetches CSV bodies over HTTP per parameter value and per day
(``function_app.py:56-121``), which at 100 TB becomes "read a partitioned
dataset and let Catalyst prune partitions". Rate limiting / retry are ingest-
connector concerns kept out of query plans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """S1 — CSV scan with explicit schema (reference parses API CSV bodies
    with inferred dtypes, ``function_app.py:69``). ``schema=None`` mirrors
    the reference's dynamic inference (extra scan — avoid at scale)."""
    reader = spark.read.options(header=header, **options)
    return reader.csv(path, schema=schema) if schema else reader.option(
        "inferSchema", True
    ).csv(path)


def parquet_source(spark: SparkSession, path: str) -> DataFrame:
    """S5-equivalent columnar scan: filters/column pruning pushed by Catalyst."""
    return spark.read.parquet(path)


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """S5 — JDBC table scan (reference: ``pd.read_sql(SELECT * FROM ...)``,
    ``function_app.py:192-196``). At scale, always pass ``partition_column``
    bounds so the read parallelizes instead of a single-connection pull."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


class SourceReadError(RuntimeError):
    """A source read failed after exhausting its retry budget. Carries the
    attempt count and the last underlying error — the EXPLICIT failure the
    reference lacks (``function_app.py:71-73`` returns None on a failed
    fetch and crashes later, far from the cause)."""

    def __init__(self, attempts: int, last_error: Exception):
        self.attempts = attempts
        self.last_error = last_error
        super().__init__(
            f"source read failed after {attempts} attempts: {last_error!r}"
        )


def read_with_retry(
    build: "callable",
    max_attempts: int = 3,
    backoff_seconds: float = 1.0,
    retryable: tuple[type[Exception], ...] = (Exception,),
) -> DataFrame:
    """Bounded retry-with-exponential-backoff around a source read:
    ``build()`` is any zero-arg callable returning a DataFrame (a
    ``csv_source``/``jdbc_source`` closure). Retries cover PLAN-TIME
    failures — file listing, schema resolution, JDBC connect — which is
    where transient connector errors surface; task-level execution
    retries remain Spark's own domain (``spark.task.maxFailures``).
    After ``max_attempts`` the error is raised as :class:`SourceReadError`
    immediately at the source, never deferred to a later stage.
    """
    import time

    last: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return build()
        except retryable as e:  # noqa: PERF203 — retry loop by design
            last = e
            if attempt < max_attempts - 1:
                time.sleep(backoff_seconds * (2**attempt))
    raise SourceReadError(max_attempts, last)


def union_param_sweep(frames: list[DataFrame]) -> DataFrame:
    """S2/O1 — union of per-parameter reads (reference unions
    ``status ∈ {active, inactive}`` fetches, ``function_app.py:78-86``).
    ``unionByName`` so column order never silently misaligns."""
    if not frames:
        raise ValueError("union_param_sweep needs at least one frame")
    return reduce(lambda a, b: a.unionByName(b), frames)


def date_spine(
    spark: SparkSession, start: str, end: str, col_name: str = "fecha"
) -> DataFrame:
    """S3/F5 — materialize the per-day spine the reference loops over
    (``pd.date_range``, ``function_app.py:93``) as one distributed column:
    ``sequence(start, end) → explode``. Inclusive of both endpoints."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("interval 1 day"),
            )
        ).alias(col_name)
    )
