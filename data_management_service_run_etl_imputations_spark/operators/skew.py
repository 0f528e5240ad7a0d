"""Skew mitigation helpers — part of the engine's 100 TB posture.

Spark already absorbs most skew: map-side partial aggregation for
``groupBy().agg()`` and AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) for joins. The
helpers here cover the remaining case: per-key computations with no partial
aggregate (``collect_list``, exact windows over one hot key), where a single
hot key pins one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, n_salts): spreads a hot key
    over n_salts reducers. Derived from the whole row's hash — stable across
    retries (required for exactly-once shuffle recompute), no RNG state."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation through an explicit salt:
    ``groupBy(keys + salt).partial → groupBy(keys).final``.

    ``aggs`` maps column → {sum, count, min, max} (the re-aggregable
    functions; avg = sum/count composed by the caller). For these Spark's
    own partial aggregation usually suffices — use this when the first
    stage must materialize per-key state that has no partial form, or to
    force finer parallelism than the input partitioning gives.
    """
    allowed = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in allowed:
            raise ValueError(f"non-re-aggregable function: {fn}")

    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[allowed[fn](c).alias(f"__p_{c}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[refold[fn](f"__p_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )


def salted_hot_key_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed equi-join by salt-and-replicate: fact rows get a random salt,
    the dim side is exploded n_salts× so every (key, salt) pair exists, and
    the join runs on (key, salt) — a hot fact key spreads over n_salts
    reducers at the cost of replicating the (small) dim side.

    Prefer AQE's automatic skew-join split; use this when the skew is known
    ahead of time or AQE is unavailable (e.g. inside a streaming batch).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_fact.join(replicated_dim, [key, "__salt"])
    return out.drop("__salt")
