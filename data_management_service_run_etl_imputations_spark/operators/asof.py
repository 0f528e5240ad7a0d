"""Temporal joins Spark lacks as primitives — as-of join and
interval/range join — built as compositions of existing DataFrame ops
(SURVEY guidance: composition first, Pandas UDF only if semantics demand).

Both avoid the naive O(n·m) theta-join:
- as-of: union both sides, one sort per key, carry the last right-side row
  forward (`last(..., ignorenulls)` over an unbounded-preceding window) —
  the classic log-merge rendering; one shuffle on the key, no range
  predicate at all.
- interval: explode intervals into fixed-width time buckets so the range
  predicate becomes an equi-join on (key, bucket) + a residual filter —
  shuffle ∝ bucket collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (direction='backward'; the standard
    as-of semantics) within the same ``on`` key. Left rows with no earlier
    right row keep nulls.

    Implementation: tag + union + per-key sort + forward-fill via
    ``last(ignorenulls=True)`` over rows between unboundedPreceding and
    current. Ties (right_ts == left_ts) match, right row sorts first.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")

    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right on ties
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    merged = l_tag.unionByName(r_tag)
    w = Window.partitionBy("__k").orderBy("__ts", "__side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = merged.withColumn("__r_fill", F.last("__r", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__r_fill")[c].alias(f"asof_{c}") for c in payload],
    )
    return out


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    point_cols: list[str] | None = None,
    interval_cols: list[str] | None = None,
) -> DataFrame:
    """points ⋈ intervals on ``start ≤ point_ts < end`` without a
    nested-loop: intervals explode into the fixed-width buckets they
    overlap, points map to one bucket, join on bucket, then apply the exact
    residual predicate. Choose ``bucket_seconds`` ≈ median interval length
    (replication factor = len/bucket + 1)."""
    p_bucket = (F.col(point_ts).cast("double") / bucket_seconds).cast("long")
    p = points.select(
        *(point_cols or points.columns), p_bucket.alias("__bucket")
    )
    s_bucket = (F.col(start_ts).cast("double") / bucket_seconds).cast("long")
    # end is exclusive: a zero-length or bucket-aligned end must not spill
    # into the next bucket.
    e_bucket = (
        (F.col(end_ts).cast("double") - 1e-6) / bucket_seconds
    ).cast("long")
    i = intervals.select(
        *(interval_cols or intervals.columns),
        F.explode(F.sequence(s_bucket, F.greatest(e_bucket, s_bucket))).alias(
            "__bucket"
        ),
    )
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("__bucket")
    )
