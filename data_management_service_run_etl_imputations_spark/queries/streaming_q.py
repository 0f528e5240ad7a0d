"""Streaming queries: real ``readStream`` plans executed with
Trigger.AvailableNow into a memory sink (bounded deterministic replay), so
the driver can batch-compare them against SQL oracles. The same plans run
unmodified as continuous streams on a cluster.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.streaming.events import (
    dedup_stream_within_watermark,
    foreach_batch_incremental,
    read_events_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    stream_static_join,
    tumbling_window_agg,
)
from data_management_service_run_etl_imputations_spark.schemas import load_table


@register(
    "streaming_tumbling_agg",
    headline=True,
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling windows over the event stream
    (readStream → window agg → AvailableNow replay). Epoch-aligned windows
    ≡ date_trunc('hour') in the batch oracle."""
    stream = read_events_stream(spark, sf_dir)
    return run_available_now(tumbling_window_agg(stream, "1 hour"))


@register(
    "streaming_sliding_agg",
    oracle="""
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                   value
            FROM events
        )
        SELECT window_start, COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM assigned GROUP BY 1
    """,
)
def streaming_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in exactly
    two windows — the oracle materializes that assignment explicitly."""
    stream = read_events_stream(spark, sf_dir)
    return run_available_now(sliding_window_agg(stream, "1 hour", "30 minutes"))


@register(
    "streaming_session_window",
    oracle="""
        WITH d AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch(ts - LAG(ts) OVER w) >= 300 OR
                             LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM d
        )
        SELECT MIN(ts) AS session_start, user_id,
               COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
        FROM s GROUP BY user_id, session_id
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-minute-gap session windows (stateful streaming agg). The
    oracle derives the same sessions with gaps-and-islands: a new session
    starts when the gap to the previous event is ≥ the 300 s timeout."""
    stream = read_events_stream(spark, sf_dir)
    return run_available_now(session_window_agg(stream, "5 minutes"))


@register(
    "streaming_foreach_batch_merge",
    oracle="""
        SELECT event_id, user_id, value FROM events
    """,
)
def streaming_foreach_batch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7-as-streaming: foreachBatch insert-only merge (anti-join on
    event_id) into a parquet target — the streaming twin of the reference's
    idempotent load (function_app.py:305-312). Bounded replay of the whole
    stream ⇒ the target equals the distinct input set."""
    target = f"{tempfile.gettempdir()}/stream_merge_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    foreach_batch_incremental(stream, target, ["event_id"])
    return spark.read.parquet(target)


@register(
    "streaming_static_dim_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type,
               c.c_mktsegment AS segment,
               c.c_nationkey AS nationkey
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.event_type = 'purchase'
    """,
)
def streaming_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: purchases enriched with the customer dimension
    (user_id → c_custkey). The static side re-resolves every micro-batch —
    the streaming pattern for slowly-changing dims — and broadcasts, so the
    stream side never shuffles. Append-mode (no aggregation, no state)."""
    stream = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    enriched = stream_static_join(
        stream, dim, stream.user_id == dim.c_custkey, "left"
    ).select("event_id", "user_id", "event_type", "segment", "nationkey")
    return run_available_now(enriched, output_mode="append")


@register(
    "streaming_dedup_events",
    oracle="""
        SELECT event_id, user_id, value FROM events
    """,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup-at-ingest: the event stream unioned with ITSELF
    (a deterministic at-least-once duplicate source) flows through
    ``dropDuplicatesWithinWatermark`` on event_id — the doubled stream must
    collapse back to exactly the original distinct set. Watermark sized to
    cover the bounded replay; production tunes it to the upstream's real
    redelivery horizon so per-key state expires."""
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    deduped = dedup_stream_within_watermark(
        doubled, ["event_id"], watermark="365 days"
    )
    return run_available_now(
        deduped.select("event_id", "user_id", "value"), output_mode="append"
    )


@register(
    "streaming_stateful_user_totals",
    oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM events GROUP BY user_id
    """,
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-user
    totals, update-mode — one row per (user, micro-batch it appeared in).
    The oracle-checkable invariant is the FINAL state: cumulative totals
    after full replay equal the batch aggregate. n_events is strictly
    increasing per user across that user's updates, so max_by(·, n_events)
    selects each user's last emission deterministically."""
    from data_management_service_run_etl_imputations_spark.streaming.stateful import (
        running_user_totals,
    )

    stream = read_events_stream(spark, sf_dir)
    updates = run_available_now(running_user_totals(stream), output_mode="update")
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


@register(
    "streaming_stream_stream_join",
    oracle="""
        SELECT v.user_id,
               v.event_id AS view_id,
               p.event_id AS purchase_id,
               ROUND(p.value, 6) AS purchase_value
        FROM events v
        JOIN events p
          ON p.user_id = v.user_id
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 30 MINUTE
        WHERE v.event_type = 'view'
          AND p.event_type = 'purchase'
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each view event matched to the same
    user's purchase events within the following 30 minutes. Both sides are
    live streams (no static dim), so this exercises the watermarked
    dual-buffer join — the streaming counterpart of the batch interval
    join. AvailableNow replay over the full bounded input makes the result
    exactly the batch self-join the oracle states (no row is older than
    the watermark at end-of-replay in a bounded run)."""
    from data_management_service_run_etl_imputations_spark.streaming.events import (
        stream_stream_interval_join,
    )

    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id"))
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = stream_stream_interval_join(
        views, purchases, "user_id", "view_ts", "purchase_ts", "30 minutes"
    )
    return run_available_now(
        joined.select(
            "user_id",
            "view_id",
            "purchase_id",
            F.round("purchase_value", 6).alias("purchase_value"),
        ),
        output_mode="append",
    )


@register(
    "streaming_stream_stream_left_join",
    oracle="""
        WITH bound AS (
            SELECT MAX(ts) - INTERVAL 4 HOUR AS b FROM events
        )
        SELECT v.user_id,
               v.event_id AS view_id,
               p.event_id AS purchase_id,
               ROUND(p.value, 6) AS purchase_value
        FROM events v
        LEFT JOIN events p
          ON p.user_id = v.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 30 MINUTE
        WHERE v.event_type = 'view'
          AND v.ts <= (SELECT b FROM bound)
    """,
)
def streaming_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: views with no purchase in
    the following 30 minutes surface once, null-padded, after the
    watermark passes their match window — the semantics a funnel
    drop-off stream needs (inner joins silently drop non-converters).
    Outer emission is watermark-delayed by construction, so the left
    side is bounded to ≥4 h before stream end (well past the 2 h
    watermark + 30 min horizon flush lag): every retained view's outcome
    is then deterministic in a bounded AvailableNow replay and the
    result equals the batch left join the oracle states."""
    from data_management_service_run_etl_imputations_spark.schemas import load_table
    from data_management_service_run_etl_imputations_spark.streaming.events import (
        stream_stream_interval_join,
    )

    # flush bound from the data (driver-side scalar, same value the
    # oracle's subquery computes)
    bound = load_table(spark, sf_dir, "events").agg(
        (F.max("ts") - F.expr("INTERVAL 4 HOUR")).alias("b")
    ).first()["b"]

    # NOTE: the bound is applied to the OUTPUT, not the view stream — a
    # pre-join filter would cut the left input's own max event time and
    # drag the global watermark (min across inputs) back with it, so the
    # last watermark+horizon of SELECTED views could never flush their
    # null rows no matter the margin.
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = stream_stream_interval_join(
        views,
        purchases,
        "user_id",
        "view_ts",
        "purchase_ts",
        "30 minutes",
        how="left_outer",
    )
    return run_available_now(
        joined.filter(F.col("view_ts") <= F.lit(bound)).select(
            "user_id",
            "view_id",
            "purchase_id",
            F.round("purchase_value", 6).alias("purchase_value"),
        ),
        output_mode="append",
    )
