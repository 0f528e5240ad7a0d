"""Structured Streaming over the events table — the engine's streaming
story (extension: the reference is batch-only, SURVEY.md §2.9; its closest
analogues are the per-day chunked ingest S3 and the idempotent incremental
load S7, which here become a real stream with watermarks and a foreachBatch
merge).

Everything is expressed against ``readStream`` so the same code runs
continuously on a cluster; tests and catalog queries drive it with
``Trigger.AvailableNow`` (bounded replay of the parquet files) + a memory
sink, which makes results deterministic and collectable.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Scale confs for every engine-driven streaming query. The default
# HDFS-backed state store holds each partition's ENTIRE state map as JVM
# heap objects and snapshots it per batch — at 100× key cardinality
# (sessionization / per-user totals over hundreds of millions of keys)
# that is the scale-killer: GC pressure scales with live keys and
# checkpoint upload with total state. RocksDB (rocksdbjni ships in
# Spark's jars) keeps state off-heap with incremental compaction, and
# changelog checkpointing uploads per-batch deltas instead of full
# snapshots — state size is then bounded by disk, not heap.
STREAMING_SCALE_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def ensure_streaming_confs(spark: SparkSession) -> SparkSession:
    """Apply the streaming scale confs (RocksDB state store) to any
    session. Idempotent; picked up by queries STARTED after the call
    (running queries keep their provider)."""
    for k, v in STREAMING_SCALE_CONFS.items():
        spark.conf.set(k, v)
    return spark


def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Kept for importers/tests: the µs-Timestamp shape every stream reader
# ultimately produces.
EVENTS_STREAM_SCHEMA = _events_stream_schema(T.TimestampType())


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table. At scale this is a
    date-partitioned directory (or Kafka); here the single parquet file is
    selected via pathGlobFilter.

    ``readStream`` needs a static schema, but the generator's timestamp
    encoding has varied across rounds (INT64 TIMESTAMP(NANOS) read as long
    vs TIMESTAMP(MICROS, ntz)); probe the file footer once (driver-side
    metadata read, no data scan) and normalize to µs TimestampType exactly
    as the batch loader does (schemas.load_table)."""
    probed = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    if isinstance(probed, T.LongType):
        raw = (
            spark.readStream.schema(_events_stream_schema(T.LongType()))
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(_events_stream_schema(T.TimestampType()))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw


def tumbling_window_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling windows with a watermark: counts + sums per
    (window, event_type). Late data beyond the watermark is dropped —
    state is bounded, the requirement for an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows (each event contributes to
    window/slide overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_window_agg(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based): a session closes after ``gap``
    of inactivity. State is per (user, open session) and bounded by the
    watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def stream_static_join(
    events: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich an unbounded stream with a (periodically
    re-read) dimension table. Supported natively by Structured Streaming
    for inner/left-outer with a static right side; the static side is
    re-resolved per micro-batch, so slowly-changing dims pick up updates
    without restarting the query. At scale the dim broadcasts — no state,
    no watermark needed (unlike stream-stream joins)."""
    return events.join(F.broadcast(dim), on, how)


def run_available_now(
    stream_df: DataFrame, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with Trigger.AvailableNow into a memory
    sink and return the (batch) result table. Deterministic bounded replay —
    the bridge between the streaming plans above and the batch-compare
    driver/oracle harness. Stateful applyInPandasWithState plans require
    ``output_mode='update'``."""
    ensure_streaming_confs(stream_df.sparkSession)
    name = name or f"stream_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def foreach_batch_incremental(
    stream: DataFrame, path: str, keys: list[str]
) -> None:
    """S7-as-streaming: every micro-batch is merged insert-only into the
    target via the same anti-join sink the batch pipelines use
    (reference semantics at function_app.py:305-312, applied per batch).
    Runs to completion with AvailableNow."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        incremental_insert_only,
    )

    ensure_streaming_confs(stream.sparkSession)
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _epoch: incremental_insert_only(batch_df, path, keys)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", path + "_checkpoint")
        .start()
    )
    q.awaitTermination()


def dedup_stream_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once-per-key within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keeps state only for ``watermark`` of
    event time (vs plain dropDuplicates whose state grows forever) — the
    dedup-at-ingest building block for at-least-once upstreams."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    user_col: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval constraint:
    a right-side event matches a left-side event for the same user when it
    lands in ``[left_ts, left_ts + horizon]``. Both sides carry watermarks
    and the join predicate bounds both event times, so Structured Streaming
    can expire join state (the unbounded-state hazard of naive
    stream-stream joins) — each side keeps at most
    ``watermark + horizon`` of buffered rows per partition. At scale both
    streams hash-partition on the join key; no broadcast (both sides are
    unbounded).

    ``how="left_outer"`` adds the no-match rows: a left event whose match
    window has fully passed the watermark emits once with null right
    columns — so outer results are inherently watermark-delayed (a left
    row within ``watermark + horizon`` of the stream head cannot emit its
    null row yet; bound the left side accordingly when an exact bounded
    replay is compared against a batch oracle)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(
        rw,
        (lw[user_col] == rw[user_col])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {horizon}")),
        how,
    ).drop(rw[user_col])
