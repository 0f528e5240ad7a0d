"""Streaming layer tests: windowed aggs equal their batch equivalents,
foreachBatch merge is idempotent, stateful totals equal batch groupBy."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.schemas import load_table
from data_management_service_run_etl_imputations_spark.streaming.events import (
    foreach_batch_incremental,
    read_events_stream,
    run_available_now,
    tumbling_window_agg,
)
from data_management_service_run_etl_imputations_spark.streaming.stateful import (
    running_user_totals,
)


def test_tumbling_equals_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    streamed = run_available_now(tumbling_window_agg(stream, "1 hour")).collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    )
    s = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in streamed}
    b = {(r.window_start, r.event_type): (r.n, r.tv) for r in batch}
    assert s == b


def test_foreach_batch_merge_idempotent(spark, sf_dir, tmp_path):
    target = str(tmp_path / f"merge_{uuid.uuid4().hex[:6]}")
    stream = read_events_stream(spark, sf_dir).select("event_id", "value")
    foreach_batch_incremental(stream, target, ["event_id"])
    n1 = spark.read.parquet(target).count()
    assert n1 == load_table(spark, sf_dir, "events").count()
    # replay into the same target with a FRESH checkpoint: the anti-join
    # must append nothing (idempotency comes from the sink, not only the
    # checkpoint)
    stream2 = read_events_stream(spark, sf_dir).select("event_id", "value")
    import shutil

    shutil.rmtree(target + "_checkpoint")
    foreach_batch_incremental(stream2, target, ["event_id"])
    assert spark.read.parquet(target).count() == n1


def test_stateful_totals_equal_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    streamed = run_available_now(running_user_totals(stream), output_mode="update").collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    )
    s = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in streamed}
    b = {r.user_id: (r.n, round(r.tv, 4)) for r in batch}
    assert s == b


def test_stream_dedup_within_watermark(spark, sf_dir):
    """Duplicated input stream → deduped output equals the distinct batch."""
    from data_management_service_run_etl_imputations_spark.streaming.events import (
        dedup_stream_within_watermark,
    )

    stream = read_events_stream(spark, sf_dir).select("event_id", "ts", "value")
    doubled = stream.unionByName(stream)  # at-least-once delivery simulation
    deduped = dedup_stream_within_watermark(doubled, ["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.table("dedup_stream_t").count()
    assert n == load_table(spark, sf_dir, "events").count()


def test_rocksdb_state_store_high_cardinality_replay(spark, tmp_path):
    """The stateful path runs on the RocksDB state store (the 100×-key
    scale posture: off-heap state + changelog checkpoints, vs the default
    HDFS provider's on-heap full-snapshot-per-batch), and a 50k-distinct-
    key replay through applyInPandasWithState still matches the batch
    aggregate. Asserts RocksDB was genuinely engaged via the query's
    stateOperators metrics, not just the conf value."""
    import pandas as pd

    from data_management_service_run_etl_imputations_spark.streaming.events import (
        ensure_streaming_confs,
    )

    n, n_keys = 200_000, 50_000
    src = str(tmp_path / "hc_events")
    import os

    os.makedirs(src, exist_ok=True)
    pd.DataFrame(
        {
            "user_id": [i % n_keys for i in range(n)],
            "value": [float(i % 97) for i in range(n)],
        }
    ).to_parquet(src + "/part0.parquet")

    ensure_streaming_confs(spark)
    stream = (
        spark.readStream.schema("user_id LONG, value DOUBLE").parquet(src)
    )
    name = f"hc_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [p for p in q.recentProgress if p["stateOperators"]]
    assert progress, "no stateful progress recorded"
    ops = progress[-1]["stateOperators"][0]
    # RocksDB-specific metrics prove the provider actually backed the state
    assert any("rocksdb" in k.lower() for k in ops["customMetrics"]), ops
    assert ops["numRowsTotal"] == n_keys

    got = {
        r.user_id: (r.n_events, round(r.total_value, 4))
        for r in spark.table(name).collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    )
    want = {r.user_id: (r.n, round(r.tv, 4)) for r in batch}
    assert got == want
