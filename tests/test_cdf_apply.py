"""CDF → downstream-table apply (CDC end-to-end): the manifest CDF
stream applied to a second manifest table through
``manifest_apply_cdf_batch`` must reproduce the upstream snapshot —
inserts present, updates applied, deletes gone — with exactly-once end
state across stream RESTARTS (checkpoint resume) and foreachBatch
REPLAYS (txn-token idempotency).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.sources.manifest_stream import (
    ManifestFeedDataSource,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_apply_cdf_batch,
    manifest_delete,
    manifest_history,
    manifest_read,
    manifest_upsert_partitioned,
)


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def roots():
    base = f"{tempfile.gettempdir()}/cdfap_{uuid.uuid4().hex[:10]}"
    up, down, ckpt = f"{base}_up", f"{base}_down", f"{base}_ckpt"
    yield up, down, ckpt
    for p in (up, down, ckpt):
        shutil.rmtree(p, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE")


def _snap(spark, path):
    return sorted(
        (r["k"], r["day"], r["v"])
        for r in manifest_read(spark, path).collect()
    )


def _run_feed(spark, up, down, ckpt, app):
    spark.dataSource.register(ManifestFeedDataSource)
    feed = (
        spark.readStream.format("manifest_feed")
        .option("path", up)
        .option("mode", "cdf")
        .load()
    )
    q = (
        feed.writeStream.foreachBatch(
            lambda bdf, bid: manifest_apply_cdf_batch(
                bdf, down, ["k"], "day", app, bid
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_apply_reproduces_snapshot_including_deletes(spark, roots):
    up, down, ckpt = roots
    app = f"t_{uuid.uuid4().hex[:6]}"
    rows = [(k, f"d{k % 3}", float(k)) for k in range(30)]
    manifest_upsert_partitioned(
        _batch(spark, rows).coalesce(2), up, ["k"], "day"
    )
    manifest_upsert_partitioned(  # update: %5 keys get +1000
        _batch(
            spark, [(k, f"d{k % 3}", float(k) + 1000) for k in range(0, 30, 5)]
        ).coalesce(1),
        up,
        ["k"],
        "day",
    )
    manifest_delete(  # MoR delete of %7 keys
        spark.createDataFrame([(k,) for k in range(0, 30, 7)], "k LONG"),
        up,
        ["k"],
    )
    _run_feed(spark, up, down, ckpt, app)
    assert _snap(spark, down) == _snap(spark, up)
    ks = {t[0] for t in _snap(spark, down)}
    assert ks.isdisjoint({0, 7, 14, 21, 28})
    assert (5, "d2", 1005.0) in _snap(spark, down)


def test_restart_applies_only_new_commits_exactly_once(spark, roots):
    """Stop after the first drain, commit more upstream (update AND
    delete), resume from the checkpoint: the second run must apply only
    the new versions, and the end state equals upstream."""
    up, down, ckpt = roots
    app = f"t_{uuid.uuid4().hex[:6]}"
    rows = [(k, f"d{k % 2}", float(k)) for k in range(20)]
    manifest_upsert_partitioned(
        _batch(spark, rows).coalesce(1), up, ["k"], "day"
    )
    _run_feed(spark, up, down, ckpt, app)
    assert _snap(spark, down) == _snap(spark, up)
    n_commits_after_run1 = len(manifest_history(down))
    # upstream evolves while the stream is DOWN
    manifest_upsert_partitioned(
        _batch(spark, [(3, "d1", 9999.0)]).coalesce(1), up, ["k"], "day"
    )
    manifest_delete(
        spark.createDataFrame([(4,), (6,)], "k LONG"), up, ["k"]
    )
    _run_feed(spark, up, down, ckpt, app)  # resume, same checkpoint
    assert _snap(spark, down) == _snap(spark, up)
    got = dict(((t[0]), t[2]) for t in _snap(spark, down))
    assert got[3] == 9999.0
    assert 4 not in got and 6 not in got
    # third run with NOTHING new: no data commits at all downstream
    n_before = len(manifest_history(down))
    _run_feed(spark, up, down, ckpt, app)
    assert len(manifest_history(down)) == n_before
    assert n_before > n_commits_after_run1  # run 2 really committed


def test_batch_replay_is_idempotent(spark, roots):
    """Re-invoking the foreachBatch body with the SAME batch_id and the
    same content (Spark's retry contract: immutable manifests replay
    byte-identical batches) must change nothing — txn tokens skip."""
    up, down, ckpt = roots
    app = f"t_{uuid.uuid4().hex[:6]}"
    rows = [(k, "d0", float(k)) for k in range(10)]
    manifest_upsert_partitioned(
        _batch(spark, rows).coalesce(1), up, ["k"], "day"
    )
    manifest_delete(
        spark.createDataFrame([(1,), (2,)], "k LONG"), up, ["k"]
    )
    # hand-build the one batch the feed would deliver (both versions)
    batch = (
        _batch(spark, [(k, "d0", float(k)) for k in range(10)])
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_commit_version", F.lit(1).cast("long"))
        .unionByName(
            _batch(spark, [(1, "d0", 1.0), (2, "d0", 2.0)])
            .withColumn("_change_type", F.lit("delete"))
            .withColumn("_commit_version", F.lit(2).cast("long"))
        )
    )
    r1 = manifest_apply_cdf_batch(batch, down, ["k"], "day", app, 0)
    snap1 = _snap(spark, down)
    hist1 = len(manifest_history(down))
    r2 = manifest_apply_cdf_batch(batch, down, ["k"], "day", app, 0)
    assert _snap(spark, down) == snap1
    assert len(manifest_history(down)) == hist1  # replay commits nothing
    assert sorted(k for k, _, _ in snap1) == [0, 3, 4, 5, 6, 7, 8, 9]


def test_insert_then_delete_same_batch_folds_to_absent(spark, roots):
    up, down, ckpt = roots
    app = f"t_{uuid.uuid4().hex[:6]}"
    batch = (
        _batch(spark, [(1, "d0", 1.0), (2, "d0", 2.0)])
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_commit_version", F.lit(1).cast("long"))
        .unionByName(
            _batch(spark, [(1, "d0", 1.0)])
            .withColumn("_change_type", F.lit("delete"))
            .withColumn("_commit_version", F.lit(2).cast("long"))
        )
    )
    manifest_apply_cdf_batch(batch, down, ["k"], "day", app, 0)
    assert [t[0] for t in _snap(spark, down)] == [2]


def test_partition_migration_applies_downstream(spark, roots):
    """A partition-MIGRATING update upstream (UPDATE ... SET day=...)
    surfaces in CDF as delete(old partition) + insert(new partition) at
    ONE commit version; the apply must land the row in its NEW
    partition downstream (delete-first + re-insert — a matched_update
    can never move a row between partitions)."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_update_where,
    )

    up, down, ckpt = roots
    app = f"t_{uuid.uuid4().hex[:6]}"
    rows = [(k, f"d{k % 2}", float(k)) for k in range(10)]
    manifest_upsert_partitioned(
        _batch(spark, rows).coalesce(1), up, ["k"], "day"
    )
    _run_feed(spark, up, down, ckpt, app)
    assert _snap(spark, down) == _snap(spark, up)
    # migrate k=4 from d0 to d9 (and bump v) while the stream is down
    manifest_update_where(
        spark, up, {"day": "'d9'", "v": "v + 100"}, "k = 4", mode="cow"
    )
    _run_feed(spark, up, down, ckpt, app)
    assert _snap(spark, down) == _snap(spark, up)
    got = {t[0]: (t[1], t[2]) for t in _snap(spark, down)}
    assert got[4] == ("d9", 104.0)
    # and the old-partition copy is GONE (no phantom duplicate)
    assert sum(1 for t in _snap(spark, down) if t[0] == 4) == 1
