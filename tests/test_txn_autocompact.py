"""Idempotent batch writes (txn tokens) and write-path auto-compaction.

Delta parity on two operational guarantees a 100 TB pipeline leans on:

- ``txn=(app_id, version)`` makes upsert / merge / replace-partitions
  IDEMPOTENT — a replayed token (orchestrator re-run, crash after
  commit) skips and the table is bit-identical; the marker commits in
  the SAME atomic version as the data, so token and content can never
  diverge (same design the streaming sink already uses for batch ids).
- ``auto_compact_min_files=N`` bounds a table's own fragmentation at
  the write path: after each commit the touched partitions whose
  manifest file count reached N compact best-effort, so steady
  small-batch ingestion never needs a separate maintenance job.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    _latest_manifest,
    manifest_history,
    manifest_merge,
    manifest_read,
    manifest_replace_partitions,
    manifest_restore,
    manifest_upsert_partitioned,
)


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/txnac_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, day STRING, v DOUBLE")


def test_txn_idempotent_upsert(spark, table_path):
    r = manifest_upsert_partitioned(
        _df(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]),
        table_path, ["id"], "day", txn=("job", 1),
    )
    assert r == {"updated": 0, "inserted": 2}
    v1, c1 = _latest_manifest(table_path)
    assert c1["txns"] == {"job": 1}

    # replay of the SAME token with different data: full skip, no new
    # version, table bit-identical
    r = manifest_upsert_partitioned(
        _df(spark, [(1, "d1", 999.0)]),
        table_path, ["id"], "day", txn=("job", 1),
    )
    assert r == {"updated": 0, "inserted": 0, "skipped": True}
    v2, c2 = _latest_manifest(table_path)
    assert (v2, c2) == (v1, c1)
    assert {x["id"]: x["v"] for x in manifest_read(spark, table_path).collect()} == {
        1: 1.0, 2: 2.0,
    }

    # the next token applies; an OLDER token then skips (monotone)
    r = manifest_upsert_partitioned(
        _df(spark, [(1, "d1", 10.0)]),
        table_path, ["id"], "day", txn=("job", 2),
    )
    assert r == {"updated": 1, "inserted": 0}
    assert manifest_upsert_partitioned(
        _df(spark, [(9, "d1", 9.0)]),
        table_path, ["id"], "day", txn=("job", 1),
    )["skipped"]

    # independent app ids track independent sequences
    r = manifest_upsert_partitioned(
        _df(spark, [(3, "d2", 3.0)]),
        table_path, ["id"], "day", txn=("other_job", 1),
    )
    assert r == {"updated": 0, "inserted": 1}
    assert _latest_manifest(table_path)[1]["txns"] == {"job": 2, "other_job": 1}


def test_txn_merge_and_replace(spark, table_path):
    manifest_upsert_partitioned(
        _df(spark, [(1, "d1", 1.0)]), table_path, ["id"], "day"
    )
    r = manifest_merge(
        _df(spark, [(1, "d1", 5.0), (2, "d1", 2.0)]),
        table_path, ["id"], "day",
        matched_update={"v": "s.v"}, txn=("m", 7),
    )
    assert r == {"updated": 1, "deleted": 0, "inserted": 1}
    v_after, _ = _latest_manifest(table_path)
    r = manifest_merge(
        _df(spark, [(2, "d1", -1.0)]),
        table_path, ["id"], "day",
        matched_update={"v": "s.v"}, txn=("m", 7),
    )
    assert r == {"updated": 0, "deleted": 0, "inserted": 0, "skipped": True}
    assert _latest_manifest(table_path)[0] == v_after

    r = manifest_replace_partitions(
        _df(spark, [(8, "d2", 8.0)]), table_path, "day", ["d2"],
        txn=("rp", 1),
    )
    assert r == {"partitions_written": 1, "partitions_dropped": 0}
    r = manifest_replace_partitions(
        _df(spark, [(9, "d2", 9.0)]), table_path, "day", ["d2"],
        txn=("rp", 1),
    )
    assert r["skipped"]
    got = {x["id"] for x in manifest_read(spark, table_path).collect()}
    assert got == {1, 2, 8}


def test_txn_monotone_across_restore(spark, table_path):
    manifest_upsert_partitioned(
        _df(spark, [(1, "d1", 1.0)]), table_path, ["id"], "day",
        txn=("job", 1),
    )
    v1, _ = _latest_manifest(table_path)
    manifest_upsert_partitioned(
        _df(spark, [(2, "d1", 2.0)]), table_path, ["id"], "day",
        txn=("job", 2),
    )
    manifest_restore(table_path, version=v1)
    # the restored snapshot predates token 2, but the marker stays
    # monotone: a replay of batch 2 must NOT re-apply
    assert _latest_manifest(table_path)[1]["txns"] == {"job": 2}
    assert manifest_upsert_partitioned(
        _df(spark, [(2, "d1", 2.0)]), table_path, ["id"], "day",
        txn=("job", 2),
    )["skipped"]


def test_auto_compact_bounds_fragmentation(spark, table_path):
    # steady small-batch ingestion into ONE partition; every write adds
    # files, auto-compact keeps the partition's count bounded
    for i in range(6):
        manifest_upsert_partitioned(
            _df(spark, [(i, "d1", float(i))]).repartition(2),
            table_path, ["id"], "day",
            auto_compact_min_files=3,
        )
    _, content = _latest_manifest(table_path)
    n_files = len(content["files"]["d1"])
    assert n_files < 3, f"auto-compact left {n_files} files"
    # content unharmed
    got = {x["id"]: x["v"] for x in manifest_read(spark, table_path).collect()}
    assert got == {i: float(i) for i in range(6)}
    # compaction rode the write path: history shows compact commits
    ops = [h["op"] for h in manifest_history(table_path)]
    assert "compact" in ops
    # untouched partitions are never selected: a fragmented OTHER
    # partition stays put when this write doesn't touch it
    for i in range(10, 13):
        manifest_upsert_partitioned(
            _df(spark, [(i, "d2", float(i))]).repartition(2),
            table_path, ["id"], "day",
        )
    _, content = _latest_manifest(table_path)
    frag_before = len(content["files"]["d2"])
    assert frag_before >= 3
    manifest_upsert_partitioned(
        _df(spark, [(99, "d1", 99.0)]), table_path, ["id"], "day",
        auto_compact_min_files=3,
    )
    _, content = _latest_manifest(table_path)
    assert len(content["files"]["d2"]) == frag_before
