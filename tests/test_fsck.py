"""manifest_fsck: the metadata-only integrity checker. A healthy table
— through upserts, merges, MoR deletes (equality AND positional),
renames, checkpoints, compaction — reports ok; every seeded corruption
(missing data file, size drift, missing delete sidecar, dropped-column
equality entry) is caught; orphaned stages surface as warnings, not
errors.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.fsck import (
    manifest_fsck,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    _latest_manifest,
    manifest_compact,
    manifest_delete,
    manifest_delete_where,
    manifest_merge,
    manifest_rename_column,
    manifest_upsert_partitioned,
    manifest_vacuum,
)


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/fsck_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE")


def _busy_table(spark, table_path):
    """Exercise enough surface that fsck's checks all have material:
    >8 versions (a parquet checkpoint lands), merge, equality + MoR
    positional deletes, a rename (column mapping), compaction."""
    for r in range(4):
        manifest_upsert_partitioned(
            _batch(
                spark,
                [(10 * r + i, f"d{i % 2}", float(r)) for i in range(4)],
            ),
            table_path,
            ["k"],
            "day",
        )
    manifest_merge(
        _batch(spark, [(0, "d0", 100.0), (999, "d9", 9.0)]),
        table_path,
        ["k"],
        "day",
        matched_update={"v": "t.v + s.v"},
        insert_not_matched=True,
    )
    manifest_delete(
        spark.createDataFrame([(30,)], "k long"), table_path, ["k"]
    )
    manifest_delete_where(spark, table_path, "k = 31")
    manifest_rename_column(table_path, "v", "val")
    manifest_compact(spark, table_path, partition_values=["d0"])
    manifest_upsert_partitioned(
        _batch(spark, [(500, "d0", 5.0)]).withColumnRenamed("v", "val"),
        table_path,
        ["k"],
        "day",
    )


def test_fsck_clean_table_ok(spark, table_path):
    _busy_table(spark, table_path)
    report = manifest_fsck(table_path)
    assert report["errors"] == []
    assert report["ok"] is True
    assert report["versions"] >= 9
    assert report["files_checked"] > 0


def test_fsck_clean_after_vacuum(spark, table_path):
    _busy_table(spark, table_path)
    manifest_vacuum(table_path, keep_versions=2)
    report = manifest_fsck(table_path)
    assert report["errors"] == []
    # vacuum reaped every orphan: no warnings about stages either
    assert not any("orphaned" in w for w in report["warnings"])


def test_fsck_missing_table(table_path):
    report = manifest_fsck(table_path)
    assert report["ok"] is False


def test_fsck_catches_missing_live_file(spark, table_path):
    _busy_table(spark, table_path)
    _, content = _latest_manifest(table_path)
    rel = next(iter(content["files"].values()))[0][0]
    os.remove(os.path.join(table_path, *rel.split("/")))
    report = manifest_fsck(table_path)
    assert report["ok"] is False
    assert any("missing on disk" in e and rel in e for e in report["errors"])


def test_fsck_catches_size_drift(spark, table_path):
    _busy_table(spark, table_path)
    _, content = _latest_manifest(table_path)
    rel = next(iter(content["files"].values()))[0][0]
    with open(os.path.join(table_path, *rel.split("/")), "ab") as f:
        f.write(b"x")
    report = manifest_fsck(table_path)
    assert any("size drift" in e for e in report["errors"])
    # size checking is optional (object stores bill per HEAD request)
    report2 = manifest_fsck(table_path, check_sizes=False)
    assert not any("size drift" in e for e in report2["errors"])


def test_fsck_catches_missing_delete_sidecar(spark, table_path):
    _busy_table(spark, table_path)
    _, content = _latest_manifest(table_path)
    refs = [e["ref"] for e in content.get("deletes") or []]
    assert refs, "busy table should have pending delete entries"
    shutil.rmtree(os.path.join(table_path, *refs[0].split("/")))
    report = manifest_fsck(table_path)
    assert any("sidecar missing" in e for e in report["errors"])


def test_fsck_catches_out_of_range_positional_address(spark, table_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    _busy_table(spark, table_path)
    _, content = _latest_manifest(table_path)
    pos_entries = [
        e for e in content.get("deletes") or [] if e.get("kind") == "pos"
    ]
    assert pos_entries
    sp = os.path.join(table_path, *pos_entries[0]["ref"].split("/"))
    t = pq.read_table(sp)
    bad = pa.table(
        {
            "file": t.column("file"),
            "pos": pa.array([10**7] * len(t), pa.int64()),
        }
    )
    part = next(
        n for n in os.listdir(sp) if n.endswith(".parquet")
    )
    pq.write_table(bad, os.path.join(sp, part))
    report = manifest_fsck(table_path)
    assert any("addresses row" in e for e in report["errors"])


def test_fsck_warns_on_orphaned_stage(spark, table_path):
    _busy_table(spark, table_path)
    # a crashed writer's stage: data on disk, never committed
    orphan = os.path.join(table_path, "data", "deadbeefcafe")
    os.makedirs(os.path.join(orphan, "__p=d0"))
    with open(os.path.join(orphan, "__p=d0", "part-0.parquet"), "wb") as f:
        f.write(b"not really parquet")
    report = manifest_fsck(table_path)
    assert report["ok"] is True  # orphans are invisible to readers
    assert any("orphaned" in w for w in report["warnings"])
