"""manifest_clone: zero-copy table clone via hard links of immutable
files. Pins: content equality at clone time (including pending
positional/equality delete masks), fully independent evolution on both
sides, vacuum on one side never breaks the other (shared inodes), time
travel clones an OLD version, fsck passes on the clone, and the
destination-must-be-empty guard.
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
    manifest_clone,
    manifest_compact,
    manifest_delete_where,
    manifest_history,
    manifest_read,
    manifest_upsert_partitioned,
    manifest_vacuum,
)


@pytest.fixture()
def roots():
    src = f"{tempfile.gettempdir()}/clone_src_{uuid.uuid4().hex[:10]}"
    dst = f"{tempfile.gettempdir()}/clone_dst_{uuid.uuid4().hex[:10]}"
    yield src, dst
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE")


def _rows(spark, path, **kw):
    return sorted(
        (r["k"], r["day"], r["v"])
        for r in manifest_read(spark, path, **kw).collect()
    )


def _seed(spark, src):
    manifest_upsert_partitioned(
        _batch(spark, [(k, f"d{k % 2}", float(k)) for k in range(6)]),
        src,
        ["k"],
        "day",
    )
    manifest_upsert_partitioned(
        _batch(spark, [(6, "d0", 6.0), (7, "d1", 7.0)]), src, ["k"], "day"
    )
    # pending positional mask must clone along
    manifest_delete_where(spark, src, "k = 3")


def test_clone_content_equality_and_zero_copy(spark, roots):
    src, dst = roots
    _seed(spark, src)
    res = manifest_clone(src, dst)
    assert res["files_copied"] == 0  # same fs: everything hard-linked
    assert res["files_linked"] > 0
    assert _rows(spark, dst) == _rows(spark, src)
    assert 3 not in [k for (k, _, _) in _rows(spark, dst)]
    # shared inodes, not copies
    hist = manifest_history(dst)
    assert len(hist) == 1 and hist[0]["op"].startswith("clone(")
    assert hist[0]["op_metrics"]["files_linked"] == res["files_linked"]


def test_clone_independent_evolution(spark, roots):
    src, dst = roots
    _seed(spark, src)
    manifest_clone(src, dst)
    before_src = _rows(spark, src)
    manifest_upsert_partitioned(
        _batch(spark, [(100, "d0", 100.0)]), dst, ["k"], "day"
    )
    manifest_delete_where(spark, dst, "k = 0", mode="cow")
    assert _rows(spark, src) == before_src  # src untouched
    got_dst = [k for (k, _, _) in _rows(spark, dst)]
    assert 100 in got_dst and 0 not in got_dst
    # and the other direction
    manifest_upsert_partitioned(
        _batch(spark, [(200, "d1", 200.0)]), src, ["k"], "day"
    )
    assert 200 not in [k for (k, _, _) in _rows(spark, dst)]


def test_vacuum_on_source_never_breaks_clone(spark, roots):
    src, dst = roots
    _seed(spark, src)
    manifest_clone(src, dst)
    # source rewrites everything it shared, then drops the old files
    manifest_compact(spark, src)
    manifest_vacuum(src, keep_versions=1)
    # the clone still reads its (hard-linked) snapshot bit-for-bit
    keys = [k for (k, _, _) in _rows(spark, dst)]
    assert keys == [0, 1, 2, 4, 5, 6, 7]
    assert manifest_fsck(dst)["ok"] is True


def test_time_travel_clone(spark, roots):
    src, dst = roots
    _seed(spark, src)  # v1 upsert, v2 upsert, v3 delete
    manifest_clone(src, dst, version=1)
    assert [k for (k, _, _) in _rows(spark, dst)] == [0, 1, 2, 3, 4, 5]
    hist = manifest_history(dst)
    assert hist[0]["op_metrics"]["source_version"] == 1


def test_clone_refuses_existing_destination(spark, roots):
    src, dst = roots
    _seed(spark, src)
    manifest_clone(src, dst)
    with pytest.raises(ValueError, match="already has a table"):
        manifest_clone(src, dst)


def test_clone_fsck_green_and_counts(spark, roots):
    src, dst = roots
    _seed(spark, src)
    manifest_clone(src, dst)
    report = manifest_fsck(dst)
    assert report["ok"] is True, report["errors"]
    # positional masks clone along: metadata count subtracts them
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_count,
    )

    assert manifest_count(dst) == 7


def test_clone_refuses_stray_destination_file(spark, roots):
    """ADVICE r8 (low): the copy fallback in _link_one used to clobber
    a pre-existing destination file. A dst containing stray data at a
    colliding rel path must fail loudly, not silently overwrite."""
    src, dst = roots
    manifest_upsert_partitioned(
        spark.createDataFrame(
            [(1, "d1", 1.0)], "k LONG, day STRING, v DOUBLE"
        ).coalesce(1),
        src,
        ["k"],
        "day",
    )
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        _latest_manifest,
    )

    _, content = _latest_manifest(src)
    rel = next(iter(content["files"].values()))[0][0]
    stray = os.path.join(dst, *rel.split("/"))
    os.makedirs(os.path.dirname(stray), exist_ok=True)
    with open(stray, "w") as fh:
        fh.write("precious")
    with pytest.raises((FileExistsError, OSError)):
        manifest_clone(src, dst)
    with open(stray) as fh:
        assert fh.read() == "precious"  # never clobbered
