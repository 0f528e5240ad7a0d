"""Insert-only MERGE fast path (round 12, SCALE.md commit-latency
profile): a ``WHEN NOT MATCHED THEN INSERT``-only merge cannot change an
existing row, so it must plan as ANTI-JOIN + APPEND — zero file
rewrites, and a fully-matched source commits NOTHING (the general plan
rewrote every matched file with identical content and bumped the
version on every no-op re-run). Reference parity: this is exactly the
reference's S7 anti-join insert-only load (`function_app.py:305-312`).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_delete_where,
    manifest_history,
    manifest_merge,
    manifest_read,
    manifest_upsert_partitioned,
)


@pytest.fixture()
def table_path():
    p = os.path.join(tempfile.gettempdir(), f"mio_{uuid.uuid4().hex[:8]}")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _b(spark, rows):
    return spark.createDataFrame(rows, "k INT, day STRING, v DOUBLE")


def _content(df):
    return sorted(tuple(r) for r in df.collect())


def test_insert_only_is_append_not_rewrite(spark, table_path):
    manifest_upsert_partitioned(
        _b(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]), table_path,
        ["k"], "day",
    )
    r = manifest_merge(
        _b(spark, [(2, "d1", 99.0), (3, "d1", 3.0)]), table_path,
        ["k"], "day", insert_not_matched=True,
    )
    assert r == {"updated": 0, "deleted": 0, "inserted": 1}
    m = manifest_history(table_path)[-1]["op_metrics"]
    # the matched key's file is NOT rewritten — append-only by plan
    assert m["insert_only"] is True
    assert m["files_rewritten"] == 0
    assert m["rows_inserted"] == 1
    got = _content(manifest_read(spark, table_path))
    assert got == [(1, "d1", 1.0), (2, "d1", 2.0), (3, "d1", 3.0)]


def test_noop_rerun_commits_nothing(spark, table_path):
    manifest_upsert_partitioned(
        _b(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
    )
    src = _b(spark, [(1, "d1", 5.0)])
    n_before = len(manifest_history(table_path))
    r = manifest_merge(
        src, table_path, ["k"], "day", insert_not_matched=True
    )
    assert r == {"updated": 0, "deleted": 0, "inserted": 0}
    # idempotent re-run: table version did NOT bump — history and CDF
    # show only the loads that changed something
    assert len(manifest_history(table_path)) == n_before
    assert _content(manifest_read(spark, table_path)) == [(1, "d1", 1.0)]


def test_key_surviving_only_in_deleted_rows_inserts(spark, table_path):
    """The anti-join must apply pending deletes: a key whose only
    target occurrence was deleted is NOT matched — the insert lands."""
    manifest_upsert_partitioned(
        _b(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]), table_path,
        ["k"], "day",
    )
    manifest_delete_where(spark, table_path, "k = 2", mode="mor")
    r = manifest_merge(
        _b(spark, [(2, "d1", 22.0)]), table_path, ["k"], "day",
        insert_not_matched=True,
    )
    assert r["inserted"] == 1
    got = _content(manifest_read(spark, table_path))
    assert got == [(1, "d1", 1.0), (2, "d1", 22.0)]


def test_insert_values_expressions(spark, table_path):
    manifest_upsert_partitioned(
        _b(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
    )
    r = manifest_merge(
        _b(spark, [(1, "d1", 9.0), (3, "d2", 3.0)]), table_path,
        ["k"], "day", insert_not_matched=True,
        insert_values={"k": "s.k", "day": "s.day", "v": "s.v * 10"},
    )
    assert r == {"updated": 0, "deleted": 0, "inserted": 1}
    got = _content(manifest_read(spark, table_path))
    assert got == [(1, "d1", 1.0), (3, "d2", 30.0)]


def test_schema_evolution_through_fast_path(spark, table_path):
    manifest_upsert_partitioned(
        _b(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
    )
    src = spark.createDataFrame(
        [(5, "d1", 5.0, "note5")], "k INT, day STRING, v DOUBLE, note STRING"
    )
    r = manifest_merge(
        src, table_path, ["k"], "day", insert_not_matched=True
    )
    assert r["inserted"] == 1
    got = _content(manifest_read(spark, table_path))
    assert (5, "d1", 5.0, "note5") in got
    assert (1, "d1", 1.0, None) in got  # old rows null-fill


def test_txn_token_idempotence(spark, table_path):
    manifest_upsert_partitioned(
        _b(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
    )
    r1 = manifest_merge(
        _b(spark, [(7, "d1", 7.0)]), table_path, ["k"], "day",
        insert_not_matched=True, txn=("app", 1),
    )
    r2 = manifest_merge(
        _b(spark, [(8, "d1", 8.0)]), table_path, ["k"], "day",
        insert_not_matched=True, txn=("app", 1),
    )
    assert r1["inserted"] == 1
    assert r2.get("skipped") is True and r2["inserted"] == 0
    got = _content(manifest_read(spark, table_path))
    assert (8, "d1", 8.0) not in got


def test_general_path_still_used_with_matched_clauses(spark, table_path):
    manifest_upsert_partitioned(
        _b(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]), table_path,
        ["k"], "day",
    )
    r = manifest_merge(
        _b(spark, [(2, "d1", 99.0), (3, "d1", 3.0)]), table_path,
        ["k"], "day", matched_update={"v": "s.v"},
        insert_not_matched=True,
    )
    assert r == {"updated": 1, "deleted": 0, "inserted": 1}
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert "insert_only" not in m
    got = _content(manifest_read(spark, table_path))
    assert got == [(1, "d1", 1.0), (2, "d1", 99.0), (3, "d1", 3.0)]


def test_null_keys_match_null_safe(spark, table_path):
    """eqNullSafe anti-join: a NULL source key matching a NULL target
    key is a MATCH (does not insert) — same semantics as the general
    path's full-outer join."""
    src0 = spark.createDataFrame(
        [(None, "d1", 1.0)], "k INT, day STRING, v DOUBLE"
    )
    manifest_upsert_partitioned(src0, table_path, ["k"], "day")
    r = manifest_merge(
        spark.createDataFrame(
            [(None, "d1", 9.0), (4, "d1", 4.0)],
            "k INT, day STRING, v DOUBLE",
        ),
        table_path, ["k"], "day", insert_not_matched=True,
    )
    assert r["inserted"] == 1
    got = {tuple(r) for r in manifest_read(spark, table_path).collect()}
    assert got == {(4, "d1", 4.0), (None, "d1", 1.0)}
