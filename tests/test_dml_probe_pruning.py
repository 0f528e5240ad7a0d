"""Index-pruned DML match scans: DELETE WHERE / UPDATE WHERE bound
their probe to files that CAN hold matching rows — partition-equality
conjuncts drop whole partitions, zone-map stats drop files by range —
with every unrecognized predicate shape falling back to the full scan.
Soundness battery: pruned results must equal the semantic filter on
every seed, because pruning by a subset of conjuncts may only
over-approximate the match set.
"""

from __future__ import annotations

import random
import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    _predicate_boxes,
    manifest_delete_where,
    manifest_history,
    manifest_read,
    manifest_update_where,
    manifest_upsert_partitioned,
)
from data_management_service_run_etl_imputations_spark.sources.skipping import (
    manifest_collect_stats,
)


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/dmlp_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_predicate_boxes_extraction(spark):
    bx = _predicate_boxes
    assert bx(spark, "k = 3") == {"k": (3, 3)}
    assert bx(spark, "v >= 4 AND v <= 7") == {"v": (4, 7)}
    assert bx(spark, "5 < k") == {"k": (5, None)}
    assert bx(spark, "day = 'd1' AND v > 2") == {
        "day": ("d1", "d1"),
        "v": (2, None),
    }
    assert bx(spark, "k IN (3, 9, 5)") == {"k": (3, 9)}
    # intersecting conjuncts tighten
    assert bx(spark, "k > 2 AND k > 5 AND k <= 9") == {"k": (5, 9)}
    # unrecognized shapes contribute nothing (but other conjuncts do)
    assert bx(spark, "k % 7 = 0 AND v < 3") == {"v": (None, 3)}
    assert bx(spark, "k = 1 OR k = 2") == {}
    assert bx(spark, "NOT (k = 1)") == {}
    assert bx(spark, "name LIKE 'x%'") == {}
    assert bx(spark, "k = NULL") == {}
    assert bx(spark, "this is not sql") == {}


def _seed_partitioned(spark, table_path, with_stats=True):
    """3 partitions x 2 files each, k ranges disjoint per file."""
    for lo in (0, 30):
        rows = [
            (k, f"d{p}", float(k))
            for p in range(3)
            for k in range(lo + 10 * p, lo + 10 * p + 10)
        ]
        manifest_upsert_partitioned(
            spark.createDataFrame(
                rows, "k LONG, day STRING, v DOUBLE"
            ).coalesce(1),
            table_path,
            ["k"],
            "day",
        )
    if with_stats:
        manifest_collect_stats(spark, table_path, ["k", "v"])


def test_partition_equality_prunes_probe(spark, table_path):
    _seed_partitioned(spark, table_path, with_stats=False)
    res = manifest_delete_where(spark, table_path, "day = 'd1' AND k >= 40")
    m = manifest_history(table_path)[-1]["op_metrics"]
    # 6 live files total; only d1's 2 files probed (no stats needed)
    assert m["probe_files_total"] == 6
    assert m["probe_files_kept"] == 2
    assert res["deleted_rows"] == 10  # d1's second file: k 40..49
    got = sorted(
        r["k"]
        for r in manifest_read(spark, table_path)
        .filter("day = 'd1'")
        .collect()
    )
    assert got == [10, 11, 12, 13, 14, 15, 16, 17, 18, 19]


def test_zone_map_stats_prune_probe(spark, table_path):
    _seed_partitioned(spark, table_path, with_stats=True)
    res = manifest_update_where(
        spark, table_path, {"v": "v + 1000"}, "k >= 50", mode="cow"
    )
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert m["probe_files_total"] == 6
    # only the second-round files (k >= 30 per partition) can match
    assert m["probe_files_kept"] < 6
    assert res["updated_rows"] == 10  # d2's second file: k 50..59
    assert (
        manifest_read(spark, table_path).filter("v >= 1000").count() == 10
    )


def test_unparseable_predicate_full_scan_still_correct(spark, table_path):
    _seed_partitioned(spark, table_path, with_stats=True)
    res = manifest_delete_where(spark, table_path, "k % 13 = 0 OR v < 1")
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert m["probe_files_kept"] == m["probe_files_total"] == 6
    expect_deleted = {k for k in range(60) if k % 13 == 0 or k < 1}
    got = sorted(r["k"] for r in manifest_read(spark, table_path).collect())
    assert got == sorted(set(range(60)) - expect_deleted)
    assert res["deleted_rows"] == len(expect_deleted)


def test_bloom_equality_prunes_probe(spark, table_path):
    """A point delete on a bloom-indexed column prunes to the files
    that may contain the key — no zone maps involved (none collected):
    the equality complement the range stats cannot provide."""
    from data_management_service_run_etl_imputations_spark.sources.skipping import (
        manifest_collect_bloom,
    )

    _seed_partitioned(spark, table_path, with_stats=False)
    manifest_collect_bloom(spark, table_path, "k")
    res = manifest_delete_where(spark, table_path, "k = 42")
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert m["probe_files_total"] == 6
    assert m["probe_files_kept"] <= 2  # bloom fp margin; typically 1
    assert res["deleted_rows"] == 1
    assert manifest_read(spark, table_path).filter("k = 42").count() == 0


def test_bloom_gate_refuses_coercing_literal(spark, table_path):
    """`s = 1` is TRUE for string '01' under Spark's own coercion, but
    the bloom hash of "1" differs — the faithful-type gate must refuse
    to prune, and the delete must remove BOTH coercion-matching rows."""
    from data_management_service_run_etl_imputations_spark.sources.skipping import (
        manifest_collect_bloom,
    )

    manifest_upsert_partitioned(
        spark.createDataFrame(
            [("1", "d1", 1.0)], "s STRING, day STRING, v DOUBLE"
        ),
        table_path,
        ["s"],
        "day",
    )
    manifest_upsert_partitioned(
        spark.createDataFrame(
            [("01", "d1", 2.0), ("7", "d1", 3.0)],
            "s STRING, day STRING, v DOUBLE",
        ),
        table_path,
        ["s"],
        "day",
    )
    manifest_collect_bloom(spark, table_path, "s")
    res = manifest_delete_where(spark, table_path, "s = 1")
    m = manifest_history(table_path)[-1]["op_metrics"]
    # the int literal on a string column must NOT bloom-prune
    assert m["probe_files_kept"] == m["probe_files_total"]
    assert res["deleted_rows"] == 2  # both '1' and '01' coerce-match
    left = sorted(
        r["s"] for r in manifest_read(spark, table_path).collect()
    )
    assert left == ["7"]
    # a faithful STRING literal does prune and hits exactly one row
    res2 = manifest_delete_where(spark, table_path, "s = '7'")
    assert res2["deleted_rows"] == 1


def test_read_where_matches_plain_filter_and_time_travel(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_read_where,
    )

    _seed_partitioned(spark, table_path, with_stats=True)
    cond = "day = 'd2' AND k >= 50 AND v < 57"
    got = sorted(
        r["k"] for r in manifest_read_where(spark, table_path, cond).collect()
    )
    expect = sorted(
        r["k"]
        for r in manifest_read(spark, table_path).filter(cond).collect()
    )
    assert got == expect == [50, 51, 52, 53, 54, 55, 56]
    # time travel: version 1 predates the second-round files
    got_v1 = manifest_read_where(
        spark, table_path, "k >= 30", version=1
    ).count()
    assert got_v1 == 0
    # unparseable predicate: full scan, same semantics
    messy = "k % 7 = 3 OR v > 58"
    got_m = sorted(
        r["k"]
        for r in manifest_read_where(spark, table_path, messy).collect()
    )
    expect_m = sorted(
        r["k"]
        for r in manifest_read(spark, table_path).filter(messy).collect()
    )
    assert got_m == expect_m


def test_randomized_pruned_delete_equals_semantic_filter(spark, table_path):
    """Differential soundness: across random predicates (mixed
    prunable/unprunable conjuncts) the pruned DELETE must remove
    exactly the rows the same predicate selects on a plain read."""
    _seed_partitioned(spark, table_path, with_stats=True)
    rng = random.Random(7)
    survivors = set(range(60))
    for i in range(5):
        lo = rng.randint(0, 59)
        hi = lo + rng.randint(0, 20)
        extra = rng.choice(
            ["", f" AND k % {rng.randint(2, 5)} = 0", " AND day = 'd1'"]
        )
        cond = f"k >= {lo} AND k <= {hi}{extra}"
        before = manifest_read(spark, table_path)
        expect = {r["k"] for r in before.filter(cond).collect()}
        manifest_delete_where(
            spark, table_path, cond, mode=rng.choice(["mor", "cow"])
        )
        survivors -= expect
        got = {r["k"] for r in manifest_read(spark, table_path).collect()}
        assert got == survivors, f"round {i}: {cond}"


# --- typed partition-equality pruning (ADVICE r8: coercion faithfulness) ---


def test_partition_prune_int_column_float_literal(spark, table_path):
    """`p = 1.0` on an INT partition column: the str()-form compare
    ('1.0' vs key '1') used to prune EVERY partition and the DML
    silently matched 0 rows. Typed matching must keep p=1 and still
    prune the others."""
    rows = [(k, k % 3, float(k)) for k in range(30)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, p INT, v DOUBLE").coalesce(1),
        table_path,
        ["k"],
        "p",
    )
    got = manifest_read(
        spark, table_path
    ).filter("p = 1.0").count()
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_read_where,
    )

    assert manifest_read_where(spark, table_path, "p = 1.0").count() == got
    res = manifest_delete_where(spark, table_path, "p = 1.0")
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert res["deleted_rows"] == got == 10
    assert m["probe_files_kept"] < m["probe_files_total"]  # still prunes
    assert manifest_read(spark, table_path).count() == 20


def test_partition_prune_double_column_int_literal(spark, table_path):
    """`p = 1` on a DOUBLE partition column (key '1.0' vs str '1'):
    typed float compare keeps the matching partition AND prunes."""
    rows = [(k, float(k % 3), float(k)) for k in range(30)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, p DOUBLE, v DOUBLE").coalesce(1),
        table_path,
        ["k"],
        "p",
    )
    res = manifest_update_where(
        spark, table_path, {"v": "v + 1000"}, "p = 1", mode="cow"
    )
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert res["updated_rows"] == 10
    assert m["probe_files_kept"] < m["probe_files_total"]
    assert manifest_read(spark, table_path).filter("v >= 1000").count() == 10


def test_partition_prune_string_column_int_literal_no_prune(spark, table_path):
    """`p = 5` on a STRING partition column holding '05': Spark's own
    coercion casts the column to the literal's type, so '05' matches —
    pruning on the str form would drop it. The gate must refuse to
    prune and the delete must hit both '5' and '05'."""
    rows = [(1, "05", 1.0), (2, "5", 2.0), (3, "7", 3.0)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, p STRING, v DOUBLE").coalesce(1),
        table_path,
        ["k"],
        "p",
    )
    res = manifest_delete_where(spark, table_path, "p = 5")
    assert res["deleted_rows"] == 2
    assert sorted(
        r["k"] for r in manifest_read(spark, table_path).collect()
    ) == [3]


def test_partition_prune_fractional_literal_on_int_col_empty(
    spark, table_path
):
    """`p = 1.5` on an INT partition column is provably empty — exact
    to prune everything, and the DML must report 0 rows (not crash)."""
    rows = [(k, k % 3, float(k)) for k in range(9)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, p INT, v DOUBLE").coalesce(1),
        table_path,
        ["k"],
        "p",
    )
    res = manifest_delete_where(spark, table_path, "p = 1.5")
    assert res["deleted_rows"] == 0
    assert manifest_read(spark, table_path).count() == 9


def test_partition_prune_string_equality_still_prunes(spark, table_path):
    """The faithful pairing (string col, string literal) must still
    engage pruning — the fix may not regress the fast path."""
    _seed_partitioned(spark, table_path, with_stats=False)
    manifest_delete_where(spark, table_path, "day = 'd1'")
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert m["probe_files_total"] == 6
    assert m["probe_files_kept"] == 2
