"""SQL DML dispatcher (manifest_sql): DELETE FROM / UPDATE … SET /
MERGE INTO statements routed to the manifest table's transactional
engines, with statement-level parsing only — conditions and assignments
reach Spark's own expression parser verbatim. Non-DML falls through to
spark.sql, DML refreshes the view to the new head, and every refusal is
loud (VERDICT r8 "Next round" #1).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
    _find_kw_top,
    _parse_assignments,
    _rewrite_alias,
    _split_top,
    manifest_sql,
    manifest_sql_register,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_history,
    manifest_read,
    manifest_upsert_partitioned,
)


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/msql_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture()
def view(spark, table_path):
    rows = [(i, f"d{i % 3}", float(i)) for i in range(30)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE").coalesce(2),
        table_path,
        ["k"],
        "day",
    )
    name = f"msqlv_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path)
    yield name
    try:
        spark.catalog.dropTempView(name)
    except Exception:  # noqa: BLE001
        pass


# ---- statement-level tokenizer units ---------------------------------


def test_find_kw_top_skips_quotes_and_parens():
    s = "a = 'x WHERE y' AND fn(1, 'WHERE') AND b WHERE c = 1"
    i = _find_kw_top(s, "WHERE")
    assert s[i:].startswith("WHERE c")
    assert _find_kw_top("no keyword here", "WHERE") == -1
    # word boundaries: WHEREx / xWHERE never match
    assert _find_kw_top("aWHERE WHEREb", "WHERE") == -1


def test_split_top_commas_and_keywords():
    assert _split_top("a = f(1, 2), b = 'x,y', c = 3", ",") == [
        "a = f(1, 2)",
        " b = 'x,y'",
        " c = 3",
    ]
    parts = _split_top("t.a = s.a AND t.b = s.b AND (x AND y) = z", "AND")
    assert len(parts) == 3
    assert parts[2].strip() == "(x AND y) = z"


def test_parse_assignments_edges():
    a = _parse_assignments("v = v + 1, s = concat(a, ','), `q` = 'a=b'")
    assert a == {"v": "v + 1", "s": "concat(a, ',')", "q": "'a=b'"}
    with pytest.raises(ValueError, match="assigned twice"):
        _parse_assignments("v = 1, v = 2")
    with pytest.raises(ValueError, match="cannot parse"):
        _parse_assignments("not an assignment")


def test_rewrite_alias_outside_strings_only():
    got = _rewrite_alias(
        "tgt.v + src.v + 'tgt.v literal' + xtgt.v",
        {"tgt": "t", "src": "s"},
    )
    assert got == "t.v + s.v + 'tgt.v literal' + xtgt.v"


# ---- DELETE ------------------------------------------------------------


def test_sql_delete_where(spark, table_path, view):
    r = manifest_sql(spark, f"DELETE FROM {view} WHERE k % 5 = 0")
    assert r["statement"] == "delete" and r["deleted_rows"] == 6
    # the view auto-refreshed: SELECT through spark.sql sees the delete
    assert spark.sql(f"SELECT count(*) n FROM {view}").first()["n"] == 24
    assert manifest_read(spark, table_path).count() == 24
    # default is merge-on-read: zero rewrite
    last = manifest_history(table_path)[-1]
    assert last["op"] == "delete"
    assert last["op_metrics"]["mode"] == "merge-on-read"


def test_sql_delete_without_where_and_mode(spark, table_path, view):
    r = manifest_sql(spark, f"DELETE FROM {view}", mode="cow")
    assert r["deleted_rows"] == 30
    assert spark.sql(f"SELECT count(*) n FROM {view}").first()["n"] == 0


def test_sql_delete_trailing_semicolon_and_case(spark, table_path, view):
    r = manifest_sql(spark, f"  delete from {view} where day = 'd1' ; ")
    assert r["deleted_rows"] == 10


# ---- UPDATE ------------------------------------------------------------


def test_sql_update_set_where(spark, table_path, view):
    r = manifest_sql(
        spark,
        f"UPDATE {view} SET v = v * 2, day = day WHERE k >= 20",
    )
    assert r["statement"] == "update" and r["updated_rows"] == 10
    got = {r["k"]: r["v"] for r in spark.sql(f"SELECT k, v FROM {view}").collect()}
    assert got[25] == 50.0 and got[5] == 5.0


def test_sql_update_where_in_string_literal(spark, table_path, view):
    """A WHERE inside a string literal must not split the statement."""
    r = manifest_sql(
        spark,
        f"UPDATE {view} SET day = concat(day, ' WHERE not a clause') "
        f"WHERE k = 1",
    )
    assert r["updated_rows"] == 1


# ---- MERGE -------------------------------------------------------------


def test_sql_merge_all_clauses(spark, table_path, view):
    src = f"msqls_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(1, "d1", 999.0), (100, "d1", 1.0), (7, "d1", -1.0)],
        "k LONG, day STRING, v DOUBLE",
    ).createOrReplaceTempView(src)
    r = manifest_sql(
        spark,
        f"""
        MERGE INTO {view} AS tgt USING {src} AS src
        ON tgt.k = src.k
        WHEN MATCHED AND src.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = src.v
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert r == {"statement": "merge", "updated": 1, "deleted": 1, "inserted": 1}
    got = {r["k"]: r["v"] for r in spark.sql(f"SELECT k, v FROM {view}").collect()}
    assert got[1] == 999.0 and got[100] == 1.0 and 7 not in got
    assert len(got) == 30  # 30 - 1 deleted + 1 inserted


def test_sql_merge_subquery_source_update_star(spark, table_path, view):
    """Parenthesized subquery source + UPDATE SET * (all non-key,
    non-partition columns from the source)."""
    r = manifest_sql(
        spark,
        f"""
        MERGE INTO {view} t
        USING (SELECT 2 AS k, 'd2' AS day, CAST(-5 AS DOUBLE) AS v) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        """,
    )
    assert r["updated"] == 1 and r["inserted"] == 0
    got = {r["k"]: r["v"] for r in spark.sql(f"SELECT k, v FROM {view}").collect()}
    assert got[2] == -5.0


def test_sql_merge_unaliased_relations_qualify_by_name(spark, table_path, view):
    src = f"msqls_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(3, "d0", 333.0)], "k LONG, day STRING, v DOUBLE"
    ).createOrReplaceTempView(src)
    r = manifest_sql(
        spark,
        f"MERGE INTO {view} USING {src} ON {view}.k = {src}.k "
        f"WHEN MATCHED THEN UPDATE SET v = {src}.v",
    )
    assert r["updated"] == 1
    got = {r["k"]: r["v"] for r in spark.sql(f"SELECT k, v FROM {view}").collect()}
    assert got[3] == 333.0


def test_sql_merge_refusals(spark, table_path, view):
    src = f"msqls_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(1, "d1", 1.0)], "k LONG, day STRING, v DOUBLE"
    ).createOrReplaceTempView(src)
    # column-list INSERT must name the partition column
    with pytest.raises(ValueError, match="partition"):
        manifest_sql(
            spark,
            f"MERGE INTO {view} t USING {src} s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)",
        )
    with pytest.raises(ValueError, match="names 2 columns"):
        manifest_sql(
            spark,
            f"MERGE INTO {view} t USING {src} s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, day) VALUES (s.k)",
        )
    with pytest.raises(ValueError, match="duplicate column"):
        manifest_sql(
            spark,
            f"MERGE INTO {view} t USING {src} s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, k) VALUES (s.k, s.k)",
        )
    with pytest.raises(ValueError, match="equi-key"):
        manifest_sql(
            spark,
            f"MERGE INTO {view} t USING {src} s ON t.k > s.k "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="same-named"):
        manifest_sql(
            spark,
            f"MERGE INTO {view} t USING {src} s ON t.k = s.v "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="cannot parse MERGE WHEN"):
        manifest_sql(
            spark, f"MERGE INTO {view} t USING {src} s ON t.k = s.k WHEN"
        )


def test_unregistered_table_and_fallthrough(spark, table_path, view):
    with pytest.raises(ValueError, match="not a registered manifest view"):
        manifest_sql(spark, "DELETE FROM never_registered WHERE 1=1")
    # SELECT / SHOW fall through to spark.sql unchanged
    df = manifest_sql(spark, f"SELECT count(*) AS n FROM {view}")
    assert df.first()["n"] == 30


def test_sql_dml_probe_still_prunes(spark, table_path, view):
    """Plan evidence (VERDICT r8 'done' criterion): a partition-equality
    DELETE through SQL probes only the matching partition's files —
    the dispatcher forwards the predicate verbatim, so the engine's
    probe pruning engages exactly as the Python API's."""
    r = manifest_sql(spark, f"DELETE FROM {view} WHERE day = 'd1'")
    assert r["deleted_rows"] == 10
    # _prune_dml_probe telemetry: the mor probe read only d1's files
    m = manifest_history(table_path)[-1]["op_metrics"]
    assert m["probe_files_kept"] < m["probe_files_total"], (
        f"probe did not prune: {m}"
    )


# ---- follow_head: always-current views through the dispatcher --------


def _add(spark, table_path, rows):
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE").coalesce(1),
        table_path,
        ["k"],
        "day",
    )


def test_follow_head_view_sees_new_commits(spark, table_path):
    _add(spark, table_path, [(1, "d0", 1.0), (2, "d1", 2.0)])
    name = f"msqlf_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path, follow_head=True)
    q = f"SELECT count(*) AS c FROM {name}"
    assert manifest_sql(spark, q).collect()[0].c == 2
    # commit through the Python API (NOT the dispatcher) — currency must
    # come from the head compare, not the DML refresh path
    _add(spark, table_path, [(3, "d2", 3.0)])
    assert manifest_sql(spark, q).collect()[0].c == 3
    # raw spark.sql keeps the last bound snapshot only until the next
    # dispatcher call re-binds; after it, both agree
    assert spark.sql(q).collect()[0].c == 3


def test_pinned_view_stays_pinned_through_dispatcher(spark, table_path):
    _add(spark, table_path, [(1, "d0", 1.0)])
    name = f"msqlp_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path)  # default: pinned
    q = f"SELECT count(*) AS c FROM {name}"
    _add(spark, table_path, [(2, "d1", 2.0)])
    assert manifest_sql(spark, q).collect()[0].c == 1


def test_follow_head_refuses_explicit_version(spark, table_path):
    _add(spark, table_path, [(1, "d0", 1.0)])
    with pytest.raises(ValueError, match="follow_head"):
        manifest_sql_register(
            spark, "nope", table_path, version=1, follow_head=True
        )


def test_follow_head_no_rebind_when_head_unchanged(spark, table_path):
    """An unchanged table must not be re-registered (re-binding replans
    the DataFrame; the whole point of the version compare is that a
    quiescent table costs only metadata stats)."""
    from data_management_service_run_etl_imputations_spark.sources import (
        manifest_batch as mb,
    )

    _add(spark, table_path, [(1, "d0", 1.0), (2, "d1", 2.0)])
    name = f"msqln_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path, follow_head=True)
    bound_before = mb._SQL_TABLES[name.lower()]
    q = f"SELECT sum(v) AS s FROM {name}"
    manifest_sql(spark, q).collect()
    assert mb._SQL_TABLES[name.lower()] == bound_before  # same tuple → no rebind


def test_follow_head_survives_dml_refresh(spark, table_path):
    """A DML statement's view refresh must preserve the follow flag —
    otherwise one UPDATE silently downgrades the view to pinned."""
    from data_management_service_run_etl_imputations_spark.sources import (
        manifest_batch as mb,
    )

    _add(spark, table_path, [(1, "d0", 1.0), (2, "d1", 2.0)])
    name = f"msqld_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path, follow_head=True)
    manifest_sql(spark, f"UPDATE {name} SET v = v + 10 WHERE k = 1")
    assert mb._SQL_TABLES[name.lower()][2] is True
    # and the refreshed view already sees the DML
    got = manifest_sql(
        spark, f"SELECT v FROM {name} WHERE k = 1"
    ).collect()[0].v
    assert got == 11.0
    # out-of-band commit after DML still tracked
    _add(spark, table_path, [(9, "d0", 9.0)])
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {name}").collect()[0].c
        == 3
    )


def test_follow_head_name_in_string_literal_not_a_reference(spark, table_path):
    """A view name inside a string literal must not trigger a head
    compare/rebind — the reference detector strips quoted regions."""
    from data_management_service_run_etl_imputations_spark.sources import (
        manifest_batch as mb,
    )

    _add(spark, table_path, [(1, "d0", 1.0)])
    name = f"msqls_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path, follow_head=True)
    _add(spark, table_path, [(2, "d1", 2.0)])
    bound = mb._SQL_TABLES[name.lower()]
    manifest_sql(spark, f"SELECT '{name}' AS tag").collect()
    assert mb._SQL_TABLES[name.lower()] == bound  # literal only → untouched


def test_follow_head_subquery_reference_rebinds(spark, table_path):
    _add(spark, table_path, [(1, "d0", 1.0), (2, "d1", 2.0)])
    name = f"msqlq_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path, follow_head=True)
    _add(spark, table_path, [(3, "d2", 3.0)])
    got = manifest_sql(
        spark,
        f"SELECT c FROM (SELECT count(*) AS c FROM {name}) x",
    ).collect()[0].c
    assert got == 3


# ---- INSERT INTO / INSERT OVERWRITE through the dispatcher ------------


def test_sql_insert_into_select(spark, table_path, view):
    r = manifest_sql(
        spark,
        f"INSERT INTO {view} SELECT k + 1000, day, v * 10 "
        f"FROM {view} WHERE k < 3",
    )
    assert r["statement"] == "insert" and r["mode"] == "append"
    assert r["rows_inserted"] == 3
    got = sorted(
        (row["k"], row["v"])
        for row in manifest_sql(
            spark, f"SELECT k, v FROM {view} WHERE k >= 1000"
        ).collect()
    )
    assert got == [(1000, 0.0), (1001, 10.0), (1002, 20.0)]
    assert manifest_read(spark, table_path).count() == 33


def test_sql_insert_values_and_column_list(spark, table_path, view):
    r = manifest_sql(
        spark,
        f"INSERT INTO {view} (day, k) VALUES ('d9', 900), ('d9', 901)",
    )
    assert r["rows_inserted"] == 2
    got = manifest_sql(
        spark, f"SELECT k, day, v FROM {view} WHERE day = 'd9' ORDER BY k"
    ).collect()
    assert [(row["k"], row["day"], row["v"]) for row in got] == [
        (900, "d9", None),  # unlisted column fills NULL
        (901, "d9", None),
    ]


def test_sql_insert_overwrite_dynamic(spark, table_path, view):
    before_d0 = manifest_sql(
        spark, f"SELECT count(*) AS c FROM {view} WHERE day = 'd0'"
    ).collect()[0].c
    assert before_d0 == 10
    r = manifest_sql(
        spark,
        f"INSERT OVERWRITE {view} VALUES "
        f"(CAST(1 AS LONG), 'd0', CAST(-1.0 AS DOUBLE))",
    )
    assert r["mode"] == "dynamic-overwrite"
    # d0 replaced wholesale, every other partition untouched
    got = manifest_sql(
        spark, f"SELECT k, v FROM {view} WHERE day = 'd0'"
    ).collect()
    assert [(row["k"], row["v"]) for row in got] == [(1, -1.0)]
    assert manifest_read(spark, table_path).count() == 30 - 10 + 1


def test_sql_insert_parenthesized_select_source(spark, table_path, view):
    r = manifest_sql(
        spark,
        f"INSERT INTO {view} (SELECT k + 2000, day, v FROM {view} "
        f"WHERE k = 5)",
    )
    assert r["rows_inserted"] == 1
    assert (
        manifest_sql(
            spark, f"SELECT count(*) AS c FROM {view} WHERE k = 2005"
        ).collect()[0].c
        == 1
    )


def test_sql_insert_refusals(spark, table_path, view):
    # positional arity mismatch
    with pytest.raises(ValueError, match="positional"):
        manifest_sql(spark, f"INSERT INTO {view} SELECT 1, 'd0'")
    # unknown column in the list
    with pytest.raises(ValueError, match="do not exist"):
        manifest_sql(
            spark, f"INSERT INTO {view} (nope, day, v) VALUES (1, 'd0', 1.0)"
        )
    # column list omitting the partition column
    with pytest.raises(ValueError, match="partition"):
        manifest_sql(spark, f"INSERT INTO {view} (k, v) VALUES (1, 1.0)")
    # duplicate column in the list
    with pytest.raises(ValueError, match="duplicate"):
        manifest_sql(
            spark, f"INSERT INTO {view} (k, k, day) VALUES (1, 2, 'd0')"
        )
    # arity mismatch against the column list
    with pytest.raises(ValueError, match="column list names"):
        manifest_sql(spark, f"INSERT INTO {view} (k, day) VALUES (1)")


def test_sql_insert_casts_to_table_types(spark, table_path, view):
    """Store-assignment: INT literals land in LONG/DOUBLE columns."""
    manifest_sql(
        spark, f"INSERT INTO {view} VALUES (42424242, 'd1', 7)"
    )
    got = manifest_sql(
        spark, f"SELECT k, v FROM {view} WHERE k = 42424242"
    ).collect()
    assert (got[0]["k"], got[0]["v"]) == (42424242, 7.0)


def test_sql_merge_conditional_update(spark, table_path, view):
    """WHEN MATCHED AND <cond> THEN UPDATE: only matched rows passing
    the per-clause condition update; the rest carry unchanged."""
    src = f"msqls_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(0, 100.0), (1, 200.0), (2, 300.0)], "k LONG, nv DOUBLE"
    ).createOrReplaceTempView(src)
    r = manifest_sql(
        spark,
        f"MERGE INTO {view} t USING {src} s ON t.k = s.k "
        "WHEN MATCHED AND s.nv > 150 THEN UPDATE SET v = s.nv",
    )
    assert r["updated"] == 2  # k=0 matched but failed the gate
    got = {
        row["k"]: row["v"]
        for row in manifest_sql(
            spark, f"SELECT k, v FROM {view} WHERE k IN (0, 1, 2)"
        ).collect()
    }
    assert got == {0: 0.0, 1: 200.0, 2: 300.0}


def test_sql_merge_column_list_insert(spark, table_path, view):
    """INSERT (cols) VALUES (exprs): expressions over the source,
    unlisted columns NULL, partition column required (and present)."""
    src = f"msqls_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(500, "d7"), (501, "d7")], "k LONG, target_day STRING"
    ).createOrReplaceTempView(src)
    r = manifest_sql(
        spark,
        f"MERGE INTO {view} t USING {src} s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, day) VALUES (s.k + 1000, "
        "s.target_day)",
    )
    assert r["inserted"] == 2
    got = manifest_sql(
        spark, f"SELECT k, day, v FROM {view} WHERE day = 'd7' ORDER BY k"
    ).collect()
    assert [(row["k"], row["day"], row["v"]) for row in got] == [
        (1500, "d7", None),
        (1501, "d7", None),
    ]


def test_sql_merge_conditional_update_null_condition_carries(
    spark, table_path, view
):
    """A NULL per-clause condition means NOT updated (ANSI), never an
    error or an update."""
    src = f"msqls_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [(3, None), (4, 10.0)], "k LONG, nv DOUBLE"
    ).createOrReplaceTempView(src)
    r = manifest_sql(
        spark,
        f"MERGE INTO {view} t USING {src} s ON t.k = s.k "
        "WHEN MATCHED AND s.nv > 5 THEN UPDATE SET v = s.nv",
    )
    assert r["updated"] == 1  # k=3's NULL gate carries
    got = {
        row["k"]: row["v"]
        for row in manifest_sql(
            spark, f"SELECT k, v FROM {view} WHERE k IN (3, 4)"
        ).collect()
    }
    assert got == {3: 3.0, 4: 10.0}


# ---- utility statements ------------------------------------------------


def test_sql_describe_history(spark, table_path, view):
    manifest_sql(spark, f"DELETE FROM {view} WHERE k = 0")
    hist = manifest_sql(spark, f"DESCRIBE HISTORY {view}").collect()
    assert hist[0]["op"] == "delete"  # newest first
    assert hist[-1]["op"] == "upsert"
    assert hist[0]["version"] > hist[-1]["version"]
    import json as _json

    m = _json.loads(hist[0]["op_metrics"])
    assert m["deleted_rows"] == 1


def test_sql_optimize_compacts(spark, table_path, view):
    # fragment one partition with two extra appends
    for i in (800, 801):
        manifest_sql(spark, f"INSERT INTO {view} VALUES "
                            f"(CAST({i} AS LONG), 'd0', CAST(0.0 AS DOUBLE))")
    r = manifest_sql(spark, f"OPTIMIZE {view}")
    assert r["statement"] == "optimize"
    assert r["partitions"] >= 1 and r["files_after"] <= r["files_before"]
    # content unchanged, view refreshed
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 32
    )
    assert manifest_read(spark, table_path).count() == 32


def test_sql_optimize_zorder(spark, table_path, view):
    r = manifest_sql(spark, f"OPTIMIZE {view} ZORDER BY (k, v)")
    assert r["statement"] == "optimize-zorder"
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 30
    )


def test_sql_vacuum_retain_versions(spark, table_path, view):
    import os

    manifest_sql(spark, f"UPDATE {view} SET v = v + 1 WHERE k = 1")
    manifest_sql(spark, f"OPTIMIZE {view}")
    n_stages_before = len(os.listdir(f"{table_path}/data"))
    r = manifest_sql(spark, f"VACUUM {view} RETAIN 1 VERSIONS")
    assert r["statement"] == "vacuum"
    assert r["removed_dirs"] >= 1
    assert len(os.listdir(f"{table_path}/data")) < n_stages_before
    # table still reads correctly at head
    got = manifest_sql(
        spark, f"SELECT v FROM {view} WHERE k = 1"
    ).collect()[0].v
    assert got == 2.0


def test_sql_util_unregistered_table_refused(spark):
    with pytest.raises(ValueError, match="not a registered manifest view"):
        manifest_sql(spark, "DESCRIBE HISTORY no_such_view")
    with pytest.raises(ValueError, match="not a registered manifest view"):
        manifest_sql(spark, "VACUUM no_such_view")


def test_sql_analyze_table(spark, table_path, view):
    r = manifest_sql(
        spark,
        f"ANALYZE TABLE {view} COMPUTE STATISTICS FOR COLUMNS k, v",
    )
    assert r["statement"] == "analyze"
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        _latest_manifest,
    )

    _, content = _latest_manifest(table_path)
    assert content.get("stats_ref")
    assert set(content.get("stats_cols", [])) >= {"k", "v"}


def test_sql_create_table_as(spark, table_path, view):
    import shutil as _shutil
    import tempfile as _tempfile

    dst = f"{_tempfile.gettempdir()}/msqlctas_{uuid.uuid4().hex[:8]}"
    new_view = f"msqlnew_{uuid.uuid4().hex[:8]}"
    try:
        r = manifest_sql(
            spark,
            f"CREATE TABLE {new_view} LOCATION '{dst}' "
            f"PARTITIONED BY (day) "
            f"AS SELECT k, day, v * 100 AS v FROM {view} WHERE k < 6",
        )
        assert r["statement"] == "create-table-as"
        assert r["rows_inserted"] == 6
        # registered follow_head: later INSERT through the dispatcher is
        # visible without re-registration
        manifest_sql(
            spark,
            f"INSERT INTO {new_view} VALUES "
            f"(CAST(99 AS LONG), 'd9', CAST(9.0 AS DOUBLE))",
        )
        got = manifest_sql(
            spark, f"SELECT count(*) AS c FROM {new_view}"
        ).collect()[0].c
        assert got == 7
        assert manifest_read(spark, dst).count() == 7
    finally:
        _shutil.rmtree(dst, ignore_errors=True)
        try:
            spark.catalog.dropTempView(new_view)
        except Exception:  # noqa: BLE001
            pass


def test_sql_create_table_as_refusals(spark, table_path, view):
    with pytest.raises(ValueError, match="PARTITIONED BY column"):
        manifest_sql(
            spark,
            f"CREATE TABLE t2 LOCATION '/tmp/x_{uuid.uuid4().hex[:6]}' "
            f"PARTITIONED BY (nope) AS SELECT k, day, v FROM {view}",
        )


def test_sql_restore_version_as_of(spark, table_path, view):
    v0 = manifest_history(table_path)[-1]["version"]
    manifest_sql(spark, f"DELETE FROM {view} WHERE k < 10")
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 20
    )
    r = manifest_sql(spark, f"RESTORE TABLE {view} TO VERSION AS OF {v0}")
    assert r["statement"] == "restore" and r["restored_version"] == v0
    # view re-bound to the restored head: the deleted rows are back
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 30
    )
    # history preserved: restore is a NEW head, not a rewind
    assert manifest_history(table_path)[-1]["version"] > v0 + 1


def test_sql_restore_timestamp_as_of(spark, table_path, view):
    ts0 = manifest_history(table_path)[-1]["committed_at"]
    manifest_sql(spark, f"UPDATE {view} SET v = v + 100 WHERE k = 1")
    r = manifest_sql(spark, f"RESTORE {view} TO TIMESTAMP AS OF {ts0}")
    assert r["statement"] == "restore"
    got = manifest_sql(spark, f"SELECT v FROM {view} WHERE k = 1").collect()
    assert got[0].v == 1.0


def test_sql_alter_constraint_roundtrip(spark, table_path, view):
    r = manifest_sql(
        spark, f"ALTER TABLE {view} ADD CONSTRAINT v_nonneg CHECK (v >= 0)"
    )
    assert r == {"statement": "add-constraint", "name": "v_nonneg"}
    # the constraint is live: a violating INSERT aborts before commit
    with pytest.raises(Exception, match="v_nonneg"):
        manifest_sql(
            spark,
            f"INSERT INTO {view} VALUES "
            f"(CAST(900 AS LONG), 'd0', CAST(-1.0 AS DOUBLE))",
        )
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 30
    )
    r = manifest_sql(spark, f"ALTER TABLE {view} DROP CONSTRAINT v_nonneg")
    assert r["statement"] == "drop-constraint"
    manifest_sql(
        spark,
        f"INSERT INTO {view} VALUES "
        f"(CAST(900 AS LONG), 'd0', CAST(-1.0 AS DOUBLE))",
    )
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 31
    )


def test_sql_alter_rename_and_drop_column(spark, table_path, view):
    r = manifest_sql(spark, f"ALTER TABLE {view} RENAME COLUMN v TO score")
    assert r == {"statement": "rename-column", "old": "v", "new": "score"}
    # view re-registered with the new schema; old files read re-labeled
    got = manifest_sql(
        spark, f"SELECT sum(score) AS s FROM {view}"
    ).collect()[0].s
    assert got == float(sum(range(30)))
    r = manifest_sql(spark, f"ALTER TABLE {view} DROP COLUMN score")
    assert r == {"statement": "drop-column", "column": "score"}
    cols = manifest_sql(spark, f"SELECT * FROM {view}").columns
    assert cols == ["k", "day"]


def test_sql_alter_unsupported_clause_refused(spark, table_path, view):
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        manifest_sql(
            spark, f"ALTER TABLE {view} SET TBLPROPERTIES ('a'='b')"
        )
    with pytest.raises(ValueError, match="not a registered manifest view"):
        manifest_sql(spark, "RESTORE TABLE nope TO VERSION AS OF 0")


def test_sql_insert_into_column_mapped_table(spark, table_path, view):
    manifest_sql(spark, f"ALTER TABLE {view} RENAME COLUMN v TO score")
    r = manifest_sql(
        spark,
        f"INSERT INTO {view} VALUES "
        f"(CAST(700 AS LONG), 'd1', CAST(7.0 AS DOUBLE))",
    )
    assert r["statement"] == "insert" and r["rows_inserted"] == 1
    got = manifest_sql(
        spark, f"SELECT score FROM {view} WHERE k = 700"
    ).collect()
    assert got[0].score == 7.0
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 31
    )


def test_sql_insert_overwrite_constrained_table(spark, table_path, view):
    manifest_sql(
        spark, f"ALTER TABLE {view} ADD CONSTRAINT v_cap CHECK (v < 1000)"
    )
    # dynamic overwrite replaces exactly partition d0, enforcing the CHECK
    r = manifest_sql(
        spark,
        f"INSERT OVERWRITE {view} VALUES "
        f"(CAST(1 AS LONG), 'd0', CAST(500.0 AS DOUBLE))",
    )
    assert r["statement"] == "insert" and r["mode"] == "dynamic-overwrite"
    assert r["partitions_written"] == 1
    assert (
        manifest_sql(
            spark, f"SELECT count(*) AS c FROM {view} WHERE day = 'd0'"
        ).collect()[0].c
        == 1
    )
    # the other partitions survive untouched
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 21
    )
    with pytest.raises(Exception, match="v_cap"):
        manifest_sql(
            spark,
            f"INSERT OVERWRITE {view} VALUES "
            f"(CAST(2 AS LONG), 'd0', CAST(2000.0 AS DOUBLE))",
        )


def test_sql_unfiltered_read_after_filtered_read_not_pruned(
    spark, table_path, view
):
    # Spark reuses the view's reader instance across queries and does
    # NOT call pushFilters when a query has no pushable filters — the
    # planner must CONSUME pushdown state per round, or this count
    # returns the previous query's pruned subset (10) instead of 30
    assert (
        manifest_sql(
            spark, f"SELECT count(*) AS c FROM {view} WHERE day = 'd0'"
        ).collect()[0].c
        == 10
    )
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 30
    )
    # and a DIFFERENT filter right after is planned from ITS filters
    assert (
        manifest_sql(
            spark, f"SELECT count(*) AS c FROM {view} WHERE day = 'd1'"
        ).collect()[0].c
        == 10
    )


def test_sql_mixed_filter_contexts_one_statement(spark, table_path, view):
    # a statement referencing the view twice (one scan filtered, one
    # not) is registered prune='false' for the round — the shared JVM
    # scan cache can otherwise serve the pruned plan to the unfiltered
    # scan WITHIN the statement
    r = manifest_sql(
        spark,
        f"SELECT (SELECT count(*) FROM {view}) AS total, "
        f"(SELECT count(*) FROM {view} WHERE day='d0') AS dd",
    ).collect()[0]
    assert (r.total, r.dd) == (30, 10)
    # the next single-reference statement restores a pruning binding
    from data_management_service_run_etl_imputations_spark.sources import (
        manifest_batch as mb,
    )

    assert mb._SQL_TABLES[view.lower()][4] is True
    assert (
        manifest_sql(
            spark, f"SELECT count(*) AS c FROM {view} WHERE day = 'd1'"
        ).collect()[0].c
        == 10
    )


def test_raw_sql_binding_with_prune_false_is_reusable(spark, table_path):
    import uuid as _uuid

    from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
        manifest_sql_register as reg,
    )

    rows = [(i, f"d{i % 3}", float(i)) for i in range(30)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE").coalesce(
            2
        ),
        table_path,
        ["k"],
        "day",
    )
    name = f"msqlraw_{_uuid.uuid4().hex[:8]}"
    reg(spark, name, table_path, prune=False)
    # raw spark.sql (no dispatcher, no rebinds): filtered then
    # unfiltered on ONE long-lived binding stays correct because the
    # no-prune reader never bakes a filter context into the cached scan
    assert (
        spark.sql(
            f"SELECT count(*) AS c FROM {name} WHERE day = 'd0'"
        ).collect()[0].c
        == 10
    )
    assert (
        spark.sql(f"SELECT count(*) AS c FROM {name}").collect()[0].c == 30
    )


def test_sql_alter_unregistered_table_falls_through(spark):
    # ALTER TABLE is a core Spark verb: a statement naming a table that
    # is NOT a registered manifest view must reach spark.sql unchanged
    # (and fail with SPARK's error there, not our registry refusal)
    import pyspark.errors

    with pytest.raises(pyspark.errors.AnalysisException):
        manifest_sql(
            spark, "ALTER TABLE definitely_not_registered ADD COLUMNS (x INT)"
        )
    with pytest.raises(pyspark.errors.AnalysisException):
        manifest_sql(
            spark,
            "ANALYZE TABLE definitely_not_registered COMPUTE STATISTICS "
            "FOR COLUMNS x",
        )


def test_sql_insert_overwrite_generated_partition_table(spark, table_path):
    """INSERT OVERWRITE on a hidden-partitioned table: the replaced
    partitions must be computed AFTER generated-column application —
    the pre-generation frame names the wrong (NULL) partitions and the
    engine's stray-dir guard would reject the staged data."""
    import uuid as _uuid

    rows = [(i, f"2024-01-0{1 + i % 3}", float(i)) for i in range(9)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, ts STRING, v DOUBLE"),
        table_path,
        ["k"],
        "day",
        generated_cols={"day": "substring(ts, 1, 10)"},
    )
    name = f"msqlgen_{_uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path)
    r = manifest_sql(
        spark,
        f"INSERT OVERWRITE {name} (k, ts, v) VALUES "
        f"(CAST(100 AS LONG), '2024-01-01', CAST(1.5 AS DOUBLE))",
    )
    assert r["partitions_written"] == 1
    got = manifest_read(spark, table_path)
    # 2024-01-01 replaced by the single row; other days untouched
    assert got.filter("day = '2024-01-01'").count() == 1
    assert got.count() == 7
    assert got.filter("k = 100").collect()[0].day == "2024-01-01"


def test_sql_time_travel_version_and_timestamp(spark, table_path, view):
    hist0 = manifest_history(table_path)[-1]
    v0, ts0 = hist0["version"], hist0["committed_at"]
    manifest_sql(spark, f"DELETE FROM {view} WHERE k < 20")
    # current binding sees the delete; VERSION AS OF reads the old snapshot
    r = manifest_sql(
        spark,
        f"SELECT (SELECT count(*) FROM {view}) AS cur, "
        f"(SELECT count(*) FROM {view} VERSION AS OF {v0}) AS old",
    ).collect()[0]
    assert (r.cur, r.old) == (10, 30)
    assert (
        manifest_sql(
            spark,
            f"SELECT count(*) AS c FROM {view} TIMESTAMP AS OF {ts0}",
        ).collect()[0].c
        == 30
    )
    # a join of now vs then — the classic time-travel diff
    gone = manifest_sql(
        spark,
        f"SELECT count(*) AS c FROM {view} VERSION AS OF {v0} a "
        f"LEFT ANTI JOIN {view} b ON a.k = b.k",
    ).collect()[0].c
    assert gone == 20


def test_sql_time_travel_not_rewritten_in_literals_or_dml(
    spark, table_path, view
):
    got = manifest_sql(
        spark, f"SELECT '{view} VERSION AS OF 1' AS tag"
    ).collect()[0].tag
    assert got == f"{view} VERSION AS OF 1"
    # mutating/utility TARGETS refuse time travel loudly
    for bad in (
        f"DELETE FROM {view} VERSION AS OF 1",
        f"VACUUM {view} VERSION AS OF 1",
        f"OPTIMIZE {view} VERSION AS OF 1",
        f"ALTER TABLE {view} VERSION AS OF 1 DROP COLUMN v",
    ):
        with pytest.raises(ValueError, match="cannot target"):
            manifest_sql(spark, bad)


def test_sql_time_travel_source_in_dml_and_quoted_value(
    spark, table_path, view
):
    v0 = manifest_history(table_path)[-1]["version"]
    ts0 = manifest_history(table_path)[-1]["committed_at"]
    manifest_sql(spark, f"DELETE FROM {view} WHERE k < 25")
    # time travel in a DML SOURCE (Delta-supported): re-insert the
    # deleted rows from the old snapshot
    r = manifest_sql(
        spark,
        f"INSERT INTO {view} SELECT * FROM {view} VERSION AS OF {v0} "
        f"WHERE k < 5",
    )
    assert r["rows_inserted"] == 5
    assert (
        manifest_sql(spark, f"SELECT count(*) AS c FROM {view}").collect()[0].c
        == 10
    )
    # QUOTED timestamp value after AS OF still rewrites
    assert (
        manifest_sql(
            spark,
            f"SELECT count(*) AS c FROM {view} TIMESTAMP AS OF '{ts0}'",
        ).collect()[0].c
        == 30
    )
    # a qualified reference to someone ELSE's table is left alone
    import pyspark.errors

    with pytest.raises(pyspark.errors.AnalysisException):
        manifest_sql(
            spark, f"SELECT * FROM nope.{view} VERSION AS OF {v0}"
        ).collect()


def test_sql_describe_detail_pinned_binding_sees_its_snapshot(
    spark, table_path, view
):
    # CoW delete: the emptied partition physically leaves the manifest
    # (a MoR delete would keep it, masked by a pending entry)
    manifest_sql(spark, f"DELETE FROM {view} WHERE day = 'd2'", mode="cow")
    hist = manifest_history(table_path)
    v0 = hist[0]["version"]  # the original upsert
    import uuid as _uuid

    pinned = f"msqlpin_{_uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, pinned, table_path, version=v0)
    d = manifest_sql(spark, f"DESCRIBE DETAIL {pinned}").collect()[0]
    assert d.version == v0 and d.num_partitions == 3
    p = manifest_sql(spark, f"SHOW PARTITIONS {pinned}").collect()
    assert [r.partition for r in p] == ["day=d0", "day=d1", "day=d2"]
    # while the head view describes the post-delete state
    d2 = manifest_sql(spark, f"DESCRIBE DETAIL {view}").collect()[0]
    assert d2.num_partitions == 2


def test_sql_describe_detail_and_show_partitions(spark, table_path, view):
    d = manifest_sql(spark, f"DESCRIBE DETAIL {view}").collect()[0]
    assert d.format == "manifest" and d.location == table_path
    assert d.partition_columns == ["day"] and d.num_partitions == 3
    assert d.num_files >= 3 and d.size_in_bytes > 0
    p = manifest_sql(spark, f"SHOW PARTITIONS {view}").collect()
    assert [r.partition for r in p] == ["day=d0", "day=d1", "day=d2"]
    assert all(r.num_files >= 1 for r in p)
    # core-Spark verb falls through for unregistered tables
    import pyspark.errors

    with pytest.raises(pyspark.errors.AnalysisException):
        manifest_sql(spark, "SHOW PARTITIONS definitely_not_registered")


def test_sql_insert_into_generated_partition_table(spark, table_path):
    """Column-list INSERT INTO a hidden-partitioned table may omit the
    generated partition column (it is computed, never supplied); the
    featured route sends it through manifest_insert, which applies the
    recorded expression."""
    import uuid as _uuid

    rows = [(i, f"2024-02-0{1 + i % 2}", float(i)) for i in range(6)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, ts STRING, v DOUBLE"),
        table_path,
        ["k"],
        "day",
        generated_cols={"day": "substring(ts, 1, 10)"},
    )
    name = f"msqlgin_{_uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path)
    r = manifest_sql(
        spark,
        f"INSERT INTO {name} (k, ts, v) VALUES "
        f"(CAST(50 AS LONG), '2024-02-03', CAST(5.0 AS DOUBLE))",
    )
    assert r["rows_inserted"] == 1
    got = manifest_read(spark, table_path).filter("k = 50").collect()[0]
    assert got.day == "2024-02-03"
    assert manifest_read(spark, table_path).count() == 7
