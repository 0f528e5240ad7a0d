"""Literal-safe SQL tokenization (VERDICT r9 "Next round" #2): string
literals containing keywords, parens, semicolons, or time-travel syntax
must never confuse the statement-level router — every verb is exercised
with hostile literals and the routed engine must still see the exact
expression text.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
    manifest_sql,
    manifest_sql_register,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_read,
    manifest_upsert_partitioned,
)


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/hostile_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture()
def view(spark, table_path):
    rows = [
        (1, "d0", "WHERE x = 1"),
        (2, "d0", "VERSION AS OF 1"),
        (3, "d1", "WHEN MATCHED THEN"),
        (4, "d1", "a;b"),
        (5, "d1", "(paren"),
    ]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, day STRING, txt STRING"),
        table_path,
        ["k"],
        "day",
    )
    name = f"hv_{uuid.uuid4().hex[:8]}"
    manifest_sql_register(spark, name, table_path)
    return name, table_path


class TestHostileLiterals:
    def test_select_keyword_literals(self, spark, view):
        v, _ = view
        # a literal containing "<view> VERSION AS OF 1" must NOT rewrite
        got = manifest_sql(
            spark,
            f"SELECT k FROM {v} WHERE txt = 'VERSION AS OF 1' "
            f"OR txt = '{v} VERSION AS OF 1'",
        ).collect()
        assert [r["k"] for r in got] == [2]

    def test_delete_where_keyword_literal(self, spark, view):
        v, path = view
        r = manifest_sql(spark, f"DELETE FROM {v} WHERE txt = 'WHERE x = 1'")
        assert r["deleted_rows"] == 1
        assert manifest_read(spark, path).filter("k = 1").count() == 0

    def test_update_set_literal_with_where_and_semicolon(self, spark, view):
        v, path = view
        r = manifest_sql(
            spark,
            f"UPDATE {v} SET txt = 'now WHERE ; WHEN MATCHED' WHERE k = 4",
        )
        assert r["updated_rows"] == 1
        got = manifest_read(spark, path).filter("k = 4").first()
        assert got["txt"] == "now WHERE ; WHEN MATCHED"

    def test_insert_values_with_parens_and_keywords(self, spark, view):
        """A ')' inside a VALUES literal must not unbalance the
        column-list paren scan; keyword literals pass through."""
        v, path = view
        r = manifest_sql(
            spark,
            f"INSERT INTO {v} (k, day, txt) "
            "VALUES (100, 'd0', ') WHEN MATCHED (')",
        )
        assert r["rows_inserted"] == 1
        got = manifest_read(spark, path).filter("k = 100").first()
        assert got["txt"] == ") WHEN MATCHED ("

    def test_insert_positional_paren_literal(self, spark, view):
        v, path = view
        manifest_sql(
            spark, f"INSERT INTO {v} VALUES (101, 'd1', '(((')"
        )
        assert manifest_read(spark, path).filter("k = 101").first()["txt"] == "((("

    def test_merge_with_hostile_literals(self, spark, view):
        """WHEN/USING/ON/AND inside literals in the merge's expressions
        must not affect clause splitting."""
        v, path = view
        src = f"hsrc_{uuid.uuid4().hex[:6]}"
        spark.createDataFrame(
            [(3, "d1", "x"), (200, "d0", "y")], "k LONG, day STRING, txt STRING"
        ).createOrReplaceTempView(src)
        r = manifest_sql(
            spark,
            f"MERGE INTO {v} t USING {src} s ON t.k = s.k "
            "WHEN MATCHED AND s.txt <> 'WHEN NOT MATCHED AND USING ON' "
            "THEN UPDATE SET txt = concat(s.txt, ' WHEN MATCHED THEN ') "
            "WHEN NOT MATCHED THEN INSERT (k, day, txt) "
            "VALUES (s.k, s.day, '); USING (')",
        )
        assert r["updated"] == 1 and r["inserted"] == 1
        rows = {
            row["k"]: row["txt"]
            for row in manifest_read(spark, path).collect()
        }
        assert rows[3] == "x WHEN MATCHED THEN "
        assert rows[200] == "); USING ("

    def test_time_travel_backticked_view(self, spark, view):
        """A backtick-quoted reference to a registered view rewrites the
        same as the bare name (ADVICE r9 low #3)."""
        v, path = view
        manifest_sql(spark, f"DELETE FROM {v} WHERE k = 5")
        head = manifest_sql(spark, f"SELECT count(*) AS n FROM `{v}`").first()["n"]
        old = manifest_sql(
            spark, f"SELECT count(*) AS n FROM `{v}` VERSION AS OF 1"
        ).first()["n"]
        assert old == head + 1

    def test_trailing_semicolons(self, spark, view):
        v, _ = view
        got = manifest_sql(spark, f"SELECT count(*) AS n FROM {v};").first()
        assert got["n"] >= 4
        # a trailing literal ending in ; with a statement-final ; too
        got = manifest_sql(
            spark, f"SELECT count(*) AS n FROM {v} WHERE txt = 'a;b';"
        ).first()
        assert got["n"] == 1

    def test_asof_alias_cap_protects_current_statement(self, spark, view):
        """One statement referencing more AS-OF pins than the per-view
        alias cap (8) must not evict its own aliases mid-rewrite (ADVICE
        r9 low #2): 9 distinct version pins in one UNION ALL all
        resolve."""
        v, path = view
        from data_management_service_run_etl_imputations_spark.sources.sinks import (
            manifest_history,
        )

        # grow REAL history to >= 9 versions (each UPDATE matches a row,
        # so each statement commits one version)
        while manifest_history(path)[-1]["version"] < 9:
            manifest_sql(spark, f"UPDATE {v} SET txt = concat(txt, '.') WHERE k = 1")
        pins = range(1, 10)
        union = " UNION ALL ".join(
            f"SELECT count(*) AS n FROM {v} VERSION AS OF {p}" for p in pins
        )
        got = manifest_sql(spark, union).collect()
        assert len(got) == 9
        assert all(r["n"] == 5 for r in got)


class TestScriptAndUnregister:
    def test_script_splits_on_top_level_semicolons_only(self, spark, view):
        from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
            manifest_sql_script,
        )

        v, path = view
        outs = manifest_sql_script(
            spark,
            f"""
            INSERT INTO {v} VALUES (300, 'd0', 'semi ; inside');
            UPDATE {v} SET txt = 'a;b;c' WHERE k = 300;
            SELECT count(*) AS n FROM {v} WHERE txt = 'a;b;c';
            """,
        )
        assert outs[0]["rows_inserted"] == 1
        assert outs[1]["updated_rows"] == 1
        assert outs[2].first()["n"] == 1

    def test_script_comments_with_semicolons(self, spark, view):
        """ADVICE r10: a ';' inside '-- …' or '/* … */' must not split a
        statement — and '--' INSIDE a string literal is not a comment."""
        from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
            manifest_sql_script,
        )

        v, path = view
        outs = manifest_sql_script(
            spark,
            f"""
            -- leading comment; with a semicolon
            INSERT INTO {v} /* block; comment */ VALUES (400, 'd0', 'x--y');
            /* multi;
               line; block */
            SELECT count(*) AS n -- trailing; note
            FROM {v} WHERE txt = 'x--y';
            """,
        )
        assert len(outs) == 2
        assert outs[0]["rows_inserted"] == 1
        assert outs[1].first()["n"] == 1

    def test_script_unterminated_block_comment_refuses(self, spark, view):
        from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
            manifest_sql_script,
        )

        v, path = view
        with pytest.raises(ValueError, match="unterminated"):
            manifest_sql_script(spark, f"SELECT 1 /* oops; FROM {v}")

    def test_unregister_removes_view_and_asof_aliases(self, spark, view):
        from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
            _SQL_TABLES,
            manifest_sql,
            manifest_sql_unregister,
        )

        v, path = view
        manifest_sql(spark, f"DELETE FROM {v} WHERE k = 1")
        # create an AS-OF alias binding
        manifest_sql(spark, f"SELECT count(*) AS n FROM {v} VERSION AS OF 1")
        assert any(k.startswith(f"{v.lower()}__asof_") for k in _SQL_TABLES)
        assert manifest_sql_unregister(spark, v) is True
        assert v.lower() not in _SQL_TABLES
        assert not any(
            k.startswith(f"{v.lower()}__asof_") for k in _SQL_TABLES
        )
        # idempotent; the view is genuinely gone from SQL
        assert manifest_sql_unregister(spark, v) is False
        with pytest.raises(Exception):
            manifest_sql(spark, f"DELETE FROM {v} WHERE k = 2")
