"""Round-12 lifecycle verbs (VERDICT r11 "Next round" #1-#3):

- ``ALTER TABLE old RENAME TO new`` — registry-level re-point (location
  untouched), mirrored into the attached durable catalog as ONE
  snapshot commit (``catalog_store.catalog_rename``), refusing renames
  onto existing names (session or catalog, table or view).
- ``CREATE [OR REPLACE] VIEW`` / ``DROP VIEW`` — views as stored
  DEFINITIONS (SQL text, not frozen plans) that survive sessions via
  the warehouse catalog and stay exactly as current as their base
  tables (re-created after every statement's rebind pass).
- ``CREATE TABLE t SHALLOW CLONE s [VERSION|TIMESTAMP AS OF …]
  [LOCATION …]`` — the SQL spelling of ``sinks.manifest_clone``.

Reference parity: the reference's SQL Server catalog renames tables
server-side (sp_rename territory; ``function_app.py:192-196`` resolves
names in the catalog) and its derived frames are ad-hoc pandas — views
and zero-copy clones are the lakehouse generalization (Delta's
CREATE VIEW / SHALLOW CLONE semantics).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.catalog_store import (
    catalog_rename,
    catalog_set,
    catalog_set_view,
    catalog_tables,
    catalog_views,
    manifest_catalog_attach,
    manifest_catalog_detach,
)
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
    _SQL_TABLES,
    _SQL_VIEWS,
    manifest_sql,
    manifest_sql_register,
    manifest_sql_unregister,
    manifest_sql_view_unregister,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_history,
)


@pytest.fixture()
def warehouse(spark):
    wh = tempfile.mkdtemp(prefix="r12_wh_")
    before_t = set(_SQL_TABLES)
    before_v = set(_SQL_VIEWS)
    yield wh
    manifest_catalog_detach()
    for k in set(_SQL_TABLES) - before_t:
        manifest_sql_unregister(spark, k)
    for k in set(_SQL_VIEWS) - before_v:
        manifest_sql_view_unregister(spark, k)
    shutil.rmtree(wh, ignore_errors=True)


def _name(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def _mk(spark, wh, name, rows="(1,'a'),(2,'b'),(1,'c')"):
    manifest_sql(
        spark, f"CREATE TABLE {name} (k INT, v STRING) PARTITIONED BY (k)"
    )
    manifest_sql(spark, f"INSERT INTO {name} VALUES {rows}")


# --- ALTER TABLE … RENAME TO -------------------------------------------------


class TestRename:
    def test_rename_end_to_end(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        old, new = _name("rn_old"), _name("rn_new")
        _mk(spark, warehouse, old)
        r = manifest_sql(spark, f"ALTER TABLE {old} RENAME TO {new}")
        assert r["statement"] == "rename-table"
        # old name gone everywhere, new name answers queries
        assert old.lower() not in _SQL_TABLES
        assert old.lower() not in catalog_tables(warehouse)
        assert new.lower() in catalog_tables(warehouse)
        n = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {new}"
        ).collect()[0]["n"]
        assert n == 3
        # location untouched: rename is a registry re-point
        assert r["location"].endswith(old)
        # DML through the new name keeps working (binding flags carried)
        manifest_sql(spark, f"INSERT INTO {new} VALUES (3,'d')")
        n = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {new}"
        ).collect()[0]["n"]
        assert n == 4
        manifest_sql(spark, f"DROP TABLE {new} PURGE")
        assert new.lower() not in catalog_tables(warehouse)

    def test_rename_is_one_catalog_commit(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        old, new = _name("rn1c_a"), _name("rn1c_b")
        _mk(spark, warehouse, old)
        cat_dir = os.path.join(warehouse, "_catalog")
        before = len(os.listdir(cat_dir))
        manifest_sql(spark, f"ALTER TABLE {old} RENAME TO {new}")
        # exactly ONE new snapshot: remove-old+add-new are atomic — a
        # concurrent attach can never see both names or neither
        assert len(os.listdir(cat_dir)) == before + 1

    def test_rename_refuses_existing_target(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        a, b = _name("rnc_a"), _name("rnc_b")
        _mk(spark, warehouse, a)
        _mk(spark, warehouse, b)
        with pytest.raises(ValueError, match="never overwrite|already"):
            manifest_sql(spark, f"ALTER TABLE {a} RENAME TO {b}")
        # both tables intact
        assert a.lower() in catalog_tables(warehouse)
        assert b.lower() in catalog_tables(warehouse)

    def test_rename_refuses_view_target_and_view_source(
        self, spark, warehouse
    ):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v = _name("rnv_t"), _name("rnv_v")
        _mk(spark, warehouse, t)
        manifest_sql(spark, f"CREATE VIEW {v} AS SELECT k FROM {t}")
        with pytest.raises(ValueError, match="never overwrite|already"):
            manifest_sql(spark, f"ALTER TABLE {t} RENAME TO {v}")
        with pytest.raises(ValueError, match="is a VIEW"):
            manifest_sql(spark, f"ALTER TABLE {v} RENAME TO {t}x")

    def test_rename_cross_session(self, spark, warehouse):
        """Rename in session A; fresh session B (registry wipe + attach)
        sees ONLY the new name."""
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        old, new = _name("rnx_a"), _name("rnx_b")
        _mk(spark, warehouse, old)
        manifest_sql(spark, f"ALTER TABLE {old} RENAME TO {new}")
        manifest_catalog_detach()
        manifest_sql_unregister(spark, new)
        att = manifest_catalog_attach(spark, warehouse)
        assert old.lower() not in att and new.lower() in att
        n = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {new}"
        ).collect()[0]["n"]
        assert n == 3

    def test_rename_unattached_session_only(self, spark, warehouse):
        """No warehouse attached: rename flips the session registry
        only (nothing durable to touch)."""
        old, new = _name("rnu_a"), _name("rnu_b")
        path = os.path.join(warehouse, "t")
        manifest_sql(
            spark,
            f"CREATE TABLE {old} (k INT, v STRING) LOCATION '{path}' "
            "PARTITIONED BY (k)",
        )
        manifest_sql(spark, f"INSERT INTO {old} VALUES (1,'x')")
        manifest_sql(spark, f"ALTER TABLE {old} RENAME TO {new}")
        assert old.lower() not in _SQL_TABLES
        assert new.lower() in _SQL_TABLES
        n = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {new}"
        ).collect()[0]["n"]
        assert n == 1

    def test_rename_hostile_backtick_names(self, spark, warehouse):
        """Keyword-shaped, backtick-quoted names route and rename."""
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        manifest_sql(
            spark,
            "CREATE TABLE `select` (k INT, v STRING) PARTITIONED BY (k)",
        )
        manifest_sql(spark, "INSERT INTO `select` VALUES (7,'q')")
        try:
            manifest_sql(
                spark, "ALTER TABLE `select` RENAME TO `order`"
            )
            assert "order" in catalog_tables(warehouse)
            n = manifest_sql(
                spark, "SELECT COUNT(*) AS n FROM `order`"
            ).collect()[0]["n"]
            assert n == 1
        finally:
            manifest_sql(spark, "DROP TABLE IF EXISTS `order` PURGE")
            manifest_sql(spark, "DROP TABLE IF EXISTS `select` PURGE")

    def test_rename_refuses_time_travel_target(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t = _name("rntt")
        _mk(spark, warehouse, t)
        with pytest.raises(ValueError, match="time travel"):
            manifest_sql(
                spark,
                f"ALTER TABLE {t} VERSION AS OF 1 RENAME TO {t}x",
            )

    def test_catalog_rename_primitive_guards(self, spark, warehouse):
        catalog_set(warehouse, "a", os.path.join(warehouse, "a"))
        with pytest.raises(ValueError, match="not in the durable"):
            catalog_rename(warehouse, "nope", "b")
        catalog_set(warehouse, "b", os.path.join(warehouse, "b"))
        with pytest.raises(ValueError, match="already exists"):
            catalog_rename(warehouse, "a", "b")
        catalog_rename(warehouse, "a", "c")
        assert set(catalog_tables(warehouse)) == {"b", "c"}


# --- CREATE / DROP VIEW ------------------------------------------------------


class TestViews:
    def test_view_follows_head_and_persists(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v = _name("vw_t"), _name("vw_v")
        _mk(spark, warehouse, t)
        r = manifest_sql(
            spark,
            f"CREATE VIEW {v} AS "
            f"SELECT k, COUNT(*) AS n FROM {t} GROUP BY k",
        )
        assert r["durable"] is True
        got = {
            x["k"]: x["n"]
            for x in manifest_sql(spark, f"SELECT * FROM {v}").collect()
        }
        assert got == {1: 2, 2: 1}
        # the view is a DEFINITION: it sees writes that land after it
        manifest_sql(spark, f"INSERT INTO {t} VALUES (2,'d')")
        got = {
            x["k"]: x["n"]
            for x in manifest_sql(spark, f"SELECT * FROM {v}").collect()
        }
        assert got == {1: 2, 2: 2}
        # durable: fresh session re-creates it from catalog text
        manifest_catalog_detach()
        manifest_sql_unregister(spark, t)
        manifest_sql_view_unregister(spark, v)
        manifest_catalog_attach(spark, warehouse)
        got = {
            x["k"]: x["n"]
            for x in manifest_sql(spark, f"SELECT * FROM {v}").collect()
        }
        assert got == {1: 2, 2: 2}

    def test_view_over_view_roundtrip(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v1, v2 = _name("vv_t"), _name("vv_1"), _name("vv_2")
        _mk(spark, warehouse, t)
        manifest_sql(
            spark,
            f"CREATE VIEW {v1} AS "
            f"SELECT k, COUNT(*) AS n FROM {t} GROUP BY k",
        )
        manifest_sql(
            spark, f"CREATE VIEW {v2} AS SELECT SUM(n) AS total FROM {v1}"
        )
        assert (
            manifest_sql(spark, f"SELECT total FROM {v2}").collect()[0][
                "total"
            ]
            == 3
        )
        # seq order survives the catalog round-trip (v2 references v1)
        manifest_catalog_detach()
        manifest_sql_unregister(spark, t)
        manifest_sql_view_unregister(spark, v1)
        manifest_sql_view_unregister(spark, v2)
        manifest_catalog_attach(spark, warehouse)
        assert (
            manifest_sql(spark, f"SELECT total FROM {v2}").collect()[0][
                "total"
            ]
            == 3
        )

    def test_or_replace_required_and_shadow_guards(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v = _name("vg_t"), _name("vg_v")
        _mk(spark, warehouse, t)
        manifest_sql(spark, f"CREATE VIEW {v} AS SELECT k FROM {t}")
        with pytest.raises(ValueError, match="OR REPLACE"):
            manifest_sql(spark, f"CREATE VIEW {v} AS SELECT v FROM {t}")
        manifest_sql(
            spark,
            f"CREATE OR REPLACE VIEW {v} AS "
            f"SELECT COUNT(*) AS n FROM {t}",
        )
        assert (
            manifest_sql(spark, f"SELECT n FROM {v}").collect()[0]["n"]
            == 3
        )
        # views cannot shadow tables, tables cannot shadow views
        with pytest.raises(ValueError, match="shadow|TABLE"):
            manifest_sql(spark, f"CREATE VIEW {t} AS SELECT 1 AS one")
        with pytest.raises(ValueError, match="VIEW"):
            catalog_set(warehouse, v, os.path.join(warehouse, "x"))

    def test_view_refuses_time_travel_body(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v = _name("vt_t"), _name("vt_v")
        _mk(spark, warehouse, t)
        with pytest.raises(ValueError, match="time-travel"):
            manifest_sql(
                spark,
                f"CREATE VIEW {v} AS "
                f"SELECT k FROM {t} VERSION AS OF 1",
            )

    def test_dml_on_view_refuses(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v = _name("vd_t"), _name("vd_v")
        _mk(spark, warehouse, t)
        manifest_sql(spark, f"CREATE VIEW {v} AS SELECT k FROM {t}")
        for stmt in (
            f"DELETE FROM {v} WHERE k = 1",
            f"UPDATE {v} SET k = 2",
            f"INSERT INTO {v} VALUES (9)",
            f"TRUNCATE TABLE {v}",
            f"DESCRIBE HISTORY {v}",
        ):
            with pytest.raises(ValueError, match="VIEW"):
                manifest_sql(spark, stmt)

    def test_show_tables_distinguishes_kind(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v = _name("vs_t"), _name("vs_v")
        _mk(spark, warehouse, t)
        manifest_sql(spark, f"CREATE VIEW {v} AS SELECT k FROM {t}")
        rows = {
            r["table"]: r
            for r in manifest_sql(spark, "SHOW TABLES").collect()
        }
        assert rows[t.lower()]["kind"] == "table"
        assert rows[v.lower()]["kind"] == "view"
        assert rows[v.lower()]["cataloged"] is True
        assert rows[v.lower()]["location"] is None

    def test_drop_view_removes_durable_entry(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, v = _name("dv_t"), _name("dv_v")
        _mk(spark, warehouse, t)
        manifest_sql(spark, f"CREATE VIEW {v} AS SELECT k FROM {t}")
        assert v.lower() in catalog_views(warehouse)
        r = manifest_sql(spark, f"DROP VIEW {v}")
        assert r["dropped"] is True
        assert v.lower() not in catalog_views(warehouse)
        assert v.lower() not in _SQL_VIEWS

    def test_unattached_view_over_manifest_table(self, spark, warehouse):
        """No warehouse: a view over a registered manifest table is
        still OURS (session definition, durable=False) — it must stay
        current over the follow-head base table."""
        t, v = _name("vu_t"), _name("vu_v")
        path = os.path.join(warehouse, "t")
        manifest_sql(
            spark,
            f"CREATE TABLE {t} (k INT, v STRING) LOCATION '{path}' "
            "PARTITIONED BY (k)",
        )
        manifest_sql(spark, f"INSERT INTO {t} VALUES (1,'a')")
        r = manifest_sql(
            spark, f"CREATE VIEW {v} AS SELECT COUNT(*) AS n FROM {t}"
        )
        assert r["durable"] is False
        manifest_sql(spark, f"INSERT INTO {t} VALUES (2,'b')")
        assert (
            manifest_sql(spark, f"SELECT n FROM {v}").collect()[0]["n"]
            == 2
        )

    def test_vanilla_view_stays_native(self, spark):
        """Unattached + no engine reference: CREATE VIEW falls through
        to spark.sql — vanilla behavior unchanged."""
        v = _name("native_v")
        out = manifest_sql(
            spark, f"CREATE VIEW {v} AS SELECT 1 AS one"
        )
        # fall-through returns a DataFrame (spark.sql result), not an
        # op-dict, and the engine registry has no entry
        assert not isinstance(out, dict)
        assert v.lower() not in _SQL_VIEWS
        spark.sql(f"DROP VIEW IF EXISTS {v}")

    def test_attach_strict_refuses_broken_view(self, spark, warehouse):
        """A durable view whose base table was dropped is a stale entry:
        strict attach names it; skip registers everything else."""
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        t, keep, v = _name("bk_t"), _name("bk_keep"), _name("bk_v")
        _mk(spark, warehouse, t)
        _mk(spark, warehouse, keep)
        manifest_sql(spark, f"CREATE VIEW {v} AS SELECT k FROM {t}")
        manifest_sql(spark, f"DROP TABLE {t} PURGE")
        # DROP TABLE leaves the (now-broken) view behind, as SQL does
        manifest_catalog_detach()
        manifest_sql_unregister(spark, keep)
        manifest_sql_view_unregister(spark, v)
        with pytest.raises(ValueError, match="failed to re-create"):
            manifest_catalog_attach(spark, warehouse)
        att = manifest_catalog_attach(spark, warehouse, missing="skip")
        assert keep.lower() in att
        # repair: DROP VIEW removes the stale definition durably
        manifest_sql(spark, f"DROP VIEW {v}")
        assert v.lower() not in catalog_views(warehouse)


# --- SHALLOW CLONE -----------------------------------------------------------


class TestShallowClone:
    def test_clone_head_and_independence(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        s, c = _name("cl_s"), _name("cl_c")
        _mk(spark, warehouse, s)
        r = manifest_sql(spark, f"CREATE TABLE {c} SHALLOW CLONE {s}")
        assert r["statement"] == "shallow-clone"
        assert r["files_linked"] + r["files_copied"] > 0
        assert c.lower() in catalog_tables(warehouse)
        n = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {c}"
        ).collect()[0]["n"]
        assert n == 3
        # clones evolve independently
        manifest_sql(spark, f"INSERT INTO {c} VALUES (9,'z')")
        ns = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {s}"
        ).collect()[0]["n"]
        nc = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {c}"
        ).collect()[0]["n"]
        assert (ns, nc) == (3, 4)

    def test_clone_version_as_of_with_history(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        s, c = _name("cv_s"), _name("cv_c")
        _mk(spark, warehouse, s)  # v1 create, v2 insert (3 rows)
        manifest_sql(spark, f"INSERT INTO {s} VALUES (5,'e')")  # v3
        manifest_sql(
            spark,
            f"CREATE TABLE {c} SHALLOW CLONE {s} VERSION AS OF 2",
        )
        n = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {c}"
        ).collect()[0]["n"]
        assert n == 3  # pre-v3 snapshot
        # the clone has its own v1 history and supports time travel
        path = catalog_tables(warehouse)[c.lower()]
        hist = manifest_history(path)
        assert hist[0]["version"] == 1
        n1 = manifest_sql(
            spark,
            f"SELECT COUNT(*) AS n FROM {c} VERSION AS OF 1",
        ).collect()[0]["n"]
        assert n1 == 3

    def test_clone_with_location_unattached(self, spark, warehouse):
        s, c = _name("cu_s"), _name("cu_c")
        sp = os.path.join(warehouse, "src")
        cp = os.path.join(warehouse, "dst")
        manifest_sql(
            spark,
            f"CREATE TABLE {s} (k INT, v STRING) LOCATION '{sp}' "
            "PARTITIONED BY (k)",
        )
        manifest_sql(spark, f"INSERT INTO {s} VALUES (1,'a'),(2,'b')")
        manifest_sql(
            spark,
            f"CREATE TABLE {c} SHALLOW CLONE {s} LOCATION '{cp}'",
        )
        n = manifest_sql(
            spark, f"SELECT COUNT(*) AS n FROM {c}"
        ).collect()[0]["n"]
        assert n == 2

    def test_clone_guards(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        s = _name("cg_s")
        _mk(spark, warehouse, s)
        with pytest.raises(ValueError, match="not a registered"):
            manifest_sql(
                spark, f"CREATE TABLE x SHALLOW CLONE no_such_table"
            )
        with pytest.raises(ValueError, match="never overwrite|already"):
            manifest_sql(spark, f"CREATE TABLE {s} SHALLOW CLONE {s}")
        # no LOCATION and no warehouse → loud
        manifest_catalog_detach()
        with pytest.raises(ValueError, match="no LOCATION"):
            manifest_sql(
                spark, f"CREATE TABLE {_name('cg')} SHALLOW CLONE {s}"
            )

    def test_clone_hostile_names(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        manifest_sql(
            spark,
            "CREATE TABLE `from` (k INT, v STRING) PARTITIONED BY (k)",
        )
        manifest_sql(spark, "INSERT INTO `from` VALUES (1,'a')")
        try:
            manifest_sql(
                spark, "CREATE TABLE `where` SHALLOW CLONE `from`"
            )
            n = manifest_sql(
                spark, "SELECT COUNT(*) AS n FROM `where`"
            ).collect()[0]["n"]
            assert n == 1
        finally:
            manifest_sql(spark, "DROP TABLE IF EXISTS `where` PURGE")
            manifest_sql(spark, "DROP TABLE IF EXISTS `from` PURGE")


# --- catalog_store primitives ------------------------------------------------


class TestCatalogViewStore:
    def test_set_view_seq_and_replace(self, warehouse):
        catalog_set_view(warehouse, "v1", "SELECT 1")
        catalog_set_view(warehouse, "v2", "SELECT 2")
        vs = catalog_views(warehouse)
        assert list(vs) == ["v1", "v2"]
        assert vs["v1"]["seq"] < vs["v2"]["seq"]
        # replace keeps the slot: v1 still re-creates before v2
        catalog_set_view(warehouse, "v1", "SELECT 10")
        vs = catalog_views(warehouse)
        assert list(vs) == ["v1", "v2"]
        assert vs["v1"]["view"] == "SELECT 10"

    def test_view_table_namespace_is_shared(self, warehouse):
        catalog_set(warehouse, "t", os.path.join(warehouse, "t"))
        with pytest.raises(ValueError, match="TABLE"):
            catalog_set_view(warehouse, "t", "SELECT 1")
        catalog_set_view(warehouse, "v", "SELECT 1")
        with pytest.raises(ValueError, match="VIEW"):
            catalog_set(warehouse, "v", os.path.join(warehouse, "v"))
        # rename moves a view entry too, atomically
        catalog_rename(warehouse, "v", "v9")
        assert "v9" in catalog_views(warehouse)
        assert "v" not in catalog_views(warehouse)
