"""SQL table-lifecycle verbs + cross-session catalog (VERDICT r10 "Next
round" #2/#3): ``TRUNCATE TABLE`` (whole-table metadata delete, history
preserved), ``CREATE OR REPLACE TABLE … AS`` (atomic head swap),
``DROP TABLE [IF EXISTS] [PURGE]``, ``SHOW TABLES``, and the durable
warehouse catalog (``ATTACH WAREHOUSE`` / ``manifest_catalog_attach``)
that lets a FRESH session reach every table by name.

The r10 gap these close: a SQL user could CREATE a table but had to
drop to Python ``shutil.rmtree`` + ``manifest_sql_unregister`` to finish
the lifecycle (the engine's own queries did exactly that,
``pkg/queries/sources_q.py`` finally blocks).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources import catalog_store
from data_management_service_run_etl_imputations_spark.sources.catalog_store import (
    catalog_remove,
    catalog_set,
    catalog_tables,
    manifest_catalog_attach,
    manifest_catalog_detach,
)
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
    _SQL_TABLES,
    manifest_sql,
    manifest_sql_register,
    manifest_sql_unregister,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    manifest_history,
    manifest_read,
    manifest_replace_table,
    manifest_truncate,
    manifest_upsert_partitioned,
)


@pytest.fixture()
def warehouse():
    wh = tempfile.mkdtemp(prefix="sql_wh_")
    yield wh
    manifest_catalog_detach()
    shutil.rmtree(wh, ignore_errors=True)


def _name(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def _seed(spark, path: str, n: int = 10) -> None:
    rows = [(i, i % 3, float(i)) for i in range(n)]
    manifest_upsert_partitioned(
        spark.createDataFrame(rows, "k LONG, p LONG, v DOUBLE"),
        path,
        ["k"],
        "p",
    )


def _drop(spark, name: str) -> None:
    manifest_sql_unregister(spark, name)


# --- TRUNCATE TABLE ---------------------------------------------------------


class TestTruncate:
    def test_truncate_empties_head_preserves_history(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        name = _name("trunc")
        _seed(spark, path, 12)
        manifest_sql_register(spark, name, path, follow_head=True)
        try:
            r = manifest_sql(spark, f"TRUNCATE TABLE {name}")
            assert r["statement"] == "truncate"
            assert r["rows_removed"] == 12
            assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 0
            # schema survives the truncate
            assert set(
                manifest_sql(spark, f"SELECT * FROM {name}").columns
            ) == {"k", "p", "v"}
            # history preserved: the pre-truncate snapshot stays readable
            assert (
                manifest_sql(
                    spark, f"SELECT * FROM {name} VERSION AS OF 1"
                ).count()
                == 12
            )
            ops = [h["op"] for h in manifest_history(path)]
            assert ops[-1] == "truncate"
        finally:
            _drop(spark, name)

    def test_insert_after_truncate(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        name = _name("trunc2")
        _seed(spark, path, 6)
        manifest_sql_register(spark, name, path, follow_head=True)
        try:
            manifest_sql(spark, f"TRUNCATE TABLE {name}")
            manifest_sql(
                spark,
                f"INSERT INTO {name} SELECT id AS k, id % 2 AS p, "
                "CAST(id AS DOUBLE) AS v FROM range(4)",
            )
            assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 4
        finally:
            _drop(spark, name)

    def test_truncate_then_restore(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        name = _name("trunc3")
        _seed(spark, path, 8)
        manifest_sql_register(spark, name, path, follow_head=True)
        try:
            manifest_sql(spark, f"TRUNCATE TABLE {name}")
            manifest_sql(spark, f"RESTORE TABLE {name} TO VERSION AS OF 1")
            assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 8
        finally:
            _drop(spark, name)

    def test_truncate_vacuum_interplay(self, spark, warehouse):
        """After TRUNCATE + VACUUM the old data dirs are reclaimed, the
        head still reads zero rows, and RESTORE past the vacuum horizon
        refuses loudly instead of committing dangling references."""
        path = os.path.join(warehouse, "t")
        name = _name("trunc4")
        _seed(spark, path, 8)
        manifest_sql_register(spark, name, path, follow_head=True)
        try:
            manifest_sql(spark, f"TRUNCATE TABLE {name}")
            manifest_sql(spark, f"VACUUM {name} RETAIN 1 VERSIONS")
            data_dirs = [
                d
                for d in os.listdir(os.path.join(path, "data"))
                if os.path.isdir(os.path.join(path, "data", d))
            ] if os.path.isdir(os.path.join(path, "data")) else []
            assert data_dirs == []
            assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 0
            # restoring past the vacuum horizon fails LOUDLY — either the
            # dangling-reference guard (ValueError) or the vacuumed commit
            # file itself being gone (OSError), never a silent dangling
            # commit
            with pytest.raises((ValueError, OSError)):
                manifest_sql(
                    spark, f"RESTORE TABLE {name} TO VERSION AS OF 1"
                )
        finally:
            _drop(spark, name)

    def test_truncate_unregistered_falls_through(self, spark):
        with pytest.raises(Exception):
            manifest_sql(
                spark, f"TRUNCATE TABLE no_such_table_{uuid.uuid4().hex[:6]}"
            )


# --- CREATE OR REPLACE TABLE ------------------------------------------------


class TestCreateOrReplace:
    def test_replace_changes_schema_and_spec(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        name = _name("rep")
        _seed(spark, path, 10)
        manifest_sql_register(spark, name, path, follow_head=True)
        try:
            r = manifest_sql(
                spark,
                f"CREATE OR REPLACE TABLE {name} LOCATION '{path}' "
                "PARTITIONED BY (g) AS "
                "SELECT id % 2 AS g, CAST(id AS STRING) AS s FROM range(5)",
            )
            assert r["statement"] == "replace-table"
            assert r["rows_written"] == 5
            df = manifest_sql(spark, f"SELECT * FROM {name}")
            assert set(df.columns) == {"g", "s"}
            assert df.count() == 5
            # the pre-replace snapshot stays time-travel readable
            old = manifest_sql(spark, f"SELECT * FROM {name} VERSION AS OF 1")
            assert old.count() == 10
            assert set(old.columns) == {"k", "p", "v"}
        finally:
            _drop(spark, name)

    def test_replace_on_nonexistent_is_create(self, spark, warehouse):
        path = os.path.join(warehouse, "fresh")
        name = _name("rep2")
        try:
            manifest_sql(
                spark,
                f"CREATE OR REPLACE TABLE {name} LOCATION '{path}' "
                "AS SELECT id AS x FROM range(7)",
            )
            assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 7
            assert manifest_history(path)[0]["version"] == 1
        finally:
            _drop(spark, name)

    def test_replace_refuses_repointing(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        other = os.path.join(warehouse, "other")
        name = _name("rep3")
        _seed(spark, path, 3)
        manifest_sql_register(spark, name, path, follow_head=True)
        try:
            with pytest.raises(ValueError, match="re-point"):
                manifest_sql(
                    spark,
                    f"CREATE OR REPLACE TABLE {name} LOCATION '{other}' "
                    "AS SELECT id AS x FROM range(2)",
                )
        finally:
            _drop(spark, name)

    def test_replace_is_single_commit(self, spark, warehouse):
        """Atomicity evidence: exactly ONE new version lands, and its op
        is the replace — no intermediate truncate/append states a
        concurrent reader could observe."""
        path = os.path.join(warehouse, "t")
        name = _name("rep4")
        _seed(spark, path, 4)
        manifest_sql_register(spark, name, path, follow_head=True)
        try:
            before = manifest_history(path)[-1]["version"]
            manifest_sql(
                spark,
                f"CREATE OR REPLACE TABLE {name} LOCATION '{path}' AS "
                "SELECT id AS x FROM range(3)",
            )
            hist = manifest_history(path)
            assert hist[-1]["version"] == before + 1
            assert hist[-1]["op"] == "replace-table"
        finally:
            _drop(spark, name)

    def test_replace_table_python_api_carries_markers(self, spark, warehouse):
        """stream_batches / txns max-merge across a replace (exactly-once
        monotonicity — same contract as RESTORE)."""
        path = os.path.join(warehouse, "t")
        _seed(spark, path, 3)
        df = spark.range(3).selectExpr("id AS k")
        manifest_upsert_partitioned(
            spark.createDataFrame([(99, 0, 1.0)], "k LONG, p LONG, v DOUBLE"),
            path,
            ["k"],
            "p",
            txn=("appA", 7),
        )
        manifest_replace_table(df, path)
        from data_management_service_run_etl_imputations_spark.sources.sinks import (
            _latest_manifest,
        )

        _, content = _latest_manifest(path)
        assert content.get("txns", {}).get("appA") == 7


# --- DROP TABLE ---------------------------------------------------------------


class TestDropTable:
    def test_drop_unregisters_keeps_data(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        name = _name("drop1")
        _seed(spark, path, 5)
        manifest_sql_register(spark, name, path, follow_head=True)
        r = manifest_sql(spark, f"DROP TABLE {name}")
        assert r == {
            "statement": "drop-table",
            "dropped": True,
            "purged": False,
            "location": path,
        }
        # external-table semantics: the data survives a non-PURGE drop
        assert os.path.isdir(path)
        assert manifest_read(spark, path).count() == 5
        with pytest.raises(Exception):
            manifest_sql(spark, f"SELECT * FROM {name}").collect()

    def test_drop_purge_removes_directory(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        name = _name("drop2")
        _seed(spark, path, 5)
        manifest_sql_register(spark, name, path, follow_head=True)
        r = manifest_sql(spark, f"DROP TABLE {name} PURGE")
        assert r["purged"] is True
        assert not os.path.exists(path)

    def test_drop_if_exists_unknown_is_noop(self, spark):
        # unknown name falls through to native spark.sql, which honors
        # IF EXISTS — a SQL script cleanup block never crashes
        manifest_sql(
            spark, f"DROP TABLE IF EXISTS nope_{uuid.uuid4().hex[:6]}"
        )

    def test_drop_removes_timetravel_aliases(self, spark, warehouse):
        path = os.path.join(warehouse, "t")
        name = _name("drop3")
        _seed(spark, path, 5)
        manifest_sql_register(spark, name, path, follow_head=True)
        manifest_sql(spark, f"SELECT * FROM {name} VERSION AS OF 1").collect()
        manifest_sql(spark, f"DROP TABLE {name}")
        assert not [k for k in _SQL_TABLES if k.startswith(name.lower())]


# --- SHOW TABLES + durable catalog -------------------------------------------


class TestCatalog:
    def test_show_tables_lists_session_and_catalog(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        path = os.path.join(warehouse, "t")
        name = _name("show")
        manifest_sql(
            spark,
            f"CREATE TABLE {name} LOCATION '{path}' AS "
            "SELECT id AS x FROM range(3)",
        )
        try:
            rows = {
                r["table"]: r
                for r in manifest_sql(spark, "SHOW TABLES").collect()
            }
            assert name.lower() in rows or name in rows
            row = rows.get(name, rows.get(name.lower()))
            assert row["registered"] and row["cataloged"]
            assert row["location"] == path
        finally:
            manifest_sql(spark, f"DROP TABLE {name} PURGE")

    def test_sql_lifecycle_keeps_catalog_in_sync(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        path = os.path.join(warehouse, "t")
        name = _name("sync")
        manifest_sql(
            spark,
            f"CREATE TABLE {name} (a INT, b STRING) LOCATION '{path}'",
        )
        assert name.lower() in catalog_tables(warehouse)
        manifest_sql(spark, f"DROP TABLE {name} PURGE")
        assert name.lower() not in catalog_tables(warehouse)

    def test_attach_in_fresh_session(self, spark, warehouse):
        """The cross-session contract: tables created under one session
        registry are reachable BY NAME after a registry wipe (the
        process-level stand-in for a brand-new session) via one
        manifest_catalog_attach call."""
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        name = _name("xsess")
        path = os.path.join(warehouse, "t")
        manifest_sql(
            spark,
            f"CREATE TABLE {name} LOCATION '{path}' PARTITIONED BY (p) AS "
            "SELECT id AS k, id % 2 AS p FROM range(9)",
        )
        # simulate a fresh session: drop every session-level binding
        manifest_sql_unregister(spark, name)
        manifest_catalog_detach()
        with pytest.raises(Exception):
            manifest_sql(spark, f"SELECT * FROM {name}").collect()

        tables = manifest_catalog_attach(spark, warehouse)
        assert name.lower() in tables
        assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 9
        # attached views follow the head: a later INSERT is visible
        manifest_sql(
            spark,
            f"INSERT INTO {name} SELECT 100 AS k, 0 AS p",
        )
        assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 10
        manifest_sql(spark, f"DROP TABLE {name} PURGE")

    def test_warehouse_is_relocatable(self, spark, warehouse):
        """Paths under the warehouse are stored RELATIVE: moving the
        whole directory keeps the catalog valid at the new mount."""
        name = _name("reloc")
        path = os.path.join(warehouse, "t")
        _seed(spark, path, 4)
        catalog_set(warehouse, name, path)
        moved = warehouse + "_moved"
        shutil.move(warehouse, moved)
        try:
            tables = manifest_catalog_attach(spark, moved)
            assert tables[name.lower()] == os.path.join(
                os.path.abspath(moved), "t"
            )
            assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 4
        finally:
            manifest_sql_unregister(spark, name)
            manifest_catalog_detach()
            shutil.move(moved, warehouse)

    def test_catalog_set_remove_roundtrip(self, warehouse):
        assert catalog_tables(warehouse) == {}
        catalog_set(warehouse, "A", "/abs/elsewhere")
        catalog_set(warehouse, "b", os.path.join(warehouse, "inside"))
        t = catalog_tables(warehouse)
        # names are case-normalized; external paths stay absolute
        assert t["a"] == "/abs/elsewhere"
        assert t["b"] == os.path.join(os.path.abspath(warehouse), "inside")
        assert catalog_remove(warehouse, "a") is True
        assert catalog_remove(warehouse, "a") is False
        assert list(catalog_tables(warehouse)) == ["b"]

    def test_concurrent_catalog_sets_both_land(self, warehouse):
        """put_if_absent versioning: two racing writers re-merge instead
        of losing an update (driven here as version-conflict replay)."""
        from data_management_service_run_etl_imputations_spark.sources.catalog_store import (
            _latest_catalog,
            _publish,
        )

        catalog_set(warehouse, "x", "/p1")
        # simulate a foreign writer landing the next version first
        v, tables = _latest_catalog(warehouse)
        _publish(warehouse, v + 1, {**tables, "foreign": "/pf"})
        catalog_set(warehouse, "y", "/p2")
        t = catalog_tables(warehouse)
        assert set(t) == {"x", "foreign", "y"}


class TestManagedTables:
    """CREATE without LOCATION while a warehouse is attached = a MANAGED
    table at <warehouse>/<name> (Delta's managed layout); unattached,
    the no-LOCATION forms stay native spark.sql statements."""

    def test_managed_ctas_create_replace_drop(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        name = _name("mgd")
        r = manifest_sql(
            spark,
            f"CREATE TABLE {name} PARTITIONED BY (p) AS "
            "SELECT id AS k, id % 2 AS p FROM range(8)",
        )
        assert r["statement"] == "create-table-as"
        assert os.path.isdir(os.path.join(warehouse, name))
        assert name.lower() in catalog_tables(warehouse)
        # replace in place without restating the location
        manifest_sql(
            spark,
            f"CREATE OR REPLACE TABLE {name} AS SELECT id AS y FROM range(3)",
        )
        assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 3
        manifest_sql(spark, f"DROP TABLE {name} PURGE")
        assert not os.path.exists(os.path.join(warehouse, name))
        assert name.lower() not in catalog_tables(warehouse)

    def test_managed_empty_create(self, spark, warehouse):
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        name = _name("mgd2")
        r = manifest_sql(spark, f"CREATE TABLE {name} (a INT, b STRING)")
        assert r["statement"] == "create-table"
        assert os.path.isdir(os.path.join(warehouse, name))
        manifest_sql(spark, f"INSERT INTO {name} VALUES (1, 'x')")
        assert manifest_sql(spark, f"SELECT * FROM {name}").count() == 1
        manifest_sql(spark, f"DROP TABLE {name} PURGE")

    def test_unattached_no_location_stays_native(self, spark):
        """Without an attached warehouse the no-LOCATION CTAS must fall
        through to spark.sql (native catalog), not be hijacked."""
        manifest_catalog_detach()
        name = _name("native")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        try:
            out = manifest_sql(
                spark, f"CREATE TABLE {name} AS SELECT 1 AS a"
            )
            # native spark.sql returns a DataFrame, not our op dict
            assert not isinstance(out, dict)
            assert name.lower() not in _SQL_TABLES
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_attach_stale_entry_strict_and_skip(self, spark, warehouse):
        """A catalog entry whose table was deleted OUTSIDE DROP TABLE:
        strict attach refuses loudly naming it; missing='skip' attaches
        the healthy tables and DROP TABLE repairs the catalog."""
        good = _name("good")
        path = os.path.join(warehouse, "good_t")
        _seed(spark, path, 3)
        catalog_set(warehouse, good, path)
        catalog_set(warehouse, "ghost", os.path.join(warehouse, "nope"))
        with pytest.raises(ValueError, match="ghost"):
            manifest_catalog_attach(spark, warehouse)
        attached = manifest_catalog_attach(spark, warehouse, missing="skip")
        assert good.lower() in attached and "ghost" not in attached
        assert manifest_sql(spark, f"SELECT * FROM {good}").count() == 3
        # repair: DROP TABLE removes the stale name from the catalog
        manifest_sql(spark, "DROP TABLE ghost")
        assert "ghost" not in catalog_tables(warehouse)
        manifest_sql(spark, f"DROP TABLE {good} PURGE")

    def test_create_forms_with_hostile_literals(self, spark, warehouse):
        """Keyword-shaped STRING LITERALS must not confuse the optional
        LOCATION/PARTITIONED BY scan, and native USING-clause CREATEs
        stay native even while attached."""
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        name = _name("hostile")
        manifest_sql(
            spark,
            f"CREATE TABLE {name} AS "
            "SELECT 'LOCATION ''/tmp/x''' AS a, "
            "'PARTITIONED BY (y)' AS b FROM range(2)",
        )
        try:
            df = manifest_sql(spark, f"SELECT * FROM {name}")
            assert df.count() == 2
            assert os.path.isdir(os.path.join(warehouse, name))
            row = df.first()
            assert row["a"] == "LOCATION '/tmp/x'"
            assert row["b"] == "PARTITIONED BY (y)"
        finally:
            manifest_sql(spark, f"DROP TABLE {name} PURGE")
        # a USING clause is native Spark DDL — ours must not hijack it
        nat = _name("native_using")
        spark.sql(f"DROP TABLE IF EXISTS {nat}")
        try:
            out = manifest_sql(
                spark, f"CREATE TABLE {nat} (a INT) USING parquet"
            )
            assert not isinstance(out, dict)
            assert nat.lower() not in _SQL_TABLES
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {nat}")

    def test_drop_shadowed_name_keeps_catalog_entry(self, spark, warehouse):
        """code-review r11: a session view shadowing a catalog name at a
        DIFFERENT path must not erase the unrelated durable entry."""
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        name = _name("shadow")
        real = os.path.join(warehouse, "real_t")
        _seed(spark, real, 3)
        catalog_set(warehouse, name, real)
        other = os.path.join(warehouse, "other_t")
        _seed(spark, other, 2)
        manifest_sql_register(spark, name, other)  # the shadow
        r = manifest_sql(spark, f"DROP TABLE {name}")
        assert r["location"] == other
        # the durable entry for the REAL table survives
        assert catalog_tables(warehouse).get(name.lower()) == real
        manifest_sql(spark, f"DROP TABLE {name}")  # now resolves via catalog
        assert name.lower() not in catalog_tables(warehouse)

    def test_create_refuses_repointing_catalog_only_name(self, spark, warehouse):
        """code-review r11: a name in the attached catalog but NOT
        session-registered must not be silently re-pointed by
        CREATE [OR REPLACE] at a different location."""
        manifest_sql(spark, f"ATTACH WAREHOUSE '{warehouse}'")
        name = _name("catonly")
        p1 = os.path.join(warehouse, "t1")
        _seed(spark, p1, 3)
        catalog_set(warehouse, name, p1)  # cataloged, never registered
        p2 = os.path.join(warehouse, "t2")
        for stmt in (
            f"CREATE OR REPLACE TABLE {name} LOCATION '{p2}' AS SELECT 1 AS a",
            f"CREATE TABLE {name} LOCATION '{p2}' AS SELECT 1 AS a",
            f"CREATE TABLE {name} (a INT) LOCATION '{p2}'",
        ):
            with pytest.raises(ValueError, match="cataloged at"):
                manifest_sql(spark, stmt)
        assert catalog_tables(warehouse)[name.lower()] == p1
        # replacing IN PLACE (no LOCATION → resolves via catalog) is fine
        manifest_sql(
            spark, f"CREATE OR REPLACE TABLE {name} AS SELECT 1 AS a"
        )
        assert catalog_tables(warehouse)[name.lower()] == p1
        manifest_sql(spark, f"DROP TABLE {name} PURGE")
