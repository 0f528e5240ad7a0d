"""Column RENAME / DROP via column mapping (VERDICT r06 #3): stable
column ids in the manifest (Delta's column-mapping design) let the
logical name move or disappear while data files never move — old files
stay readable, time travel keeps the old names, indexes rekey on rename
and purge on drop, and a re-added name takes a fresh id so dropped data
can never resurrect.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    _latest_manifest,
    manifest_drop_column,
    manifest_read,
    manifest_rename_column,
    manifest_upsert_partitioned,
)


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/cmap_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(f"{path}_ckpt", ignore_errors=True)


def _batch(spark, rows, ddl="k LONG, day STRING, v DOUBLE"):
    return spark.createDataFrame(rows, ddl)


def _content(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_rename_keeps_old_files_readable_and_time_travel(spark, table_path):
    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0), (2, "d2", 2.0)]), table_path, ["k"], "day"
    )
    manifest_upsert_partitioned(
        _batch(spark, [(3, "d1", 3.0)]), table_path, ["k"], "day"
    )
    manifest_rename_column(table_path, "v", "amount")

    got = manifest_read(spark, table_path)
    assert got.columns == ["k", "day", "amount"]
    assert _content(got, ["k", "day", "amount"]) == [
        (1, "d1", 1.0),
        (2, "d2", 2.0),
        (3, "d1", 3.0),
    ]
    # time travel to v2 still shows the pre-rename name
    old = manifest_read(spark, table_path, version=2)
    assert old.columns == ["k", "day", "v"]
    # a mapped table stamps reader protocol 2
    _, content = _latest_manifest(table_path)
    assert content["protocol"] == 2


def test_write_after_rename_mixes_generations(spark, table_path):
    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]), table_path, ["k"], "day"
    )
    manifest_rename_column(table_path, "v", "amount")
    # post-rename batch writes the NEW name; k=2 is a file-granular
    # update whose rewrite reads pre-rename files through the mapping
    manifest_upsert_partitioned(
        _batch(spark, [(2, "d1", 20.0), (4, "d2", 4.0)], "k LONG, day STRING, amount DOUBLE"),
        table_path,
        ["k"],
        "day",
    )
    got = _content(manifest_read(spark, table_path), ["k", "day", "amount"])
    assert got == [
        (1, "d1", 1.0),
        (2, "d1", 20.0),
        (4, "d2", 4.0),
    ]


def test_rename_key_column_then_upsert_on_new_name(spark, table_path):
    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]), table_path, ["k"], "day"
    )
    manifest_rename_column(table_path, "k", "id")
    manifest_upsert_partitioned(
        _batch(spark, [(2, "d1", 22.0)], "id LONG, day STRING, v DOUBLE"),
        table_path,
        ["id"],
        "day",
    )
    assert _content(manifest_read(spark, table_path), ["id", "day", "v"]) == [
        (1, "d1", 1.0),
        (2, "d1", 22.0),
    ]


def test_drop_column_and_fresh_readd_does_not_resurrect(spark, table_path):
    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0), (2, "d2", 2.0)]), table_path, ["k"], "day"
    )
    manifest_drop_column(table_path, "v")
    got = manifest_read(spark, table_path)
    assert got.columns == ["k", "day"]
    # re-ADD a column named v (fresh id) via schema evolution: the old
    # files' dropped bytes must NOT serve the new column
    manifest_upsert_partitioned(
        _batch(spark, [(3, "d1", 30.0)]), table_path, ["k"], "day"
    )
    got = _content(manifest_read(spark, table_path), ["k", "day", "v"])
    assert got == [
        (1, "d1", None),
        (2, "d2", None),
        (3, "d1", 30.0),
    ]


def test_rename_with_pending_mor_delete_still_masks(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_delete,
    )

    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]), table_path, ["k"], "day"
    )
    manifest_delete(spark.createDataFrame([(2,)], "k long"), table_path, ["k"])
    manifest_rename_column(table_path, "k", "id")
    got = _content(manifest_read(spark, table_path), ["id", "day", "v"])
    assert got == [(1, "d1", 1.0)]


def test_rename_rekeys_indexes_drop_purges_them(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.skipping import (
        manifest_collect_stats,
        manifest_skipping_plan,
    )

    for p in range(4):
        manifest_upsert_partitioned(
            _batch(spark, [(p * 10 + j, f"d{p}", float(p)) for j in range(3)]),
            table_path,
            ["k"],
            "day",
        )
    manifest_collect_stats(spark, table_path, ["k"])
    manifest_rename_column(table_path, "k", "id")
    _, content = _latest_manifest(table_path)
    assert content["stats_cols"] == ["id"]
    kept, n_kept, n_total, _ = manifest_skipping_plan(
        table_path, {"id": (30, 35)}
    )
    # only d3's files hold keys in [30, 35]: the rekeyed zone maps keep
    # pruning under the NEW name without a fresh ANALYZE
    assert n_total >= 8 and n_kept <= 3, (n_kept, n_total)

    # drop v then re-add: no stats survive under the reused name
    manifest_drop_column(table_path, "v")
    manifest_collect_stats(spark, table_path, ["id"])  # still fine
    _, content = _latest_manifest(table_path)
    assert "v" not in content.get("stats_cols", [])


def test_streaming_feed_maps_old_files_to_new_name(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.manifest_stream import (
        ManifestFeedDataSource,
    )

    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
    )
    manifest_rename_column(table_path, "v", "amount")
    manifest_upsert_partitioned(
        _batch(spark, [(2, "d2", 2.0)], "k LONG, day STRING, amount DOUBLE"),
        table_path,
        ["k"],
        "day",
    )
    spark.dataSource.register(ManifestFeedDataSource)
    name = f"cm_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("manifest_feed")
        .option("path", table_path)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            map(
                tuple,
                spark.sql(
                    f"select k, amount, _commit_version from {name}"
                ).collect(),
            )
        )
    finally:
        q.stop()
    # the v1 file was written pre-rename: its column feeds 'amount'
    assert got == [(1, 1.0, 1), (2, 2.0, 3)], got


def test_cdf_across_rename_pairs_by_column_id(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.manifest_stream import (
        ManifestFeedDataSource,
    )

    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0), (2, "d1", 2.0)]), table_path, ["k"], "day"
    )
    manifest_rename_column(table_path, "v", "amount")
    manifest_upsert_partitioned(  # update k=2 post-rename
        _batch(spark, [(2, "d1", 20.0)], "k LONG, day STRING, amount DOUBLE"),
        table_path,
        ["k"],
        "day",
    )
    spark.dataSource.register(ManifestFeedDataSource)
    name = f"cmc_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("manifest_feed")
        .option("path", table_path)
        .option("mode", "cdf")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            map(
                tuple,
                spark.sql(
                    f"select k, amount, _change_type, _commit_version from {name}"
                ).collect(),
            )
        )
    finally:
        q.stop()
    # v1 inserts surface under the CURRENT name; v3 is one paired update
    assert got == [
        (1, 1.0, "insert", 1),
        (2, 2.0, "insert", 1),
        (2, 20.0, "update_post", 3),
    ], got


def test_refusals(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_add_constraint,
        manifest_delete,
    )

    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
    )
    with pytest.raises(ValueError, match="partition column"):
        manifest_rename_column(table_path, "day", "dt")
    with pytest.raises(ValueError, match="partition column"):
        manifest_drop_column(table_path, "day")
    manifest_add_constraint(spark, table_path, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        manifest_rename_column(table_path, "v", "amount")
    with pytest.raises(ValueError, match="constraint"):
        manifest_drop_column(table_path, "v")
    manifest_delete(spark.createDataFrame([(1,)], "k long"), table_path, ["k"])
    with pytest.raises(ValueError, match="delete"):
        manifest_drop_column(table_path, "k")
    with pytest.raises(ValueError, match="already exists"):
        manifest_rename_column(table_path, "k", "v")


def test_zorder_dirs_stay_mapped_across_later_rename(spark, table_path):
    """A Z-order rewrite AFTER mapping initialization must record its new
    dirs' column ids — otherwise a later rename would read those files
    as legacy by-name and null the renamed column."""
    from data_management_service_run_etl_imputations_spark.sources.skipping import (
        manifest_cluster_zorder,
    )

    manifest_upsert_partitioned(
        _batch(spark, [(i, "d1", float(i)) for i in range(8)]),
        table_path,
        ["k"],
        "day",
    )
    manifest_rename_column(table_path, "v", "amount")  # initializes mapping
    manifest_cluster_zorder(spark, table_path, ["k", "amount"])
    manifest_rename_column(table_path, "amount", "val")
    got = _content(manifest_read(spark, table_path), ["k", "day", "val"])
    assert got == [(i, "d1", float(i)) for i in range(8)], got
