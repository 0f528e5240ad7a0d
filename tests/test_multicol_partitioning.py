"""Multi-column partitioning (VERDICT r06 #6): a manifest table
partitioned on SEVERAL columns — nested escaped dirs, canonical JSON
composite keys, tuple pruning plus subset partition_filter, and the
whole protocol (upsert/merge/delete/compact/feed) running unchanged on
top. Tables using it stamp reader protocol 2.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    _latest_manifest,
    manifest_count,
    manifest_merge,
    manifest_read,
    manifest_upsert_partitioned,
)


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/mpart_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(f"{path}_ckpt", ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k LONG, day STRING, src STRING, v DOUBLE"
    )


def _content(df):
    return sorted(map(tuple, df.select("k", "day", "src", "v").collect()))


def test_multicol_upsert_read_prune_and_protocol(spark, table_path):
    b1 = _batch(
        spark,
        [
            (1, "d1", "web", 1.0),
            (2, "d1", "app", 2.0),
            (3, "d2", "web", 3.0),
        ],
    )
    r1 = manifest_upsert_partitioned(b1, table_path, ["k"], ["day", "src"])
    assert r1 == {"updated": 0, "inserted": 3}

    # update within one (day, src) cell + insert a new cell
    b2 = _batch(spark, [(2, "d1", "app", 20.0), (4, "d2", "app", 4.0)])
    r2 = manifest_upsert_partitioned(b2, table_path, ["k"], ["day", "src"])
    assert r2 == {"updated": 1, "inserted": 1}

    assert _content(manifest_read(spark, table_path)) == [
        (1, "d1", "web", 1.0),
        (2, "d1", "app", 20.0),
        (3, "d2", "web", 3.0),
        (4, "d2", "app", 4.0),
    ]
    v, content = _latest_manifest(table_path)
    assert content["partition_cols"] == ["day", "src"]
    assert content["protocol"] == 2
    # composite keys are canonical JSON tuples; dirs nest one level per
    # column
    assert '["d1","app"]' in content["partitions"]
    assert "/__p0=d1/__p1=app" in content["partitions"]['["d1","app"]']

    # exact-tuple pruning
    one = manifest_read(spark, table_path, partition_values=[("d1", "app")])
    assert _content(one) == [(2, "d1", "app", 20.0)]
    # subset filter: one day across all sources
    day = manifest_read(spark, table_path, partition_filter={"day": "d1"})
    assert _content(day) == [(1, "d1", "web", 1.0), (2, "d1", "app", 20.0)]
    src = manifest_read(spark, table_path, partition_filter={"src": "web"})
    assert _content(src) == [(1, "d1", "web", 1.0), (3, "d2", "web", 3.0)]
    # metadata-only count with tuple pruning
    assert manifest_count(table_path, partition_values=[("d2", "web")]) == 1


def test_multicol_merge_delete_compact_roundtrip(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_compact,
        manifest_delete,
    )

    b1 = _batch(
        spark,
        [
            (1, "d1", "web", 1.0),
            (2, "d1", "app", 2.0),
            (3, "d2", "web", 3.0),
        ],
    )
    manifest_upsert_partitioned(b1, table_path, ["k"], ["day", "src"])

    r = manifest_merge(
        _batch(spark, [(1, "d1", "web", 100.0), (9, "d2", "app", 9.0)]),
        table_path,
        ["k"],
        ["day", "src"],
        matched_update={"v": "s.v"},
        insert_not_matched=True,
    )
    assert r == {"updated": 1, "deleted": 0, "inserted": 1}

    # partition columns are protected from matched_update
    with pytest.raises(ValueError, match="partition column"):
        manifest_merge(
            _batch(spark, [(1, "d1", "web", 0.0)]),
            table_path,
            ["k"],
            ["day", "src"],
            matched_update={"src": "s.src"},
        )

    manifest_delete(spark.createDataFrame([(2,)], "k long"), table_path, ["k"])
    manifest_compact(spark, table_path)
    assert _content(manifest_read(spark, table_path)) == [
        (1, "d1", "web", 100.0),
        (3, "d2", "web", 3.0),
        (9, "d2", "app", 9.0),
    ]
    # compaction of the (day, src) grid leaves one file per live cell
    _, content = _latest_manifest(table_path)
    assert all(len(v) == 1 for v in content["files"].values())


def test_multicol_escaped_values_and_null_component(spark, table_path):
    b = _batch(
        spark,
        [(1, "2024-01-01 10:30", "a:b", 1.0), (2, None, "web", 2.0)],
    )
    manifest_upsert_partitioned(b, table_path, ["k"], ["day", "src"])
    got = _content(manifest_read(spark, table_path))
    assert got == [
        (1, "2024-01-01 10:30", "a:b", 1.0),
        (2, None, "web", 2.0),
    ]
    assert _content(
        manifest_read(
            spark, table_path, partition_values=[("2024-01-01 10:30", "a:b")]
        )
    ) == [(1, "2024-01-01 10:30", "a:b", 1.0)]
    # update the null-day row (composite key with the null sentinel)
    manifest_upsert_partitioned(
        _batch(spark, [(2, None, "web", 22.0)]), table_path, ["k"], ["day", "src"]
    )
    assert (2, None, "web", 22.0) in _content(manifest_read(spark, table_path))


def test_multicol_streaming_feed_and_cdf(spark, table_path):
    from data_management_service_run_etl_imputations_spark.sources.manifest_stream import (
        ManifestFeedDataSource,
    )

    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", "web", 1.0), (2, "d1", "app", 2.0)]),
        table_path,
        ["k"],
        ["day", "src"],
    )
    manifest_upsert_partitioned(
        _batch(spark, [(2, "d1", "app", 20.0)]),
        table_path,
        ["k"],
        ["day", "src"],
    )
    spark.dataSource.register(ManifestFeedDataSource)
    name = f"mp_{uuid.uuid4().hex[:8]}"
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
                    "select k, src, v, _change_type, _commit_version "
                    f"from {name}"
                ).collect(),
            )
        )
    finally:
        q.stop()
    assert got == [
        (1, "web", 1.0, "insert", 1),
        (2, "app", 2.0, "insert", 1),
        (2, "app", 20.0, "update_post", 2),
    ], got


def test_multicol_incremental_aggregate_refresh(spark, table_path):
    """manifest_refresh_aggregate maintains a rollup PARTITIONED ON TWO
    of its group columns — the change feed touches only changed (day,
    src) cells of the rollup."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        manifest_refresh_aggregate,
    )

    fact = f"{table_path}_fact"
    agg = f"{table_path}_agg"
    try:
        manifest_upsert_partitioned(
            _batch(
                spark,
                [
                    (1, "d1", "web", 1.0),
                    (2, "d1", "app", 2.0),
                    (3, "d2", "web", 3.0),
                ],
            ),
            fact,
            ["k"],
            "day",
        )
        r = manifest_refresh_aggregate(
            spark, fact, agg, 0, ["day", "src"], ["day", "src"], ["v"]
        )
        assert r["changed_groups"] == 3
        got = sorted(
            map(
                tuple,
                manifest_read(spark, agg)
                .select("day", "src", "n_rows", "sum_v")
                .collect(),
            )
        )
        assert got == [
            ("d1", "app", 1, 2.0),
            ("d1", "web", 1, 1.0),
            ("d2", "web", 1, 3.0),
        ]
        v_fact, _ = _latest_manifest(fact)
        # incremental: a one-cell fact update refreshes one rollup cell
        manifest_upsert_partitioned(
            _batch(spark, [(2, "d1", "app", 20.0)]), fact, ["k"], "day"
        )
        r2 = manifest_refresh_aggregate(
            spark, fact, agg, v_fact, ["day", "src"], ["day", "src"], ["v"]
        )
        assert r2["changed_groups"] == 1
        got = sorted(
            map(
                tuple,
                manifest_read(spark, agg)
                .select("day", "src", "n_rows", "sum_v")
                .collect(),
            )
        )
        assert got == [
            ("d1", "app", 1, 20.0),
            ("d1", "web", 1, 1.0),
            ("d2", "web", 1, 3.0),
        ]
    finally:
        shutil.rmtree(fact, ignore_errors=True)
        shutil.rmtree(agg, ignore_errors=True)


def test_multicol_zorder_whole_table_and_scoped(spark, table_path):
    """OPTIMIZE ZORDER on a (day, src)-partitioned table: whole-table
    clustering rewrites every composite partition into z-range files
    with identical logical content, and ``partition_values`` scoping
    with a composite key re-clusters exactly one partition. Zone-map
    skipping must engage on the clustered column afterwards."""
    from data_management_service_run_etl_imputations_spark.sources.skipping import (
        manifest_cluster_zorder,
        manifest_skipping_plan,
    )

    rows = [
        (i, f"d{i % 2}", f"s{i % 3}", float(i * 7 % 101)) for i in range(4000)
    ]
    manifest_upsert_partitioned(
        _batch(spark, rows), table_path, ["k"], ["day", "src"]
    )
    r = manifest_cluster_zorder(
        spark, table_path, ["k", "v"], files_per_partition=4
    )
    assert r["partitions"] == 6
    assert _content(manifest_read(spark, table_path)) == sorted(rows)
    _, content = _latest_manifest(table_path)
    assert all(len(fs) >= 4 for fs in content["files"].values())

    # scoped: one composite partition, content unchanged
    r2 = manifest_cluster_zorder(
        spark,
        table_path,
        ["k"],
        files_per_partition=2,
        partition_values=[["d0", "s1"]],
    )
    assert r2["partitions"] == 1
    assert _content(manifest_read(spark, table_path)) == sorted(rows)

    # the z-order pass collected per-file stats: a narrow k-range scan
    # plan must drop most files
    kept, n_kept, n_total, _ = manifest_skipping_plan(
        table_path, {"k": (100, 139)}
    )
    assert n_kept < n_total, (n_kept, n_total)
