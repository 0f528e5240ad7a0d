"""Generated partition columns (hidden partitioning).

Delta's generated-columns / Iceberg's hidden-partitioning story on the
manifest table: the table records `generated_cols={"day":
"date_trunc('day', ts)"}`, partitions on the generated name, every write
path computes the column from the recorded expression (caller values
overwritten — the transform can never drift), and reads prune on raw
timestamp ranges through `generated_partition_filter`.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    _latest_manifest,
    generated_partition_filter,
    manifest_merge,
    manifest_read,
    manifest_rename_column,
    manifest_upsert_partitioned,
)


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/gencol_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _events(spark, rows):
    # (id, ts-string, v) — no day column: the table computes it
    return spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(ts), v) for i, ts, v in rows],
        "id LONG, ts TIMESTAMP, v DOUBLE",
    )


GEN = {"day": "to_date(ts)"}


def test_hidden_partitioning_end_to_end(spark, table_path):
    manifest_upsert_partitioned(
        _events(
            spark,
            [
                (1, "2024-03-01T10:00:00", 1.0),
                (2, "2024-03-02T11:30:00", 2.0),
                (3, "2024-03-05T09:15:00", 3.0),
            ],
        ),
        table_path,
        ["id"],
        "day",
        generated_cols=GEN,
    )
    content = _latest_manifest(table_path)[1]
    assert content["generated_cols"] == GEN
    assert sorted(content["partitions"]) == [
        "2024-03-01",
        "2024-03-02",
        "2024-03-05",
    ]

    # later upserts NEVER supply the column; a wrong caller value is
    # overwritten by the spec
    wrong = _events(spark, [(4, "2024-03-02T23:59:00", 4.0)]).withColumn(
        "day", F.lit(dt.date(1999, 1, 1))
    )
    manifest_upsert_partitioned(wrong, table_path, ["id"], "day")
    got = {
        r["id"]: r["day"]
        for r in manifest_read(spark, table_path).collect()
    }
    assert got[4] == dt.date(2024, 3, 2)

    # merge source without the column: computed, probe + insert correct
    r = manifest_merge(
        _events(spark, [(3, "2024-03-05T09:15:00", 30.0),
                        (9, "2024-03-07T00:30:00", 9.0)]),
        table_path,
        ["id"],
        "day",
        matched_update={"v": "s.v"},
        insert_not_matched=True,
    )
    assert r == {"updated": 1, "deleted": 0, "inserted": 1}
    rows = {
        r["id"]: (r["day"], r["v"])
        for r in manifest_read(spark, table_path).collect()
    }
    assert rows[3] == (dt.date(2024, 3, 5), 30.0)
    assert rows[9] == (dt.date(2024, 3, 7), 9.0)

    # raw-range pruning: a two-day ts window maps to exactly its day keys
    filt = generated_partition_filter(
        table_path,
        {"ts": (dt.datetime(2024, 3, 2, 5), dt.datetime(2024, 3, 3, 22))},
    )
    assert filt == {"day": [dt.date(2024, 3, 2), dt.date(2024, 3, 3)]}
    pruned = manifest_read(spark, table_path, partition_filter=filt)
    assert sorted(r["id"] for r in pruned.collect()) == [2, 4]


def test_generated_spec_is_table_identity(spark, table_path):
    manifest_upsert_partitioned(
        _events(spark, [(1, "2024-01-01T00:00:00", 1.0)]),
        table_path,
        ["id"],
        "day",
        generated_cols=GEN,
    )
    with pytest.raises(ValueError, match="mismatch"):
        manifest_upsert_partitioned(
            _events(spark, [(2, "2024-01-02T00:00:00", 2.0)]),
            table_path,
            ["id"],
            "day",
            generated_cols={"day": "date_trunc('month', ts)"},
        )
    # generated names must BE partition columns
    with pytest.raises(ValueError, match="partition columns"):
        manifest_upsert_partitioned(
            _events(spark, [(2, "2024-01-02T00:00:00", 2.0)]),
            f"{table_path}_b",
            ["id"],
            "day",
            generated_cols={"other": "to_date(ts)"},
        )
    # the base column is load-bearing: rename refused
    with pytest.raises(ValueError, match="generated column"):
        manifest_rename_column(table_path, "ts", "event_ts")


def test_generated_partition_filter_units(spark, table_path):
    manifest_upsert_partitioned(
        _events(spark, [(1, "2024-01-15T07:45:00", 1.0)]),
        table_path,
        ["id"],
        "day",
        generated_cols={"day": "date_trunc('month', ts)"},
    )
    filt = generated_partition_filter(
        table_path,
        {"ts": (dt.datetime(2023, 11, 20), dt.datetime(2024, 2, 2))},
    )
    assert filt == {
        "day": [
            dt.datetime(2023, 11, 1),
            dt.datetime(2023, 12, 1),
            dt.datetime(2024, 1, 1),
            dt.datetime(2024, 2, 1),
        ]
    }
    with pytest.raises(ValueError, match="no enumerable"):
        generated_partition_filter(table_path, {"v": (0, 1)})
