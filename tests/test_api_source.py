"""Custom Python DataSource (csv_endpoint): the reference's per-parameter
CSV API fetch as partition-parallel Spark ingest."""

from __future__ import annotations

import csv
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.sources.api_source import (
    register_csv_endpoint,
)

NATION_DDL = "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"


@pytest.fixture()
def endpoint_dir(spark, sf_dir):
    """Fake the parameterized API: one CSV body per region key, written
    from the nation parquet."""
    d = f"{tempfile.gettempdir()}/api_{uuid.uuid4().hex[:8]}"
    os.makedirs(d)
    rows = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    regions = sorted({r.n_regionkey for r in rows})
    for rk in regions:
        with open(f"{d}/{rk}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["n_nationkey", "n_name", "n_regionkey"])
            for r in rows:
                if r.n_regionkey == rk:
                    w.writerow([r.n_nationkey, r.n_name, r.n_regionkey])
    yield d, regions
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_csv_endpoint_partition_parallel_fetch(spark, sf_dir, endpoint_dir):
    d, regions = endpoint_dir
    register_csv_endpoint(spark)
    df = (
        spark.read.format("csv_endpoint")
        .schema(NATION_DDL)
        .option("url_template", f"file://{d}/{{param}}.csv")
        .option("params", ",".join(str(r) for r in regions))
        .load()
    )
    # one input partition per parameter value — the S2 union is the scan
    assert df.rdd.getNumPartitions() == len(regions)
    orig = {
        tuple(r)
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    }
    assert {tuple(r) for r in df.collect()} == orig


def test_csv_endpoint_missing_schema_fails_fast(spark, endpoint_dir):
    d, regions = endpoint_dir
    register_csv_endpoint(spark)
    with pytest.raises(Exception, match="schema|inference"):
        (
            spark.read.format("csv_endpoint")
            .option("url_template", f"file://{d}/{{param}}.csv")
            .option("params", "0")
            .load()
            .collect()
        )


def test_csv_endpoint_fetch_failure_is_explicit(spark, endpoint_dir):
    """A dead endpoint fails the TASK with the attempt count in the error
    (the reference fails to None and crashes later) — max_attempts=2 keeps
    the backoff short."""
    d, _ = endpoint_dir
    register_csv_endpoint(spark)
    df = (
        spark.read.format("csv_endpoint")
        .schema(NATION_DDL)
        .option("url_template", f"file://{d}/missing_{{param}}.csv")
        .option("params", "99")
        .option("max_attempts", "2")
        .option("backoff_seconds", "0.01")
        .load()
    )
    with pytest.raises(Exception, match="after 2 attempts"):
        df.collect()
