from __future__ import annotations

from pyspark.sql import types as T

from data_management_service_run_etl_imputations_spark.sources.readers import (
    csv_source,
    union_param_sweep,
)


def test_csv_source_with_schema_and_inferred(spark, tmp_path):
    p = tmp_path / "emp.csv"
    p.write_text(
        "id,company_name,price_per_hour,nid,status\n"
        "e1,ACME HOLDINGS,50.5,DNI-1,active\n"
        "e2,Globex,60.0,DNI-2,inactive\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("company_name", T.StringType()),
            T.StructField("price_per_hour", T.DoubleType()),
            T.StructField("nid", T.StringType()),
            T.StructField("status", T.StringType()),
        ]
    )
    explicit = csv_source(spark, str(p), schema=schema)
    assert explicit.schema == schema
    rows = {r.id: r for r in explicit.collect()}
    assert rows["e1"].price_per_hour == 50.5

    # reference-mirror mode: dynamic inference (function_app.py:69)
    inferred = csv_source(spark, str(p))
    assert dict(inferred.dtypes)["price_per_hour"] == "double"
    assert inferred.count() == 2


def test_union_param_sweep_schema_mismatch_alignment(spark):
    a = spark.createDataFrame([(1, "x")], "id INT, v STRING")
    b = spark.createDataFrame([("y", 2)], "v STRING, id INT")  # reordered cols
    out = union_param_sweep([a, b])
    got = sorted((r.id, r.v) for r in out.collect())
    assert got == [(1, "x"), (2, "y")]  # unionByName aligns by name


def test_read_with_retry_flaky_then_success(spark, sf_dir):
    """A reader that fails twice then succeeds: the wrapper retries with
    backoff and returns the DataFrame; attempts are counted."""
    from data_management_service_run_etl_imputations_spark.sources.readers import (
        read_with_retry,
    )

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient: connection reset")
        return spark.read.parquet(f"{sf_dir}/nation.parquet")

    df = read_with_retry(flaky, max_attempts=3, backoff_seconds=0.01)
    assert calls["n"] == 3
    assert df.count() > 0


def test_read_with_retry_exhausts_and_raises(spark):
    """Permanent failure surfaces as an explicit SourceReadError at the
    source (the reference returns None and crashes later) with the attempt
    count and the underlying cause preserved."""
    import pytest

    from data_management_service_run_etl_imputations_spark.sources.readers import (
        SourceReadError,
        read_with_retry,
    )

    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise IOError("permanent: no such host")

    with pytest.raises(SourceReadError) as ei:
        read_with_retry(broken, max_attempts=4, backoff_seconds=0.01)
    assert calls["n"] == 4
    assert ei.value.attempts == 4
    assert isinstance(ei.value.last_error, IOError)


def test_read_with_retry_non_retryable_raises_immediately(spark):
    from data_management_service_run_etl_imputations_spark.sources.readers import (
        read_with_retry,
    )
    import pytest

    calls = {"n": 0}

    def type_bug():
        calls["n"] += 1
        raise TypeError("not transient")

    with pytest.raises(TypeError):
        read_with_retry(
            type_bug, max_attempts=5, backoff_seconds=0.01, retryable=(IOError,)
        )
    assert calls["n"] == 1
