from __future__ import annotations

from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.skew import (
    salted_agg,
    salted_hot_key_join,
)


def test_salted_agg_equals_direct(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0), ("cold", 2.0)],
        "k STRING, v DOUBLE",
    )
    salted = {
        r.k: (r.sum_v, r.count_v, r.min_v, r.max_v)
        for r in salted_agg(
            df, ["k"], {"v": "sum"} | {}, n_salts=8
        ).join(
            salted_agg(df, ["k"], {"v": "count"}, n_salts=8), "k"
        ).join(
            salted_agg(df, ["k"], {"v": "min"}, n_salts=8), "k"
        ).join(
            salted_agg(df, ["k"], {"v": "max"}, n_salts=8), "k"
        ).collect()
    }
    direct = {
        r.k: (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert salted == direct


def test_salted_hot_key_join_equals_direct(spark):
    fact = spark.createDataFrame(
        [(1, f"row{i}") for i in range(500)] + [(2, "x"), (3, "y")],
        "k INT, payload STRING",
    )
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k INT, name STRING")
    salted = salted_hot_key_join(fact, dim, "k", n_salts=4)
    direct = fact.join(dim, "k")
    assert sorted((r.k, r.payload, r.name) for r in salted.collect()) == sorted(
        (r.k, r.payload, r.name) for r in direct.collect()
    )
