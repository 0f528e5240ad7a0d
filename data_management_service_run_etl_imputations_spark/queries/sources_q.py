"""Source/sink round-trip queries: partitioned parquet with partition
pruning, CSV with explicit schema, and the salted-aggregation skew path.
Each runs a real write inside the query (same-process temp dir), reads its
own output back, and is oracle-checked against the original parquet — so
the driver's differential gate covers the connector code, not just the
transform code.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.skew import salted_agg
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table
from data_management_service_run_etl_imputations_spark.sources.readers import csv_source


def _tmp(prefix: str) -> str:
    return f"{tempfile.gettempdir()}/{prefix}_{uuid.uuid4().hex[:8]}"


@register(
    "partitioned_write_prune",
    oracle="""
        SELECT EXTRACT(MONTH FROM o_orderdate) AS o_month,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 6) AS total_price
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        GROUP BY o_month
    """,
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet round-trip: write orders partitioned by
    order year, read back with a partition filter, aggregate by month.
    The year predicate prunes at the directory level (PartitionFilters in
    the scan, non-matching years never open) — the layout pattern for a
    100 TB date-partitioned fact store. The partition column is also
    dropped from the data files (it lives in the path), shrinking them."""
    target = _tmp("orders_by_year")
    orders = load_table(spark, sf_dir, "orders")
    try:
        (
            orders.withColumn("o_year", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(target)
        )
        pruned = spark.read.parquet(target).filter(F.col("o_year") == 1997)
        return (
            pruned.groupBy(F.month("o_orderdate").alias("o_month"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 6).alias("total_price"),
            )
            .localCheckpoint()  # materialize before the temp dir vanishes
        )
    finally:
        shutil.rmtree(target, ignore_errors=True)


@register(
    "csv_roundtrip_agg",
    oracle="""
        SELECT n_regionkey, COUNT(*) AS n_nations,
               list_sort(list(n_name)) AS nations
        FROM nation GROUP BY n_regionkey
    """,
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 CSV source round-trip with an explicit schema (no inference
    scan): nation → CSV → read back → aggregate. Proves header handling
    and deterministic typing survive the text format."""
    target = _tmp("nation_csv")
    nation = load_table(spark, sf_dir, "nation")
    try:
        nation.write.mode("overwrite").option("header", True).csv(target)
        back = csv_source(spark, target, schema=nation.schema)
        return (
            back.groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n_nations"),
                F.array_sort(F.collect_list("n_name")).alias("nations"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(target, ignore_errors=True)


@register(
    "skew_salted_agg",
    oracle="""
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 6) AS sum_l_quantity,
               COUNT(l_extendedprice) AS count_l_extendedprice
        FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation on a genuinely skewed key:
    l_returnflag has 3 values over the whole fact table, so a plain
    groupBy funnels everything into 3 reducers. Salting spreads each key
    over 16 partial groups first; the final refold touches 3×16 rows.
    Semantically transparent — the oracle is the plain GROUP BY."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={"l_quantity": "sum", "l_extendedprice": "count"},
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 6).alias("sum_l_quantity"),
        F.col("count_l_extendedprice").cast("long").alias("count_l_extendedprice"),
    )
