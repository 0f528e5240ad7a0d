"""Core reference-parity queries over the TPC-H-ish testdata.

Each query is one row of SURVEY.md §2's operator inventory re-expressed as a
lazy DataFrame plan. File:line citations point into the reference
(``/root/reference/function_app.py``) so parity can be checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table


@register(
    "flagship_daily_customer_revenue",
    oracle="""
        SELECT CAST(o.o_orderdate AS DATE) AS fecha,
               c.c_custkey            AS customer_key,
               c.c_name               AS customer_name,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               SUM(l.l_quantity)      AS sum_qty,
               COUNT(*)               AS n_lines
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    """,
    headline=True,
)
def flagship_daily_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's core shape — fact ⋈ dim ⋈ dim, derived
    measure, multi-key group-by sum (sub-pipeline A, ``function_app.py:148-315``:
    joins J1/J2 at :163/:174, derived hours F6 at :181, group-by-sum A3 at
    :277-285). Here: daily billed revenue per customer.

    Scale notes: lineitem⋈orders is large-large → sort-merge/shuffled-hash
    chosen by AQE; customer is small → broadcast hint. Aggregation gets
    map-side partial combine from Catalyst automatically.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.to_date("o_orderdate").alias("fecha"),
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
