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
from data_management_service_run_etl_imputations_spark.sources.readers import (
    date_spine,
    union_param_sweep,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    incremental_new_rows,
)


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

    # Aggregate on the NARROW key (date, custkey) and attach c_name by a
    # broadcast join AFTER the aggregate (guide §2.3: shuffle keys, not
    # payloads): c_name is functionally dependent on c_custkey (customer's
    # primary key), so grouping by it only widened every partial-agg row
    # and the exchange by an ~18-byte string — measured 1.19 → 0.88 s min
    # interleaved at sf0.1, row-for-row parity. The post-agg inner join
    # drops exactly the custkey-absent groups the pre-agg join dropped.
    agg = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.to_date("o_orderdate").alias("fecha"),
            F.col("o_custkey").alias("customer_key"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return agg.join(
        F.broadcast(customer), agg.customer_key == customer.c_custkey
    ).select(
        "fecha",
        "customer_key",
        F.col("c_name").alias("customer_name"),
        "revenue",
        "sum_qty",
        "n_lines",
    )


@register(
    "s2_union_param_sweep",
    oracle="""
        WITH sweep AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               SUM(o_totalprice) AS total_price
        FROM sweep GROUP BY 1
    """,
)
def s2_union_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/O1 — per-parameter reads unioned by name (reference unions the
    ``status ∈ {active, inactive}`` employee fetches, ``function_app.py:78-86``;
    concat at :86, :121). At scale one read with a partition column beats N
    reads; both shapes are supported."""
    orders = load_table(spark, sf_dir, "orders")
    sweep = union_param_sweep(
        [
            orders.filter(F.col("o_orderstatus") == s).select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            for s in ("O", "F")
        ]
    )
    return sweep.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


@register(
    "s3_date_spine_daily_events",
    oracle="""
        WITH spine AS (
            SELECT CAST(g AS DATE) AS fecha
            FROM generate_series(DATE '2024-01-01', DATE '2024-02-05',
                                 INTERVAL 1 DAY) t(g)
        )
        SELECT s.fecha,
               COUNT(e.event_id) AS n_events,
               COALESCE(SUM(e.value), 0.0) AS total_value
        FROM spine s
        LEFT JOIN events e ON CAST(e.ts AS DATE) = s.fecha
        GROUP BY 1
    """,
)
def s3_date_spine_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/F5 — date-spine generation (reference: per-day fetch loop over
    ``pd.date_range``, ``function_app.py:93-121``) rendered as
    ``sequence → explode`` plus a left join, so zero-activity days survive.
    The spine is tiny → broadcast to the events side."""
    events = load_table(spark, sf_dir, "events")
    spine = date_spine(spark, "2024-01-01", "2024-02-05")
    return (
        F.broadcast(spine)
        .join(events, F.to_date(events.ts) == spine.fecha, "left")
        .groupBy("fecha")
        .agg(
            F.count("event_id").alias("n_events"),
            F.coalesce(F.sum("value"), F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "s7_incremental_antijoin",
    oracle="""
        SELECT i.o_orderkey, i.o_custkey, CAST(i.o_orderdate AS DATE) AS fecha,
               i.o_totalprice
        FROM orders i
        WHERE i.o_orderdate >= TIMESTAMP '1996-01-01'
          AND NOT EXISTS (
            SELECT 1 FROM orders ex
            WHERE ex.o_orderdate < TIMESTAMP '1998-01-01'
              AND ex.o_orderkey = i.o_orderkey
          )
    """,
)
def s7_incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/J10 — the reference's idempotent incremental load filter: incoming
    batch minus already-loaded keys via left_anti
    (``function_app.py:305-312, 378-385``). Here "existing" is simulated as
    orders already loaded before 1998; "incoming" is the 1996+ window."""
    orders = load_table(spark, sf_dir, "orders")
    incoming = orders.filter(F.col("o_orderdate") >= "1996-01-01")
    existing = orders.filter(F.col("o_orderdate") < "1998-01-01")
    fresh = incremental_new_rows(incoming, existing, ["o_orderkey"])
    return fresh.select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("fecha"),
        "o_totalprice",
    )
