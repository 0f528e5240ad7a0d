"""Advanced operator coverage beyond the reference surface: as-of join,
bucketed interval join, GROUPING SETS, pandas_udf, forced sort-merge join,
and two TPC-H-classic multi-way join shapes (Q3/Q5)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.asof import (
    asof_join,
    interval_join_bucketed,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table


@register(
    "asof_join_last_signup",
    headline=True,
    oracle="""
        SELECT p.event_id, p.user_id, p.ts,
               s.ts AS asof_ts, s.value AS asof_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively): each purchase gets the
    user's most recent signup at-or-before it. Implemented as tag + union +
    single per-key sort + forward fill — one shuffle, no range theta-join.
    Oracle: DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    signups = events.filter(F.col("event_type") == "signup")
    out = asof_join(
        purchases.select("event_id", "user_id", "ts"),
        signups.select("user_id", "ts", "value"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["ts", "value"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_ts"), F.col("asof_value"),
    )


@register(
    "interval_join_error_windows",
    oracle="""
        WITH windows AS (
            SELECT date_trunc('hour', ts) AS w_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end
            FROM events WHERE event_type = 'error'
            GROUP BY 1
        )
        SELECT e.event_id, w.w_start, e.value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        JOIN windows w ON e.ts >= w.w_start AND e.ts < w.w_end
    """,
)
def interval_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join via time-bucketing: purchases falling inside
    error-hours. The range predicate becomes an equi-join on the hour
    bucket + residual filter — no BroadcastNestedLoopJoin."""
    events = load_table(spark, sf_dir, "events")
    windows = (
        events.filter(F.col("event_type") == "error")
        .select(F.date_trunc("hour", "ts").alias("w_start"))
        .distinct()
        .withColumn("w_end", F.col("w_start") + F.expr("interval 1 hour"))
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    out = interval_join_bucketed(
        purchases, windows, "ts", "w_start", "w_end",
        bucket_seconds=3600,
        point_cols=["event_id", "ts", "value"],
        interval_cols=["w_start", "w_end"],
    )
    return out.select("event_id", "w_start", "value")


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (engine SQL surface; Catalyst Expand)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "pandas_udf_zscore",
    oracle="""
        SELECT event_id,
               ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                     / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6)
                   AS value_zscore
        FROM events
    """,
)
def pandas_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface (SURVEY §2.8): grouped-map ``applyInPandas`` (Arrow
    batches, vectorized numpy math) computing per-event-type z-scores. The
    sample-stddev window oracle proves numeric parity of the Arrow path.
    Built-ins would express this too — the point is exercising the
    vectorized Python boundary the engine allows."""

    def zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "value_zscore": ((v - v.mean()) / v.std(ddof=1)).round(6),
            }
        )

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").applyInPandas(
        zscore_group, "event_id long, value_zscore double"
    )


@register(
    "smj_large_large_join",
    oracle="""
        SELECT l.l_orderkey, COUNT(*) AS n_lines, SUM(l.l_quantity) AS sum_qty,
               MAX(o.o_totalprice) AS total_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
)
def smj_large_large_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large join with an explicit sort-merge hint — the strategy a
    100 TB lineitem⋈orders takes when neither side broadcasts. Locally the
    hint forces the same plan AQE would choose at scale, keeping the SMJ
    path exercised."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").hint("merge")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").alias("sum_qty"),
            F.max("o_totalprice").alias("total_price"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               CAST(o.o_orderdate AS DATE) AS o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-03-15'
          AND l.l_shipdate > TIMESTAMP '1997-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 20
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    Exercises filter pushdown on both join sides + TakeOrdered."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < "1997-03-15")
        .join(li, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > "1997-03-15")
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q5_local_volume",
    headline=True,
    oracle="""
        SELECT n.n_name,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join with a composite join condition and a
    region filter — the join-reordering/broadcast-selection stress test."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # lineitem is the LEFT (streamed) operand of every join it is in:
    # written dim-first, the static planner's pruned-column size estimate
    # put lineitem itself UNDER the 10 MB broadcast threshold at bench
    # scale and built a 600k-row hash relation of the fact table (guide
    # §3.1: check the build side). Fact-first, the smaller operand of each
    # join is the build side at any scale — broadcast when it fits, SMJ
    # via AQE when it doesn't — and lineitem streams through one codegen
    # stage with zero pre-aggregation exchanges.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .join(c, c.c_custkey == o.o_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
