"""Data-profiling and runtime-filtering queries — the observability layer
a 100 TB ingest pipeline runs BEFORE trusting a new data drop: per-column
profiles (null/distinct/min/max in one scan), fixed-bin value histograms,
and a runtime Bloom-filter join (Spark's row-level runtime filtering for
selective dim→fact joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table


@register(
    "dq_profile_orders",
    oracle="""
        SELECT 'o_custkey' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
               CAST(MAX(o_custkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders
    """,
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: null count, exact distinct count, min and max for
    several columns in ONE aggregation over ONE scan (the oracle's
    UNION ALL rescans per column — the naive form this operator replaces).
    Values are stringified so heterogeneous column types stack into one
    report frame. Multiple COUNT(DISTINCT)s expand via Spark's single-pass
    expand-and-aggregate, not one job per column."""
    o = load_table(spark, sf_dir, "orders")

    def stats(col: str):
        return [
            F.count(F.lit(1)).alias(f"{col}__n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__n_nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__n_distinct"),
            F.min(col).cast("string").alias(f"{col}__min_value"),
            F.max(col).cast("string").alias(f"{col}__max_value"),
        ]

    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [a for c in cols for a in stats(c)]
    wide = o.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n_rows").alias("n_rows"),
            F.col(f"{c}__n_nulls").alias("n_nulls"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_value").alias("min_value"),
            F.col(f"{c}__max_value").alias("max_value"),
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionAll(p)
    return out


@register(
    "value_histogram_totalprice",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(MIN(o_totalprice), 4) AS bin_min,
               ROUND(MAX(o_totalprice), 4) AS bin_max
        FROM orders
        GROUP BY bin
    """,
)
def value_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (the profiling companion to the exact
    percentiles query): bin id is a pure projection, so the histogram is
    one partial-aggregated shuffle regardless of bin count — unlike
    ``histogram_numeric`` whose adaptive bins are nondeterministic and
    unverifiable cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("bin_min"),
            F.round(F.max("o_totalprice"), 4).alias("bin_max"),
        )
    )


@register(
    "bloom_filter_join_pruned",
    oracle="""
        SELECT l.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
        GROUP BY l.l_returnflag
    """,
)
def bloom_filter_join_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim-side filter driving a fact join with runtime row-level
    Bloom filtering enabled: Spark injects a bloom-filter aggregate on the
    filtered orders side and applies ``might_contain`` at the lineitem
    scan, discarding non-matching fact rows BEFORE the join shuffle. At
    100 TB this is the mechanism that turns a 2%-selective dim filter into
    a ~98% fact-shuffle reduction without bucketing or manual semi-join
    staging. At test scale the filtered dim is broadcast-able, so Spark
    correctly skips the bloom filter (it only benefits shuffle joins) and
    the plan degenerates to broadcast-hash — tests/test_scale_plans.py
    proves injection under the 100 TB condition by disabling
    auto-broadcast. The result is identical either way: the filter only
    prunes rows the join would drop."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


@register(
    "dq_expectations_orders",
    oracle="""
        WITH flags AS (
            SELECT o.o_totalprice, o.o_orderdate, o.o_orderstatus,
                   (c.c_custkey IS NOT NULL) AS fk_ok,
                   COUNT(*) OVER (PARTITION BY o.o_orderkey) = 1 AS key_unique
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        wide AS (
            SELECT COUNT(*) AS n_rows,
                   SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE)
                            THEN 0 ELSE 1 END) AS positive_price,
                   SUM(CASE WHEN COALESCE(
                            EXTRACT(YEAR FROM o_orderdate) BETWEEN 1992 AND 1998,
                            FALSE) THEN 0 ELSE 1 END) AS orderdate_in_range,
                   SUM(CASE WHEN COALESCE(
                            o_orderstatus IN ('O', 'F', 'P'), FALSE)
                            THEN 0 ELSE 1 END) AS status_in_domain,
                   SUM(CASE WHEN COALESCE(fk_ok, FALSE)
                            THEN 0 ELSE 1 END) AS custkey_references_customer,
                   SUM(CASE WHEN COALESCE(key_unique, FALSE)
                            THEN 0 ELSE 1 END) AS orderkey_unique
            FROM flags
        )
        SELECT r.rule, w.n_rows, r.n_violations,
               ROUND(CAST(w.n_rows - r.n_violations AS DOUBLE) / w.n_rows, 6)
                   AS pass_rate
        FROM wide w, LATERAL (VALUES
            ('positive_price', CAST(positive_price AS BIGINT)),
            ('orderdate_in_range', CAST(orderdate_in_range AS BIGINT)),
            ('status_in_domain', CAST(status_in_domain AS BIGINT)),
            ('custkey_references_customer',
             CAST(custkey_references_customer AS BIGINT)),
            ('orderkey_unique', CAST(orderkey_unique AS BIGINT))
        ) AS r(rule, n_violations)
    """,
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based expectations gate over orders (the Great-Expectations /
    Delta-constraints shape): range, domain, referential-integrity, and
    key-uniqueness rules validated in ONE aggregate pass (each rule is a
    CASE-fold counter in the same scan; the FK flag is a broadcast left
    join, uniqueness a per-key window). NULL rule results count as
    violations — unknown is not a pass
    (operators/quality.py validate_expectations)."""
    from pyspark.sql import Window

    from data_management_service_run_etl_imputations_spark.operators.quality import (
        validate_expectations,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("__ck")
    )
    flagged = (
        orders.join(
            F.broadcast(customer),
            orders["o_custkey"] == F.col("__ck"),
            "left",
        )
        .withColumn("__fk_ok", F.col("__ck").isNotNull())
        .withColumn(
            "__key_unique",
            F.count(F.lit(1)).over(Window.partitionBy("o_orderkey")) == 1,
        )
    )
    return validate_expectations(
        flagged,
        {
            "positive_price": F.col("o_totalprice") > 0,
            "orderdate_in_range": F.year("o_orderdate").between(1992, 1998),
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "custkey_references_customer": F.col("__fk_ok"),
            "orderkey_unique": F.col("__key_unique"),
        },
    )


@register(
    "dq_quarantine_orders",
    oracle="""
        WITH t AS (
            SELECT (NOT COALESCE(o_totalprice < 400000, FALSE)) AS v_cap,
                   (NOT COALESCE(o_orderstatus <> 'P', FALSE)) AS v_status,
                   (NOT COALESCE(o_orderpriority LIKE '_-%', FALSE)) AS v_prio
            FROM orders
        )
        SELECT 'totalprice_under_cap' AS rule,
               CAST(SUM(CASE WHEN v_cap THEN 1 ELSE 0 END) AS BIGINT) AS n_rows
        FROM t
        UNION ALL SELECT 'status_not_pending',
               CAST(SUM(CASE WHEN v_status THEN 1 ELSE 0 END) AS BIGINT) FROM t
        UNION ALL SELECT 'priority_format',
               CAST(SUM(CASE WHEN v_prio THEN 1 ELSE 0 END) AS BIGINT) FROM t
        UNION ALL SELECT '__pass__',
               CAST(SUM(CASE WHEN NOT v_cap AND NOT v_status AND NOT v_prio
                         THEN 1 ELSE 0 END) AS BIGINT) FROM t
        UNION ALL SELECT '__quarantined__',
               CAST(SUM(CASE WHEN v_cap OR v_status OR v_prio
                         THEN 1 ELSE 0 END) AS BIGINT) FROM t
    """,
)
def dq_quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level QUARANTINE gate (VERDICT r04 #5): orders are split into
    pass/quarantine by route_expectations; quarantined rows carry the
    array of failed rules — the audit trail whose absence is the
    reference's silent-drop defect (function_app.py:227,268). Output:
    per-rule quarantined-row counts plus __pass__/__quarantined__ totals,
    all from ONE scan of the tagged frame (array_contains counters folded
    into a single aggregate; the tag itself is shuffle-free per-row
    expressions — operators/quality.py with_expectations)."""
    from data_management_service_run_etl_imputations_spark.operators.quality import (
        with_expectations,
    )

    orders = load_table(spark, sf_dir, "orders")
    rules = {
        "totalprice_under_cap": F.col("o_totalprice") < 400000,
        "status_not_pending": F.col("o_orderstatus") != "P",
        "priority_format": F.col("o_orderpriority").like("_-%"),
    }
    tagged = with_expectations(orders, rules)
    aggs = [
        F.sum(F.array_contains("failed_rules", name).cast("long")).alias(name)
        for name in rules
    ]
    wide = tagged.agg(
        *aggs,
        F.sum((F.size("failed_rules") == 0).cast("long")).alias("__pass__"),
        F.sum((F.size("failed_rules") > 0).cast("long")).alias(
            "__quarantined__"
        ),
    )
    names = [*rules, "__pass__", "__quarantined__"]
    stack_expr = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.select(
        F.expr(f"stack({len(names)}, {stack_expr}) AS (rule, n_rows)")
    )
