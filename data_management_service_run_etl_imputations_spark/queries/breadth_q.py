"""Breadth coverage: the remaining SQL-surface shapes a user of a general
analytics engine reaches for — pivot, correlated subqueries, exact
percentiles, string-distance, map/array manipulation, conditional
aggregation. All oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table


@register(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS f_total,
               ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS o_total,
               ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS p_total
        FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order totals by priority × status. Explicit pivot
    values keep the plan one-pass (no extra distinct scan)."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("f_total"),
        F.col("O").alias("o_total"),
        F.col("P").alias("p_total"),
    )


@register(
    "correlated_exists_subquery",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
    """,
)
def correlated_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS correlated subqueries via the SQL frontend —
    Catalyst decorrelates both into semi/anti joins."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders_v o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
        """
    )


@register(
    "scalar_correlated_subquery",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o2.o_totalprice) FROM orders o2
                                     WHERE o2.o_custkey = o.o_custkey), 6)
                   AS diff_from_cust_avg
        FROM orders o
    """,
)
def scalar_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-row aggregate of a sibling set) —
    decorrelated by Catalyst into an aggregate + join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sc_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o2.o_totalprice) FROM orders_sc_v o2
                                     WHERE o2.o_custkey = o.o_custkey), 6)
                   AS diff_from_cust_avg
        FROM orders_sc_v o
        """
    )


@register(
    "agg_exact_percentiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
               ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (`percentile` = sort-based;
    at 100 TB swap for approx_percentile's one-pass sketch)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "string_distance_levenshtein",
    oracle="""
        SELECT p.p_partkey,
               levenshtein(p.p_brand, 'Brand#33') AS dist_to_brand33,
               CASE WHEN levenshtein(p.p_brand, 'Brand#33') <= 1
                    THEN 'near' ELSE 'far' END AS proximity
        FROM part p
    """,
)
def string_distance_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance scalar (the fuzzy-matching companion to the J6
    containment join)."""
    part = load_table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_brand"), F.lit("Brand#33"))
    return part.select(
        "p_partkey",
        dist.alias("dist_to_brand33"),
        F.when(dist <= 1, "near").otherwise("far").alias("proximity"),
    )


@register(
    "map_array_manipulation",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               len(string_split(event_type, '')) AS type_chars,
               array_to_string(list_sort(string_split(event_type, '')), '') AS sorted_chars,
               list_contains(string_split('signup purchase', ' '), event_type)
                   AS is_conversion
        FROM events
    """,
)
def map_array_manipulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: split/sort/join/contains over derived arrays (SURVEY
    §1.3: arrays/maps supported beyond the reference's scalar-only types)."""
    events = load_table(spark, sf_dir, "events")
    chars = F.filter(F.split("event_type", ""), lambda c: c != "")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.size(chars).cast("long").alias("type_chars"),
        F.array_join(F.array_sort(chars), "").alias("sorted_chars"),
        F.array_contains(F.split(F.lit("signup purchase"), " "), F.col("event_type")).alias(
            "is_conversion"
        ),
    )


@register(
    "conditional_aggregation",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS n_errors,
               ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 6)
                   AS purchase_value,
               ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6)
                   AS avg_click_value
        FROM events GROUP BY user_id
    """,
)
def conditional_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-style conditional aggregates (count/sum/avg over predicated
    subsets in one pass)."""
    events = load_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return events.groupBy("user_id").agg(
        F.count(F.when(is_purchase, 1)).alias("n_purchases"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.round(F.sum(F.when(is_purchase, F.col("value"))), 6).alias("purchase_value"),
        F.round(F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 6).alias(
            "avg_click_value"
        ),
    )


@register(
    "window_analytics_extended",
    oracle="""
        SELECT c_custkey,
               c_mktsegment,
               ntile(4) OVER w AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_analytics_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-analytic window battery: ntile / percent_rank /
    cume_dist per market segment. The (acctbal, custkey) order makes every
    row its own peer group — deterministic across engines. One window
    partition = one shuffle; all three functions share the sort."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "unpivot_nation_metrics",
    oracle="""
        WITH m AS (
            SELECT c_nationkey,
                   CAST(COUNT(*) AS DOUBLE) AS n_customers,
                   SUM(c_acctbal) AS total_bal,
                   AVG(c_acctbal) AS avg_bal
            FROM customer GROUP BY c_nationkey
        )
        SELECT c_nationkey, 'n_customers' AS metric,
               ROUND(n_customers, 6) AS metric_value FROM m
        UNION ALL
        SELECT c_nationkey, 'total_bal', ROUND(total_bal, 6) FROM m
        UNION ALL
        SELECT c_nationkey, 'avg_bal', ROUND(avg_bal, 6) FROM m
    """,
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-nation metrics to long (nation, metric,
    value) triples — the inverse of pivot. Spark's native unpivot is a
    zero-shuffle Expand node over the aggregated (already tiny) frame."""
    customer = load_table(spark, sf_dir, "customer")
    wide = customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.sum("c_acctbal").alias("total_bal"),
        F.avg("c_acctbal").alias("avg_bal"),
    )
    return wide.unpivot(
        ["c_nationkey"],
        ["n_customers", "total_bal", "avg_bal"],
        "metric",
        "metric_value",
    ).select(
        "c_nationkey", "metric", F.round("metric_value", 6).alias("metric_value")
    )


@register(
    "agg_collect_sorted_set",
    oracle="""
        SELECT c_nationkey,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|')
                   AS segments,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        FROM customer GROUP BY c_nationkey
    """,
)
def agg_collect_sorted_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation: sorted distinct segment list per nation.
    collect_set is an unordered accumulator — array_sort makes the result
    deterministic (never rely on collect_set order). Emitted as a
    '|'-joined string: the driver's canonicalizer sorts rows by every
    column, and ndarray cells are unhashable — output columns must be
    scalar."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("c_mktsegment"))).alias(
            "segments"
        ),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )


@register(
    "funnel_view_to_purchase",
    oracle="""
        WITH fv AS (
            SELECT user_id, MIN(ts) AS first_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        fp AS (
            SELECT e.user_id, MIN(e.ts) AS first_purchase
            FROM events e JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'purchase' AND e.ts > fv.first_view
            GROUP BY e.user_id
        )
        SELECT fv.user_id, fv.first_view, fp.first_purchase,
               fp.first_purchase IS NOT NULL AS converted
        FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (product-analytics staple): per user, the first
    'view' and the first 'purchase' strictly AFTER that view (ordering
    matters — a purchase before any view is not a conversion). One
    unpartitioned-window-free plan: a per-user min aggregate, a same-key
    join back onto purchases (reuses the user_id hash partitioning), and
    a second per-user min — no window over raw events needed."""
    events = load_table(spark, sf_dir, "events")
    fv = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return fv.join(fp, "user_id", "left").select(
        "user_id",
        "first_view",
        "first_purchase",
        F.col("first_purchase").isNotNull().alias("converted"),
    )


@register(
    "agg_rollup_status_priority",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) → (status) → grand total in one
    aggregation pass. Spark expands the rollup into grouping sets executed
    as a single shuffle with partial aggregation — no per-level rescan of
    the fact table (the naive UNION ALL alternative scans it once per
    level)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


@register(
    "agg_cube_flag_status",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(SUM(l_quantity), 4) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations in
    one pass. Same single-shuffle grouping-sets expansion as ROLLUP; the
    cube lattice is produced by replicating each input row into its
    grouping sets map-side, so the fact table is still scanned once."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@register(
    "sketch_hll_distinct_rollup",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
               true AS est_ok
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '__all__', COUNT(DISTINCT user_id), true FROM events
    """,
)
def sketch_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    ``hll_sketch_agg``/``hll_union_agg``): per-event-type user sketches,
    then a global estimate by UNIONING THE SKETCHES — never re-scanning
    the input. This is the two-level rollup that replaces exact
    COUNT(DISTINCT) at 100 TB: partial sketches per shard/day are tiny
    (~KB), merge associatively, and land in a serving store; the exact
    count here exists only to verify the estimate.

    Oracle shape (same pattern as the ANN recall oracles): the sketch
    estimate is deterministic for fixed input, so the query emits the
    exact count plus an ``est_ok`` bound check (|est - exact| ≤ 5%·exact;
    default lgConfigK=12 gives ~1.6% rse) and the oracle recomputes the
    exact side in plain SQL with ``true`` expected."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    glob = per.agg(
        F.hll_union_agg("sk").alias("sk"),
        # exact global from the per-type exacts is NOT summable (users
        # overlap types) — recompute over the distinct pairs' parent; at
        # scale this column exists only in the verification harness.
        F.lit(None).cast("long").alias("n_exact"),
    ).withColumn("event_type", F.lit("__all__"))
    glob_exact = ev.agg(F.count_distinct("user_id").alias("g")).select("g")
    rows = per.select("event_type", "n_exact", "sk").unionByName(
        glob.join(F.broadcast(glob_exact))
        .select("event_type", F.col("g").alias("n_exact"), "sk")
    )
    est = F.hll_sketch_estimate("sk")
    return rows.select(
        "event_type",
        "n_exact",
        (
            F.abs(est - F.col("n_exact"))
            <= F.lit(0.05) * F.col("n_exact")
        ).alias("est_ok"),
    )


@register(
    "udaf_weighted_mean",
    oracle="""
        WITH t AS (
            SELECT event_type,
                   CAST(ROUND(value, 0) AS BIGINT) AS v,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS w
            FROM events
        )
        SELECT event_type,
               ROUND(CAST(SUM(v * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6)
                   AS weighted_mean_value,
               CAST(SUM(w) AS BIGINT) AS total_weight
        FROM t GROUP BY event_type
    """,
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 UDAF surface: a GROUPED_AGG pandas UDF (custom Arrow-batched
    aggregate — the fourth UDF shape) computing the k-weighted mean event
    value per type. Integer-scaled inputs keep the sums exact int64 in
    both engines, so a custom PYTHON aggregate is still oracle-checkable
    bit-for-bit (operators/aggregates.py weighted_mean_udaf; the plan is
    a normal hash aggregate with an AggregateInPandas exec)."""
    from data_management_service_run_etl_imputations_spark.operators.aggregates import (
        int_sum_udaf,
        weighted_mean_udaf,
    )

    events = load_table(spark, sf_dir, "events")
    t = events.select(
        "event_type",
        F.round("value", 0).cast("long").alias("v"),
        F.get_json_object("props", "$.k").cast("long").alias("w"),
    )
    wm = weighted_mean_udaf()
    ws = int_sum_udaf()
    return t.groupBy("event_type").agg(
        F.round(wm("v", "w"), 6).alias("weighted_mean_value"),
        ws("w").alias("total_weight"),
    )
