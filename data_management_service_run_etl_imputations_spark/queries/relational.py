"""Relational operator coverage: joins (J1-J10), aggregations (A1-A4),
window functions (§2.5), sorts/limits/set ops (§2.6), grouping sets.

Each query names the SURVEY.md §2 inventory row it implements and cites the
reference line it generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.aggregates import (
    dedup_keep_last,
    latest_per_key,
)
from data_management_service_run_etl_imputations_spark.operators.joins import (
    fuzzy_containment_lookup,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table

# --- joins ----------------------------------------------------------------


@register(
    "j1_inner_equi_join",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
    """,
)
def j1_inner_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 — inner equi-join fact→dim (reference merges time_entries ⋈
    employees twice on the same key, ``function_app.py:163, 174``; the engine
    folds repeated same-key merges into one broadcast join)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@register(
    "j3_left_outer_join",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
        FROM customer c
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j3_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J5/J7-J9 — left outer equi-join chain (reference left-joins
    employees→nid map→latest-department, ``function_app.py:224, 266, 329-338``)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "j10_semi_anti_join",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CASE WHEN EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey)
                    THEN 'has_orders' ELSE 'no_orders' END AS order_presence
        FROM customer c
    """,
)
def j10_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — semi/anti join surface (reference uses only the negated form for
    incremental load, ``function_app.py:308, 381``). Implemented as
    left_semi ∪ left_anti with a provenance tag, proving both halves
    partition the input exactly."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select("o_custkey")
    has = (
        customer.join(keys, customer.c_custkey == keys.o_custkey, "left_semi")
        .withColumn("order_presence", F.lit("has_orders"))
    )
    hasnt = (
        customer.join(keys, customer.c_custkey == keys.o_custkey, "left_anti")
        .withColumn("order_presence", F.lit("no_orders"))
    )
    return has.unionByName(hasnt).select("c_custkey", "c_name", "order_presence")


@register(
    "j6_fuzzy_containment_lookup",
    headline=True,
    oracle="""
        WITH kw(kid, name, ord) AS (
            VALUES (10, 'spark', 1), (20, 'window', 2), (30, 'vector', 3),
                   (40, 'customer', 4), (50, 'zzznever', 5)
        ),
        m AS (
            SELECT d.doc_id, arg_min(k.kid, k.ord) AS keyword_id
            FROM documents d
            LEFT JOIN kw k ON position(k.name IN lower(d.text)) > 0
            GROUP BY d.doc_id
        )
        SELECT doc_id, keyword_id FROM m
    """,
)
def j6_fuzzy_containment_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — the reference's fuzzy containment lookup (``get_field_id``,
    ``function_app.py:233-256``, applied :258, :268, :335, :345): first dim
    row, in dim order, whose text is a case-insensitive substring of the fact
    string; null when none. Broadcast theta-join + first-match window — no
    Python in the hot path (the reference runs an O(fact×dim) iterrows loop).
    """
    docs = load_table(spark, sf_dir, "documents")
    # VALUES literal (LocalRelation), not createDataFrame (Python RDD):
    # the operator's bounded plan-time dim probe then collects driver-side
    # with no Spark job — same reasoning as plans/fixtures.py.
    dim = spark.sql(
        "SELECT * FROM VALUES (10, 'spark', 1), (20, 'window', 2), "
        "(30, 'vector', 3), (40, 'customer', 4), (50, 'zzznever', 5) "
        "AS t(kid, name, ord)"
    )
    out = fuzzy_containment_lookup(
        docs,
        dim,
        fact_text="text",
        dim_text="name",
        dim_id="kid",
        out_col="keyword_id",
        dim_order="ord",
        fact_key="doc_id",
    )
    return out.select("doc_id", "keyword_id")


# --- aggregations -----------------------------------------------------------


@register(
    "a1_dedup_keep_last",
    oracle="""
        SELECT c_nationkey,
               MAX(c_custkey) AS last_custkey,
               ARG_MAX(c_name, c_custkey) AS last_name
        FROM customer GROUP BY c_nationkey
    """,
)
def a1_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — dedup keep-last (reference: ``groupby('DNI').agg({'empleado_id':
    'last'})``, ``function_app.py:200-202``, order-dependent). Deterministic
    rendering: last = first row under an explicit descending order."""
    customer = load_table(spark, sf_dir, "customer")
    return dedup_keep_last(
        customer, ["c_nationkey"], [F.desc("c_custkey")]
    ).select(
        "c_nationkey",
        F.col("c_custkey").alias("last_custkey"),
        F.col("c_name").alias("last_name"),
    )


@register(
    "a2_argmax_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey AS latest_orderkey,
               CAST(o_orderdate AS DATE) AS latest_orderdate, o_totalprice
        FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def a2_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — keep the full latest row per group (reference: ``idxmax`` on
    ``updated_at`` + ``.loc``, ``function_app.py:263-264``). Window top-1;
    Spark's WindowGroupLimit prunes to per-partition candidates pre-shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    latest = latest_per_key(
        orders, ["o_custkey"], [F.desc("o_orderdate"), F.desc("o_orderkey")]
    )
    return latest.select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.to_date("o_orderdate").alias("latest_orderdate"),
        "o_totalprice",
    )


@register(
    "a3_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity)       AS sum_qty,
               SUM(l_extendedprice)  AS sum_base_price,
               SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               AVG(l_quantity)       AS avg_qty,
               AVG(l_extendedprice)  AS avg_price,
               AVG(l_discount)       AS avg_disc,
               COUNT(*)              AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def a3_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — multi-aggregate group-by (reference: first×6 + sum,
    ``function_app.py:277-285``), generalized to the TPC-H Q1 pricing-summary
    shape: filter → hash aggregate with map-side partial combine."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a4_daily_user_totals",
    oracle="""
        SELECT user_id, CAST(ts AS DATE) AS fecha,
               SUM(value) AS total_value, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
)
def a4_daily_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — multi-column grouped sums (reference sums three seconds counters
    per (employeeId, date), ``function_app.py:322-326``)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        "user_id", F.to_date("ts").alias("fecha")
    ).agg(F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events"))


@register(
    "agg_distinct_counts",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (not in the reference; engine surface per SURVEY
    §2.4 closing note). Spark expands to a two-phase partial-distinct plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_n_part,
               TRUE AS approx_within_5pct
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct count (HLL++, rsd=0.01) — the 100 TB substitute
    for exact COUNT(DISTINCT). Oracle = a deterministic error-bound
    invariant: per group, the HLL++ estimate must land within 5% of the
    exact count (5× the configured rsd — wide margin, and HLL++ is
    deterministic for fixed data). The exact count is also returned and
    value-checked, so the query demonstrates both paths side by side."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_n_part"),
        F.approx_count_distinct("l_partkey", 0.01).alias("__approx"),
    ).select(
        "l_returnflag",
        "exact_n_part",
        (
            F.abs(F.col("__approx") - F.col("exact_n_part"))
            <= 0.05 * F.col("exact_n_part")
        ).alias("approx_within_5pct"),
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (engine surface; free via Catalyst Expand)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "agg_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               SUM(o_totalprice) AS total_price, COUNT(*) AS n_orders
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (engine surface)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum("o_totalprice").alias("total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- windows ---------------------------------------------------------------


@register(
    "window_rank_lag_running",
    headline=True,
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber,
                                     l_quantity, l_partkey, l_suppkey) AS price_rank,
               LAG(l_quantity) OVER w AS prev_qty,
               LEAD(l_quantity) OVER w AS next_qty,
               SUM(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS running_qty
        FROM lineitem
        -- (orderkey, linenumber) is NOT unique in the synthetic data; the
        -- full tuple below is — required for a deterministic oracle match.
        WINDOW w AS (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_quantity, l_extendedprice,
                              l_partkey, l_suppkey)
    """,
)
def window_rank_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 — ranking / offset / frame windows in one pass (the reference's
    A1/A2/J6 are all window-shaped; this exposes the full surface). All four
    expressions share one (partition, order) → a single shuffle+sort."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"
    )
    w_price = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"),
        F.asc("l_linenumber"),
        F.asc("l_quantity"),
        F.asc("l_partkey"),
        F.asc("l_suppkey"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_price).alias("price_rank"),
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.sum("l_quantity")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_qty"),
    )


# --- sorts / limits / top-k / set ops ---------------------------------------


@register(
    "topk_customers_by_revenue",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        ORDER BY revenue DESC, c_custkey
        LIMIT 10
    """,
    headline=True,
)
def topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 — global top-k: agg → orderBy → limit. Spark plans TakeOrdered
    (per-partition heaps, no global sort materialization) — the scale-safe
    top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # Narrow-key aggregate: group on o_custkey alone and attach c_name via
    # broadcast AFTER the aggregate (c_name is functionally dependent on the
    # customer primary key) — the revenue shuffle carries no string payload;
    # the join still precedes the limit, so custkey-absent groups drop
    # exactly as before. TakeOrdered then runs over the joined aggregate.
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        agg.join(F.broadcast(customer.select("c_custkey", "c_name")), "c_custkey")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", "revenue")
    )


@register(
    "setops_intersect_except",
    oracle="""
        SELECT c_custkey, 'both_statuses' AS tag FROM (
            SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        UNION ALL
        SELECT c_custkey, 'open_only' AS tag FROM (
            SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
    """,
)
def setops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 — INTERSECT / EXCEPT (absent in the reference; the engine surface
    includes them — EXCEPT is the set-level twin of the S7 anti-join)."""
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    done_keys = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = open_keys.intersect(done_keys).withColumn("tag", F.lit("both_statuses"))
    # subtract == SQL EXCEPT (distinct semantics); exceptAll would keep
    # multiplicity and diverge from the oracle.
    only_open = open_keys.subtract(done_keys).withColumn("tag", F.lit("open_only"))
    return both.unionByName(only_open)
