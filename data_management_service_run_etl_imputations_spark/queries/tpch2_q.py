"""TPC-H completion: the remaining public query shapes (Q2, Q6, Q8, Q9,
Q11, Q12, Q15, Q16, Q20, Q21) over the driver testdata.

The driver schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns, so the queries
that reference them are ADAPTED — ``lineitem`` serves as the part-supplier
link (``l_partkey``/``l_suppkey``), supply cost is proxied from
``p_retailprice``, and "late" is ``l_shipdate`` vs ``o_orderdate`` — while
keeping the plan shape each query is famous for:

- Q2  — correlated MIN subquery (cheapest supplier per part in a region)
- Q6  — pure scan-filter-aggregate (the pushdown benchmark)
- Q8  — two-role dimension routing + conditional ratio by year
- Q9  — profit expression over a fan-in join, grouped by nation × year
- Q11 — group-by HAVING against a global scalar aggregate
- Q12 — late-shipment CASE-sum pivot by line status
- Q15 — aggregate joined against its own MAX (top-supplier view)
- Q16 — COUNT(DISTINCT) with a NOT-IN supplier exclusion
- Q20 — nested semi-join behind a correlated-aggregate threshold
- Q21 — multi-EXISTS/NOT-EXISTS (only-late-supplier on multi-supplier
        orders), implemented aggregate-style so the fact table is scanned
        once instead of three-way self-joined

All pure DataFrame API; dimension sides broadcast; every query has a
DuckDB oracle (Q21's oracle deliberately uses the classic EXISTS form to
prove the single-scan aggregate rewrite equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT SUM(l_extendedprice * l_discount) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: scan → filter → single aggregate, zero joins. The benchmark for
    predicate pushdown: all three conjuncts reach the parquet scan as
    PushedFilters, and the sum is a one-stage partial+final aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
        SELECT o_year,
               SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                   / SUM(volume) AS mkt_share
        FROM (
            SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem l
            JOIN part p     ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
            JOIN region r   ON r.r_regionkey = n1.n_regionkey
            JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
            WHERE r.r_name = 'AMERICA'
              AND p.p_type = 'ECONOMY'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        ) AS all_nations
        GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: nation joined twice under different roles (customer's
    region gates the rows; supplier's nation feeds the numerator), then a
    conditional-ratio aggregate per year. All five dimension joins
    broadcast; the fact side shuffles only for the final year grouping."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum("volume")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
        SELECT n.n_name AS nation,
               EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
               SUM(l.l_extendedprice * (1 - l.l_discount)
                   - 0.05 * p.p_retailprice * l.l_quantity) AS sum_profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (adapted): profit per supplier-nation per year for a
    part-name slice. No ``partsupp`` in the testdata, so supply cost is
    proxied as ``5% of p_retailprice`` per unit — the plan shape (selective
    dimension filter driving a multi-join into a two-key agg) is intact.
    The part filter broadcasts; orders joins on the fact's order key."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.05) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).alias("sum_profit"))
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, o.unit_cost
        FROM part p
        JOIN offers o   ON o.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = o.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
          AND r.r_name = 'EUROPE'
          AND o.unit_cost = (
              SELECT MIN(o2.unit_cost)
              FROM offers o2
              JOIN supplier s2 ON s2.s_suppkey = o2.l_suppkey
              JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
              JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
              WHERE o2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 20
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (adapted): cheapest supplier per part within a region via a
    correlated MIN. No ``partsupp``, so the offer table is derived from
    lineitem (min observed unit price per part×supplier). The correlated
    subquery becomes a window MIN over the region-filtered offers — one
    shuffle on part key, no re-join against a second aggregate."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    regional = (
        offers.join(F.broadcast(s), offers.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("l_partkey")
    best = regional.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(20)
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
        WITH natl AS (
            SELECT l.l_partkey,
                   SUM(l.l_quantity * p.p_retailprice) AS part_value
            FROM lineitem l
            JOIN part p     ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, part_value
        FROM natl
        WHERE part_value > 0.002 * (SELECT SUM(part_value) FROM natl)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (adapted): per-part value within one nation, kept only if
    it exceeds a fraction of the nation's total — HAVING against a global
    scalar aggregate. The scalar re-aggregates the already-grouped frame
    (tiny) and broadcasts via a 1-row cross join; the fact table is
    scanned and shuffled exactly once."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natl = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("part_value"))
    )
    total = natl.agg(F.sum("part_value").alias("total_value"))
    return (
        natl.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.002 * F.col("total_value"))
        .select("l_partkey", "part_value")
    )


@register(
    "tpch_q12_late_shipments",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_linestatus
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (adapted): late lines pivoted into priority-class counts.
    No ``l_shipmode``/``l_commitdate``, so "late" is shipped >45 days after
    order date and the grouping key is ``l_linestatus``. The join predicate
    correlates fact columns from both sides (ship vs order date); the
    CASE-sum pair is the classic conditional pivot without a shuffle per
    class."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON r.supplier_no = s.s_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: an aggregate view joined against its own MAX (the
    classic top-supplier query; ties all surface, no arbitrary pick). The
    MAX is a 1-row broadcast cross join over the 100-row revenue frame —
    lineitem is scanned once."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#3'
          AND p.p_type NOT LIKE 'PROMO%'
          AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (adapted): distinct-supplier counts per part attribute
    triple, excluding a supplier blacklist. ``lineitem`` is the
    part-supplier link (no ``partsupp``); the NOT IN becomes a broadcast
    left-anti join (safe here: s_suppkey is non-null, so NOT IN and ANTI
    agree). COUNT(DISTINCT) expands to the standard two-phase distinct
    aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_shippers",
    oracle="""
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
          AND s.s_suppkey IN (
              SELECT l.l_suppkey
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_name LIKE 'red%'
                AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                AND l.l_shipdate <  TIMESTAMP '1998-01-01'
              GROUP BY l.l_suppkey, l.l_partkey
              HAVING SUM(l.l_quantity) > 25
          )
        ORDER BY s.s_name
    """,
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (adapted): suppliers reached through a nested semi-join
    whose inner side is gated by a correlated-aggregate threshold (shipped
    >25 units of some 'red' part in 1997). No ``partsupp``/availqty, so
    the threshold is on shipped quantity. Plans as agg → HAVING →
    distinct-key semi-join into the broadcast-filtered supplier dim."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    heavy = (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 25)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (adapted): suppliers who were the ONLY late supplier on a
    multi-supplier finished order ("late" = shipped >60 days after order
    date; no receipt/commit dates in the testdata). The classic form is a
    triple self-join (EXISTS + NOT EXISTS — kept verbatim in the oracle);
    here it is rewritten as a single-scan aggregate: per (order, supplier)
    mark lateness and count each line, then per order count distinct and
    late-distinct suppliers — orders with ≥2 suppliers and exactly 1 late
    supplier attribute every late LINE (COUNT(*) in the oracle counts l1
    rows) to that supplier. One shuffle on order key instead of three
    fact-fact joins — the rewrite that matters at 100 TB."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lines = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast(
            "int"
        ),
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum("is_late").alias("late_lines"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    culprit = (
        per_supp.filter(F.col("supp_late") == 1)
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
    )
    return (
        culprit.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
