"""TPC-H-style analytical queries over the driver's star schema
(TESTDATA.md). These exercise the same operator classes as the reference
inventory at bench scale (FIXTURES.md §3: lineitem/orders at sf0.1) and
are the bench headliners for multi-join / large-agg throughput.

Scale notes: scan-side filters and column pruning reach the parquet
reader (verified via explain — PushedFilters/ReadSchema); dim joins
(region/nation/customer at testdata ratios) broadcast; large joins
shuffle on their keys with AQE handling skew.

Rounding-for-parity rule: a SUM's round precision must be >= the exact
decimal precision of its terms (price*discount terms carry 4 decimals,
*(1+tax) carries 6). Rounding coarser (e.g. 2) puts exact .xx50 values
ON the rounding boundary, where Spark's HALF_UP and DuckDB's rounding
of nearest-double representations disagree — observed as last-cent
hash mismatches. At term precision every true value is >= 5e-5 from a
boundary while cross-engine FP association noise is ~1e-10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import memoized_build
from ..registry import register
from ..tables import load_table, maybe_broadcast


# Q1-style pricing summary: wide aggregation, map-side partials dominate.
@memoized_build("lineitem")
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "tpch_q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)(tpch_q1_pricing_summary)


# Q3-style shipping priority: selective dim filter → two joins → top-k.
@memoized_build("customer", "lineitem", "orders")
def tpch_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-reduce the broadcast side (r13, guide §3.1/§3.2): joining the
    # fact against broadcast(ALL orders) and then broadcast(customer)
    # built a full-orders hash relation (150 k rows collected per
    # execution at sf0.1) and probed every lineitem row twice. The
    # BUILDING segment keeps ~1/5 of customers, so fold the selective
    # dim INTO the broadcast side first: orders ⋈ broadcast(building
    # custkeys) → ~1/5 of orders, projected to the three carried
    # columns, becomes the ONE broadcast the fact probes. The fact-side
    # probe drops non-BUILDING lines immediately, so the aggregate and
    # its exchange see ~20% of the rows. Same inner-join chain, same
    # result set; plan: 2 fact-side BHJs → 1, broadcast build 150 k →
    # ~30 k rows.
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bo = orders.join(
        maybe_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(maybe_broadcast(bo, sf_dir, "orders"), li.l_orderkey == bo.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


register(
    "tpch_q3_top_orders",
    sql="""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)(tpch_q3_top_orders)


# Q5-style local-supplier revenue: 5-way join through region/nation dims.
@memoized_build("customer", "lineitem", "nation", "orders", "region", "supplier")
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)  # local-supplier rule
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


register(
    "tpch_q5_region_revenue",
    sql="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)(tpch_q5_region_revenue)


# Pivot-style order-priority count (exercises conditional agg / pivot shape).
def tpch_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


register(
    "tpch_order_priority_counts",
    sql="""
    SELECT o_orderpriority, count(*) AS n_orders,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)(tpch_order_priority_counts)


# Q6-style forecast revenue: the pushdown showcase — every predicate is a
# plain comparison that reaches the parquet reader, the agg is a single
# map-side-combined scalar. At 100 TB this query is pure scan bandwidth.
@memoized_build("lineitem")
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


register(
    "tpch_q6_forecast_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)(tpch_q6_forecast_revenue)


# Ranking-window analytics: top-3 orders per customer by revenue. The
# reference has no OVER-clause ranking (SURVEY.md §2.5) — this extends
# the engine's window surface (row_number over a keyed sort) with an
# exact oracle. Scale: one shuffle on o_custkey; the rank filter
# truncates each partition stream early (WindowGroupLimit pushdown).
@memoized_build("lineitem", "orders")
def tpch_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("revenue"), F.asc("o_orderkey")
    )
    return (
        orders.join(rev, orders.o_orderkey == rev.l_orderkey)
        .select("o_custkey", "o_orderkey", "revenue")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "revenue", "rk")
    )


# Q4-style priority check: the LEFT-SEMI join class (EXISTS). The reference
# has no semi-joins beyond the session gap test (SURVEY.md §2.3 note); this
# completes the engine's join surface with an exact oracle. Scale: the semi
# join deduplicates build-side keys before probing — no row multiplication,
# one shuffle pair on orderkey (or broadcast of the filtered side under AQE).
@memoized_build("lineitem", "orders")
def tpch_q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    "tpch_q4_priority_semijoin",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)(tpch_q4_priority_semijoin)


# Q16-flavored dead-stock report: the LEFT-ANTI join class (NOT EXISTS).
# Parts with no shipment in 1996H1, counted per type. Scale: anti join
# needs only the distinct probe-side keys — Spark builds a hash set of
# shipped partkeys (broadcastable once filtered+deduped) and streams parts.
def tpch_unsold_parts_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("l_partkey")
    )
    return (
        part.join(shipped, part.p_partkey == shipped.l_partkey, "left_anti")
        .groupBy("p_type")
        .agg(F.count("*").alias("unsold_parts"))
        .orderBy("p_type")
    )


register(
    "tpch_unsold_parts_anti",
    sql="""
    SELECT p_type, count(*) AS unsold_parts
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey
                        AND l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1996-07-01')
    GROUP BY p_type
    ORDER BY p_type
    """,
)(tpch_unsold_parts_anti)


# Q12-style priority split: conditional aggregation over a fact-fact join
# (CASE WHEN inside SUM). One shuffle on orderkey; the CASE evaluates in
# the same whole-stage-codegen pass as the join probe.
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


register(
    "tpch_q12_priority_lines",
    sql="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)(tpch_q12_priority_lines)


# Q14-style promo share: ratio of conditional sum to total over a
# lineitem ⋈ part join. Sums are rounded at term precision (4, see module
# docstring); the percentage divides the two ROUNDED sums so both engines
# divide bit-identical inputs — no cross-engine FP-association noise in
# the quotient.
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
    agg = joined.agg(
        F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev)), 4).alias(
            "promo_revenue"
        ),
        F.round(F.sum(rev), 4).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            100 * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


register(
    "tpch_q14_promo_revenue",
    sql="""
    WITH agg AS (
      SELECT round(sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) END), 4)
               AS promo_revenue,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-03-01'
    )
    SELECT promo_revenue, total_revenue,
           round(100 * promo_revenue / total_revenue, 6) AS promo_pct
    FROM agg
    """,
)(tpch_q14_promo_revenue)


# Q18-style large-volume orders: post-aggregation HAVING filter, then a
# join back to orders for context and a deterministic top-k. Scale: the
# HAVING prunes to a tiny key set BEFORE the orders join, so the join
# build side is the filtered aggregate (broadcastable at any SF).
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(maybe_broadcast(big, sf_dir, "orders"), orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


register(
    "tpch_q18_big_orders",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderdate, total_qty
    FROM orders
    JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING round(sum(l_quantity), 2) > 300) big
      ON o_orderkey = l_orderkey
    ORDER BY total_qty DESC, o_orderkey LIMIT 100
    """,
)(tpch_q18_big_orders)


register(
    "tpch_top_orders_per_customer",
    sql="""
    WITH rev AS (
      SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM lineitem GROUP BY l_orderkey
    ),
    ranked AS (
      SELECT o_custkey, o_orderkey, revenue,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY revenue DESC, o_orderkey) AS rk
      FROM orders JOIN rev ON o_orderkey = l_orderkey
    )
    SELECT o_custkey, o_orderkey, revenue, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    """,
)(tpch_top_orders_per_customer)


# Q19-style disjunctive predicate revenue: OR-of-ANDs across both join
# sides. Catalyst pushes the common per-side conjuncts below the join
# (constraint propagation extracts p_brand/p_size bounds to the part
# scan and l_quantity bounds to the lineitem scan) while the residual
# disjunction evaluates on the joined row — the shape that separates a
# predicate-pushdown-correct engine from a scan-everything one.
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return j.filter(cond).agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


register(
    "tpch_q19_disjunctive_revenue",
    sql="""
    SELECT count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)(tpch_q19_disjunctive_revenue)


# Q13-style customer order-count distribution: LEFT OUTER join with a
# join-side filter (customers with zero surviving orders must appear with
# c_count = 0), two-level aggregation. The outer-join-then-agg class is
# not exercised anywhere else in the inventory.
@memoized_build("customer", "orders")
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


register(
    "tpch_q13_custdist",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)(tpch_q13_custdist)


# Q15-style top supplier: revenue view + scalar-subquery MAX filter. The
# max is a 1-row broadcast (no second scan of the big side at 100 TB —
# the view is dim-sized once aggregated).
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
        .alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


register(
    "tpch_q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)(tpch_q15_top_supplier)


# Q16-style supplier count: COUNT(DISTINCT) after an anti-join exclusion.
# NOT IN is rewritten as left-anti, and the exclusion list explicitly
# drops NULL keys on BOTH engines: a NULL key identifies no supplier,
# and SQL `NOT IN (…, NULL)` is three-valued-logic poison (every
# comparison UNKNOWN → the whole result empties) while a left-anti join
# simply never matches the NULL — the degenerate TPC-H sweep plants
# exactly that row. Distinct-agg over a join output is its own shuffle
# shape (partial distinct under the Expand). (A distinct
# (l_partkey, l_suppkey) pre-agg BELOW the joins was A/B'd in round 8:
# 7 solo reps at sf0.1 measured 1.07 s vs 1.05 s min — no win, because
# the partial distinct already dedups map-side before the shuffle — so
# the simpler one-pass form stands.)
@memoized_build("lineitem", "part", "supplier")
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE exchange (r13): the old shape paid two full aggregation
    # rounds — a (l_partkey, l_suppkey) distinct exchange that
    # collapsed 600k rows to 591k (pure waste) and then the
    # count-distinct's own (brand, size, suppkey) exchange — 12.2 MB
    # shuffled, 8.5 s task time at sf0.1. Both joins are broadcast, so
    # instead hash-partition the post-join rows ONCE on (p_brand,
    # p_size): that partitioning satisfies the clustering requirement
    # of BOTH the triple dedup (subset rule) and the per-(brand, size)
    # count, so each runs as a single complete-mode HashAggregate with
    # no further exchange. Skew-safe: TPC-H spreads rows uniformly over
    # the 1,250 (brand, size) cells.
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#45")
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(
        (F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull()
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    pairs = li.select("l_partkey", "l_suppkey")
    return (
        pairs.join(maybe_broadcast(bad, sf_dir, "supplier"), "l_suppkey", "left_anti")
        .join(maybe_broadcast(part, sf_dir, "part"), pairs.l_partkey == part.p_partkey)
        .select("p_brand", "p_size", "l_suppkey")
        .repartition("p_brand", "p_size")
        .distinct()
        .groupBy("p_brand", "p_size")
        .agg(F.count("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
        .limit(20)
    )


register(
    "tpch_q16_supplier_cnt",
    sql="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0 AND s_suppkey IS NOT NULL)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    LIMIT 20
    """,
)(tpch_q16_supplier_cnt)


# Q17-style small-quantity revenue: correlated scalar subquery (per-part
# average) decorrelated into an aggregate + equi-join — the plan Spark
# and every warehouse engine should produce; at 100 TB the per-part avg
# side is partial-agged before its shuffle.
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cutoff")
    )
    return (
        li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


register(
    "tpch_q17_small_quantity",
    sql="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    """,
)(tpch_q17_small_quantity)


# Q21-lite multi-EXISTS: the only supplier with a returned item in a
# finished multi-supplier order — one semi-join (another supplier
# exists) AND one anti-join (no OTHER supplier returned) against the
# same fact, both equi on orderkey with a non-equi residual.
@memoized_build("lineitem", "orders", "supplier")
def tpch_q21_lone_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE lineitem scan (r13): the literal semi+anti formulation scanned
    # lineitem three times and built two fact-sized broadcast hash
    # relations (the full 600k-pair projection as the semi build side).
    # Both EXISTS tests are per-order set facts: "another supplier
    # exists" ⟺ the order has ≥2 distinct suppkeys, and "no OTHER
    # supplier returned" ⟺ the order's returned lines span exactly 1
    # distinct suppkey (l1's own supplier is always in that set, so =1
    # means only l1's). Collapse lineitem to (l_orderkey, l_suppkey,
    # n_ret) with one hash exchange on l_orderkey — the groupBy's
    # (orderkey, suppkey) clustering is satisfied by the orderkey
    # partitioning (subset rule) and the per-order window reuses the
    # same exchange — then derive both counts with a window and keep
    # candidates. numwait contribution per (order, supplier) is its
    # returned-line count n_ret, so the final per-supplier sum equals
    # the original per-row count. The null-key filters mirror the join
    # semantics (null orderkey/suppkey rows never matched).
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_returnflag") == "R").cast("long").alias("is_ret"),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("is_ret").alias("n_ret"))
    )
    # Second complete-mode aggregate on the SAME exchange: when exactly
    # one supplier in the order returned (n_ret_supp == 1), the scalar
    # conditional maxes recover that supplier and its returned-line
    # count without a struct-max (which would force an interpreted
    # SortAggregate) and without a window (which would force a sort) —
    # the whole per-order reduction stays in codegen HashAggregates.
    per_ord = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("n_ret") > 0).cast("int")).alias("n_ret_supp"),
        F.max(F.when(F.col("n_ret") > 0, F.col("l_suppkey"))).alias(
            "lone_supp"
        ),
        F.max(F.when(F.col("n_ret") > 0, F.col("n_ret"))).alias(
            "lone_n_ret"
        ),
    )
    cand = per_ord.filter(
        (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
    )
    return (
        cand.join(orders, cand.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), cand.lone_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("lone_n_ret").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


register(
    "tpch_q21_lone_returner",
    sql="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)(tpch_q21_lone_returner)


# Q22-style dormant high-balance customers: scalar-subquery average
# (1-row broadcast) + NOT EXISTS anti-join against orders. "Dormant" =
# no OPEN order (an unconditional no-orders test is vacuous at the
# testdata's 10:1 orders:customers ratio — every customer has some).
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "tpch_q22_dormant_customers",
    sql="""
    SELECT c_mktsegment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderstatus = 'O')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)(tpch_q22_dormant_customers)


# --- Q7: volume shipping between two nations ------------------------------
# Faithful to TPC-H Q7 (supplier nation ⇄ customer nation trade volume by
# year); only the nation names and date window are adapted to the driver
# schema's NATION_* domain and 1995-2001 date range.
@memoized_build("customer", "lineitem", "nation", "orders", "supplier")
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(vol), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register(
    "tpch_q7_volume_shipping",
    sql="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)(tpch_q7_volume_shipping)


# --- Q8: national market share --------------------------------------------
# Faithful to TPC-H Q8: NATION_3's share of AMERICA-customer revenue for
# PROMO-type parts by order year (conditional-sum / ratio-of-aggregates).
@memoized_build("lineitem", "orders", "customer", "part", "supplier", "nation", "region")
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


register(
    "tpch_q8_market_share",
    sql="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)(tpch_q8_market_share)


# --- Q9: product-type profit by nation and year ---------------------------
# ADAPTED from TPC-H Q9: the driver schema has no partsupp, so
# ps_supplycost is proxied as 60% of p_retailprice — the operator class
# (5-way join + LIKE part filter + two-key rollup of an arithmetic
# profit expression) is what's exercised, not the cost model.
@memoized_build("lineitem", "nation", "orders", "part", "supplier")
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


register(
    "tpch_q9_product_profit",
    sql="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 4) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)(tpch_q9_product_profit)


# --- Q10: returned-item reporting (top 20 customers) ----------------------
# Faithful to TPC-H Q10: revenue lost to returns per customer over one
# quarter, top 20 (join + agg + top-k with tiebreak).
@memoized_build("customer", "lineitem", "nation", "orders")
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.round(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


register(
    "tpch_q10_returned_items",
    sql="""
    SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)(tpch_q10_returned_items)


# --- Q11: important part concentration ------------------------------------
# ADAPTED from TPC-H Q11 (no partsupp): a part's "held value" is its
# sold value (extendedprice x quantity is not available per stock, so
# sum of extendedprice) through suppliers of one nation; keep parts
# whose value exceeds a fixed fraction of the nation's total — the
# scalar-subquery HAVING threshold is the operator under test.
Q11_FRACTION = 0.002


@memoized_build("lineitem", "nation", "supplier")
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    base = (
        li.join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", "l_extendedprice")
    )
    total = base.agg(
        (F.sum("l_extendedprice") * Q11_FRACTION).alias("threshold")
    )
    return (
        base.groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("value"))
        .join(F.broadcast(total), F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


register(
    "tpch_q11_important_parts",
    sql=f"""
    WITH base AS (
      SELECT l_partkey, l_extendedprice
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
    )
    SELECT l_partkey, round(sum(l_extendedprice), 4) AS value
    FROM base
    GROUP BY l_partkey
    HAVING round(sum(l_extendedprice), 4)
           > (SELECT sum(l_extendedprice) * {Q11_FRACTION} FROM base)
    ORDER BY value DESC, l_partkey
    """,
)(tpch_q11_important_parts)


# --- Q2: cheapest supplier per part ---------------------------------------
# ADAPTED from TPC-H Q2 (no partsupp): a supplier's "offer price" for a
# part is its average realized unit price from lineitem; for EUROPE
# suppliers and a part size/type slice, keep the (part, supplier) rows
# hitting the per-part minimum — the correlated-min subquery + multi-
# join + top-k shape of Q2.
@memoized_build("lineitem", "nation", "part", "region", "supplier")
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    offers = (
        li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name"
        )
        .agg(
            F.round(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_price"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_price"
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


register(
    "tpch_q2_min_cost_supplier",
    sql="""
    WITH offers AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
             round(avg(l_extendedprice / l_quantity), 6) AS unit_price
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size <= 10 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_price
    FROM offers o
    WHERE unit_price = (SELECT min(unit_price) FROM offers i
                        WHERE i.p_partkey = o.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)(tpch_q2_min_cost_supplier)


# --- Q20: promotion-part shippers -----------------------------------------
# ADAPTED from TPC-H Q20 (no partsupp availability to halve): suppliers
# in one nation who shipped more than Q20_MIN_QTY units of pattern-
# matched parts in one year — the agg-subquery -> semi-join -> dim-
# filter chain of Q20.
Q20_MIN_QTY = 300


@memoized_build("lineitem", "nation", "part", "supplier")
def tpch_q20_promo_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%old%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    shippers = (
        li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        .filter(F.col("qty") > Q20_MIN_QTY)
    )
    return (
        supp.join(shippers, "s_suppkey", "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


register(
    "tpch_q20_promo_shippers",
    sql=f"""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%old%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING round(sum(l_quantity), 2) > {Q20_MIN_QTY}
      )
    ORDER BY s_name
    """,
)(tpch_q20_promo_shippers)
