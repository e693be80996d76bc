"""Remaining TPC-H-class query shapes (completes the relational matrix).

The reference pipeline has no SQL layer (SURVEY.md §2 intro); these shapes
exercise the decorrelation / multi-level-aggregation patterns its join and
split logic implies (J1-J5, A9-A11) at full TPC-H breadth. The driver's star
schema has no partsupp table, so the part-supplier shapes (Q2/Q17/Q20-like)
are re-anchored on lineitem's (l_partkey, l_suppkey) fact edges.

Every correlated-subquery shape is decorrelated the Spark-idiomatic way —
a window or a pre-aggregated join — never a per-row re-scan: at 100 TB a
correlated rescan is O(n) extra jobs, while the window/agg form is one extra
shuffle at most, and several here reuse the shuffle the main aggregation
already pays (partitionBy == groupBy key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import table
from .exact import (
    REVENUE_FIXED_SQL,
    cents,
    cents_sql,
    revenue_fixed,
    whole,
    whole_sql,
)
from .registry import query

# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part. Correlated MIN subquery decorrelated
# as a window-min over the per-(part, supplier) aggregate. Two exchanges by
# design: the first is keyed (part_key, l_suppkey) so map-side partial
# aggregation collapses raw lineitem rows BEFORE any shuffle (~Nx fewer
# bytes); the second re-keys the already-aggregated offer table (one row per
# part-supplier pair) for the window. Re-keying the small table beats
# pre-partitioning the raw fact scan by part_key (which would shuffle every
# raw row to make the window free). Supplier dim broadcasts.
# ---------------------------------------------------------------------------


@query(
    "join_min_cost_supplier_per_part",
    oracle=f"""
    WITH offer AS (
        SELECT l_partkey AS part_key,
               l_suppkey,
               min({cents_sql('l_extendedprice')} / {whole_sql('l_quantity')}) AS unit_cents
        FROM lineitem
        GROUP BY 1, 2
    )
    SELECT o.part_key,
           s.s_name AS supplier_name,
           s.s_acctbal AS supplier_acctbal,
           o.unit_cents AS min_unit_cents
    FROM offer o
    JOIN supplier s ON o.l_suppkey = s.s_suppkey
    WHERE o.unit_cents = (SELECT min(i.unit_cents) FROM offer i
                          WHERE i.part_key = o.part_key)
    ORDER BY o.part_key, supplier_name
    """,
)
def join_min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part_key"),
        "l_suppkey",
        (cents(F.col("l_extendedprice")) / whole(F.col("l_quantity"))).alias("unit"),
    )
    offer = li.groupBy("part_key", "l_suppkey").agg(F.min("unit").alias("unit_cents"))
    best = offer.withColumn(
        "best", F.min("unit_cents").over(Window.partitionBy("part_key"))
    ).filter(F.col("unit_cents") == F.col("best"))
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_name").alias("supplier_name"),
        F.col("s_acctbal").alias("supplier_acctbal"),
    )
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select("part_key", "supplier_name", "supplier_acctbal", F.col("unit_cents").alias("min_unit_cents"))
        .orderBy("part_key", "supplier_name")
    )


# ---------------------------------------------------------------------------
# Q4 shape: order-priority census over an EXISTS. The semi-join keeps the
# orders scan narrow; counting happens after, so the exists never inflates
# rows (no DISTINCT repair needed, unlike an inner-join formulation).
# "Late" = any line shipped more than 90 days after the order date.
# ---------------------------------------------------------------------------


@query(
    "orders_priority_late_exists",
    oracle="""
    SELECT o.o_orderpriority AS order_priority,
           count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("order_priority")
    )


# ---------------------------------------------------------------------------
# Q11 shape: groups exceeding a global-share threshold. The global scalar is
# the sum of the per-group sums — computed by re-aggregating the SMALL
# per-group result (100 suppliers), never by a second scan of lineitem; the
# scalar is then broadcast into the HAVING filter. One fact-table scan total.
# ---------------------------------------------------------------------------


@query(
    "supplier_value_share_threshold",
    oracle=f"""
    WITH value_by_supp AS (
        SELECT l_suppkey AS supp_key,
               CAST(sum({cents_sql('l_extendedprice')} * {whole_sql('l_quantity')}) AS BIGINT) AS value_fixed
        FROM lineitem GROUP BY 1
    )
    SELECT supp_key, value_fixed
    FROM value_by_supp
    WHERE value_fixed > (SELECT sum(value_fixed) FROM value_by_supp) * 0.012
    ORDER BY value_fixed DESC, supp_key
    """,
)
def supplier_value_share_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supp_key"),
        (cents(F.col("l_extendedprice")) * whole(F.col("l_quantity"))).alias("v"),
    )
    per_supp = li.groupBy("supp_key").agg(F.sum("v").alias("value_fixed"))
    total = per_supp.agg(F.sum("value_fixed").alias("t"))
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("value_fixed") > F.col("t") * 0.012)
        .select("supp_key", "value_fixed")
        .orderBy(F.desc("value_fixed"), "supp_key")
    )


# ---------------------------------------------------------------------------
# Q13 shape: count-of-counts distribution (orders per customer, customers per
# order-count). Two cascaded aggregations; the second one's input is already
# tiny (one row per customer), so only the first shuffle touches fact data.
# Left join keeps zero-order customers in the c_count=0 bucket.
# ---------------------------------------------------------------------------


@query(
    "customer_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 shape: conditional-revenue ratio over a join (promo revenue percent).
# part joins broadcast (200·SF rows); the ratio is two conditional sums in
# ONE aggregate pass — never two scans.
# ---------------------------------------------------------------------------


@query(
    "promo_revenue_percent",
    oracle=f"""
    SELECT 100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN {REVENUE_FIXED_SQL} ELSE 0 END)
               / sum({REVENUE_FIXED_SQL}) AS promo_pct,
           count(*) AS line_count
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def promo_revenue_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            / F.sum(rev)
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("line_count"),
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier(s) by revenue, tie-safe. MAX-equality via window
# over the 100-row per-supplier aggregate — zero extra shuffle (single
# partition window on a dim-sized frame is fine; the fact scan dominated).
# ---------------------------------------------------------------------------


@query(
    "top_supplier_revenue_tiesafe",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supp_key, CAST(sum({REVENUE_FIXED_SQL}) AS BIGINT) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT r.supp_key, s.s_name AS supplier_name, r.total_rev
    FROM rev r JOIN supplier s ON r.supp_key = s.s_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY r.supp_key
    """,
)
def top_supplier_revenue_tiesafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supp_key")).agg(
        F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))).alias("total_rev")
    )
    best = rev.withColumn("mx", F.max("total_rev").over(Window.partitionBy())).filter(
        F.col("total_rev") == F.col("mx")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", F.col("s_name").alias("supplier_name"))
    return (
        best.join(F.broadcast(supp), best.supp_key == supp.s_suppkey)
        .select("supp_key", "supplier_name", "total_rev")
        .orderBy("supp_key")
    )


# ---------------------------------------------------------------------------
# Q17 shape: rows below a fraction of their group's average (small-quantity
# revenue). Correlated AVG decorrelated as a window-avg partitioned by the
# SAME key the filter correlates on — Catalyst plans one shuffle on
# l_partkey, and the brand filter (broadcast semi via the part dim) prunes
# the fact scan before that shuffle.
# ---------------------------------------------------------------------------


@query(
    "small_quantity_revenue_below_avg",
    oracle=f"""
    SELECT sum({cents_sql('l.l_extendedprice')}) / 100.0 / 7.0 AS avg_yearly,
           count(*) AS line_count
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#7'
      AND l.l_quantity < (SELECT 0.4 * avg(i.l_quantity) FROM lineitem i
                          WHERE i.l_partkey = l.l_partkey)
    """,
)
def small_quantity_revenue_below_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_keys = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7").select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    branded = li.join(F.broadcast(part_keys), li.l_partkey == part_keys.p_partkey, "left_semi")
    w = Window.partitionBy("l_partkey")
    small = branded.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.4 * F.col("avg_qty")
    )
    return small.agg(
        (F.sum(cents(F.col("l_extendedprice"))) / 100.0 / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("line_count"),
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders — HAVING on a fact aggregate, then join the
# survivors back to their headers. The groupBy(orderkey) output after HAVING
# is tiny, so the join back to orders/customer broadcasts the SURVIVORS
# (not the dims): at 100 TB the orders side stays un-shuffled.
# ---------------------------------------------------------------------------


@query(
    "large_order_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, CAST(sum({whole_sql('l_quantity')}) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY 1
        HAVING sum({whole_sql('l_quantity')}) > 220
    )
    SELECT c.c_name AS customer_name, o.o_orderkey AS order_key,
           o.o_orderdate AS order_date, b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY b.total_qty DESC, order_key
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(whole(F.col("l_quantity"))).alias("total_qty"))
        .filter(F.col("total_qty") > 220)
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "order_key")
    )


# ---------------------------------------------------------------------------
# Q21 shape: double-correlated EXISTS / NOT EXISTS (multi-supplier orders
# where exactly one supplier shipped late). The textbook form is two extra
# self-joins of lineitem; here both existentials collapse into ONE groupBy
# over the fact table — count distinct suppliers vs distinct late suppliers
# per order — then a filter. One shuffle replaces two self-join shuffles.
# ---------------------------------------------------------------------------


@query(
    "late_sole_supplier_orders",
    oracle="""
    WITH per_order AS (
        SELECT l.l_orderkey,
               count(DISTINCT l.l_suppkey) AS n_supps,
               count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                                   THEN l.l_suppkey END) AS n_late,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN l.l_suppkey END) AS late_supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY 1
    )
    SELECT s.s_name AS supplier_name, count(*) AS numwait
    FROM per_order p JOIN supplier s ON p.late_supp = s.s_suppkey
    WHERE p.n_supps > 1 AND p.n_late = 1
    GROUP BY 1
    ORDER BY numwait DESC, supplier_name
    """,
)
def late_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late_supp = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.col("l_suppkey"),
    )
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(late_supp).alias("n_late"),
        F.max(late_supp).alias("late_supp"),
    )
    waiting = per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", F.col("s_name").alias("supplier_name"))
    return (
        waiting.join(F.broadcast(supp), waiting.late_supp == supp.s_suppkey)
        .groupBy("supplier_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "supplier_name")
    )


# ---------------------------------------------------------------------------
# Q22 shape: above-average balance + no recent orders, by nation. The scalar
# AVG subquery is an aggregate-then-broadcast-join (cross join with a 1-row
# frame is a BroadcastNestedLoopJoin Catalyst folds to near-zero cost); the
# NOT EXISTS is a left_anti join on the pre-filtered orders projection.
# ---------------------------------------------------------------------------


@query(
    "idle_rich_customers_by_nation",
    oracle="""
    SELECT c.c_nationkey AS nation_key,
           count(*) AS numcust,
           CAST(round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT))) AS BIGINT) AS totacctbal_cents
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(i.c_acctbal) FROM customer i WHERE i.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    ORDER BY 1
    """,
)
def idle_rich_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents(F.col("c_acctbal"))).alias("totacctbal_cents"),
        )
        .orderBy("nation_key")
    )
