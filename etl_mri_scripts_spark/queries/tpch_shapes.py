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
# Q15 shape: top supplier(s) by revenue, tie-safe. MAX-equality via a
# broadcast 1-row max aggregate over the per-supplier rollup — the fact
# scan dominates, and no stage depends on supplier cardinality fitting
# one partition.
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
    # Scalar max via a broadcast 1-row aggregate (bounded NLJ side), not
    # an unpartitioned window — supplier cardinality grows with the data.
    mx = rev.agg(F.max("total_rev").alias("mx"))
    best = rev.crossJoin(F.broadcast(mx)).filter(F.col("total_rev") == F.col("mx"))
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


# ---------------------------------------------------------------------------
# Q6 shape: forecast-revenue-change. The canonical zero-shuffle query: every
# predicate (date band, discount band, quantity cap) is a parquet scan
# filter, the aggregate is a single global partial+final — at 100 TB the
# only bytes that move are one partial sum per task. Revenue term
# extendedprice*discount is kept in exact 1e-4 fixed point.
# ---------------------------------------------------------------------------


@query(
    "forecast_revenue_discount_band",
    oracle=f"""
    SELECT round(sum({cents_sql('l_extendedprice')} * {cents_sql('l_discount')})
                 / 10000.0, 6) AS revenue_increase
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_discount_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(cents(F.col("l_extendedprice")) * cents(F.col("l_discount")))
                / 10000.0,
                6,
            ).alias("revenue_increase")
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape: shipping volume between nation pairs. Scale plan: both nation
# filters are applied to the DIMENSION sides (supplier, customer) before any
# fact join, so the big lineitem<->orders sort-merge only carries rows whose
# supplier already matched — the runtime bloom filter on l_suppkey prunes
# the fact scan further. The nation dim (25 rows) broadcasts; year comes
# from the ship date, and the pair aggregate reuses AQE-coalesced shuffle
# partitions.
# ---------------------------------------------------------------------------


@query(
    "nation_pair_shipping_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum({REVENUE_FIXED_SQL}) / 10000.0, 6) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_pair_shipping_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount")))
                / 10000.0,
                6,
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share of one supplier nation inside one consuming region.
# The share is a conditional-sum over the same aggregate rows — one pass,
# no second join. All dimension filters (region via customer nation, part
# type) cut BEFORE the fact joins; the two nation lookups broadcast.
# ---------------------------------------------------------------------------


@query(
    "nation_market_share_in_region",
    oracle=f"""
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_2' THEN {REVENUE_FIXED_SQL} ELSE 0 END)
                 * 1.0 / sum({REVENUE_FIXED_SQL}), 6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'PROMO'
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def nation_market_share_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    asia_nations = (
        nat.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    promo_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        li.join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0)))
                * 1.0
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: profit by supplier nation and year. partsupp's supplycost is
# re-anchored on part.p_retailprice (cost proxy), keeping the shape: profit
# = revenue - cost*qty, aggregated (nation, year). Fixed-point end to end:
# revenue is 1e-4, cost*qty lifted to 1e-4 to subtract exactly.
# ---------------------------------------------------------------------------


@query(
    "profit_by_supp_nation_year",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           round(sum({REVENUE_FIXED_SQL}
                     - {cents_sql('p.p_retailprice')} * {whole_sql('l.l_quantity')} * 100)
                 / 10000.0, 6) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def profit_by_supp_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = revenue_fixed(F.col("l_extendedprice"), F.col("l_discount")) - cents(
        F.col("p_retailprice")
    ) * whole(F.col("l_quantity")) * 100
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit) / 10000.0, 6).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 shape: revenue lost to returned items, top-20 customers. The heavy
# fact-side work (returnflag filter + quarter window on orders) happens
# before the customer join; the final top-k is a driver-cheap sorted limit
# on the aggregated (customer) table, not the fact stream.
# ---------------------------------------------------------------------------


@query(
    "returned_item_revenue_customers",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           round(sum({REVENUE_FIXED_SQL}) / 10000.0, 6) AS revenue,
           c.c_acctbal,
           n.n_name AS nation
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(
            F.round(
                F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount")))
                / 10000.0,
                6,
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape: late-shipment priority census. The driver schema carries no
# shipmode/commitdate, so the mode dimension is l_linestatus and "late"
# reuses Q4's ship-more-than-90-days-after-order rule. The conditional
# counts are one pass over the joined rows; the orders join carries only
# (o_orderkey, o_orderdate, o_orderpriority).
# ---------------------------------------------------------------------------


@query(
    "late_lines_priority_by_status",
    oracle="""
    SELECT l.l_linestatus,
           CAST(count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
                AS BIGINT) AS high_line_count,
           CAST(count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
                AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def late_lines_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # full-timestamp arithmetic, matching the oracle's + INTERVAL 90
        # DAY; F.date_add would truncate o_orderdate to a DATE first and
        # diverge on any non-midnight order timestamp
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(is_high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~is_high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier diversity per part attribute group. The part-supplier
# relation is the distinct (l_partkey, l_suppkey) edge set from lineitem
# (no partsupp in this schema). The NOT-IN supplier exclusion is an
# anti-join (never a per-row subquery), applied to the edge table BEFORE
# the count-distinct aggregate.
# ---------------------------------------------------------------------------


@query(
    "supplier_count_by_part_attrs",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    excluded AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    SELECT p.p_brand,
           p.p_type,
           p.p_size,
           CAST(count(DISTINCT e.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM edges e
    JOIN part p ON e.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND e.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    parts = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        edges.join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive bracketed predicates (OR of AND-brackets spanning
# the join). The part-side conjuncts (brand+size) prune the broadcast dim;
# the lineitem-side quantity bounds stay in the parquet scan as a single
# OR-range filter (qty 1..30 covers all brackets), and the exact bracket
# match evaluates post-join inside codegen — no bracket explodes into a
# separate scan.
# ---------------------------------------------------------------------------


@query(
    "disjunctive_bracket_revenue",
    oracle=f"""
    SELECT round(sum({REVENUE_FIXED_SQL}) / 10000.0, 6) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    parts = table(spark, sf_dir, "part").filter(
        (
            (F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 5)
            | (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
            | (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15)
        )
        & (F.col("p_size") >= 1)
    ).select("p_partkey", "p_brand", "p_size")
    bracket = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            F.round(
                F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount")))
                / 10000.0,
                6,
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: suppliers with heavy volume in a brand's parts. Nested
# semi-join chain, all decorrelated: brand parts (broadcast) gate the fact
# edges; the per-(supplier, part) volume aggregate applies the HAVING
# threshold; the surviving supplier keys semi-join the nation-filtered
# supplier dim. No step rescans the fact table.
# ---------------------------------------------------------------------------


@query(
    "excess_volume_suppliers",
    oracle="""
    WITH brand_parts AS (
        SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'
    ),
    vol AS (
        SELECT l_suppkey, l_partkey, sum(CAST(round(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM brand_parts)
        GROUP BY 1, 2
        HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 50
    )
    SELECT DISTINCT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_4')
      AND s.s_suppkey IN (SELECT l_suppkey FROM vol)
    ORDER BY s_name
    """,
)
def excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    brand_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    )
    vol = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(whole(F.col("l_quantity"))).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4")
    ).select("n_nationkey")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(vol, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name")
    )
