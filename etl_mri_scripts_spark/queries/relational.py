"""Relational operator matrix (SURVEY.md §2 / §7 Phase 1).

Each query re-expresses one reference operator family as an idiomatic
Catalyst plan over the driver's star schema; the DuckDB oracle next to it is
the correctness contract. Scale notes are given per query: these plans are
written for a 1000-executor / 100 TB cluster (broadcast hints on dims,
partial aggregation, no driver-side collection), then verified on small SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.rank import global_order_prefix, global_row_number, ntile_from_rank
from ..tables import table
from .exact import (
    CHARGE_FIXED_SQL,
    REVENUE_FIXED_SQL,
    cents,
    cents_sql,
    charge_fixed,
    revenue_fixed,
    whole,
)
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: scan -> filter -> 4-way join -> agg -> sort  (S1,F1,J1,A9,O1)
# Revenue by region x order priority. Joins to region/nation are broadcast
# (fixed-size dims, ALWAYS small); orders<->lineitem is the only real
# shuffle and AQE handles skew. Filters sit directly on the scan so parquet
# row-group pruning sees them.
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue_by_region_priority",
    oracle=f"""
    SELECT r.r_name AS region_name,
           o.o_orderpriority AS order_priority,
           sum({REVENUE_FIXED_SQL}) / 10000.0 AS revenue,
           count(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
      AND l.l_discount BETWEEN 0.03 AND 0.09
    GROUP BY 1, 2
    ORDER BY revenue DESC, region_name, order_priority
    """,
)
def flagship_revenue_by_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.09)
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            (F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.desc("revenue"), "region_name", "order_priority")
    )


# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): wide partial-aggregable rollup per
# returnflag/linestatus. Pure map-side-combinable aggregates; at 100 TB the
# shuffle moves only |groups| x |aggs| rows per partition.
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           sum({cents_sql('l_extendedprice')}) / 100.0 AS sum_base_price,
           sum({REVENUE_FIXED_SQL}) / 10000.0 AS sum_disc_price,
           sum({CHARGE_FIXED_SQL}) / 1000000.0 AS sum_charge,
           sum({cents_sql('l_discount')}) / 100.0 AS sum_discount,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(whole(F.col("l_quantity"))).alias("sum_qty"),
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))) / 10000.0).alias("sum_disc_price"),
            (
                F.sum(charge_fixed(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")))
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum(cents(F.col("l_discount"))) / 100.0).alias("sum_discount"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scan + filter + projection with arithmetic (P6/P10 analogs): predicate
# must push to parquet (verified in tests via explain); projection prunes to
# 4 of 11 columns.
# ---------------------------------------------------------------------------


@query(
    "filter_project_arith",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           {REVENUE_FIXED_SQL} / 10000.0 AS net_price,
           CAST(round(l_quantity) AS BIGINT) // 2 AS half_qty
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def filter_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            (revenue_fixed(F.col("l_extendedprice"), F.col("l_discount")) / 10000.0).alias("net_price"),
            (whole(F.col("l_quantity")) / F.lit(2)).cast("long").alias("half_qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Join family (J1-J5). Each join strategy the engine relies on, as its own
# verifiable query.
# ---------------------------------------------------------------------------


@query(
    "join_inner_orders_customer",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    ORDER BY o.o_orderkey
    """,
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "join_left_customer_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS order_count,
           coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) / 100.0 AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def join_left_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            (F.coalesce(F.sum(cents(F.col("o_totalprice"))), F.lit(0)) / 100.0).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2: the reference's approved-keys gate (extract_subimages.py:75-76) is
    # exactly a left-semi join; the probe side is pre-filtered and deduped by
    # the semi join itself.
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_broadcast_supplier_geo",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name, r.r_name AS region_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY s.s_suppkey
    """,
)
def join_broadcast_supplier_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name"), "n_regionkey"
    )
    r = table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region_name")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "nation_name", "region_name")
        .orderBy("s_suppkey")
    )


@query(
    "join_symmetric_difference_validation",
    oracle="""
    SELECT side, key_val FROM (
      SELECT 'orders_only' AS side, o_orderkey AS key_val FROM orders
      WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
      UNION ALL
      SELECT 'lineitem_only' AS side, l_orderkey AS key_val FROM (SELECT DISTINCT l_orderkey FROM lineitem)
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ) ORDER BY side, key_val
    """,
)
def join_symmetric_difference_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4: the reference's pre-write HR/LR key-parity check
    # (slice_generator.py:145-164) — symmetric difference must be empty; the
    # query *returns* the difference so violations are inspectable. Both
    # anti-joins are shuffle-free on the broadcast side at scale because the
    # distinct key sets are tiny relative to the fact table.
    o = table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("key_val"))
    l = table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("key_val")).distinct()
    o_only = o.join(l, "key_val", "left_anti").select(
        F.lit("orders_only").alias("side"), "key_val"
    )
    l_only = l.join(o, "key_val", "left_anti").select(
        F.lit("lineitem_only").alias("side"), "key_val"
    )
    return o_only.unionAll(l_only).orderBy("side", "key_val")


# ---------------------------------------------------------------------------
# Aggregation family (A1-A10).
# ---------------------------------------------------------------------------


@query(
    "agg_minmax_per_group",
    oracle="""
    SELECT l_returnflag,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_minmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1: per-volume min/max normalize denominator (slice_generator.py:72-73)
    # as the canonical groupBy min/max — order-independent, hence exact.
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    -- explicit grouping sets: per (flag,status), per status alone, grand
    -- total — the report shapes the reference writes as three separate
    -- passes (split_info / slice_split_info / dataset_meta totals).
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    ORDER BY returnflag, linestatus
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One Expand pass produces all three report granularities in a single
    # shuffle — vs the reference's three separate counter dictionaries
    # (v2/nii_to_lmdb.py:165-182, A9/A10).
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return li.sparkSession.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(1) AS n_lines,
               sum(cast(round(l_quantity) AS BIGINT)) AS total_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


@query(
    "agg_count_distinct_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS line_count,
           count(DISTINCT l_orderkey) AS order_count
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def agg_count_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A10: the per-volume/per-split count report (v2/nii_to_lmdb.py:165-171)
    # is a rollup; count(distinct) exercises expand+two-phase distinct agg.
    # Pre-fold to (group keys, distinct key) BEFORE the rollup: Expand
    # multiplies its input x(grouping sets), so shrinking the input first
    # (map-side combinable groupBy) beats expanding the raw fact table,
    # and the gap grows with fact-to-distinct ratio at corpus scale.
    # r5 re-measurement of the r4 driver-bench outlier (3.61 s vs 1.33 s
    # pin): interleaved 5-run medians at sf0.1 put pre-fold at 1.28-1.37 s
    # and direct rollup at 1.30-1.45 s — statistically indistinguishable
    # locally, so the driver number was host noise, and the pre-fold stays
    # (bench.py now emits a host-noise factor to normalize such runs).
    base = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("cnt").alias("line_count"),
            F.countDistinct("l_orderkey").alias("order_count"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "line_count",
            "order_count",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "agg_histogram_width_bucket",
    oracle="""
    -- width_bucket(x, 0, 50, 10) spelled out (DuckDB lacks width_bucket):
    -- [0,5) -> 1 ... [45,50) -> 10, x >= 50 -> 11, x < 0 -> 0
    SELECT CASE WHEN l_quantity < 0 THEN 0
                WHEN l_quantity >= 50 THEN 11
                ELSE CAST(floor(l_quantity / 5) AS BIGINT) + 1 END AS bucket,
           count(*) AS n,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY 1 ORDER BY bucket
    """,
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A5: Otsu's 256-bin histogram (v2/estimate_snr.py:31) generalized:
    # width_bucket + groupBy count is the scalable histogram (one shuffle of
    # |buckets| rows after partial agg).
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(F.width_bucket("l_quantity", F.lit(0), F.lit(50), F.lit(10)).alias("bucket"), "l_quantity")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(whole(F.col("l_quantity"))).alias("total_qty"))
        .orderBy("bucket")
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(value), 6) AS mean_value,
           round(stddev_samp(value), 6) AS sd_value,
           round(avg(value * value), 6) AS second_moment,
           round(var_samp(value), 6) AS var_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6/A7: ROI mean/std(ddof=1)/second moment (v2/estimate_snr.py:97-116).
    # stddev is not exactly associative in floating point — both sides round
    # to 6 dp, far above the ~1e-12 drift, far below data resolution.
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.stddev_samp("value"), 6).alias("sd_value"),
            F.round(F.avg(F.col("value") * F.col("value")), 6).alias("second_moment"),
            F.round(F.var_samp("value"), 6).alias("var_value"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.01), 6) AS p01,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2/P5: per-volume p1/p99 robust-normalize window (v2/patch_utils.py:28-30).
    # Exact `percentile` (linear interpolation, same definition as DuckDB
    # quantile_cont / np.nanpercentile); percentile_approx is offered for the
    # 100 TB path but the parity query uses the exact form.
    li = table(spark, sf_dir, "lineitem")
    # One percentile aggregate with an array of percentages: a single value
    # buffer and a single sort per group, vs 3x of each with separate aggs.
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.01), F.lit(0.50), F.lit(0.99)))
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 6).alias("p01"),
            F.round(F.col("ps")[1], 6).alias("p50"),
            F.round(F.col("ps")[2], 6).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1-O4)
# ---------------------------------------------------------------------------


@query(
    "topk_customers_by_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           sum({REVENUE_FIXED_SQL}) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O4 top-k: TakeOrderedAndProject — per-partition heap then driver merge
    # of k rows, never a global sort of the full agg output.
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg((F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


@query(
    "topk_per_group_window",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rn AS price_rank
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    ) WHERE rn <= 3
    ORDER BY p_brand, price_rank
    """,
)
def topk_per_group_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O2/O4 per-group top-k via window rank; at scale this is the standard
    # single-shuffle pattern (partitionBy brand), with AQE skew splitting.
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "price_rank")
        .orderBy("p_brand", "price_rank")
    )


@query(
    "middle_n_selection",
    oracle="""
    WITH b AS (SELECT count(*) AS total FROM events),
    ranked AS (
      SELECT event_id, ts, row_number() OVER (ORDER BY event_id) AS rn FROM events
    )
    SELECT event_id, ts FROM ranked, b
    WHERE rn > (b.total // 2) - 50 AND rn <= (b.total // 2) + 50
    ORDER BY event_id
    """,
)
def middle_n_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O2: middle-N slice selection (create_sample.py:56-61) — contiguous
    # window centered on the median position. event_id is the dense
    # 0-based positional index of the log (TESTDATA contract, pinned by
    # tests/test_round5_additions.py on every fixture scale), so
    # row_number == event_id + 1 and the middle 100 are exactly the
    # top-100 by distance from the center point (n//2 - 0.5). The center
    # comes from a broadcast single-row count aggregate (bounded NLJ
    # side, whitelisted), and the top-k plans as TakeOrderedAndProject —
    # per-partition 100-row heaps, no single-partition window, no
    # driver-side count() action.
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    total = ev.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    center = F.floor(F.col("_n") / 2) - 0.5
    return (
        ev.join(F.broadcast(total))
        .orderBy(F.abs(F.col("event_id") - center), "event_id")
        .limit(100)
        .select("event_id", "ts")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Set operations (E1-E3)
# ---------------------------------------------------------------------------


@query(
    "set_union_distinct_keys",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    ) ORDER BY custkey
    """,
)
def set_union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.union(b).distinct().orderBy("custkey")


@query(
    "set_except_keys",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY c_custkey
    """,
)
def set_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.exceptAll(o.distinct()).distinct().orderBy("c_custkey")


@query(
    "set_intersect_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY custkey
    """,
)
def set_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "5-LOW").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b).orderBy("custkey")


@query(
    "distinct_sorted_dimension",
    oracle="""
    SELECT DISTINCT n_name FROM nation ORDER BY n_name
    """,
)
def distinct_sorted_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    # E2: sorted(set(basenames)) (v2/patch_utils.py:103).
    return table(spark, sf_dir, "nation").select("n_name").distinct().orderBy("n_name")


# ---------------------------------------------------------------------------
# String / key functions (T1-T6, P11): the reference's key grammar
# ({base}__{orient}__slice_{i:03d}__{TAG}_s{idx:03d}) built and normalized
# with optimizer-visible expressions (never UDFs), exactly as the engine
# does it in the imaging pipeline.
# ---------------------------------------------------------------------------


@query(
    "key_build_and_normalize",
    oracle=r"""
    SELECT printf('vol%03d__%s__slice_%03d__%s_s%03d',
                  CAST(l_orderkey % 100 AS INT),
                  CASE l_returnflag WHEN 'A' THEN 'axial' WHEN 'N' THEN 'coronal' ELSE 'sagittal' END,
                  l_linenumber,
                  CASE CAST(l_suppkey % 3 AS INT) WHEN 0 THEN 'HR' WHEN 1 THEN 'LRx2' ELSE 'LRx4' END,
                  CAST(l_partkey % 50 AS INT)) AS full_key,
           regexp_replace(printf('vol%03d__%s__slice_%03d__%s_s%03d',
                  CAST(l_orderkey % 100 AS INT),
                  CASE l_returnflag WHEN 'A' THEN 'axial' WHEN 'N' THEN 'coronal' ELSE 'sagittal' END,
                  l_linenumber,
                  CASE CAST(l_suppkey % 3 AS INT) WHEN 0 THEN 'HR' WHEN 1 THEN 'LRx2' ELSE 'LRx4' END,
                  CAST(l_partkey % 50 AS INT)),
                  '__(HR|LRx\d+)_(s\d+)$', '__\2') AS norm_key,
           count(*) AS n
    FROM lineitem
    GROUP BY 1, 2 ORDER BY full_key
    """,
)
def key_build_and_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P11 key construction (v2/nii_to_lmdb.py:256) + T1 normalization regex
    # (v2/patch_utils.py:48-50) as pure Catalyst expressions. The aggregate
    # groups on the five narrow COMPONENTS (ints + tiny CASE strings), not
    # on the built 40-char key: the format is injective over the component
    # domains, so the groups are identical, but the shuffle carries a
    # fraction of the bytes and format_string + the normalization regex run
    # once per distinct key instead of once per input row (1.4x at sf0.1,
    # wider at scale where rows >> distinct keys).
    li = table(spark, sf_dir, "lineitem")
    comp = li.groupBy(
        (F.col("l_orderkey") % 100).cast("int").alias("vol"),
        F.when(F.col("l_returnflag") == "A", "axial")
        .when(F.col("l_returnflag") == "N", "coronal")
        .otherwise("sagittal")
        .alias("orient"),
        F.col("l_linenumber").alias("ln"),
        F.when(F.col("l_suppkey") % 3 == 0, "HR")
        .when(F.col("l_suppkey") % 3 == 1, "LRx2")
        .otherwise("LRx4")
        .alias("res"),
        (F.col("l_partkey") % 50).cast("int").alias("pn"),
    ).agg(F.count(F.lit(1)).alias("n"))
    full_key = F.format_string(
        "vol%03d__%s__slice_%03d__%s_s%03d",
        F.col("vol"),
        F.col("orient"),
        F.col("ln"),
        F.col("res"),
        F.col("pn"),
    )
    return (
        comp.select(full_key.alias("full_key"), "n")
        .withColumn(
            "norm_key",
            F.regexp_replace("full_key", r"__(HR|LRx\d+)_(s\d+)$", "__$2"),
        )
        .select("full_key", "norm_key", "n")
        .orderBy("full_key")
    )


@query(
    "path_basename_extract",
    oracle=r"""
    SELECT doc_id,
           printf('/data/ds%03d/anat/sub-%05d_T1w.nii.gz', CAST(doc_id % 7 AS INT), CAST(doc_id AS INT)) AS path,
           regexp_extract(printf('/data/ds%03d/anat/sub-%05d_T1w.nii.gz', CAST(doc_id % 7 AS INT), CAST(doc_id AS INT)),
                          '([^/]+?)\.nii\.gz$', 1) AS base,
           CASE WHEN regexp_matches(printf('/data/ds%03d/anat/sub-%05d_T1w.nii.gz', CAST(doc_id % 7 AS INT), CAST(doc_id AS INT)),
                          '.*/anat/.*') THEN 1 ELSE 0 END AS matches_anat
    FROM documents ORDER BY doc_id
    """,
)
def path_basename_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T3 basename/extension strip (slice_generator.py:77) + F1 path-regex
    # predicate (slice_generator.py:80-81) over a synthesized path column.
    d = table(spark, sf_dir, "documents")
    path = F.format_string(
        "/data/ds%03d/anat/sub-%05d_T1w.nii.gz",
        (F.col("doc_id") % 7).cast("int"),
        F.col("doc_id").cast("int"),
    )
    return (
        d.select("doc_id", path.alias("path"))
        .withColumn("base", F.regexp_extract("path", r"([^/]+?)\.nii\.gz$", 1))
        .withColumn("matches_anat", F.when(F.col("path").rlike(".*/anat/.*"), 1).otherwise(0))
        .orderBy("doc_id")
    )


@query(
    "field_target_parse",
    oracle="""
    SELECT field_str,
           coalesce(try_cast(replace(replace(lower(field_str), 't', ''), ',', '.') AS DOUBLE), 3.0) AS field_tesla,
           count(*) AS n
    FROM (
      SELECT CASE CAST(o_orderkey % 5 AS INT)
               WHEN 0 THEN '3T' WHEN 1 THEN '1.5T' WHEN 2 THEN '7t'
               WHEN 3 THEN '1,5T' ELSE 'bogus' END AS field_str
      FROM orders
    ) GROUP BY 1 ORDER BY field_str
    """,
)
def field_target_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T5: '3T' -> 3.0 parser (transform_lower_tesla.py:390-395): lowercase,
    # strip 't', comma->dot, fallback 3.0.
    o = table(spark, sf_dir, "orders")
    field_str = (
        F.when(F.col("o_orderkey") % 5 == 0, "3T")
        .when(F.col("o_orderkey") % 5 == 1, "1.5T")
        .when(F.col("o_orderkey") % 5 == 2, "7t")
        .when(F.col("o_orderkey") % 5 == 3, "1,5T")
        .otherwise("bogus")
    )
    return (
        o.select(field_str.alias("field_str"))
        .withColumn(
            "field_tesla",
            F.expr(
                "coalesce(try_cast(replace(replace(lower(field_str), 't', ''), ',', '.') AS double), 3.0D)"
            ),
        )
        .groupBy("field_str", "field_tesla")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("field_str")
    )


@query(
    "date_format_monthly_rollup",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           count(*) AS order_count,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS month_total
    FROM orders GROUP BY 1 ORDER BY order_month
    """,
)
def date_format_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T6 timestamp formatting (slice_generator.py:34) + calendar bucketing.
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            (F.sum(cents(F.col("o_totalprice"))) / 100.0).alias("month_total"),
        )
        .orderBy("order_month")
    )


@query(
    "math_scalar_functions",
    oracle="""
    SELECT p_partkey,
           round(sqrt(p_retailprice), 6) AS sqrt_price,
           round(ln(p_retailprice), 6) AS ln_price,
           round(exp(p_retailprice / 1000.0), 6) AS exp_scaled,
           round(pow(p_size, 2), 6) AS size_sq,
           round(sin(p_size), 6) AS sin_size,
           abs(p_size - 25) AS abs_off,
           CAST(sign(p_size - 25) AS DOUBLE) AS sign_off
    FROM part ORDER BY p_partkey
    """,
)
def math_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T7: the SQL-expressible slice of the math surface (exp/sin/sqrt/pow),
    # rounded to 6 dp on both engines to absorb libm last-ulp differences.
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.exp(F.col("p_retailprice") / 1000.0), 6).alias("exp_scaled"),
        F.round(F.pow("p_size", F.lit(2)), 6).alias("size_sq"),
        F.round(F.sin("p_size"), 6).alias("sin_size"),
        F.abs(F.col("p_size") - 25).alias("abs_off"),
        F.signum(F.col("p_size") - 25).cast("double").alias("sign_off"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Deterministic splits (M1-M3). The reference's seeded shuffles
# (sklearn random_state=42, np default_rng(123)) cannot be reproduced
# engine-independently, so the engine defines splits over md5 key hashes:
# deterministic under retries/speculation/AQE (SURVEY.md §7 hard parts) and
# identically computable by any engine — the property that matters.
# ---------------------------------------------------------------------------


@query(
    "split_exact_count_rank",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
             count(*) OVER () AS n
      FROM orders
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_rows, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM (
      SELECT o_orderkey,
             CASE WHEN rn <= CAST(floor(n * 0.8) AS BIGINT) THEN 'train'
                  WHEN rn <= CAST(floor(n * 0.8) AS BIGINT) + CAST(floor(n * 0.1) AS BIGINT) THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked
    ) GROUP BY split ORDER BY split
    """,
)
def split_exact_count_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # M1: exact-count split (utils_scripts.py:46-51 semantics) via md5-rank —
    # train gets exactly floor(n*0.8) rows, matching sklearn's exact-count
    # slicing rather than Bernoulli randomSplit. The rank comes from the
    # two-phase offset scheme (operators/rank.py) and the total row count
    # falls out of its per-partition counts, so the plan has neither a
    # single-partition row_number window nor a count(*) OVER () window.
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string").cast("binary")).alias("hkey"),
    )
    ranked, n = global_row_number(o, ["hkey", "o_orderkey"], rank_col="rn")
    n_train = int(n * 0.8)
    n_val = int(n * 0.1)
    split = (
        F.when(F.col("rn") <= n_train, "train")
        .when(F.col("rn") <= n_train + n_val, "val")
        .otherwise("test")
    )
    return (
        ranked.select("o_orderkey", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("split")
    )


@query(
    "split_hash_bucket",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < 'f333' THEN 'train'
                WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < 'fae1' THEN 'val'
                ELSE 'test' END AS split
    FROM orders ORDER BY o_orderkey
    """,
)
def split_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    # M3 at scale: stateless hash-bucket split (0.95/0.03/0.02 like
    # v2/nii_to_lmdb.py:51) — no global sort, no shuffle, embarrassingly
    # parallel, stable under data growth. Thresholds are hex prefixes:
    # 0.95*65536=0xf333, 0.98*65536=0xfae1.
    o = table(spark, sf_dir, "orders")
    hx = F.substring(F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 4)
    split = (
        F.when(hx < "f333", "train").when(hx < "fae1", "val").otherwise("test")
    )
    return o.select("o_orderkey", split.alias("split")).orderBy("o_orderkey")


@query(
    "split_group_consistent",
    oracle="""
    WITH cust_split AS (
      SELECT c_custkey,
             CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split
      FROM customer
    )
    SELECT s.split, CAST(count(*) AS BIGINT) AS order_count,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS customer_count
    FROM orders o JOIN cust_split s ON o.o_custkey = s.c_custkey
    GROUP BY s.split ORDER BY s.split
    """,
)
def split_group_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    # M2/J3: group-consistent split (v2/patch_utils.py:101-111) — split
    # decided on the parent unit (customer ~ volume base) and joined back so
    # all child rows land in one split. Parent dim is broadcast.
    c = table(spark, sf_dir, "customer").select("c_custkey")
    hx = F.substring(F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 4)
    cust_split = c.withColumn(
        "split",
        F.when(hx < "cccc", "train").when(hx < "e666", "val").otherwise("test"),
    )
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        o.join(F.broadcast(cust_split), o.o_custkey == cust_split.c_custkey)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("o_custkey").alias("customer_count"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Conditional aggregation + pivot (A9 counters-per-category shape)
# ---------------------------------------------------------------------------


@query(
    "conditional_agg_counters",
    oracle="""
    SELECT l_linestatus,
           CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS returned,
           CAST(count(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS accepted,
           CAST(count(*) FILTER (WHERE l_returnflag = 'N') AS BIGINT) AS neither,
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS big_discount
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def conditional_agg_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A9: per-category counters (v2/nii_to_lmdb.py:193-199) — one pass,
    # map-side combinable count_if columns instead of N filtered scans.
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count_if(F.col("l_returnflag") == "R").alias("returned"),
            F.count_if(F.col("l_returnflag") == "A").alias("accepted"),
            F.count_if(F.col("l_returnflag") == "N").alias("neither"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("big_discount"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "pivot_event_type_counts",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY 1 ORDER BY user_bucket
    """,
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A10 report shape as a pivot; values enumerated so Catalyst skips the
    # extra distinct-discovery job (mandatory at 100 TB).
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
        .orderBy("user_bucket")
    )


@query(
    "cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents(F.col("o_totalprice"))) / 100.0).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


@query(
    "two_phase_robust_normalize",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag AS grp,
             quantile_cont(l_extendedprice, 0.01) AS vmin,
             quantile_cont(l_extendedprice, 0.99) AS vmax
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber,
           round(least(greatest((l.l_extendedprice - s.vmin) / (s.vmax - s.vmin + 1e-12), 0.0), 1.0), 6) AS norm_price
    FROM lineitem l JOIN stats s ON l.l_returnflag = s.grp
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def two_phase_robust_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2+P5: THE two-phase pattern of the imaging pipeline — per-volume
    # robust percentiles precomputed once (v2/nii_to_lmdb_paralel.py:248-257),
    # broadcast back, applied per row with clip + epsilon guard
    # (v2/patch_utils.py:25-34). Group stats are tiny => broadcast join, so
    # the fact table is never shuffled.
    li = table(spark, sf_dir, "lineitem")
    # one percentile aggregate (array of percentages): single buffer + sort
    stats = (
        li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.percentile("l_extendedprice", F.array(F.lit(0.01), F.lit(0.99))).alias("ps"))
        .select("grp", F.col("ps")[0].alias("vmin"), F.col("ps")[1].alias("vmax"))
    )
    norm = F.round(
        F.least(
            F.greatest(
                (F.col("l_extendedprice") - F.col("vmin")) / (F.col("vmax") - F.col("vmin") + F.lit(1e-12)),
                F.lit(0.0),
            ),
            F.lit(1.0),
        ),
        6,
    )
    return (
        li.join(F.broadcast(stats), li.l_returnflag == stats.grp)
        .select("l_orderkey", "l_linenumber", norm.alias("norm_price"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "agg_skew_salted_two_stage",
    oracle=f"""
    -- Oracle is the PLAIN aggregate: salting is a physical rewrite with
    -- identical semantics (count/sum decompose over any partition of the
    -- rows).
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum({cents_sql("value")}) / 100.0 AS total_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def agg_skew_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hot-key-safe aggregation: stage 1 aggregates on (key, salt) so a key
    # owning 30% of the corpus spreads over 32 reducers; stage 2 re-sums the
    # 32 partials per key. Decomposable aggs only (count/sum/min/max —
    # exactly the reference's split/scale counters, v2/nii_to_lmdb.py:
    # 193-199). For groupBy, Spark's map-side partial agg already bounds
    # reducer load at #map-partitions x #keys; the explicit salt stage is
    # the plan you need when the same skew hits a WINDOW partition or a
    # high-cardinality-combiner agg, so it's declared here as a first-class
    # named shape. The salt never reaches the output — any hash works, no
    # cross-engine determinism needed.
    ev = table(spark, sf_dir, "events")
    salted = ev.groupBy(
        "event_type", F.pmod(F.xxhash64("event_id"), F.lit(32)).alias("salt")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(cents(F.col("value"))).alias("pv"),
    )
    return (
        salted.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            (F.sum("pv") / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
    )


RANGE_WINDOW_SEC = 300  # errors counted within 5 minutes after each purchase


@query(
    "join_range_time_bucketed",
    oracle=f"""
    -- Band join (no equi key): for each purchase, errors in the next 5
    -- minutes. DuckDB plans this natively (IEJoin); the Spark side shows
    -- the bucketed rewrite that avoids a nested-loop cross product.
    SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_errors
    FROM events p
    JOIN events r
      ON p.event_type = 'purchase' AND r.event_type = 'error'
     AND r.ts >= p.ts AND r.ts < p.ts + INTERVAL {RANGE_WINDOW_SEC} SECOND
    GROUP BY 1
    ORDER BY 1
    """,
)
def join_range_time_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A pure range predicate gives Spark no equi key => BroadcastNestedLoop
    # (O(n*m), the plan that dies at scale). The rewrite: quantize time into
    # window-width buckets, replicate each probe row into the <=2 buckets
    # its window can touch, then equi-join on bucket with the exact range
    # predicate as a residual filter. Fan-out is bounded by bucket
    # occupancy (rows per 5-minute bucket), never n*m; the bucket join
    # shuffles on a uniformly distributed integer. Same rewrite the
    # streaming engine applies to stream-stream interval joins.
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    width = RANGE_WINDOW_SEC * 1_000_000
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("ets"), (F.unix_micros(F.col("ts")) / width).cast("long").alias("bucket")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", (us / width).cast("long").alias("b0"))
        .select("event_id", "ts", F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"))
    )
    return (
        purchases.join(errors, "bucket")
        .filter(
            (F.col("ets") >= F.col("ts"))
            & (F.unix_micros(F.col("ets")) < F.unix_micros(F.col("ts")) + width)
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .orderBy("event_id")
    )


@query(
    "semi_structured_json_extract",
    oracle="""
    -- Semi-structured payloads: extract a typed field from the JSON props
    -- column and aggregate on it — the schema-on-read path every event
    -- pipeline needs.
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def semi_structured_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # from_json with an explicit schema (not get_json_object string-probes):
    # the parse happens once per row into a typed struct, the extracted
    # column is then a plain long for Catalyst — filter/agg pushdown and
    # codegen all apply. At scale, parse-once-then-project beats repeated
    # per-field JSON probing linearly in field count.
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json(F.col("props"), "k long").alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "report_unpivot_long",
    oracle=f"""
    -- Wide-to-long report reshape (UNPIVOT / melt): per-priority order
    -- metrics computed once in a wide aggregate, then unpivoted into the
    -- (dimension, metric, value) long form reporting stores ingest.
    -- Money metrics go through exact integer cents before the final
    -- divide, so the doubles are bit-identical across engines.
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(count(*) AS DOUBLE) AS n_orders,
             round(CAST(sum({cents_sql('o_totalprice')}) AS BIGINT) / 100.0, 6)
               AS total_price,
             round(max({cents_sql('o_totalprice')}) / 100.0, 6) AS max_price
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, metric, value FROM (
      SELECT o_orderpriority, 'max_price' AS metric, max_price AS value FROM wide
      UNION ALL
      SELECT o_orderpriority, 'n_orders', n_orders FROM wide
      UNION ALL
      SELECT o_orderpriority, 'total_price', total_price FROM wide
    ) ORDER BY o_orderpriority, metric
    """,
)
def report_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One wide aggregate (single shuffle on the 5-value priority key) then
    # DataFrame.unpivot — Catalyst's Expand over the already-aggregated
    # 5-row frame, so the reshape itself touches no base data. The inverse
    # of pivot_event_type_counts; together they round-trip the report
    # layouts. Metric values are unified to double (unpivot requires one
    # value type), money via exact cents.
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum(cents(F.col("o_totalprice"))) / 100.0, 6).alias("total_price"),
        F.round(F.max(cents(F.col("o_totalprice"))) / 100.0, 6).alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["max_price", "n_orders", "total_price"],
        "metric",
        "value",
    ).orderBy("o_orderpriority", "metric")


@query(
    "sql_scalar_subquery_decorrelated",
    oracle="""
    -- Correlated scalar subquery: orders priced above their customer's
    -- average order price. The comparison cross-multiplies exact integer
    -- cents (price * n > sum) instead of comparing against a float
    -- average, so the boundary rows agree bit-for-bit across engines.
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o
    WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
          * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          > (SELECT CAST(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o.o_orderkey
    """,
)
def sql_scalar_subquery_decorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SQL-text entry point: the engine accepts ANSI SQL with correlated
    # scalar subqueries and Catalyst decorrelates them into aggregate +
    # join (RewriteCorrelatedScalarSubquery) — no per-row re-execution,
    # which is what makes the construct survive at 100 TB. Both correlated
    # aggregates group on the same key, so they collapse into one shuffle
    # of orders plus one join back.
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqlq")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey
        FROM orders_sqlq o
        WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
              * (SELECT count(*) FROM orders_sqlq o2
                 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                 FROM orders_sqlq o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey
        """
    )


@query(
    "topk_unshipped_orders",
    oracle=f"""
    -- TPC-H Q3 shape (shipping priority): revenue still in flight per
    -- order — ordered before the cutoff, with lineitems shipping after
    -- it. Revenue accumulates in exact integer 1e-4 units (BIGINT), so
    -- the descending sort and the final doubles agree across engines.
    SELECT l.l_orderkey,
           round(CAST(sum({REVENUE_FIXED_SQL}) AS BIGINT) / 10000.0, 6) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY CAST(sum({REVENUE_FIXED_SQL}) AS BIGINT) DESC, l.l_orderkey
    LIMIT 10
    """,
)
def topk_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both date predicates push down to their parquet scans BEFORE the
    # join (Catalyst moves them below), so the join sees only the cutoff
    # slices of each table; the top-10 runs as TakeOrderedAndProject on
    # the post-aggregation frame — no global sort materialization. The
    # sort key is the exact fixed-point revenue, tiebroken on orderkey.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cutoff = "1998-01-01"
    joined = li.filter(F.col("l_shipdate") > cutoff).join(
        o.filter(F.col("o_orderdate") < cutoff),
        li.l_orderkey == o.o_orderkey,
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))).alias(
            "rev_fixed"
        )
    )
    return (
        agg.orderBy(F.col("rev_fixed").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("rev_fixed") / 10000.0, 6).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate", "l_suppkey"]


@query(
    "data_profile_summary",
    oracle=f"""
    -- Dataset profiling (the health check run before any 100 TB corpus
    -- job): per column — null count, distinct count, min/max — computed
    -- in ONE wide aggregate over one scan, reshaped to long form.
    WITH wide AS (
      SELECT count(*) AS n_rows,
             {", ".join(
                 f"count(*) - count({c}) AS nn_{c},"
                 f" count(DISTINCT {c}) AS nd_{c},"
                 f" CAST(min({c}) AS VARCHAR) AS mn_{c},"
                 f" CAST(max({c}) AS VARCHAR) AS mx_{c}"
                 for c in _PROFILE_COLS)}
      FROM lineitem
    )
    SELECT column_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nulls AS BIGINT) AS n_nulls,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           min_value, max_value
    FROM (
      {" UNION ALL ".join(
          f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_nulls,"
          f" nd_{c} AS n_distinct, mn_{c} AS min_value, mx_{c} AS max_value FROM wide"
          for c in _PROFILE_COLS)}
    ) ORDER BY column_name
    """,
)
def data_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One independent single-column aggregate per profiled column, unioned.
    # NOT the single wide multi-DISTINCT aggregate: five distinct-aggs in
    # one agg plan through Catalyst's Expand (6x row multiplication, one
    # giant mixed grouping) — measured 7.6x slower at sf0.1. The union
    # branches each scan ONE parquet column (ReadSchema shows the pruning),
    # run concurrently, and a distinct-agg per branch keeps hash tables
    # per-column-sized. min/max stringified post-aggregation so one schema
    # fits all types.
    li = table(spark, sf_dir, "lineitem")
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            li.select(F.col(c)).agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.count_distinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column_name")


SALT_FANOUT = 16


@query(
    "join_skew_salted_replicated",
    oracle="""
    -- Oracle is the PLAIN join + aggregate: salting is a physical rewrite
    -- with identical semantics (the replicated small side guarantees every
    -- salted big-side row still meets its match exactly once).
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_value
    FROM events e
    JOIN (SELECT DISTINCT event_type FROM events WHERE event_type <> 'error') t
      ON e.event_type = t.event_type
    GROUP BY 1 ORDER BY 1
    """,
)
def join_skew_salted_replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The salted-JOIN companion to agg_skew_salted_two_stage: when a join
    # key is hot enough that one reducer drowns (and the small side is too
    # big to broadcast), salt the big side with pmod(hash(row), S) and
    # REPLICATE the small side S times, joining on (key, salt) — each hot
    # key now spreads over S reducers. Replication multiplies the small
    # side by S, which is why S stays modest (16) and why broadcast wins
    # whenever it fits; AQE's skew-join split is the runtime fallback.
    # The salt is derived from a stable row id, never rand(), so retries
    # and speculative tasks stay deterministic.
    ev = table(spark, sf_dir, "events")
    dim = ev.select("event_type").filter(F.col("event_type") != "error").distinct()
    salted_big = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_FANOUT))
    )
    replicated_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_FANOUT - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    return (
        salted_big.join(replicated_dim.hint("shuffle_hash"), ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "orders_monthly_growth",
    oracle=f"""
    -- Month-over-month revenue growth: aggregate to the month grain, then
    -- a lag window over the (tiny) monthly series. Revenue is exact
    -- integer cents end-to-end; only the growth ratio is a rounded double.
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum({cents_sql('o_totalprice')}) AS BIGINT) AS rev_cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, round(rev_cents / 100.0, 6) AS revenue, n_orders,
           round((rev_cents - lag(rev_cents) OVER (ORDER BY month))
                 * 1.0 / lag(rev_cents) OVER (ORDER BY month), 6) AS mom_growth
    FROM m ORDER BY month
    """,
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate-then-window: the shuffle-heavy step is the month rollup
    # (map-side combined, ~80 output rows); the unpartitioned lag window
    # runs AFTER reduction, so the single-task global sort it implies only
    # ever sees the month-grain series — the composition order that keeps
    # unpartitioned windows harmless at any scale.
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "month",
        F.round(F.col("rev_cents") / 100.0, 6).alias("revenue"),
        "n_orders",
        F.round((F.col("rev_cents") - prev) / prev, 6).alias("mom_growth"),
    ).orderBy("month")


@query(
    "nation_revenue_share",
    oracle=f"""
    -- Percent-of-total: each nation's revenue share of the global total,
    -- computed as a window-over-aggregate (the total never leaves the
    -- 25-row post-aggregation frame). Exact integer revenue; the share
    -- divides two BIGINTs of the same unit so rounding is stable.
    WITH rev AS (
      SELECT n.n_name,
             CAST(sum({REVENUE_FIXED_SQL}) AS BIGINT) AS rev_fixed
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT n_name,
           round(rev_fixed / 10000.0, 6) AS revenue,
           round(rev_fixed * 1.0 / sum(rev_fixed) OVER (), 6) AS share
    FROM rev ORDER BY n_name
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The percent-of-total pattern done in the only scale-safe order:
    # aggregate FIRST (map-side combined shuffle on the 25-value nation
    # key), then the unpartitioned total-sum window over the 25-row
    # result. Dimension joins broadcast (customer->nation chain); the fact
    # table shuffles once, for the aggregate.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))
            ).alias("rev_fixed")
        )
    )
    total = F.sum("rev_fixed").over(Window.partitionBy())
    return rev.select(
        "n_name",
        F.round(F.col("rev_fixed") / 10000.0, 6).alias("revenue"),
        F.round(F.col("rev_fixed") / total, 6).alias("share"),
    ).orderBy("n_name")


@query(
    "histogram_equi_depth",
    oracle="""
    -- Equi-depth (quantile-binned) histogram over price: NTILE(10) with a
    -- fully deterministic order (value, then the composite row id), then
    -- per-bucket boundaries + counts — the optimizer-statistics shape, and
    -- the complement of the equi-WIDTH width_bucket histogram.
    WITH b AS (
      SELECT l_extendedprice,
             ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket
      FROM lineitem
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
    FROM b GROUP BY 1 ORDER BY bucket
    """,
)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTILE needs a total order, but NOT a single-partition window: the
    # two-phase offset rank (operators/rank.py) delivers the exact global
    # row_number from a range-partitioned parallel sort, and the NTILE
    # bucket is then a pure projection of (rank, total) — identical
    # assignment to ntile(10) OVER (ORDER BY ...), ties broken on the
    # composite row id so both engines agree at bucket edges. The approx
    # twin for the same artifact is percentile_approx over bucket
    # boundaries (test_scale_paths pins the approx-vs-exact tolerance).
    li = table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked, n = global_row_number(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], rank_col="rn"
    )
    b = ranked.select(
        "l_extendedprice", ntile_from_rank(F.col("rn"), n, 10).alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "shipping_delay_distribution",
    oracle="""
    -- Date arithmetic + exact distribution stats: order-to-ship delay in
    -- days, summarized per priority (mean / median / p95 / max). Delays
    -- are integers (date_diff of day-truncated timestamps), so every
    -- statistic except the mean is integer-exact; the mean divides two
    -- exact integers.
    WITH d AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(avg(delay_days), 6) AS avg_delay,
           CAST(median(delay_days) AS DOUBLE) AS median_delay,
           CAST(quantile_cont(delay_days, 0.95) AS DOUBLE) AS p95_delay,
           CAST(max(delay_days) AS BIGINT) AS max_delay
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def shipping_delay_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The delay column is computed BEFORE the aggregate on the joined
    # stream (narrow arithmetic, codegen); one shuffle on the 5-value
    # priority key with partial aggregation. Exact percentiles are the
    # correctness contract; percentile_approx is the documented swap at
    # scale (test_scale_paths pins the tolerance).
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.avg("delay_days"), 6).alias("avg_delay"),
            F.median("delay_days").alias("median_delay"),
            F.percentile("delay_days", F.lit(0.95)).alias("p95_delay"),
            F.max("delay_days").cast("long").alias("max_delay"),
        )
        .orderBy("o_orderpriority")
    )


RFM_CUTOFF = "2001-09-01"  # "today" for recency; just past max o_orderdate


@query(
    "customer_rfm_segments",
    oracle=f"""
    -- RFM segmentation: per customer, Recency (days since last order),
    -- Frequency (order count), Monetary (exact cents revenue), each
    -- scored into quartiles by NTILE with fully deterministic tie-breaks
    -- (the metric, then c_custkey), then summarized per segment.
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), TIMESTAMP '{RFM_CUTOFF}') AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score,
             monetary_cents
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(monetary_cents) / 100.0, 6) AS segment_revenue
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle builds the per-customer RFM frame (map-side combined);
    # each NTILE score is a projection of (two-phase global rank, total) —
    # three range-partitioned parallel sorts of the customer-grain frame
    # (operators/rank.py), never a single-partition window. The final
    # segment rollup is a 64-cell aggregate.
    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_CUTOFF).cast("timestamp"), F.max("o_orderdate")).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents(F.col("o_totalprice"))).alias("monetary_cents"),
    )
    r1, n = global_row_number(rfm, ["recency_days", "o_custkey"], rank_col="_r_rn")
    r2, _ = global_row_number(
        r1, [F.desc("frequency"), F.asc("o_custkey")], rank_col="_f_rn"
    )
    r3, _ = global_row_number(
        r2, [F.desc("monetary_cents"), F.asc("o_custkey")], rank_col="_m_rn"
    )
    scored = r3.select(
        "o_custkey",
        "monetary_cents",
        ntile_from_rank(F.col("_r_rn"), n, 4).alias("r_score"),
        ntile_from_rank(F.col("_f_rn"), n, 4).alias("f_score"),
        ntile_from_rank(F.col("_m_rn"), n, 4).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary_cents") / 100.0, 6).alias("segment_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "agg_argmax_max_by",
    oracle=f"""
    -- Per-nation argmax/argmin without a self-join or window: max_by /
    -- min_by over a composed exact-integer ordering key (cents(acctbal)
    -- scaled, custkey as tie-break) so the winner is unique and identical
    -- in both engines even when balances tie.
    WITH k AS (
      SELECT c_nationkey, c_name, c_acctbal,
             {cents_sql('c_acctbal')} * 10000000 + c_custkey AS okey
      FROM customer
    )
    SELECT n.n_name,
           max_by(k.c_name, k.okey) AS richest_customer,
           min_by(k.c_name, k.okey) AS poorest_customer,
           round(max(k.c_acctbal), 6) AS max_acctbal,
           round(min(k.c_acctbal), 6) AS min_acctbal,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM k JOIN nation n ON k.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def agg_argmax_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_by/min_by fold argmax into the ONE existing aggregation shuffle
    # — the 100 TB replacement for the "window rank + filter rn=1" idiom,
    # which would add a per-group sort. The ordering key is exact long
    # arithmetic (cents * 1e7 + custkey), collision-free while custkey
    # < 1e7 — holds through sf100; revisit the scale factor beyond that.
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    okey = cents(F.col("c_acctbal")) * 10000000 + F.col("c_custkey")
    return (
        c.select("c_nationkey", "c_name", "c_acctbal", okey.alias("okey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", "okey").alias("richest_customer"),
            F.min_by("c_name", "okey").alias("poorest_customer"),
            F.round(F.max("c_acctbal"), 6).alias("max_acctbal"),
            F.round(F.min("c_acctbal"), 6).alias("min_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("n_name")
    )


@query(
    "revenue_pareto_share",
    oracle=f"""
    -- Pareto concentration: customers ranked by lifetime order value,
    -- running cumulative share of total revenue, and the 80%-frontier
    -- flag. The boundary test is exact integer arithmetic
    -- (5*cum <= 4*total  <=>  share <= 0.8) so the flag can never flip
    -- on float rounding; the rounded share column is display-only.
    WITH r AS (
      SELECT o_custkey AS custkey,
             sum({cents_sql('o_totalprice')}) AS rev_cents
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT custkey, rev_cents,
             sum(rev_cents) OVER (ORDER BY rev_cents DESC, custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
             sum(rev_cents) OVER () AS tot_cents,
             row_number() OVER (ORDER BY rev_cents DESC, custkey) AS rev_rank
      FROM r
    )
    SELECT custkey, CAST(rev_rank AS BIGINT) AS rev_rank,
           round(rev_cents / 100.0, 6) AS revenue,
           round(cum_cents * 1.0 / tot_cents, 6) AS cum_share,
           5 * cum_cents <= 4 * tot_cents AS in_top80
    FROM t ORDER BY rev_rank
    """,
)
def revenue_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate-then-rank: the running share is computed over the
    # CUSTOMER-grain aggregate (|customers| rows), never over raw orders —
    # at 100 TB the scan+agg is the only heavy stage and it partial-aggs
    # map-side. Rank, running sum, AND the global total all come from the
    # two-phase offset scheme (operators/rank.py global_order_prefix):
    # range-partitioned sort, per-partition (count, sum) collected once
    # (bounded driver state), partition-local cumulative window keyed by
    # the range bucket. No single-partition stage; the exact-cents prefix
    # sums are associative, so the result is partitioning-independent.
    o = table(spark, sf_dir, "orders")
    r = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents(F.col("o_totalprice"))).alias("rev_cents")
    )
    t, _n, tot_cents = global_order_prefix(
        r,
        [F.desc("rev_cents"), F.asc("custkey")],
        sum_col="rev_cents",
        rank_col="rev_rank",
        cum_col="cum_cents",
    )
    return t.select(
        "custkey",
        F.col("rev_rank").cast("long").alias("rev_rank"),
        F.round(F.col("rev_cents") / 100.0, 6).alias("revenue"),
        F.round(F.col("cum_cents") / F.lit(tot_cents), 6).alias("cum_share"),
        (5 * F.col("cum_cents") <= 4 * F.lit(tot_cents)).alias("in_top80"),
    ).orderBy("rev_rank")


CDC_CUTOFF = "2024-01-25"  # base snapshot before, change batch after


@query(
    "cdc_upsert_latest_wins",
    oracle=f"""
    -- Lakehouse MERGE / CDC apply, expressed shuffle-minimally: base
    -- snapshot (latest state per user before the cutoff) unioned with the
    -- change batch, then ONE latest-wins pick per key — never a per-row
    -- MERGE loop. action classifies the outcome per key: update (delta
    -- superseded base), insert (new key), unchanged (no delta arrived).
    WITH base AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM (SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '{CDC_CUTOFF}')
      WHERE rn = 1
    ),
    delta AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM events WHERE ts >= TIMESTAMP '{CDC_CUTOFF}'
    ),
    merged AS (
      SELECT user_id, state, ts, src,
             -- event_id is the FINAL tie-breaker: two delta events with
             -- identical (user_id, ts) otherwise tie nondeterministically
             -- and engines can pick different rows
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, src DESC, event_id DESC) AS rn,
             max(CASE WHEN src = 'delta' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS has_delta,
             max(CASE WHEN src = 'base' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS has_base
      FROM (SELECT *, 'base' AS src FROM base
            UNION ALL SELECT *, 'delta' AS src FROM delta)
    )
    SELECT user_id, state AS current_state, ts AS state_ts,
           CASE WHEN has_base = 0 THEN 'insert'
                WHEN has_delta = 0 THEN 'unchanged'
                ELSE 'update' END AS action
    FROM merged WHERE rn = 1 ORDER BY user_id
    """,
)
def cdc_upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The union co-partitions on user_id once; latest-wins row_number and
    # the two existence censuses share that single window shuffle. At
    # 100 TB the base side is the big one — the plan never rewrites
    # untouched rows (they flow through the same one pass), which is the
    # property that makes log-structured CDC apply viable.
    ev = table(spark, sf_dir, "events")
    cut = F.lit(CDC_CUTOFF).cast("timestamp")
    w_latest = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    base = (
        ev.filter(F.col("ts") < cut)
        .select(
            "user_id", F.col("event_type").alias("state"), "ts", "event_id",
            F.row_number().over(w_latest).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "state", "ts", "event_id", F.lit("base").alias("src"))
    )
    delta = ev.filter(F.col("ts") >= cut).select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id",
        F.lit("delta").alias("src"),
    )
    u = base.unionByName(delta)
    w_user = Window.partitionBy("user_id")
    # event_id as the final tie-breaker: identical (user_id, ts) delta
    # events would otherwise tie nondeterministically across engines/runs
    w_pick = w_user.orderBy(F.desc("ts"), F.desc("src"), F.desc("event_id"))
    m = u.select(
        "user_id", "state", "ts",
        F.row_number().over(w_pick).alias("rn"),
        F.max(F.when(F.col("src") == "delta", 1).otherwise(0))
        .over(w_user).alias("has_delta"),
        F.max(F.when(F.col("src") == "base", 1).otherwise(0))
        .over(w_user).alias("has_base"),
    )
    return (
        m.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("state").alias("current_state"),
            F.col("ts").alias("state_ts"),
            F.when(F.col("has_base") == 0, "insert")
            .when(F.col("has_delta") == 0, "unchanged")
            .otherwise("update")
            .alias("action"),
        )
        .orderBy("user_id")
    )


@query(
    "ingest_union_schema_drift",
    oracle="""
    -- Schema-drift ingestion: two batches with different column sets
    -- (old writer lacks priority; new writer dropped totalprice) are
    -- aligned BY NAME with missing columns null-filled, then audited.
    -- The read-side answer to schema evolution when rewriting history
    -- is off the table.
    WITH a AS (
      SELECT o_orderkey, o_totalprice, o_orderdate, 'v1' AS batch
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
      SELECT o_orderkey, o_orderdate, o_orderpriority, 'v2' AS batch
      FROM orders WHERE o_orderkey % 3 = 1
    ),
    u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
    SELECT batch,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_totalprice) AS BIGINT) AS n_totalprice,
           CAST(count(o_orderpriority) AS BIGINT) AS n_priority,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date
    FROM u GROUP BY batch ORDER BY batch
    """,
)
def ingest_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unionByName(allowMissingColumns=True) is position-independent and
    # null-fills the drift — the batch twin of the store's mergeSchema
    # read (operators/pipeline.py read_dataset). Nothing shuffles until
    # the audit aggregate; column pruning still reaches both scans.
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderdate", F.lit("v1").alias("batch")
    )
    b = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderdate", "o_orderpriority", F.lit("v2").alias("batch")
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return (
        u.groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_totalprice").alias("n_totalprice"),
            F.count("o_orderpriority").alias("n_priority"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .orderBy("batch")
    )


@query(
    "fk_integrity_audit",
    oracle="""
    -- Referential-integrity audit across the star schema: orphan counts
    -- per FK edge in one report. Each edge is an anti-join; COUNT rows
    -- that reference a missing parent. The nightly DQ gate before any
    -- downstream join assumes clean keys.
    SELECT 'lineitem->orders' AS fk_edge,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
           CAST((SELECT count(*) FROM customer) AS BIGINT)
    ORDER BY fk_edge
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Each edge is a left-anti join reduced to a count — at 100 TB the
    # dimension side of every edge broadcasts (orders' key set is the big
    # exception: that edge shuffles once on orderkey and AQE picks SMJ vs
    # shuffled-hash from runtime stats). The three one-row frames union
    # into the report; totals ride the same scans via count aggregates.
    # Fully lazy: each edge is child LEFT JOIN parent-keys -> one agg row
    # (count(*) + count of null parents); no driver-side actions, so the
    # whole report is ONE job and Catalyst can share scans.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")

    def edge(name, child, key, parent_keys, pkey):
        return (
            child.select(key)
            .join(parent_keys, F.col(key) == F.col(pkey), "left")
            .agg(
                F.lit(name).alias("fk_edge"),
                F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .select("fk_edge", "n_orphans", "n_rows")
        )

    return (
        edge("lineitem->orders", li, "l_orderkey", o.select("o_orderkey"), "o_orderkey")
        .unionByName(edge("orders->customer", o, "o_custkey", c.select("c_custkey"), "c_custkey"))
        .unionByName(
            edge("customer->nation", c, "c_nationkey", F.broadcast(n.select("n_nationkey")), "n_nationkey")
        )
        .orderBy("fk_edge")
    )


@query(
    "cdc_apply_with_deletes",
    oracle=f"""
    -- Full MERGE semantics incl. tombstones: deltas whose event_type is
    -- 'error' act as DELETE ops for their key; other deltas upsert.
    -- Single-pass form: union base+delta, one latest-wins window, then a
    -- post-merge classify — deleted keys survive into the report (action
    -- 'delete', state NULL) so downstream consumers can propagate the
    -- tombstone; rows never loop through per-row MERGE logic.
    WITH base AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM (SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '{CDC_CUTOFF}')
      WHERE rn = 1
    ),
    delta AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM events WHERE ts >= TIMESTAMP '{CDC_CUTOFF}'
    ),
    merged AS (
      SELECT user_id, state, ts, src,
             -- event_id is the FINAL tie-breaker: two delta events with
             -- identical (user_id, ts) otherwise tie nondeterministically
             -- and engines can pick different rows
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, src DESC, event_id DESC) AS rn,
             max(CASE WHEN src = 'delta' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS has_delta,
             max(CASE WHEN src = 'base' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS has_base
      FROM (SELECT *, 'base' AS src FROM base
            UNION ALL SELECT *, 'delta' AS src FROM delta)
    )
    SELECT user_id,
           CASE WHEN state = 'error' AND src = 'delta' THEN NULL
                ELSE state END AS current_state,
           ts AS state_ts,
           CASE WHEN state = 'error' AND src = 'delta' THEN 'delete'
                WHEN has_base = 0 THEN 'insert'
                WHEN has_delta = 0 THEN 'unchanged'
                ELSE 'update' END AS action
    FROM merged WHERE rn = 1 ORDER BY user_id
    """,
)
def cdc_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with matched/not-matched/delete clauses, shuffle-minimally:
    the same single union + latest-wins window as cdc_upsert_latest_wins,
    with 'error'-typed deltas interpreted as tombstones. The delete is a
    post-merge classification (one CASE on the winning row), so adding
    delete semantics costs ZERO extra shuffles over plain upsert — the
    property that keeps log-structured CDC apply viable when tombstones
    are a tiny fraction of a 100 TB change stream."""
    ev = table(spark, sf_dir, "events")
    cut = F.lit(CDC_CUTOFF).cast("timestamp")
    w_latest = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    base = (
        ev.filter(F.col("ts") < cut)
        .select(
            "user_id", F.col("event_type").alias("state"), "ts", "event_id",
            F.row_number().over(w_latest).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "state", "ts", "event_id", F.lit("base").alias("src"))
    )
    delta = ev.filter(F.col("ts") >= cut).select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id",
        F.lit("delta").alias("src"),
    )
    u = base.unionByName(delta)
    w_all = Window.partitionBy("user_id")
    # event_id as the final tie-breaker (see cdc_upsert_latest_wins)
    w_pick = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("src"), F.desc("event_id")
    )
    merged = u.select(
        "user_id", "state", "ts", "src",
        F.row_number().over(w_pick).alias("rn"),
        F.max(F.when(F.col("src") == "delta", 1).otherwise(0)).over(w_all).alias("has_delta"),
        F.max(F.when(F.col("src") == "base", 1).otherwise(0)).over(w_all).alias("has_base"),
    ).filter(F.col("rn") == 1)
    is_tombstone = (F.col("state") == "error") & (F.col("src") == "delta")
    return merged.select(
        "user_id",
        F.when(is_tombstone, F.lit(None)).otherwise(F.col("state")).alias("current_state"),
        F.col("ts").alias("state_ts"),
        F.when(is_tombstone, "delete")
        .when(F.col("has_base") == 0, "insert")
        .when(F.col("has_delta") == 0, "unchanged")
        .otherwise("update")
        .alias("action"),
    ).orderBy("user_id")
