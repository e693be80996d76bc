"""Bucketed (co-located) join: the physical-layout answer to the biggest
shuffle in the schema.

At 100 TB the dominant cost of ``orders ⋈ lineitem`` is shuffling both
sides on the join key. Bucketing is the Spark-native fix: write both
tables ``bucketBy(N, key)`` once, and every subsequent join/aggregation on
that key is EXCHANGE-FREE — each task reads matching bucket files from
both sides (reference analog: the per-store LMDB layout keyed so HR/LR
reads never cross stores, v2/nii_to_lmdb_paralel.py:298-305).

The query itself writes session-scoped bucketed copies (tiny at test SF),
then runs the join through the catalog tables. tests/test_scale_paths.py
asserts the join stage of the physical plan has no shuffle exchange.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .registry import query

N_BUCKETS = 8

_STALE_TABLE_SECS = 24 * 3600


def _sweep_stale_bucketed(spark: SparkSession, keep_app: str) -> None:
    # Best-effort GC mirroring formats._sweep_stale_exports: every session
    # writes fresh orders_b_*/lineitem_b_* copies named by applicationId,
    # and a dead session's tables survive only as warehouse DIRECTORIES
    # (the default in-memory catalog forgets them) — without a sweep the
    # warehouse grows without bound across runs. Never touch the current
    # session's tables; a >1-day mtime makes live-concurrent races moot.
    import shutil
    import time

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    try:
        entries = os.listdir(warehouse)
    except OSError:
        return
    cutoff = time.time() - _STALE_TABLE_SECS
    for name in entries:
        if not (name.startswith("orders_b_") or name.startswith("lineitem_b_")):
            continue
        if name.endswith(keep_app):
            continue
        path = os.path.join(warehouse, name)
        try:
            if os.path.isdir(path) and os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (once per session x sf_dir) bucketed+sorted copies of orders
    and lineitem, co-bucketed on the order key. Table names carry the
    applicationId so concurrent sessions on the same warehouse dir never
    clobber each other (same lesson as queries/formats.py exports);
    prior sessions' leftovers are swept on first use."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    app = spark.sparkContext.applicationId.replace("-", "_")
    _sweep_stale_bucketed(spark, keep_app=app)
    t_orders = f"orders_b_{tag}_{app}"
    t_lineitem = f"lineitem_b_{tag}_{app}"
    if not spark.catalog.tableExists(t_orders):
        (
            table(spark, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(t_orders)
        )
    if not spark.catalog.tableExists(t_lineitem):
        (
            table(spark, sf_dir, "lineitem")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(t_lineitem)
        )
    _touch_bucketed(spark, (t_orders, t_lineitem))
    return t_orders, t_lineitem


def _touch_bucketed(spark: SparkSession, names: tuple[str, ...]) -> None:
    # The stale sweep keys on directory mtime, which is otherwise frozen
    # at creation — a session alive for >_STALE_TABLE_SECS would have its
    # live tables rmtree'd by a newer session. Refreshing mtime on every
    # reuse turns the sweep key into last-access time.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    for name in names:
        try:
            os.utime(os.path.join(warehouse, name))
        except OSError:
            pass


@query(
    "join_bucketed_colocated",
    oracle="""
    -- Logical result of the bucketed join (layout changes the plan, not
    -- the answer): revenue by order priority over orders x lineitem.
    SELECT o.o_orderpriority,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free orders ⋈ lineitem via co-bucketed catalog tables.

    Both sides are bucketed (and sorted) on the join key with the same
    bucket count, so the sort-merge join needs neither shuffle nor sort;
    the first aggregation keys on the bucketed column too. Only the final
    5-row priority rollup moves data."""
    t_orders, t_lineitem = _bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders).select("o_orderkey", "o_orderpriority")
    li = spark.table(t_lineitem).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum("rev").alias("rev"))
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_lines").alias("n_lines"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "scan_aggregate_pushdown",
    oracle="""
    -- Logical truth for the footer-served aggregate: global MIN/MAX/COUNT
    -- over lineitem columns. The Spark side serves this from parquet
    -- row-group statistics (PushedAggregation) — zero data pages read.
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
           CAST(max(l_orderkey) AS BIGINT) AS max_orderkey,
           CAST(min(l_partkey) AS BIGINT) AS min_partkey,
           CAST(max(l_partkey) AS BIGINT) AS max_partkey
    FROM lineitem
    """,
)
def scan_aggregate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unfiltered MIN/MAX/COUNT answered from parquet footers
    (spark.sql.parquet.aggregatePushdown): the scan reads row-group
    statistics instead of data pages — at 100 TB that's the difference
    between a metadata operation and a full-table scan. The conf is
    set/restored around plan construction (it binds at scan planning);
    tests assert PushedAggregation appears in the scan node.

    The reference analog is its metadata-only planning pass
    (v2/nii_to_lmdb.py:47-120: shapes from headers, no pixel reads)."""
    # Two confs, both scoped to plan construction: aggregate pushdown is
    # a DataSource V2 feature, and parquet defaults to the V1 path.
    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # through the catalog chokepoint (applies tune(); for lineitem the
        # read itself is a plain parquet scan, so the V2 aggregate capture
        # below is unaffected)
        li = table(spark, sf_dir, "lineitem")
        df = li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
        )
        # Force physical planning while the confs are set — the V2 scan
        # captures the pushed aggregate at plan time.
        df._jdf.queryExecution().executedPlan()
        return df
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
