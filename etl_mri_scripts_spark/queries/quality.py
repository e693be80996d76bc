"""Data-quality validation: declarative constraint checking as queries.

The deequ/dbt-tests pattern (public concepts) expressed Spark-first: every
constraint over one table folds into a SINGLE aggregation pass (conditional
counts — no per-constraint scans), referential integrity is one anti-join
count per foreign-key edge, and the result is a tidy (check, violations)
report a pipeline can gate on. At 100 TB the single-pass property is the
whole point: a 20-constraint suite costs one scan, not twenty.

Also: HyperLogLog sketch rollups (Spark 4 DataSketches functions) — the
pre-aggregation pattern where per-group sketches persist and re-union to
coarser groupings without rescanning the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .registry import query


@query(
    "dq_lineitem_constraints",
    oracle="""
    -- one scan, many constraints: each row of the report is a conditional
    -- count computed in the same aggregate
    WITH agg AS (
        SELECT
          CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS null_orderkey,
          CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT) AS qty_out_of_range,
          CAST(count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS BIGINT) AS discount_out_of_range,
          CAST(count(CASE WHEN l_extendedprice <= 0 THEN 1 END) AS BIGINT) AS nonpositive_price,
          CAST(count(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END) AS BIGINT) AS bad_returnflag,
          CAST(count(CASE WHEN l_shipdate < DATE '1990-01-01'
                           OR l_shipdate > DATE '2030-01-01' THEN 1 END) AS BIGINT) AS shipdate_outlier,
          CAST(count(CASE WHEN l_tax < 0 THEN 1 END) AS BIGINT) AS negative_tax
        FROM lineitem
    )
    SELECT 'bad_returnflag' AS check_name, bad_returnflag AS violations FROM agg
    UNION ALL SELECT 'discount_out_of_range', discount_out_of_range FROM agg
    UNION ALL SELECT 'negative_tax', negative_tax FROM agg
    UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM agg
    UNION ALL SELECT 'null_orderkey', null_orderkey FROM agg
    UNION ALL SELECT 'qty_out_of_range', qty_out_of_range FROM agg
    UNION ALL SELECT 'shipdate_outlier', shipdate_outlier FROM agg
    ORDER BY check_name
    """,
)
def dq_lineitem_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    checks = {
        "null_orderkey": F.col("l_orderkey").isNull(),
        "qty_out_of_range": (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        "discount_out_of_range": (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
        "nonpositive_price": F.col("l_extendedprice") <= 0,
        "bad_returnflag": ~F.col("l_returnflag").isin("A", "N", "R"),
        "shipdate_outlier": (F.col("l_shipdate") < F.lit("1990-01-01"))
        | (F.col("l_shipdate") > F.lit("2030-01-01")),
        "negative_tax": F.col("l_tax") < 0,
    }
    wide = li.agg(
        *[F.count(F.when(cond, F.lit(1))).alias(name) for name, cond in checks.items()]
    )
    # wide 1-row aggregate -> tall report via stack (no extra scan)
    n = len(checks)
    pairs = ", ".join(f"'{name}', {name}" for name in checks)
    return (
        wide.select(F.expr(f"stack({n}, {pairs}) as (check_name, violations)"))
        .orderBy("check_name")
    )


@query(
    "dq_referential_integrity",
    oracle="""
    -- orphan count per foreign-key edge; 0 everywhere = referentially closed
    SELECT 'customer.nation' AS fk_edge,
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
               AS orphans
    UNION ALL
    SELECT 'lineitem.orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.part',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.supplier',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders.customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    ORDER BY fk_edge
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One anti-join count per FK edge. Scale notes: each edge is an
    independent subplan (they parallelize); the dimension side of every
    anti-join broadcasts (or AQE converts it), so no edge shuffles the fact
    table; a persistent deployment would run edges against bucketed tables
    to make them exchange-free."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    part = table(spark, sf_dir, "part")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    def orphans(fact, dim, fk, pk, edge):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(F.lit(edge).alias("fk_edge"), "orphans")
        )

    edges = [
        orphans(cust, nation, "c_nationkey", "n_nationkey", "customer.nation"),
        orphans(li, orders, "l_orderkey", "o_orderkey", "lineitem.orders"),
        orphans(li, part, "l_partkey", "p_partkey", "lineitem.part"),
        orphans(li, supp, "l_suppkey", "s_suppkey", "lineitem.supplier"),
        orphans(orders, cust, "o_custkey", "c_custkey", "orders.customer"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out.orderBy("fk_edge")


@query(
    "dq_uniqueness_report",
    oracle="""
    -- duplicate-key audit across primary keys: n_rows - n_distinct per table
    SELECT 'customer.c_custkey' AS key_name,
           CAST((SELECT count(*) - count(DISTINCT c_custkey) FROM customer) AS BIGINT) AS duplicates
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)',
           CAST((SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_orderkey',
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'part.p_partkey',
           CAST((SELECT count(*) - count(DISTINCT p_partkey) FROM part) AS BIGINT)
    ORDER BY key_name
    """,
)
def dq_uniqueness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness as count(*) - count_distinct(key) per table —
    each an independent single-agg subplan. The composite lineitem key uses
    a struct count-distinct (one shuffle of the key columns only)."""

    def dup(df, key_cols, name):
        # Composite keys count distinct STRUCTS, as the docstring says and
        # the oracle computes: multi-argument count_distinct(a, b) skips
        # any row where EITHER column is NULL — exactly the rows a
        # uniqueness audit must see — while a struct with a NULL field is
        # itself non-NULL and counts (r6 review finding). Single-column
        # keys keep the plain form (both engines skip NULL scalars).
        key = (
            F.col(key_cols[0])
            if len(key_cols) == 1
            else F.struct(*[F.col(c) for c in key_cols])
        )
        return df.agg(
            (F.count(F.lit(1)) - F.count_distinct(key)).alias("duplicates")
        ).select(F.lit(name).alias("key_name"), "duplicates")

    cust = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    reports = [
        dup(cust, ["c_custkey"], "customer.c_custkey"),
        dup(li, ["l_orderkey", "l_linenumber"], "lineitem.(l_orderkey,l_linenumber)"),
        dup(orders, ["o_orderkey"], "orders.o_orderkey"),
        dup(part, ["p_partkey"], "part.p_partkey"),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.orderBy("key_name")


@query("hll_sketch_rollup_nation_region")
def hll_sketch_rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (sketch bytes are implementation-defined, no SQL oracle):
    the sketch pre-aggregation pattern. Per-nation HLL sketches of the
    customer set are built ONCE from the fact table; the region level
    re-unions the 25 nation sketches WITHOUT rescanning customers — the
    100 TB dashboard pattern (persist sketch bytes per fine grain, roll up
    coarser grains from sketches alone). Estimates carry ~2% HLL error;
    the test asserts tolerance vs exact."""
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    per_nation = (
        cust.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sketch"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        per_nation.groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_customers")
        )
        .orderBy("n_regionkey")
    )


CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row
CMS_TOPK = 10


def _cms_bucket_sql(i: int, key: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{i}:', CAST({key} AS VARCHAR))), 1, 8)) "
        f"AS BIGINT) % {CMS_W}"
    )


@query(
    "sketch_countmin_heavy_hitters",
    oracle=f"""
    -- Count-min sketch heavy hitters, fully deterministic (md5-derived
    -- bucket hashes, so both engines build the IDENTICAL {CMS_D}x{CMS_W}
    -- counter table). Estimate = min over the {CMS_D} hashed counters;
    -- CMS never underestimates, so overestimate >= 0 always.
    WITH counts AS (
        SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM lineitem GROUP BY 1
    ),
    cells AS (
        SELECT h, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell
        FROM (
            {" UNION ALL ".join(
                f"SELECT {i} AS h, {_cms_bucket_sql(i, 'key')} AS bucket, exact_cnt FROM counts"
                for i in range(CMS_D)
            )}
        ) GROUP BY 1, 2
    ),
    est AS (
        SELECT c.key, c.exact_cnt, CAST(min(s.cell) AS BIGINT) AS cms_estimate
        FROM counts c
        JOIN cells s
          ON (   (s.h = 0 AND s.bucket = {_cms_bucket_sql(0, 'c.key')})
              {" ".join(
                f"OR (s.h = {i} AND s.bucket = {_cms_bucket_sql(i, 'c.key')})"
                for i in range(1, CMS_D)
              )})
        GROUP BY 1, 2
    )
    SELECT key, exact_cnt, cms_estimate,
           CAST(cms_estimate - exact_cnt AS BIGINT) AS overestimate
    FROM est
    ORDER BY exact_cnt DESC, key
    LIMIT {CMS_TOPK}
    """,
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over the join key.

    The mergeable-sketch pattern for key-frequency at 100 TB: the sketch
    is a fixed 4 x 64 counter grid — per-partition grids merge
    by addition (map-side combinable groupBy), so the sketch build is one
    scan regardless of key cardinality, and the grid broadcasts anywhere.
    Hashes are md5-derived, so the sketch is bit-identical across engines
    and retries (no impl-defined sketch bytes — unlike HLL, this one
    hash-matches a SQL oracle).

    Plan shape: exact per-key counts aggregate once (map-side combined —
    also the truth for the report); the 4-way explode happens on
    the AGGREGATED key table, never the fact rows; estimates join the
    256-row broadcast grid and take min over the hash rows. CMS
    guarantees estimate >= exact; the overestimate column shows the
    collision cost of 2KB of state vs the exact table."""
    li = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("key"))
    counts = li.groupBy("key").agg(F.count(F.lit(1)).alias("exact_cnt"))

    def bucket(i: int, key: F.Column) -> F.Column:
        digest = F.md5(
            F.concat(F.lit(f"{i}:"), key.cast("string")).cast("binary")
        )
        return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % CMS_W

    hashed = counts.select(
        "key",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"), bucket(i, F.col("key")).alias("bucket")
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("s"),
    ).select("key", "exact_cnt", F.col("s.h").alias("h"), F.col("s.bucket").alias("bucket"))
    cells = hashed.groupBy("h", "bucket").agg(F.sum("exact_cnt").alias("cell"))
    est = (
        hashed.join(F.broadcast(cells), ["h", "bucket"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return (
        est.select(
            "key",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "key")
        .limit(CMS_TOPK)
    )


KMV_K = 32  # sketch size: k smallest hash values per group


@query(
    "sketch_kmv_distinct_by_nation",
    oracle=f"""
    -- KMV (k-minimum-values) distinct-count sketch, the second
    -- SQL-oracle-able sketch beside count-min: hash every key to a
    -- uniform [0,1) value (md5 prefix / 2^32 — exact in doubles), keep
    -- the {KMV_K} smallest per group, estimate distinct = (k-1)/h_k.
    -- Groups holding fewer than k distinct keys report exactly.
    -- Mergeable: union two groups' sketches and re-take the k smallest.
    WITH hashed AS (
      SELECT DISTINCT c_nationkey,
             CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS h
      FROM customer
    ),
    ranked AS (
      SELECT c_nationkey, h,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY h) AS rk
      FROM hashed
    ),
    sketch AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_kept,
             max(h) AS h_k
      FROM ranked WHERE rk <= {KMV_K} GROUP BY 1
    ),
    exact AS (
      SELECT c_nationkey, CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_distinct
      FROM customer GROUP BY 1
    )
    SELECT s.c_nationkey AS nation_key,
           e.exact_distinct,
           CASE WHEN s.n_kept < {KMV_K} THEN CAST(s.n_kept AS DOUBLE)
                ELSE round(({KMV_K} - 1) / s.h_k, 6) END AS kmv_estimate,
           s.n_kept < {KMV_K} AS is_exact
    FROM sketch s JOIN exact e USING (c_nationkey)
    ORDER BY nation_key
    """,
)
def sketch_kmv_distinct_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per nation, vs the exact count.

    Scale shape: the hash is a pure projection; the k-smallest-per-group
    selection is a rank filter with a LITERAL limit, which Spark executes
    as WindowGroupLimit — a map-side partial top-k per partition before
    the exchange, so the per-group state is k rows regardless of group
    size (never a giant low-cardinality window partition). The sketch is
    mergeable (union + re-take k smallest) and, because the hash is
    md5-derived, bit-identical across engines — it hash-matches the SQL
    oracle, unlike implementation-defined HLL bytes."""
    from pyspark.sql.window import Window

    cust = table(spark, sf_dir, "customer").select("c_nationkey", "c_custkey")
    h = (
        F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    hashed = cust.select("c_nationkey", h.alias("h")).distinct()
    w = Window.partitionBy("c_nationkey").orderBy("h")
    sketch = (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k"))
    )
    exact = cust.groupBy("c_nationkey").agg(
        F.count_distinct("c_custkey").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")
    ).otherwise(F.round((KMV_K - 1) / F.col("h_k"), 6))
    return (
        sketch.join(exact, "c_nationkey")
        .select(
            F.col("c_nationkey").alias("nation_key"),
            "exact_distinct",
            est.alias("kmv_estimate"),
            (F.col("n_kept") < KMV_K).alias("is_exact"),
        )
        .orderBy("nation_key")
    )
