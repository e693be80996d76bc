"""Training-pipeline analytics extras: irregular time series, robust stats,
attribution, per-dimension embedding diagnostics.

These extend the north-star set (COVERAGE.md bottom table) with shapes a
production data-curation stack runs daily: time-weighted signal averages
over irregular event streams, trimmed/winsorized robust aggregates for
outlier-tolerant dataset stats (the relational twin of the reference's
robust percentile rescale, v2/degradation_function_v2.py:330-360), marketing
-style last-touch attribution (last-preceding-qualifying-event join), and
per-dimension variance screening over embedding columns (feature-quality
triage before ANN indexing).

All exact-arithmetic rules from queries/exact.py apply: money/value columns
are lifted to integer cents so sums are associative and bit-identical in
both engines; only final divisions produce doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import table
from .exact import REVENUE_FIXED_SQL, cents, cents_sql, revenue_fixed
from .registry import query

# ---------------------------------------------------------------------------
# Time-weighted average over an irregular event stream: each reading holds
# until the next one (step interpolation), so the mean weights each value by
# its holding duration. One window shuffle on (user_id), which the groupBy
# reuses (same key). Weights are exact integer microseconds; value is exact
# cents; the single final division is the only float op, so both engines
# produce the identical double. Scale note: sum(cents*micros) stays < 2^63
# for any per-user span under ~30 years; at larger spans switch the weight
# unit to millis (the comparison contract is unchanged).
# ---------------------------------------------------------------------------


@query(
    "events_time_weighted_avg",
    oracle=f"""
    WITH stepped AS (
        SELECT user_id,
               {cents_sql('value')} AS v_cents,
               date_diff('microsecond', ts,
                         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dt_us
        FROM events
    )
    SELECT user_id,
           CAST(sum(v_cents * dt_us) AS BIGINT) AS weighted_fixed,
           CAST(sum(dt_us) AS BIGINT) AS span_us,
           sum(v_cents * dt_us) / (100.0 * sum(dt_us)) AS time_weighted_avg
    FROM stepped
    WHERE dt_us IS NOT NULL
    GROUP BY 1
    HAVING sum(dt_us) > 0
    ORDER BY 1
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        cents(F.col("value")).alias("v_cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum(F.col("v_cents") * F.col("dt_us")).alias("weighted_fixed"),
            F.sum("dt_us").alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "weighted_fixed",
            "span_us",
            (F.col("weighted_fixed") / (100.0 * F.col("span_us"))).alias("time_weighted_avg"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Trimmed + winsorized robust means per group. The exact p05/p95 boundaries
# come from a small groupBy percentile aggregate (3 rows) broadcast-joined
# back onto the scan; the robust means are then composed exactly: interior
# mass as integer cents, boundary mass as count x boundary (one float
# multiply per group, identical in both engines). Two column-pruned scans
# and one tiny broadcast instead of the window-percentile form, which
# would drag every row through 3 giant window partitions (one per
# l_returnflag value) — the low-cardinality-key window is a scale-killer.
# ---------------------------------------------------------------------------


@query(
    "agg_trimmed_winsorized_stats",
    oracle=f"""
    WITH b AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.05) OVER (PARTITION BY l_returnflag) AS p05,
               quantile_cont(l_extendedprice, 0.95) OVER (PARTITION BY l_returnflag) AS p95,
               l_extendedprice AS price,
               {cents_sql('l_extendedprice')} AS price_cents
        FROM lineitem
    )
    SELECT l_returnflag AS return_flag,
           round(any_value(p05), 6) AS p05,
           round(any_value(p95), 6) AS p95,
           count(*) AS n_rows,
           CAST(count(CASE WHEN price < p05 THEN 1 END) AS BIGINT) AS n_below,
           CAST(count(CASE WHEN price > p95 THEN 1 END) AS BIGINT) AS n_above,
           round(sum(CASE WHEN price >= p05 AND price <= p95 THEN price_cents ELSE 0 END)
                 / 100.0 / count(CASE WHEN price >= p05 AND price <= p95 THEN 1 END), 6)
               AS trimmed_mean,
           round((sum(CASE WHEN price >= p05 AND price <= p95 THEN price_cents ELSE 0 END) / 100.0
                  + count(CASE WHEN price < p05 THEN 1 END) * any_value(p05)
                  + count(CASE WHEN price > p95 THEN 1 END) * any_value(p95)) / count(*), 6)
               AS winsorized_mean
    FROM b
    GROUP BY 1
    ORDER BY 1
    """,
)
def agg_trimmed_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    pct = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("p05"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
    )
    b = li.join(F.broadcast(pct), "l_returnflag").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        cents(F.col("l_extendedprice")).alias("price_cents"),
        "p05",
        "p95",
    )
    interior = (F.col("price") >= F.col("p05")) & (F.col("price") <= F.col("p95"))
    sum_in = F.sum(F.when(interior, F.col("price_cents")).otherwise(F.lit(0)))
    n_in = F.count(F.when(interior, F.lit(1)))
    n_below = F.count(F.when(F.col("price") < F.col("p05"), F.lit(1)))
    n_above = F.count(F.when(F.col("price") > F.col("p95"), F.lit(1)))
    return (
        b.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.round(F.any_value("p05"), 6).alias("p05"),
            F.round(F.any_value("p95"), 6).alias("p95"),
            F.count(F.lit(1)).alias("n_rows"),
            n_below.alias("n_below"),
            n_above.alias("n_above"),
            # try_divide: a 2-distinct-value group has an empty interior
            # (both percentiles interpolate strictly between the values);
            # NULL like the oracle, not an ANSI DIVIDE_BY_ZERO
            F.round(F.try_divide(sum_in / 100.0, n_in), 6).alias("trimmed_mean"),
            F.round(
                (sum_in / 100.0 + n_below * F.any_value("p05") + n_above * F.any_value("p95"))
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy("return_flag")
    )


# ---------------------------------------------------------------------------
# Last-touch attribution: each purchase credits the most recent preceding
# click/view by the same user within a 7-day lookback. The classic
# formulation is an as-of self-join; the one-shuffle form is a single
# ordered window with a conditional last(..., ignoreNulls) over the
# preceding frame — no join, no row inflation, state is O(1) per row.
# ---------------------------------------------------------------------------


@query(
    "events_last_touch_attribution",
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, event_type, ts,
               last_value(CASE WHEN event_type IN ('click','view') THEN event_id END IGNORE NULLS)
                   OVER w AS touch_event_id,
               last_value(CASE WHEN event_type IN ('click','view') THEN ts END IGNORE NULLS)
                   OVER w AS touch_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_event_id,
           user_id,
           touch_event_id,
           date_diff('microsecond', touch_ts, ts) / 1000000.0 AS gap_seconds
    FROM tagged
    WHERE event_type = 'purchase'
      AND touch_ts IS NOT NULL
      AND ts - touch_ts <= INTERVAL 7 DAY
    ORDER BY purchase_event_id
    """,
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    tagged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True).over(w).alias("touch_event_id"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("touch_ts"),
    )
    return (
        tagged.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch_ts").isNotNull()
            & (F.col("ts") - F.col("touch_ts") <= F.expr("INTERVAL 7 DAYS"))
        )
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            "touch_event_id",
            ((F.unix_micros(F.col("ts")) - F.unix_micros(F.col("touch_ts"))) / 1000000.0).alias(
                "gap_seconds"
            ),
        )
        .orderBy("purchase_event_id")
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding variance screen (feature-quality triage: dead or
# exploding dimensions before ANN indexing / quantization). posexplode turns
# the array column into (dim, value) rows — at 100 TB this is the layout
# that aggregates without skew (the groupBy key cardinality is the embedding
# width, so partial aggregation collapses each partition to <=64 rows before
# the exchange). Variance/mean are float; rounded to 6 dp on both sides.
# ---------------------------------------------------------------------------


@query(
    "embedding_dimension_variance",
    oracle="""
    SELECT CAST(t.i + 1 AS INT) AS dim,
           round(avg(e.embedding[CAST(t.i + 1 AS INT)]), 6) AS mean_val,
           round(var_samp(e.embedding[CAST(t.i + 1 AS INT)]), 6) AS var_val,
           count(*) AS n_vecs
    FROM embeddings e, range(64) t(i)
    GROUP BY 1
    ORDER BY 1
    """,
)
def embedding_dimension_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("embedding")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy((F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.round(F.avg("val"), 6).alias("mean_val"),
            F.round(F.var_samp("val"), 6).alias("var_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Blocklist-term scrubbing (the shape of PII/toxicity redaction in a text
# curation stack: word-boundary alternation regex, per-doc hit counts,
# before/after sizes). Pure JVM-side regexp_count/regexp_replace — no Python
# in the row path, so the scan stays inside whole-stage codegen. The same
# word-boundary \b semantics hold in Java regex and DuckDB RE2.
# ---------------------------------------------------------------------------

_BLOCKLIST_RE = r"\b(customer|key|hash)\b"


@query(
    "text_blocklist_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BLOCKLIST_RE}')) AS BIGINT) AS n_hits,
           length(text) AS len_before,
           length(regexp_replace(text, '{_BLOCKLIST_RE}', '[REDACTED]', 'g')) AS len_after
    FROM documents
    WHERE len(regexp_extract_all(text, '{_BLOCKLIST_RE}')) > 0
    ORDER BY doc_id
    """,
)
def text_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_hits = F.regexp_count(F.col("text"), F.lit(_BLOCKLIST_RE))
    return (
        docs.select(
            "doc_id",
            n_hits.cast("long").alias("n_hits"),
            F.length("text").alias("len_before"),
            F.length(F.regexp_replace(F.col("text"), _BLOCKLIST_RE, "[REDACTED]")).alias("len_after"),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostic — the pre-flight report you run BEFORE a big join
# to decide between plain shuffle / AQE skew split / salting (the engine's
# join_skew_salted_replicated). One aggregation pass keyed by the join key;
# the global max/avg ratio comes from an unpartitioned window over the
# per-key result — key-cardinality rows, not fact rows (the
# nation_revenue_share percent-of-total pattern).
# ---------------------------------------------------------------------------


@query(
    "join_key_skew_diagnostic",
    oracle="""
    WITH per_key AS (
        SELECT l_suppkey AS join_key, count(*) AS key_rows
        FROM lineitem GROUP BY 1
    ), g AS (
        SELECT max(key_rows) AS max_rows, avg(key_rows) AS avg_rows,
               CAST(sum(key_rows) AS BIGINT) AS total_rows
        FROM per_key
    )
    SELECT p.join_key, p.key_rows,
           round(p.key_rows / g.avg_rows, 6) AS hot_factor,
           round(g.max_rows / g.avg_rows, 6) AS global_skew_ratio,
           p.key_rows > 2 * g.avg_rows AS salt_recommended
    FROM per_key p, g
    ORDER BY p.key_rows DESC, p.join_key
    """,
)
def join_key_skew_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The global max/avg are a 1-row aggregate cross-joined back
    # (broadcast, bounded NLJ side — the Q11 scalar pattern), not an
    # unpartitioned window: key cardinality grows with the data, so a
    # single-partition window over the per-key frame would not.
    li = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("join_key"))
    per_key = li.groupBy("join_key").agg(F.count(F.lit(1)).alias("key_rows"))
    g = per_key.agg(
        F.max("key_rows").alias("max_rows"), F.avg("key_rows").alias("avg_rows")
    )
    return (
        per_key.crossJoin(F.broadcast(g))
        .select(
            "join_key",
            "key_rows",
            F.round(F.col("key_rows") / F.col("avg_rows"), 6).alias("hot_factor"),
            F.round(F.col("max_rows") / F.col("avg_rows"), 6).alias("global_skew_ratio"),
            (F.col("key_rows") > 2 * F.col("avg_rows")).alias("salt_recommended"),
        )
        .orderBy(F.desc("key_rows"), "join_key")
    )


# ---------------------------------------------------------------------------
# Per-group z-score standardization (feature scaling before model training).
# mean/stddev come from a groupBy aggregate (|langs| rows) broadcast-joined
# back — the group key is low-cardinality, so a window partitioned on it
# would drag every row through a handful of giant partitions. Sums are
# float (stddev is inherently float); outputs round to 6 dp per the
# cross-engine convention, and the z-score denominator guards stddev=0.
# ---------------------------------------------------------------------------


@query(
    "feature_zscore_standardize",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang, n_chars,
               avg(n_chars) OVER (PARTITION BY lang) AS mu,
               stddev_samp(n_chars) OVER (PARTITION BY lang) AS sigma
        FROM documents
    )
    SELECT doc_id, lang, n_chars,
           round((n_chars - mu) / nullif(sigma, 0.0), 6) AS zscore,
           abs(n_chars - mu) > 2 * sigma AS is_outlier
    FROM s
    ORDER BY doc_id
    """,
)
def feature_zscore_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    stats = docs.groupBy("lang").agg(
        F.avg("n_chars").alias("mu"), F.stddev_samp("n_chars").alias("sigma")
    )
    s = docs.join(F.broadcast(stats), "lang").select(
        "doc_id", "lang", "n_chars", "mu", "sigma"
    )
    return s.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            (F.col("n_chars") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0)), 6
        ).alias("zscore"),
        (F.abs(F.col("n_chars") - F.col("mu")) > 2 * F.col("sigma")).alias("is_outlier"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Chi-square independence test over a contingency table (label-vs-source
# bias checks in dataset audits). The fact table aggregates ONCE to cell
# counts (R x C rows); marginals and the statistic come from windows over
# that tiny frame — the same aggregate-then-window discipline as
# nation_revenue_share, so fact rows shuffle exactly once.
# ---------------------------------------------------------------------------


@query(
    "orders_crosstab_chi2",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS r, o_orderstatus AS c, count(*) AS n
        FROM orders GROUP BY 1, 2
    ), m AS (
        SELECT r, c, n,
               sum(n) OVER (PARTITION BY r) AS row_tot,
               sum(n) OVER (PARTITION BY c) AS col_tot,
               sum(n) OVER () AS grand_tot
        FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS BIGINT) AS dof,
           round(sum(pow(n - row_tot * col_tot / CAST(grand_tot AS DOUBLE), 2)
                     / (row_tot * col_tot / CAST(grand_tot AS DOUBLE))), 6) AS chi2
    FROM m
    """,
)
def orders_crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
    )
    cells = orders.groupBy("r", "c").agg(F.count(F.lit(1)).alias("n"))
    m = cells.select(
        "r",
        "c",
        "n",
        F.sum("n").over(Window.partitionBy("r")).alias("row_tot"),
        F.sum("n").over(Window.partitionBy("c")).alias("col_tot"),
        F.sum("n").over(Window.partitionBy()).alias("grand_tot"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("grand_tot").cast("double")
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        ((F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)).alias("dof"),
        F.round(F.sum(F.pow(F.col("n") - e, 2) / e), 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Pairwise correlation matrix over the numeric fact columns (feature
# redundancy screen). ONE aggregate pass computes every pairwise corr —
# Spark's corr/covar accumulators merge associatively across partitions, so
# this is a single map-side-combined reduction; never per-pair scans.
# Emitted in long (pair-per-row) form, the layout a feature store ingests.
# ---------------------------------------------------------------------------


@query(
    "lineitem_numeric_correlations",
    oracle="""
    WITH s AS (
        SELECT round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
               round(corr(l_quantity, l_discount), 6) AS qty_discount,
               round(corr(l_extendedprice, l_discount), 6) AS price_discount,
               round(corr(l_extendedprice, l_tax), 6) AS price_tax
        FROM lineitem
    )
    SELECT 'qty_price' AS pair, qty_price AS corr_val FROM s
    UNION ALL SELECT 'qty_discount', qty_discount FROM s
    UNION ALL SELECT 'price_discount', price_discount FROM s
    UNION ALL SELECT 'price_tax', price_tax FROM s
    ORDER BY pair
    """,
)
def lineitem_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("qty_discount"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("price_discount"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("price_tax"),
    )
    long = s.unpivot([], ["qty_price", "qty_discount", "price_discount", "price_tax"], "pair", "corr_val")
    return long.orderBy("pair")


# ---------------------------------------------------------------------------
# Median absolute deviation per group — the robust scale estimate paired
# with the reference's robust percentile rescale (D11). Two exact-median
# passes; both windows partition on the SAME key, so Catalyst plans one
# exchange and the second pass rides the first's sort order.
# ---------------------------------------------------------------------------


@query(
    "agg_median_abs_deviation",
    oracle="""
    WITH m AS (
        SELECT l_returnflag, l_extendedprice,
               quantile_cont(l_extendedprice, 0.5) OVER (PARTITION BY l_returnflag) AS med
        FROM lineitem
    ), d AS (
        SELECT l_returnflag, med,
               quantile_cont(abs(l_extendedprice - med), 0.5)
                   OVER (PARTITION BY l_returnflag) AS mad
        FROM m
    )
    SELECT l_returnflag AS return_flag,
           round(any_value(med), 6) AS median_price,
           round(any_value(mad), 6) AS mad,
           round(any_value(mad) * 1.4826, 6) AS sigma_robust
    FROM d
    GROUP BY 1
    ORDER BY 1
    """,
)
def agg_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same discipline as agg_trimmed_winsorized_stats: the 3-row median
    # table broadcast-joins back onto the scan instead of a percentile
    # window over 3 giant low-cardinality partitions; the second median
    # (of the deviations) folds into the join's groupBy.
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.round(F.any_value("med"), 6).alias("median_price"),
            F.round(
                F.percentile(
                    F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)
                ),
                6,
            ).alias("mad"),
            F.round(
                F.percentile(
                    F.abs(F.col("l_extendedprice") - F.col("med")), F.lit(0.5)
                )
                * 1.4826,
                6,
            ).alias("sigma_robust"),
        )
        .orderBy("return_flag")
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue per nation (inequality diagnostic,
# the scalar companion to q:revenue_pareto_share's curve). Revenue sums are
# exact cents; the rank-weighted form G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n
# needs a per-nation rank — derived from one two-phase GLOBAL rank plus a
# 25-row min-offset broadcast, so no low-cardinality window — and one
# aggregate; the rank weights are exact longs, so the only float math is
# the final expression.
# ---------------------------------------------------------------------------


@query(
    "customer_revenue_gini",
    oracle=f"""
    WITH rev AS (
        SELECT c.c_nationkey AS nation_key, c.c_custkey,
               CAST(sum({REVENUE_FIXED_SQL}) AS BIGINT) AS r
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT nation_key, r,
               row_number() OVER (PARTITION BY nation_key ORDER BY r, c_custkey) AS i
        FROM rev
    )
    SELECT nation_key,
           count(*) AS n_customers,
           round(2.0 * sum(i * r) / (count(*) * CAST(sum(r) AS DOUBLE))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    GROUP BY 1
    HAVING sum(r) > 0
    ORDER BY 1
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation_key"), "c_custkey")
        .agg(F.sum(revenue_fixed(F.col("l_extendedprice"), F.col("l_discount"))).alias("r"))
    )
    # Per-nation rank without a 25-partition giant window: the canonical
    # two-phase helper (global rank over the contiguous (nation, r, cust)
    # order + per-nation min-base attach). Was an inline copy of the same
    # scheme until r5 — which meant the helper's NULL-group fix did not
    # reach it; one implementation, one set of semantics.
    from ..operators.rank import group_row_number

    ranked = group_row_number(rev, ["nation_key"], ["r", "c_custkey"], rank_col="i")
    return (
        ranked.groupBy("nation_key")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # rank-weighted sum in decimal(38,0): the int64 form overflows
            # once sum(i*r) crosses 2^63 (~27k customers/nation at these
            # fixed-point magnitudes — far below the 100-TB framing);
            # decimal matches the oracle's HUGEINT accumulation exactly
            # instead of throwing under ANSI (r6 review)
            F.round(
                2.0
                * F.sum(F.col("i").cast("decimal(38,0)") * F.col("r"))
                / (F.count(F.lit(1)) * F.sum("r").cast("double"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
                6,
            ).alias("gini"),
            F.sum("r").alias("_tot"),
        )
        .filter(F.col("_tot") > 0)
        .drop("_tot")
        .orderBy("nation_key")
    )


# ---------------------------------------------------------------------------
# Shannon entropy of the language mix per source (corpus balance
# diagnostic; low entropy = a source collapsed to one language). Cell
# counts aggregate once; the per-source totals come from a window over the
# cell table (|sources| x |langs| rows).
# ---------------------------------------------------------------------------


@query(
    "label_entropy_by_source",
    oracle="""
    WITH cells AS (
        SELECT source, lang, count(*) AS n
        FROM documents GROUP BY 1, 2
    ), m AS (
        SELECT source, lang, n, sum(n) OVER (PARTITION BY source) AS tot
        FROM cells
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           count(*) AS n_langs,
           round(-sum((n / CAST(tot AS DOUBLE)) * ln(n / CAST(tot AS DOUBLE))), 6)
               AS lang_entropy_nats
    FROM m
    GROUP BY 1
    ORDER BY 1
    """,
)
def label_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    m = cells.withColumn("tot", F.sum("n").over(Window.partitionBy("source")))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        m.groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy_nats"),
        )
        .orderBy("source")
    )
