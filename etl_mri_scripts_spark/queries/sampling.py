"""Deterministic sampling operators for training-data curation.

The reference's split planners (utils_scripts.py:46-51, v2/patch_utils.py:
101-111) are exact-count seeded shuffles — sampling by another name. These
queries generalize them to the two shapes a 100 TB corpus pipeline needs:

- **stratified exact-count** sampling (fixed fraction per stratum, e.g.
  per-language) — one shuffle on the stratum key; the per-stratum rank is
  a window over that same partitioning, so no extra exchange.
- **stateless hash-Bernoulli** sampling — ZERO shuffles: a pure filter on
  a key-derived hash bucket, fully pipelined into the scan, stable under
  retries/speculation (same determinism argument as the reference's
  per-slice seeds, SURVEY.md §4), and composable: the same predicate run
  on any subset of the corpus selects a consistent sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import table
from .registry import query

FRACTION_PCT = 10  # stratified: keep ceil(10% of each stratum)
N_BUCKETS = 256  # bernoulli: md5-derived bucket space
KEEP_BUCKETS = 26  # ~10.2% of 256


@query(
    "sample_stratified_exact",
    oracle=f"""
    -- Exact-count stratified sample: ceil(10%) of each language, members
    -- chosen by a deterministic per-doc hash rank (not Bernoulli — counts
    -- are exact, mirroring the reference's exact-count split slicing).
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
      FROM documents
    )
    SELECT doc_id, lang, rn AS sample_rank
    FROM ranked
    WHERE rn <= CAST(ceil(n_lang * {FRACTION_PCT} / 100.0) AS BIGINT)
    ORDER BY doc_id
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-lang rank + stratum size via group_row_number (operators/
    # rank.py): langs are few and strata are data-sized, so a window
    # PARTITIONED on lang would funnel each stratum through one task. The
    # group-contiguous global two-phase rank keeps every stage parallel;
    # the quota comes from the same per-group aggregate (max-min+1), not
    # a second count window. The hash order makes membership a pure
    # function of doc_id — re-running on a grown corpus keeps prior
    # members with high probability (only boundary ranks churn).
    from ..operators.rank import group_row_number

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("hkey"),
    )
    ranked = group_row_number(
        d, ["lang"], ["hkey", "doc_id"], rank_col="sample_rank", count_col="n_lang"
    )
    return (
        ranked.filter(
            F.col("sample_rank") <= F.ceil(F.col("n_lang") * FRACTION_PCT / 100.0)
        )
        .select("doc_id", "lang", "sample_rank")
        .orderBy("doc_id")
    )


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    -- Stateless hash sample: doc kept iff its md5 bucket (first 2 hex
    -- chars, 0..255) < {KEEP_BUCKETS}. No shuffle anywhere — the predicate
    -- rides the scan.
    SELECT doc_id, lang,
           CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS BIGINT) AS bucket
    FROM documents
    WHERE (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
        < {KEEP_BUCKETS}
    ORDER BY doc_id
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB default: sampling as a catalyst-visible filter, zero
    # shuffles, one pass. Contrast with df.sample(): rand() is
    # partition-order dependent, so retries/AQE re-plans change the sample;
    # a key-derived bucket never does. Bucket granularity 1/256 ~ 0.4%.
    d = table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10
    ).cast("long")
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < KEEP_BUCKETS)
        .orderBy("doc_id")
    )


WEIGHTED_K = 50  # weighted sample size (Efraimidis–Spirakis top-k)


@query(
    "sample_weighted_exact",
    oracle=f"""
    -- Deterministic weighted sampling (Efraimidis–Spirakis A-ES): each
    -- doc draws u from a md5-derived uniform and scores ln(u)/weight
    -- (monotone in u^(1/w)); the top-{WEIGHTED_K} by score form the sample,
    -- so inclusion probability is proportional to weight (n_chars). The
    -- score is rounded before ranking so both engines rank identical
    -- keys; ties (impossible-but-cheap insurance) break on doc_id.
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             round(ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) + 0.5)
                      / 65536.0) / n_chars, 6) AS es_score
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, es_score,
             row_number() OVER (ORDER BY es_score DESC, doc_id) AS sample_rank
      FROM s
    )
    SELECT doc_id, lang, weight, es_score, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= {WEIGHTED_K} ORDER BY doc_id
    """,
)
def sample_weighted_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A-ES makes weighted sampling a pure top-k: no global state, no
    # rejection loop, and the per-row score is a deterministic function of
    # the key — identical under retries/speculation and incrementally
    # stable as the corpus grows. Catalyst plans the rank-filter as
    # TakeOrderedAndProject at small k (no full sort materialization);
    # at 100 TB this is a map + a k-sized heap per partition + one merge.
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        )
        + 0.5
    ) / 65536.0
    s = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("weight"),
        F.round(F.log(u) / F.col("n_chars"), 6).alias("es_score"),
    )
    r = s.select(
        "doc_id",
        "lang",
        "weight",
        "es_score",
        F.row_number()
        .over(Window.orderBy(F.desc("es_score"), "doc_id"))
        .cast("long")
        .alias("sample_rank"),
    )
    return r.filter(F.col("sample_rank") <= WEIGHTED_K).orderBy("doc_id")
