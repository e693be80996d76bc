"""End-to-end corpus curation funnel — the composition the individual
operators exist for: quality gate -> exact dedup -> near-dedup -> stratified
sample, with per-stage document accounting (the audit trail a 100 TB corpus
build reports after every run; reference analog: the per-split counter
reconciliation v2/nii_to_lmdb.py:326-331).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import table
from .dedup import _VERIFIED_PAIRS_DUCK, dedup_lsh_verified_pairs
from .registry import query
from .sampling import FRACTION_PCT


@query(
    "curation_funnel",
    oracle=f"""
    -- Five-stage funnel over the corpus; one row of counts per stage.
    -- Near-dedup uses the pairwise rule: a doc is dropped when a verified
    -- near-dup partner with a smaller id survived the previous stages
    -- (the transitive-closure variant is dedup_connected_components).
    WITH {_VERIFIED_PAIRS_DUCK},
    q AS (
      SELECT doc_id, lang FROM documents
      WHERE length(text) >= 80
        AND len(string_split(text, ' ')) >= 12
        AND len(list_distinct(string_split(text, ' '))) * 1.0
            / len(string_split(text, ' ')) >= 0.3
    ),
    e AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents WHERE doc_id IN (SELECT doc_id FROM q)
      ) WHERE rn = 1
    ),
    n AS (
      SELECT s.doc_id, s.lang FROM e s
      WHERE NOT EXISTS (
        SELECT 1 FROM vpairs v
        JOIN e p ON p.doc_id = v.doc_a
        WHERE v.doc_b = s.doc_id
      )
    ),
    samp AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (
                 PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY lang) AS cnt
        FROM n
      ) WHERE rn <= CAST(ceil(cnt * {FRACTION_PCT} / 100.0) AS BIGINT)
    )
    SELECT 'raw' AS stage, 1 AS stage_order, CAST(count(*) AS BIGINT) AS n_docs FROM documents
    UNION ALL SELECT 'quality', 2, CAST(count(*) AS BIGINT) FROM q
    UNION ALL SELECT 'exact_dedup', 3, CAST(count(*) AS BIGINT) FROM e
    UNION ALL SELECT 'near_dedup', 4, CAST(count(*) AS BIGINT) FROM n
    UNION ALL SELECT 'sample', 5, CAST(count(*) AS BIGINT) FROM samp
    ORDER BY stage_order
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The whole funnel is ONE job: five 1-row aggregates unioned — no
    # driver-side loop, no intermediate materialization except the two
    # persisted id-tables (e, n) whose lineage would otherwise re-run the
    # digest window / the LSH+verify pipeline once per downstream branch.
    # Stage predicates are pushdown-friendly column expressions; at 100 TB
    # the survivors tables are (id, lang) — a few GB against corpus-scale
    # text that is scanned exactly once per hash family.
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    quality = (
        (F.length("text") >= 80)
        & (F.size(ws) >= 12)
        & (F.size(F.array_distinct(ws)) * 1.0 / F.size(ws) >= 0.3)
    )
    q = d.filter(quality).select("doc_id", "lang")

    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    e = (
        d.join(q.select("doc_id"), "doc_id", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    vp = dedup_lsh_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    drop_ids = vp.join(
        e.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    ).select(F.col("doc_b").alias("doc_id"))
    n = e.join(drop_ids, "doc_id", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)

    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w_rank = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    quota = F.ceil(F.count(F.lit(1)).over(Window.partitionBy("lang")) * FRACTION_PCT / 100.0)
    samp = (
        n.select("doc_id", "lang", F.row_number().over(w_rank).alias("rn"), quota.alias("qt"))
        .filter(F.col("rn") <= F.col("qt"))
        .select("doc_id")
    )

    def stage(df: DataFrame, name: str, order: int) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), F.lit(order).alias("stage_order"), "n_docs"
        )

    return (
        stage(d, "raw", 1)
        .unionAll(stage(q, "quality", 2))
        .unionAll(stage(e, "exact_dedup", 3))
        .unionAll(stage(n, "near_dedup", 4))
        .unionAll(stage(samp, "sample", 5))
        .orderBy("stage_order")
    )
