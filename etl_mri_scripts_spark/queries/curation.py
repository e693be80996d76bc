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

from ..operators.rank import (
    global_row_number,
    group_row_number,
    group_running_sum,
)
from ..tables import table
from .dedup import _VERIFIED_PAIRS_DUCK, _verified_pairs_df
from .registry import query
from .sampling import FRACTION_PCT


# The shared document quality gate (length / word count / lexical
# diversity) used by BOTH curation_funnel and crossmodal_quality_topk —
# one definition per engine so retuning a threshold cannot desynchronize
# the funnel's quality stage from the crossmodal candidate universe.
QUALITY_GATE_SQL = """length(text) >= 80
        AND len(string_split(text, ' ')) >= 12
        AND len(list_distinct(string_split(text, ' '))) * 1.0
            / len(string_split(text, ' ')) >= 0.3"""


def quality_gate_col():
    ws = F.split("text", " ")
    return (
        (F.length("text") >= 80)
        & (F.size(ws) >= 12)
        & (F.size(F.array_distinct(ws)) * 1.0 / F.size(ws) >= 0.3)
    )


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
      WHERE {QUALITY_GATE_SQL}
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
    quality = quality_gate_col()
    q = d.filter(quality).select("doc_id", "lang")

    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    e = (
        d.join(q.select("doc_id"), "doc_id", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # r13: unsorted interior — the registered query's global ORDER BY is
    # dead weight under the semi-join here (see dedup._verified_pairs_df).
    vp = _verified_pairs_df(spark, sf_dir).select("doc_a", "doc_b")
    drop_ids = vp.join(
        e.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    ).select(F.col("doc_b").alias("doc_id"))
    n = e.join(drop_ids, "doc_id", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)

    # Per-lang sample rank via the group-contiguous two-phase rank — same
    # plan shape as q:sample_stratified_exact, no per-lang giant window.
    ranked = group_row_number(
        n.select(
            "doc_id",
            "lang",
            F.md5(F.col("doc_id").cast("string").cast("binary")).alias("hkey"),
        ),
        ["lang"],
        ["hkey", "doc_id"],
        rank_col="rn",
        count_col="n_lang",
    )
    samp = ranked.filter(
        F.col("rn") <= F.ceil(F.col("n_lang") * FRACTION_PCT / 100.0)
    ).select("doc_id")

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


@query(
    "crossmodal_quality_topk",
    oracle=f"""
    -- Cross-modal composition: text quality gates choose the candidate
    -- universe, the embedding index answers similarity inside it — the
    -- "find near-neighbors among the docs worth keeping" query a curation
    -- pipeline runs before semantic dedup or domain balancing.
    WITH q AS (
      SELECT doc_id, lang FROM documents
      WHERE {QUALITY_GATE_SQL}
    ),
    v AS (
      SELECT e.vec_id, q.lang, CAST(e.embedding AS DOUBLE[]) AS e,
             concat(CASE WHEN e.embedding[1] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN e.embedding[2] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN e.embedding[3] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN e.embedding[4] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN e.embedding[5] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN e.embedding[6] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings e JOIN q ON q.doc_id = e.vec_id
    ),
    scored AS (
      SELECT q.vec_id AS query_id, q.lang,
             c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65), i -> q.e[i] * c.e[i])) /
             (sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i] * q.e[i]))) *
              sqrt(list_sum(list_transform(range(1, 65), i -> c.e[i] * c.e[i])))) AS cosine
      FROM v q JOIN v c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 25
    ),
    ranked AS (
      SELECT query_id, lang, neighbor_id, round(cosine, 6) AS cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(cosine, 6) DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, lang, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """,
)
def crossmodal_quality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The quality gate runs on the TEXT table and only ids cross over to
    # the vector side (left-semi-shaped join on the embedding key) — corpus
    # text never rides the vector shuffle. Candidates come from the sign
    # -bit bucket equi-join within the gated universe; at 100 TB the gated
    # id set is the small side and broadcasts.
    from .similarity import _cosine, _vectors

    d = table(spark, sf_dir, "documents")
    quality = quality_gate_col()
    gated = d.filter(quality).select(F.col("doc_id").alias("vec_id"), "lang")

    emb = table(spark, sf_dir, "embeddings").join(gated, "vec_id")
    bucket = F.concat(
        *[F.when(F.col("embedding")[i] >= 0, "1").otherwise("0") for i in range(6)]
    )
    v = _vectors(emb.withColumn("bucket", bucket), "bucket", "lang")
    q = v.filter(F.col("vec_id") < 25).alias("q")
    c = v.alias("c")
    scored = c.join(
        F.broadcast(q),
        (F.col("q.bucket") == F.col("c.bucket")) & (F.col("c.vec_id") != F.col("q.vec_id")),
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("q.lang").alias("lang"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(_cosine(), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .orderBy("query_id", "rank")
    )


EVAL_MOD = 7  # docs with doc_id % 7 == 0 play the held-out eval/benchmark set


@query(
    "text_decontaminate_overlap",
    oracle=f"""
    -- Decontamination: flag training docs sharing any 3-shingle with the
    -- held-out eval set, with the overlap count as evidence. The standard
    -- pre-training hygiene step (eval leakage detection by n-gram
    -- collision).
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[least(i + 1, len(string_split(text, ' ')))] || ' ' ||
                    string_split(text, ' ')[least(i + 2, len(string_split(text, ' ')))])))
             AS shingle
      FROM documents
    ),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    train_sh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_overlap_shingles
    FROM train_sh t JOIN eval_sh e ON t.shingle = e.shingle
    GROUP BY 1
    HAVING count(*) >= 3
    ORDER BY doc_id
    """,
)
def text_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shingle explode feeds both sides (persisted); the eval shingle
    # vocabulary is the post-distinct SMALL side (eval sets are thousands
    # of docs against a corpus of billions), so the contamination probe is
    # a broadcast-able semi-ish join on the shingle — the training corpus
    # shuffles nothing but (doc_id, shingle) rows that actually collide.
    from .dedup import _exploded_shingles

    sh = _exploded_shingles(spark, sf_dir, cache=True)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    train_sh = sh.filter(~is_eval)
    return (
        train_sh.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_shingles"))
        .filter(F.col("n_overlap_shingles") >= 3)
        .orderBy("doc_id")
    )


MIX_TARGET_PCT = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}


@query(
    "corpus_mix_plan",
    oracle=f"""
    -- Data-mixing plan: given target language proportions, compute how
    -- many docs each language contributes to the largest achievable
    -- mixture and the implied per-language sampling rate. The binding
    -- language is the one whose supply/target ratio is smallest.
    WITH supply AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_have FROM documents GROUP BY 1
    ),
    tgt AS (
      SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(MIX_TARGET_PCT.items()))})
             AS t(lang, target_pct)
    ),
    binding AS (
      SELECT min(s.n_have * 100.0 / t.target_pct) AS total_mix
      FROM supply s JOIN tgt t ON s.lang = t.lang
    )
    SELECT s.lang, t.target_pct, s.n_have,
           CAST(floor(b.total_mix * t.target_pct / 100.0) AS BIGINT) AS n_take,
           round(floor(b.total_mix * t.target_pct / 100.0) / s.n_have, 6) AS sample_rate
    FROM supply s JOIN tgt t ON s.lang = t.lang CROSS JOIN binding b
    ORDER BY s.lang
    """,
)
def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The plan itself is metadata-scale (one row per language) — the heavy
    # part is the supply count, a single map-side-combined groupBy over the
    # corpus. The emitted per-language rates feed the deterministic
    # hash-Bernoulli sampler (sample_hash_bernoulli) to materialize the
    # mixture without any further shuffle.
    d = table(spark, sf_dir, "documents")
    supply = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_have"))
    tgt = spark.createDataFrame(
        sorted(MIX_TARGET_PCT.items()), "lang string, target_pct int"
    )
    joined = supply.join(F.broadcast(tgt), "lang")
    binding = joined.agg(
        F.min(F.col("n_have") * 100.0 / F.col("target_pct")).alias("total_mix")
    )
    n_take = F.floor(F.col("total_mix") * F.col("target_pct") / 100.0)
    return (
        joined.crossJoin(F.broadcast(binding))
        .select(
            "lang",
            "target_pct",
            "n_have",
            n_take.cast("long").alias("n_take"),
            F.round(n_take / F.col("n_have"), 6).alias("sample_rate"),
        )
        .orderBy("lang")
    )


PACK_LEN = 256  # tokens per training sequence


@query(
    "pack_sequences_concat",
    oracle=f"""
    -- Sequence-packing plan (concat-and-chunk): per language stream, docs
    -- are laid head-to-tail in doc_id order and cut into {PACK_LEN}-token
    -- training sequences. Emits where each doc starts (pack id + offset)
    -- and whether it straddles a sequence boundary.
    WITH t AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    c AS (
      SELECT lang, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor((cum - n_tokens) / {PACK_LEN}.0) AS BIGINT) AS pack_id,
           CAST((cum - n_tokens) % {PACK_LEN} AS BIGINT) AS start_offset,
           floor((cum - 1) / {PACK_LEN}.0)
             > floor((cum - n_tokens) / {PACK_LEN}.0) AS spans_boundary
    FROM c ORDER BY lang, doc_id
    """,
)
def pack_sequences_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The token-offset layout is one running sum per language — computed
    # by the group-contiguous two-phase prefix sum (operators/rank.py
    # group_running_sum): a parallel range-partitioned sort over
    # (lang, doc_id) plus broadcast per-partition and per-group offsets,
    # so a single language larger than one task spreads across many range
    # buckets instead of serializing on one reducer. Everything downstream
    # (pack_id, offset, boundary flag) is arithmetic on the cumsum,
    # inside codegen. Token counts are exact longs, so the prefix sums
    # are associative and partitioning-independent.
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    t = group_running_sum(t, ["lang"], ["doc_id"], "n_tokens", cum_col="_cum")
    cum = F.col("_cum")
    start = cum - F.col("n_tokens")
    return t.select(
        "lang",
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(start / PACK_LEN).alias("pack_id"),
        (start % PACK_LEN).cast("long").alias("start_offset"),
        (F.floor((cum - 1) / PACK_LEN) > F.floor(start / PACK_LEN)).alias(
            "spans_boundary"
        ),
    ).orderBy("lang", "doc_id")


N_SHARDS = 8


@query(
    "training_shard_assignment",
    oracle=f"""
    -- Deterministic global shuffle + sharding (the "shuffle before
    -- training" step): order docs by a content-independent hash of their
    -- id, deal them round-robin into {N_SHARDS} balanced shards, and
    -- record each doc's position within its shard. md5 is the
    -- cross-engine-stable stand-in for the seeded shuffle hash.
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey FROM documents
    ),
    r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY hkey, doc_id) - 1 AS shuffle_rank
      FROM h
    )
    SELECT doc_id,
           CAST(shuffle_rank AS BIGINT) AS shuffle_rank,
           CAST(shuffle_rank % {N_SHARDS} AS BIGINT) AS shard_id,
           CAST(shuffle_rank // {N_SHARDS} AS BIGINT) AS pos_in_shard
    FROM r ORDER BY doc_id
    """,
)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-phase offset rank (operators/rank.py): range-partition on the
    # shuffle hash key, sort within partitions, add broadcast per-partition
    # prefix offsets — the exact global rank with NO single-partition
    # WindowExec anywhere in the plan. Each executor emits one
    # shard-contiguous run (sequential readers, no hot shard) and the
    # ordering is reproducible from (id, seed) under retries. Round-robin
    # dealing off the rank balances shard sizes to within one doc.
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hkey")
    )
    ranked, _total = global_row_number(d, ["hkey", "doc_id"], rank_col="rn")
    r = ranked.select("doc_id", (F.col("rn") - 1).cast("long").alias("shuffle_rank"))
    return r.select(
        "doc_id",
        "shuffle_rank",
        (F.col("shuffle_rank") % N_SHARDS).alias("shard_id"),
        F.floor(F.col("shuffle_rank") / N_SHARDS).alias("pos_in_shard"),
    ).orderBy("doc_id")


PSI_CUTOFF = "2024-01-16"  # snapshot A = first half of the month, B = rest
PSI_BUCKETS = 10  # value deciles of width 50 over [0, 500)


@query(
    "corpus_drift_psi",
    oracle=f"""
    -- Population-stability-index drift check between two time snapshots
    -- of the event stream, per event type. Buckets are FIXED-width (so
    -- the same binning is reproducible on any future snapshot), the
    -- bucket grid is densified (missing buckets count 0), and counts are
    -- Laplace-smoothed before the log-ratio so empty cells stay finite.
    WITH c AS (
      SELECT event_type,
             least({PSI_BUCKETS - 1}, CAST(floor(value / 50) AS INT)) AS bucket,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{PSI_CUTOFF}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{PSI_CUTOFF}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(0, {PSI_BUCKETS - 1})) AS bucket) g
    ),
    dense AS (
      SELECT grid.event_type, grid.bucket,
             coalesce(c.n_a, 0) AS n_a, coalesce(c.n_b, 0) AS n_b
      FROM grid LEFT JOIN c
        ON grid.event_type = c.event_type AND grid.bucket = c.bucket
    ),
    tot AS (
      SELECT event_type, sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM dense GROUP BY 1
    )
    SELECT d.event_type,
           CAST(t.tot_a AS BIGINT) AS n_before,
           CAST(t.tot_b AS BIGINT) AS n_after,
           round(sum(
             ((d.n_a + 1.0) / (t.tot_a + {PSI_BUCKETS}) - (d.n_b + 1.0) / (t.tot_b + {PSI_BUCKETS}))
             * ln(((d.n_a + 1.0) / (t.tot_a + {PSI_BUCKETS}))
                / ((d.n_b + 1.0) / (t.tot_b + {PSI_BUCKETS})))
           ), 6) AS psi
    FROM dense d JOIN tot t USING (event_type)
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The heavy pass is ONE conditional aggregation over the scan (both
    # snapshot counters in the same groupBy — never two scans); everything
    # after runs on a <= n_types x {PSI_BUCKETS} frame. The dense grid is
    # generated with sequence+explode and the counts broadcast onto it.
    # At 100 TB this is the nightly data-quality gate: map-side combine,
    # one small shuffle, constant-size tail.
    ev = table(spark, sf_dir, "events")
    cut = F.lit(PSI_CUTOFF).cast("timestamp")
    bucket = F.least(
        F.lit(PSI_BUCKETS - 1), F.floor(F.col("value") / 50).cast("int")
    )
    c = ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("n_b"),
    )
    # enumerate types from the AGGREGATED frame, not a second corpus
    # scan: every event row lands in c (NULL-bucket rows included), and
    # a distinct over a few hundred (type, bucket) rows is free where a
    # distinct over the events table re-scans and re-shuffles it
    grid = (
        c.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(PSI_BUCKETS - 1))).alias("bucket"))
    )
    dense = (
        grid.join(F.broadcast(c), ["event_type", "bucket"], "left")
        .fillna(0, subset=["n_a", "n_b"])
    )
    tot = dense.groupBy("event_type").agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    d = dense.join(F.broadcast(tot), "event_type")
    p = (F.col("n_a") + 1.0) / (F.col("tot_a") + PSI_BUCKETS)
    q = (F.col("n_b") + 1.0) / (F.col("tot_b") + PSI_BUCKETS)
    return (
        d.groupBy(
            "event_type",
            F.col("tot_a").cast("long").alias("n_before"),
            F.col("tot_b").cast("long").alias("n_after"),
        )
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"))
        .orderBy("event_type")
    )


COMPACT_TARGET = 25_000  # target chars per output shard file


@query(
    "docs_compaction_plan",
    oracle=f"""
    -- Small-file compaction planner: greedy sequential bin-packing of
    -- docs into ~{COMPACT_TARGET}-char output files per language. A doc's
    -- file is floor(exclusive-prefix-sum / target) — one window pass,
    -- no iteration; files can overflow by at most one doc (the standard
    -- streaming-compaction bound). Pure integer arithmetic end to end.
    WITH s AS (
      SELECT lang, doc_id, n_chars,
             coalesce(sum(n_chars) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM documents
    )
    SELECT lang,
           CAST(cum_before // {COMPACT_TARGET} AS BIGINT) AS file_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS file_chars,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM s GROUP BY 1, 2 ORDER BY lang, file_id
    """,
)
def docs_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The write-side twin of AQE coalescing: plan output files of
    # near-uniform size BEFORE the write so object-store listings stay
    # sane at 100 TB (millions of tiny files is the classic lake
    # pathology). The prefix sum shuffles once on lang; the per-lang
    # sequential scan is the unavoidable cost of order-preserving
    # packing; everything downstream (count/sum per file) is partial-agg.
    d = table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    s = group_running_sum(d, ["lang"], ["doc_id"], "n_chars", cum_col="_cum").select(
        "lang",
        "doc_id",
        "n_chars",
        # exclusive prefix: the inclusive group cumsum minus the row itself
        (F.col("_cum") - F.col("n_chars")).alias("cum_before"),
    )
    return (
        s.groupBy(
            "lang",
            F.floor(F.col("cum_before") / COMPACT_TARGET).alias("file_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("file_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "file_id")
    )


MIX_ALPHA = 0.5  # temperature: alpha < 1 upweights low-resource sources
MIX_BUDGET = 10_000  # target documents in the mixed corpus


@query(
    "corpus_temperature_mix",
    oracle=f"""
    -- Temperature-based corpus mixing (the multilingual-LM data-mix rule:
    -- q_s proportional to p_s^alpha, alpha={MIX_ALPHA}): upweights low-resource
    -- sources relative to their raw byte share. All shares computed over
    -- the per-source aggregate (20 rows), so the window sums are free.
    WITH per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1
    ),
    shares AS (
      SELECT source, n_docs, total_chars,
             total_chars * 1.0 / sum(total_chars) OVER () AS p_raw,
             pow(total_chars * 1.0 / sum(total_chars) OVER (), {MIX_ALPHA}) AS p_pow
      FROM per_source
    )
    SELECT source, n_docs, total_chars,
           round(p_raw, 6) AS raw_share,
           round(p_pow / sum(p_pow) OVER (), 6) AS mix_share,
           round((p_pow / sum(p_pow) OVER ()) / p_raw, 6) AS boost,
           CAST(round((p_pow / sum(p_pow) OVER ()) * {MIX_BUDGET}) AS BIGINT)
               AS target_docs
    FROM shares ORDER BY source
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-heavy step is one groupBy(source) over the corpus
    (map-side combined); every share/boost column is a window over the
    20-row aggregate, so the 'global sum' windows cost nothing. At 100 TB
    the same plan holds: shares always live on the aggregated table."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    w = Window.partitionBy()
    p_raw = F.col("total_chars") * 1.0 / F.sum("total_chars").over(w)
    shares = per_source.select(
        "source", "n_docs", "total_chars",
        p_raw.alias("p_raw"),
        F.pow(p_raw, MIX_ALPHA).alias("p_pow"),
    )
    mix = F.col("p_pow") / F.sum("p_pow").over(w)
    return shares.select(
        "source", "n_docs", "total_chars",
        F.round("p_raw", 6).alias("raw_share"),
        F.round(mix, 6).alias("mix_share"),
        # try_divide: a source of only empty docs has p_raw = 0; the
        # boost must be NULL like the oracle's 0/0, not an ANSI crash
        F.round(F.try_divide(mix, F.col("p_raw")), 6).alias("boost"),
        F.round(mix * MIX_BUDGET).cast("long").alias("target_docs"),
    ).orderBy("source")


BFD_CAP = 512  # bin capacity in whitespace tokens


@query("pack_sequences_bestfit")
def pack_sequences_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (bin packing is inherently sequential per shard): best-fit
    -decreasing packing WITHOUT document splitting — the packing flavor
    used when cross-document attention contamination matters more than
    perfect fill. Counterpart to pack_sequences_concat (which splits).

    Scale shape: packing state is per-LANGUAGE-shard, so the corpus
    parallelizes across shards (applyInPandas, one group per lang); inside
    a shard the FFD/BFD loop is O(n log n) python over that shard's
    metadata ONLY (doc_id + token count — never text). Documents longer
    than the bin capacity get singleton oversize bins, flagged."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    meta = d.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )

    out_schema = (
        "lang string, doc_id long, n_tokens long, bin_id long, "
        "bin_fill long, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        lang = pdf["lang"].iloc[0]
        docs = sorted(
            zip(pdf["doc_id"], pdf["n_tokens"]),
            key=lambda t: (-t[1], t[0]),  # decreasing size, id tiebreak
        )
        bins: list[int] = []  # remaining capacity per bin
        # best-fit via a bisect-maintained sorted (rem, idx) list: the
        # former linear scan over all open bins was O(n^2) python per
        # shard; bisect finds the same bin — smallest rem >= n, lowest
        # idx on ties, exactly the old scan's strict-< selection — in
        # O(log n) comparisons (insort/pop shifts are C-speed memmove).
        srt: list[tuple[int, int]] = []  # sorted (rem, bin idx)
        rows = []
        for doc_id, n in docs:
            n = int(n)
            if n > BFD_CAP:  # strictly longer than capacity; an exact-fit
                # doc (n == BFD_CAP) occupies a normal full bin below
                bins.append(0)
                bisect.insort(srt, (0, len(bins) - 1))
                rows.append((lang, int(doc_id), n, len(bins) - 1, n, True))
                continue
            pos = bisect.bisect_left(srt, (n, -1))
            if pos == len(srt):  # no open bin takes n -> new bin
                bins.append(BFD_CAP - n)
                best = len(bins) - 1
            else:
                rem, best = srt.pop(pos)
                bins[best] = rem - n
            bisect.insort(srt, (bins[best], best))
            rows.append((lang, int(doc_id), n, best, BFD_CAP - bins[best], False))
        out = pd.DataFrame(
            rows,
            columns=["lang", "doc_id", "n_tokens", "bin_id", "bin_fill", "oversize"],
        )
        return out

    return (
        meta.groupBy("lang")
        .applyInPandas(pack, schema=out_schema)
        .orderBy("lang", "bin_id", "doc_id")
    )


SOURCE_CAP = 15  # max docs kept per source (below the synthetic corpus's
# uniform 25 docs/source at sf0.01 so the drop path actually exercises)


@query(
    "source_cap_downsample",
    oracle=f"""
    -- Per-source (per-domain) cap: every web-scale corpus over-represents
    -- a few giant domains; cap each source at {SOURCE_CAP} docs, keeping
    -- the longest documents first (deterministic doc_id tie-break). The
    -- report carries both kept and dropped rows so downstream accounting
    -- can audit what the cap cost each source.
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS source_total
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rank_in_source,
           rk <= {SOURCE_CAP} AS kept, source_total
    FROM ranked
    ORDER BY doc_id
    """,
)
def source_cap_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap, the standard web-corpus de-biasing step: rank docs
    within each source by quality proxy (length, id tie-break) and keep
    the top SOURCE_CAP.

    Scale shape: group-contiguous two-phase rank (operators/rank.py
    group_row_number) over (source, n_chars desc, doc_id) — a parallel
    range-partitioned sort where a skewed mega-domain spreads across
    MANY range buckets instead of concentrating on one reducer, and the
    payload is (doc_id, source, n_chars) — never text. source_total
    comes from the same per-group base aggregate; the base join is a
    plain equi-join, so AQE broadcasts it while the domain count is
    small and shuffles it at web scale (millions of domains)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    ranked = group_row_number(
        d,
        ["source"],
        [F.desc("n_chars"), F.asc("doc_id")],
        rank_col="rank_in_source",
        count_col="source_total",
    )
    return ranked.select(
        "doc_id",
        "source",
        "rank_in_source",
        (F.col("rank_in_source") <= SOURCE_CAP).alias("kept"),
        F.col("source_total").cast("long").alias("source_total"),
    ).orderBy("doc_id")


# --- importance resampling weights (DSIR-style) -----------------------------

N_FEAT_BUCKETS = 256  # hashed-unigram feature space (md5-prefix buckets)
TARGET_LANG = "en"  # the "target domain" sample the weights steer toward


@query(
    "corpus_importance_weights",
    oracle=f"""
    -- Data-selection importance weights via hashed n-gram language models
    -- (the DSIR recipe): two unigram bucket distributions — target domain
    -- (lang = '{TARGET_LANG}') vs the whole corpus — and per document the
    -- sum of per-word log-likelihood ratios under Laplace smoothing.
    WITH wb AS (
      SELECT doc_id, lang, substr(md5(w), 1, 2) AS b
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
    ),
    src AS (SELECT b, CAST(count(*) AS BIGINT) AS n_s FROM wb GROUP BY b),
    tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS n_t
            FROM wb WHERE lang = '{TARGET_LANG}' GROUP BY b),
    llr AS (
      SELECT s.b,
             ln((COALESCE(t.n_t, 0) + 1.0)
                / (sum(COALESCE(t.n_t, 0)) OVER () + {N_FEAT_BUCKETS}.0))
           - ln((s.n_s + 1.0)
                / (sum(s.n_s) OVER () + {N_FEAT_BUCKETS}.0)) AS llr
      FROM src s LEFT JOIN tgt t ON t.b = s.b
    )
    SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           round(sum(l.llr), 6) AS log_weight
    FROM wb w JOIN llr l ON l.b = w.b
    GROUP BY w.doc_id ORDER BY w.doc_id
    """,
)
def corpus_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: log p_target(doc)/p_source(doc) under
    hashed-unigram LMs. Selection then samples proportionally to the weight
    (the sampling half is sample_weighted_exact).

    Scale shape: two linear passes over the corpus words build two
    {N}-bucket histograms (map-side partial aggs; the bucket tables are a
    few hundred rows no matter the corpus size), the log-ratio table
    broadcasts, and the per-doc weight is one more map-side-combinable
    groupBy(doc_id). No shuffle carries more than (doc_id, float) rows —
    the full-text column never moves."""
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    wb = d.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("w"),
    ).select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("w").cast("binary")), 1, 2).alias("b"),
    )
    # Persisted: feeds the two histograms AND the final per-doc sum — one
    # explode pass instead of three (same pitfall as the shingle relation
    # in dedup_jaccard_dfcap).
    wb = wb.persist(StorageLevel.MEMORY_AND_DISK)
    src = wb.groupBy("b").agg(F.count(F.lit(1)).alias("n_s"))
    tgt = (
        wb.filter(F.col("lang") == TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    k = float(N_FEAT_BUCKETS)
    llr = (
        src.join(tgt, "b", "left")
        .withColumn("n_t", F.coalesce("n_t", F.lit(0)))
        .withColumn("tot_s", F.sum("n_s").over(Window.partitionBy()))
        .withColumn("tot_t", F.sum("n_t").over(Window.partitionBy()))
        .select(
            "b",
            (
                F.log((F.col("n_t") + 1.0) / (F.col("tot_t") + k))
                - F.log((F.col("n_s") + 1.0) / (F.col("tot_s") + k))
            ).alias("llr"),
        )
    )
    return (
        wb.join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.sum("llr"), 6).alias("log_weight"),
        )
        .orderBy("doc_id")
    )


EPOCH_BUDGET_TOKENS = 200_000  # token budget for the mixed training corpus
MAX_EPOCHS = 4.0  # repetition ceiling before diminishing returns


@query(
    "corpus_epochs_budget",
    oracle=f"""
    -- Data-constrained mixing: allocate a repeat factor (epochs) per
    -- source under a global token budget — temperature-mix targets, but a
    -- source whose target exceeds its inventory repeats (up to
    -- {MAX_EPOCHS} epochs) instead of silently under-delivering. All
    -- shares live on the per-source aggregate; unspent budget from
    -- epoch-capped sources is reported, not resharded (one pass, no
    -- iterative waterfill — the audit row a second rebalance would read).
    WITH per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY 1
    ),
    raw AS (
      SELECT source, n_docs, total_tokens,
             total_tokens * 1.0 / sum(total_tokens) OVER () AS p_raw
      FROM per_source
    ),
    shares AS (
      SELECT source, n_docs, total_tokens,
             pow(p_raw, {MIX_ALPHA}) / sum(pow(p_raw, {MIX_ALPHA})) OVER () AS mix_share
      FROM raw
    )
    SELECT source, n_docs, total_tokens,
           round(mix_share, 6) AS mix_share,
           CAST(round(mix_share * {EPOCH_BUDGET_TOKENS}) AS BIGINT) AS target_tokens,
           round(least({MAX_EPOCHS}, mix_share * {EPOCH_BUDGET_TOKENS} / total_tokens), 6)
               AS epochs,
           CAST(round(total_tokens
                 * least({MAX_EPOCHS}, mix_share * {EPOCH_BUDGET_TOKENS} / total_tokens))
               AS BIGINT) AS effective_tokens,
           mix_share * {EPOCH_BUDGET_TOKENS} / total_tokens > {MAX_EPOCHS} AS epoch_capped
    FROM shares ORDER BY source
    """,
)
def corpus_epochs_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch allocation under a token budget (the
    data-constrained mixing recipe: temperature-share targets, repetition
    capped at MAX_EPOCHS for small high-value sources).

    Scale shape: identical to corpus_temperature_mix — ONE
    map-side-combined groupBy(source) over the corpus computes token
    inventories; every share/epoch column is arithmetic over the ~20-row
    per-source aggregate (the bounded-frame window whitelist case). The
    token count is the whitespace proxy; swapping in BPE counts
    (q:bpe_tokenize_counts) changes the input column, not the plan."""
    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
    )
    w = Window.partitionBy()
    p_raw = F.col("total_tokens") * 1.0 / F.sum("total_tokens").over(w)
    shares = per_source.select(
        "source",
        "n_docs",
        "total_tokens",
        (F.pow(p_raw, MIX_ALPHA) / F.sum(F.pow(p_raw, MIX_ALPHA)).over(w)).alias(
            "mix_share"
        ),
    )
    epochs = F.least(
        F.lit(MAX_EPOCHS),
        F.col("mix_share") * EPOCH_BUDGET_TOKENS / F.col("total_tokens"),
    )
    return shares.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round("mix_share", 6).alias("mix_share"),
        F.round(F.col("mix_share") * EPOCH_BUDGET_TOKENS).cast("long").alias(
            "target_tokens"
        ),
        F.round(epochs, 6).alias("epochs"),
        F.round(F.col("total_tokens") * epochs).cast("long").alias("effective_tokens"),
        (
            F.col("mix_share") * EPOCH_BUDGET_TOKENS / F.col("total_tokens")
            > MAX_EPOCHS
        ).alias("epoch_capped"),
    ).orderBy("source")
