"""Deduplication operators for training-data pipelines (BASELINE.json
north star): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Design for 100 TB:
- exact dedup = hash-groupBy: one shuffle on a 16-byte digest, never on the
  document body; at scale the digest shuffle is ~0.02% of corpus bytes.
- near-dup never does the naive O(n^2) cross join. Candidate generation is
  an inverted-index equi-join (shared shingle / LSH band bucket / sign-bit
  bucket) so the pair space is bounded by bucket occupancy; AQE skew-join
  handles hot buckets (stopword-ish shingles are pre-dropped by document
  frequency where noted).
- every hash is md5 over explicit strings — deterministic across engines,
  retries, and speculation (same property the reference needs from its
  per-slice seeds, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .registry import query

N_MINHASH = 8  # permutations (md5 with seed salt)
N_BANDS = 4  # LSH bands of 2 rows each


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(count(*) AS BIGINT) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    ORDER BY content_hash
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact dup groups: keep-min-id canonical policy. The groupBy key is the
    # digest, so the shuffle payload is (16B hash, 8B id) per doc.
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text").cast("binary")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_copies") > 1)
        .orderBy("content_hash")
    )


@query(
    "dedup_keep_canonical",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The materializing form: emit the corpus with dup bodies removed
    # (first-id wins). Window over the digest — same single shuffle.
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# --- 3-word shingles, shared helpers -------------------------------------

# 3-word shingles over a pre-split `ws` array column. Keeping the split in
# its own projection stops CollapseProject from re-inlining the (expensive)
# split at every lambda reference — split runs once per row.
_SHINGLES_WS = """
    array_distinct(transform(sequence(1, greatest(size(ws) - 2, 1)),
      i -> concat_ws(' ', element_at(ws, i),
                     element_at(ws, least(i + 1, size(ws))),
                     element_at(ws, least(i + 2, size(ws))))))
"""


def shingles_of(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows for ANY (doc_id, text) frame — the single
    definition of the 3-shingle expression, shared by the batch sf_dir
    queries below and the streaming near-dedup micro-batch probe
    (streaming/pipeline.py run_incremental_neardedup): a stream that
    shingled differently from the batch family would build an index the
    batch queries can't probe."""
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    return ws.select("doc_id", F.explode(F.expr(_SHINGLES_WS)).alias("shingle"))


def minhash_signature_of(docs: DataFrame) -> DataFrame:
    """(doc_id, m0..m7) MinHash signature for ANY (doc_id, text) frame —
    the df-based form of _minhash_signature_df (same salted-md5 hash
    family, same explode + partial-agg min), unpersisted so callers
    decide the materialization policy."""
    sh = shingles_of(docs)
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("shingle")).cast("binary")).alias(f"h{seed}")
            for seed in range(N_MINHASH)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{seed}").alias(f"m{seed}") for seed in range(N_MINHASH)]
    )


def band_buckets_of(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) LSH band buckets from a signature frame —
    the single definition of the banding expression ({N_BANDS} bands x
    {rows_per_band} rows, md5 over the '|'-joined band rows), shared by
    the candidate/verified-pairs family, the incremental delta, and the
    streaming index."""
    rows_per_band = N_MINHASH // N_BANDS
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[F.col(f"m{k * rows_per_band + r}") for r in range(rows_per_band)],
                            ).cast("binary")
                        ).alias("bucket"),
                    )
                    for k in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _exploded_shingles(
    spark: SparkSession,
    sf_dir: str,
    cache: bool = False,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """(doc_id, shingle) rows — each doc's distinct 3-shingles.

    ``cache=True`` persists the exploded table (MEMORY_AND_DISK): queries
    that branch it into several shuffle keys (pair join on shingle, sizes
    on doc_id, DF counts on shingle) would otherwise re-run the explode per
    branch — exchange reuse only dedupes identical exchanges. At corpus
    scale the same decision shows up as materializing the shingle/signature
    table once before the joins.

    ``caches`` (r14): callers with an internal materialization point (the
    iterative CC/pagerank queries, whose labels are checkpointed before
    the function returns) pass a list here; every persisted frame is
    appended so the caller can release it the moment its own result is
    materialized — executor storage stays bounded at scale instead of
    squatting until session end (guide §5). Callers whose terminal action
    runs after the query function returns cannot release safely and pass
    nothing (the session owner clears between work units, as
    check_window.py and bench.py do).
    """
    sh = shingles_of(table(spark, sf_dir, "documents"))
    if cache:
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        if caches is not None:
            caches.append(sh)
    return sh


def _minhash_signature_df(
    spark: SparkSession,
    sf_dir: str,
    caches: list[DataFrame] | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, m0..m7) MinHash signature via explode + groupBy-min.

    Each salted md5 is evaluated exactly once per (shingle, permutation);
    the aggregate is an optimizer barrier, so downstream band expressions
    reference cheap attributes instead of re-inlining the whole shingle
    pipeline (which made the naive formulation ~20x slower). The shuffle
    payload is (doc_id, 8 x 32B hex) — negligible vs corpus bytes, and
    map-side partial min keeps the shuffle rows ~= distinct doc_ids.

    ``shingles`` (r14): callers that ALSO materialize the exploded
    shingle table (_verified_pairs_df, dedup_incremental_delta) pass
    their cached (doc_id, shingle) frame so the signature derives from
    it instead of re-splitting and re-exploding every document — one
    shingle pass per cold execution instead of two. min(md5(seed:s))
    over the same distinct shingle set is the same signature, so values
    are identical; the hash family and count per query are unchanged
    (the oracle contract). Callers that need only the signature
    (dedup_minhash_signatures / _lsh_candidate_pairs_df standalone) omit
    it and keep the leaner signature-only lineage.
    """
    from pyspark import StorageLevel

    if shingles is not None:
        hashed = shingles.select(
            "doc_id",
            *[
                F.md5(
                    F.concat(F.lit(f"{seed}:"), F.col("shingle")).cast("binary")
                ).alias(f"h{seed}")
                for seed in range(N_MINHASH)
            ],
        )
        sig = hashed.groupBy("doc_id").agg(
            *[F.min(f"h{seed}").alias(f"m{seed}") for seed in range(N_MINHASH)]
        )
    else:
        sig = minhash_signature_of(table(spark, sf_dir, "documents"))
    # Persist the signature table: it is tiny (n_docs x 8 hex digests) and
    # every LSH-family query (candidates, verified pairs, connected
    # components, incremental delta) starts from it. Spark's CacheManager
    # matches by analyzed plan, so all of them share ONE materialization of
    # the 8-hashes-per-shingle pass — the dominant cost of the family.
    # Lifetime: CacheManager entries accumulate one per sf_dir for the
    # session's life; long-lived serving sessions must release between
    # work units with spark.catalog.clearCache() (check_window.py does,
    # per query) — no query-side unpersist is safe, since the consumer's
    # action runs after this function returns. Exception (r14): callers
    # with an internal materialization point register the cache in
    # ``caches`` and release it themselves (see _exploded_shingles).
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(sig)
    return sig

_SHINGLES_DUCK = """
    list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      i -> string_split(text, ' ')[i] || ' ' ||
           string_split(text, ' ')[least(i + 1, len(string_split(text, ' ')))] || ' ' ||
           string_split(text, ' ')[least(i + 2, len(string_split(text, ' ')))]))
"""


@query(
    "dedup_ngram_jaccard_pairs_diagnostic",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           round(p.common * 1.0 / (sa.n_sh + sb.n_sh - p.common), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE p.common * 1.0 / (sa.n_sh + sb.n_sh - p.common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard_pairs_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIAGNOSTIC-ONLY: exact Jaccard with NO document-frequency cap. A
    # shingle appearing in d docs fans out d^2 candidate rows, so this is a
    # small-corpus ground-truth tool for validating dedup_jaccard_dfcap and
    # the MinHash/LSH paths — never the production plan. At scale use
    # dedup_jaccard_dfcap (df-capped, bounded bucket fan-out) below.
    return _ngram_jaccard_pairs_df(spark, sf_dir).orderBy("doc_a", "doc_b")


def _ngram_jaccard_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard) — the UNSORTED interior of
    dedup_ngram_jaccard_pairs_diagnostic, split out (r13) so consumers
    that discard the ordering (dedup_lsh_quality_eval's truth side) do
    not inherit the global range sort: a Sort under the consumer's
    Generate/persist/aggregate boundaries is NOT eliminated by the
    optimizer, so the registered query's ORDER BY would otherwise run a
    sampling pass + range exchange inside every consumer. Same rows."""
    sh = _exploded_shingles(spark, sf_dir, cache=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


DF_CAP = 5  # shingles appearing in more than DF_CAP docs are dropped


@query(
    "dedup_jaccard_dfcap",
    oracle=f"""
    -- Jaccard near-dup with a document-frequency cap: shingles present in
    -- more than {DF_CAP} docs are boilerplate/stopword-ish and are dropped
    -- BEFORE the inverted-index self-join — the skew control that keeps
    -- bucket fan-out bounded at corpus scale.
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
    ),
    df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    rare AS (
      SELECT s.doc_id, s.shingle FROM sh s JOIN df ON s.shingle = df.shingle
      WHERE df.df <= {DF_CAP}
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM rare GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS common
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           round(p.common * 1.0 / (sa.n_sh + sb.n_sh - p.common), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE p.common * 1.0 / (sa.n_sh + sb.n_sh - p.common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_jaccard_dfcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The hot-key guard for the inverted-index join: per-shingle document
    # frequency is one groupBy over (shingle), the hot set is tiny (29 of
    # 16k shingles at sf0.01) so the anti-join broadcasts under AQE, and
    # the pair join then never sees a bucket wider than DF_CAP docs —
    # worst-case fan-out per shingle is DF_CAP^2 instead of corpus^2.
    from pyspark import StorageLevel

    sh = _exploded_shingles(spark, sf_dir, cache=True)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("shingle")
    )
    # Persist the df-capped shingle relation: it feeds THREE consumers
    # (sizes + both self-join sides); unpersisted, each re-runs the
    # explode + anti-join lineage — the plan showed 8 parquet scans.
    rare = sh.join(hot, "shingle", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def _minhash_duck(seed: int) -> str:
    return f"list_min(list_transform({_SHINGLES_DUCK}, s -> md5('{seed}:' || s)))"


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    SELECT doc_id,
           array_to_string([{', '.join(_minhash_duck(s) for s in range(N_MINHASH))}],
                           '|') AS signature
    FROM documents ORDER BY doc_id
    """,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MinHash signature: per permutation (salted md5), the min hash over the
    # doc's shingle set — explode + partial-agg min (see _minhash_signature_df).
    # The signature is emitted '|"-joined as ONE string column: hex digests
    # are fixed-width text, so the encoding is lossless, and scalar cells are
    # what an order-insensitive value-hash comparator can factorize (an
    # array<string> cell is unhashable for pandas-based canonicalizers).
    sigs = _minhash_signature_df(spark, sf_dir)
    return sigs.select(
        "doc_id",
        F.concat_ws("|", *[F.col(f"m{s}") for s in range(N_MINHASH)]).alias("signature"),
    ).orderBy("doc_id")


@query(
    "dedup_minhash_lsh_candidates",
    oracle=f"""
    -- LSH banding: {N_BANDS} bands x {N_MINHASH // N_BANDS} rows. Docs that
    -- agree on ALL rows of any band are candidate pairs.
    WITH sig AS (
      SELECT doc_id,
             [{', '.join(_minhash_duck(s) for s in range(N_MINHASH))}] AS sg
      FROM documents
    ),
    bands AS (
      SELECT doc_id, k AS band,
             md5(sg[2*k + 1] || '|' || sg[2*k + 2]) AS bucket
      FROM sig, (SELECT unnest(range(0, {N_BANDS})) AS k)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The scale path for near-dedup: signature -> band buckets -> equi-join
    # on (band, bucket). Join fan-out is bounded by bucket occupancy; no
    # cross join exists anywhere in the plan. Band buckets are built from
    # the aggregated signature columns (cheap attribute refs); the self-join
    # sides share one computation via Spark's exchange reuse.
    return _lsh_candidate_pairs_df(spark, sf_dir).orderBy("doc_a", "doc_b")


def _lsh_candidate_pairs_df(
    spark: SparkSession,
    sf_dir: str,
    caches: list[DataFrame] | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Distinct (doc_a, doc_b) LSH candidates — the UNSORTED interior of
    dedup_minhash_lsh_candidates (r13, like _verified_pairs_df): the
    verification pipeline consumes the candidates through joins, where
    the optimizer happens to eliminate the sort today, but the
    dependency is structural now rather than an optimizer behavior.
    ``shingles``/``caches`` pass through to _minhash_signature_df (r14)."""
    sigs = _minhash_signature_df(spark, sf_dir, caches=caches, shingles=shingles)
    bands = band_buckets_of(sigs)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )




# WITH-clause interior shared by the verified-pairs query and the
# connected-components clustering oracle: LSH banding proposes candidate
# pairs, exact Jaccard >= 0.5 confirms them -> `vpairs(doc_a, doc_b,
# jaccard)` with doc_a < doc_b.
_VERIFIED_PAIRS_DUCK = f"""
    sig AS (
      SELECT doc_id,
             [{', '.join(_minhash_duck(s) for s in range(N_MINHASH))}] AS sg
      FROM documents
    ),
    bands AS (
      SELECT doc_id, k AS band,
             md5(sg[2*k + 1] || '|' || sg[2*k + 2]) AS bucket
      FROM sig, (SELECT unnest(range(0, {N_BANDS})) AS k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    sh AS (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    vpairs AS (
      SELECT m.doc_a, m.doc_b,
             round(m.common * 1.0 / (sa.n_sh + sb.n_sh - m.common), 6) AS jaccard
      FROM common m
      JOIN sizes sa ON sa.doc_id = m.doc_a
      JOIN sizes sb ON sb.doc_id = m.doc_b
      WHERE m.common * 1.0 / (sa.n_sh + sb.n_sh - m.common) >= 0.5
    )
"""


@query(
    "dedup_lsh_verified_pairs",
    oracle=f"""
    -- The production near-dedup flow: LSH banding proposes candidates,
    -- exact Jaccard verifies them. Verification runs ONLY on candidate
    -- pairs (bounded by bucket occupancy), never on the full pair space.
    WITH {_VERIFIED_PAIRS_DUCK}
    SELECT doc_a, doc_b, jaccard FROM vpairs
    ORDER BY doc_a, doc_b
    """,
)
def dedup_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Candidates from the banded signature join; exact Jaccard computed only
    # for candidate pairs by semi-joining the shingle table down to the
    # candidate docs first. At corpus scale the shingle re-scan touches only
    # docs that appear in some candidate pair.
    return _verified_pairs_df(spark, sf_dir).orderBy("doc_a", "doc_b")


def _verified_pairs_df(
    spark: SparkSession, sf_dir: str, caches: list[DataFrame] | None = None
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — the UNSORTED interior of
    dedup_lsh_verified_pairs, split out (r13) for the seven consumers
    that immediately discard the ordering (connected components,
    pagerank representatives, triangle count, quality eval, the split
    audit, the per-source dup summary, curation_funnel): the registered
    query's global ORDER BY is a sampling pass + range exchange that the
    optimizer can NOT eliminate once the pair plan sits under a
    consumer's Generate/persist boundary (measured: 10 surviving
    rangepartitioning exchanges in the pagerank loop-lineage capture,
    plans/r13/pagerank_pass_after.txt). At corpus scale the pair set is
    the near-dup graph's edge list — billions of rows at 100 TB — so a
    dead global sort of it is a real pass. Same rows, same jaccard.

    r14: the signature derives from the SAME cached shingle table the
    verify side scans (``shingles=sh``) — previously the cold lineage
    split + exploded every document twice, once into the signature's
    explode and once into the shingle cache. One pass now; identical
    signatures (same salted-md5 family over the same distinct shingle
    set).

    r14 NEGATIVE RESULT (guide §1 — implemented, measured, reverted): a
    candidate-doc semi-join pre-filter of the shingle table before the
    verify join and the size aggregate (§2.3/§3.2). Value-identical
    (every consumer inner-joins on ids drawn from cand), but measured
    strictly worse at bench scale: +14 AQE jobs per consumer query
    (candidate-pair cache + per-occurrence doc-set broadcast builds),
    warm cpu 4.4 -> ~6.9 s. Root cause: the verify join already executes
    as a broadcast of the candidate pairs over the CACHED shingle table
    (plans/r14/dedup_lsh_verified_pairs_before.txt: 10 BHJ, 0 SMJ — the
    shingle table is never shuffled), and the size aggregate is map-side
    partial (its exchange carries ~doc-count rows, not shingle rows), so
    the pre-filter paid 3 extra full probes of the shingle cache + 3
    broadcast builds to avoid work the plan was not doing. At a scale
    where the candidate set no longer broadcasts, the recipe to revisit
    is a Bloom filter over candidate doc ids applied below the verify
    join's exchange (guide §3.2; PySpark lacks df.stat.bloomFilter — use
    the broadcast-semi form only while the distinct candidate-doc set
    provably fits the 8 GB broadcast cap)."""
    sh = _exploded_shingles(spark, sf_dir, cache=True, caches=caches)
    cand = _lsh_candidate_pairs_df(
        spark, sf_dir, caches=caches, shingles=sh
    ).select("doc_a", "doc_b")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _simhash_bit_duck(b: int) -> str:
    return (
        f"CASE WHEN 2 * len(list_filter(string_split(text, ' '), "
        f"w -> strpos('89abcdef', substr(md5(w), {b + 1}, 1)) > 0)) "
        f"> len(string_split(text, ' ')) THEN '1' ELSE '0' END"
    )


@query(
    "dedup_simhash_16bit",
    oracle=f"""
    SELECT doc_id,
           {" || ".join(_simhash_bit_duck(b) for b in range(16))} AS simhash
    FROM documents ORDER BY doc_id
    """,
)
def dedup_simhash_16bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SimHash: per bit, majority vote of per-word hash bits. Near-dups
    # differ in few bits; grouping by the full code gives coarse clusters,
    # and banding the 16 bits gives the hamming-radius candidate join.
    # Relational formulation: explode words -> ONE md5 per word -> 16 scalar
    # vote columns -> groupBy-sum. Everything is whole-stage-codegen scalar
    # expressions (no interpreted higher-order lambdas), the shuffle carries
    # (doc_id, 17 longs) after map-side partial aggregation. The naive
    # array-filter form evaluated 16 interpreted lambdas over every word.
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    hashed = words.select("doc_id", F.md5(F.col("w").cast("binary")).alias("h"))
    bits = hashed.select(
        "doc_id",
        *[
            F.when(F.substring("h", b + 1, 1).isin(*"89abcdef"), 1).otherwise(0).alias(f"b{b}")
            for b in range(16)
        ],
    )
    votes = bits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nw"),
        *[F.sum(f"b{b}").alias(f"v{b}") for b in range(16)],
    )
    code = F.concat(
        *[F.when(2 * F.col(f"v{b}") > F.col("nw"), "1").otherwise("0") for b in range(16)]
    )
    return votes.select("doc_id", code.alias("simhash")).orderBy("doc_id")


@query(
    "dedup_embedding_cosine_pairs",
    oracle="""
    -- Embedding near-dup: cosine >= 0.95 among vectors sharing a sign-bit
    -- prefix bucket (first 8 dims) — the bucketed candidate join, not a
    -- cross join. 8 bits ~ 256 buckets keeps candidate fan-out ~n^2/256
    -- while near-identical vectors still collide on every sign bit.
    WITH v AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS e,
             concat(CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) /
             (sqrt(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i]))) *
              sqrt(list_sum(list_transform(range(1, 65), i -> b.e[i] * b.e[i])))) AS cosine
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, round(cosine, 6) AS cosine
    FROM pairs WHERE cosine >= 0.95
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    # Norms are per-vector: compute them below the self-join (once per
    # vector), not per candidate pair — same arithmetic, bit-identical
    # scores, one lambda per pair instead of three.
    v = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        F.sqrt(
            F.expr(
                "aggregate(transform(cast(embedding as array<double>), x -> x * x),"
                " 0.0D, (acc, z) -> acc + z)"
            )
        ).alias("nrm"),
        F.concat(
            *[
                F.when(F.col("embedding")[i] >= 0, "1").otherwise("0")
                for i in range(8)
            ]
        ).alias("bucket"),
    )
    a = v.alias("a")
    b = v.alias("b")
    dot = F.expr("aggregate(zip_with(a.e, b.e, (x, y) -> x * y), 0.0D, (acc, z) -> acc + z)")
    cosine = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.95)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


CC_MAX_PASSES = 40  # graph-diameter ceiling; exceeding it raises loudly


def connected_component_labels(edges: DataFrame) -> DataFrame:
    """Min-label propagation over a symmetric edge list (s, d) -> one
    (node, lab) row per node, lab = component min. Each pass is ONE shuffle
    (edges x labels equi-join + groupBy-min with map-side partial agg);
    localCheckpoint truncates lineage so the plan stays constant-size.
    Convergence certificate: labels only decrease, so the decimal(38,0)
    label sum strictly drops on any change — one cheap agg per pass.

    Raises RuntimeError if the diameter exceeds CC_MAX_PASSES instead of
    returning silently-wrong labels; graphs that deep want the
    pointer-jumping / large-star-small-star variant, not a bigger cap."""
    labels = (
        edges.select(F.col("s").alias("node")).distinct().withColumn("lab", F.col("node"))
    ).localCheckpoint(eager=False)  # materialized by the first certificate

    def _label_sum(df: DataFrame) -> int:
        return df.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    if prev_sum is None:  # empty graph
        return labels
    for _ in range(CC_MAX_PASSES):
        labels = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("d").alias("node"), "lab")
            .unionAll(labels)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        ).localCheckpoint(eager=False)
        # lazy checkpoint: the label-sum certificate below is the action
        # that materializes (and truncates) this pass — one job per pass
        # instead of the former checkpoint-job + certificate-job (r13)
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected components did not converge within {CC_MAX_PASSES} passes "
        "(graph diameter exceeds the cap) — labels would be wrong; use "
        "connected_component_labels_jump for path-like graphs this deep"
    )


CC_JUMP_MAX_PASSES = 64  # log2(diameter) passes; 64 covers any real graph


def connected_component_labels_jump(edges: DataFrame) -> DataFrame:
    """Pointer-jumping min-label connected components: O(log diameter)
    passes instead of O(diameter).

    Each pass combines the propagation step with a path-doubling shortcut
    (same family as large-star/small-star, Kiveris et al. 2014):

        lab'(v) = min( lab(v),  min_{u in N(v)} lab(u),  lab(lab(v)) )

    The ``lab(lab(v))`` term is a self-join of the label table on the
    label column — every label IS a node id, so the parent pointer always
    resolves — and it doubles the effective propagation distance per
    pass, turning a depth-d chain into ~2*log2(d) rounds. Cost per pass:
    two equi-join shuffles (edges x labels, labels x labels) + one
    map-side-combined groupBy-min, vs one shuffle for the plain
    propagation — the right trade whenever diameter > a few.

    Fixpoint identical to min-label propagation (labels decrease
    monotonically; stable iff constant-on-component = component min), so
    the decimal label-sum convergence certificate carries over. Raises
    after CC_JUMP_MAX_PASSES (= 64 ~ log2 of any physical diameter) —
    reaching it indicates a bug, not a deep graph."""
    labels = (
        edges.select(F.col("s").alias("node")).distinct().withColumn("lab", F.col("node"))
    ).localCheckpoint(eager=False)  # materialized by the first certificate

    def _label_sum(df: DataFrame) -> int:
        return df.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    if prev_sum is None:  # empty graph
        return labels
    for _ in range(CC_JUMP_MAX_PASSES):
        prop = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("d").alias("node"), "lab")
            .unionAll(labels)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        x, y = prop.alias("x"), prop.alias("y")
        labels = (
            x.join(y, F.col("x.lab") == F.col("y.node"))
            .select(
                F.col("x.node").alias("node"),
                F.least(F.col("x.lab"), F.col("y.lab")).alias("lab"),
            )
        ).localCheckpoint(eager=False)
        # materialized by the certificate action below (r13, as above)
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"pointer-jumping CC did not converge within {CC_JUMP_MAX_PASSES} "
        "passes — log-diameter convergence should make this unreachable; "
        "investigate the edge list for corruption"
    )


CC_STAR_MAX_ROUNDS = 64  # O(log^2 n) proven bound; 64 >> any physical graph


def connected_component_labels_star(edges: DataFrame) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond") — the canonical
    edge-rewriting formulation, O(log^2 n) rounds worst case and ~log n
    in practice, with per-round cost linear in the CURRENT edge count
    (which shrinks as stars form, unlike label tables that stay
    node-sized).

    Round structure over an undirected edge set E:

    - large-star: for each node u, with m = min({u} + neighbors(u)),
      rewrite every STRICTLY LARGER neighbor v > u to the edge (v, m).
      Processing the symmetric adjacency means each undirected edge is
      rewritten exactly once, from its smaller endpoint's star; m <= u < v
      so no self-loops form.
    - small-star: orient each edge large->small; for each u, with
      m = min(smaller-neighbors(u)), rewrite every smaller neighbor
      v != m to (v, m) and attach (u, m).

    The fixpoint is a star forest: every non-root node holds exactly one
    edge (node, component_min). Convergence is detected by exact edge-set
    equality (count match + empty exceptAll — two cheap jobs on the
    shrinking edge set), not a hash signature. localCheckpoint truncates
    the per-round lineage exactly as in the label engines."""
    canon = (
        edges.select(
            F.greatest("s", "d").alias("a"), F.least("s", "d").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("s").alias("node")).distinct().localCheckpoint(eager=True)
    )

    E = canon
    for _ in range(CC_STAR_MAX_ROUNDS):
        # --- large-star over the symmetric adjacency
        adj = E.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            E.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = adj.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            adj.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)  # feeds both small-star branches
        )
        # --- small-star over the large->small orientation
        oriented = ls.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            oriented.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionAll(
                oriented.join(mins2, "u").select(
                    F.col("u").alias("a"), F.col("m").alias("b")
                )
            )
            .select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if ss.count() == E.count() and ss.exceptAll(E).limit(1).count() == 0:
            E = ss
            break
        E = ss
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge within {CC_STAR_MAX_ROUNDS} "
            "rounds — beyond the proven O(log^2 n) bound; investigate the edges"
        )
    # star forest -> labels: non-roots point at their component min; roots
    # (and nodes whose component collapsed onto them) label themselves
    return (
        nodes.join(E.select(F.col("a").alias("node"), F.col("b").alias("lab")), "node", "left")
        .select("node", F.coalesce("lab", "node").alias("lab"))
    )


CC_PROP_STAGE_PASSES = 4  # cheap 1-shuffle passes before escalating


def connected_component_labels_auto(edges: DataFrame) -> DataFrame:
    """Staged connected components: plain min-label propagation (one
    shuffle per pass) for the first CC_PROP_STAGE_PASSES passes — the
    regime of LSH near-dup graphs, whose near-clique clusters converge in
    ~3 — then escalation to pointer jumping (two shuffles per pass,
    O(log diameter)) for adversarially deep graphs. Best of both: the
    common case never pays the label self-join, the chain case never
    pays O(diameter) passes, and the monotone label-sum certificate
    carries across the hand-off because both stages decrease labels
    toward the same fixpoint.

    r14 session 2 (guide §2.4 "remove shuffles outright"): the identity
    initialization (distinct over the edge list, lab = node) and the
    first propagation pass (join + union + groupBy-min) are FUSED into
    one aggregate — on a SYMMETRIC edge list (the stated input contract,
    as in the siblings above) pass 1 from identity labels computes
    exactly lab(v) = min(v, min(neighbors(v))) = least(d, min(s)) per
    destination group, so a single groupBy-min over the edges IS the
    init plus pass 1. Saves one shuffle (the distinct) and one full
    join-union-agg pass per invocation; every subsequent pass and the
    certificate protocol are unchanged, and the fixpoint (component
    min per node) is the same labels row-for-row."""
    labels = (
        edges.groupBy("d")
        .agg(F.min("s").alias("mn"))
        .select(F.col("d").alias("node"), F.least("d", "mn").alias("lab"))
    ).localCheckpoint(eager=False)  # materialized by the first certificate

    def _label_sum(df: DataFrame) -> int:
        return df.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    if prev_sum is None:  # empty graph
        return labels
    for _ in range(CC_PROP_STAGE_PASSES):
        labels = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("d").alias("node"), "lab")
            .unionAll(labels)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        ).localCheckpoint(eager=False)
        # lazy checkpoint: the label-sum certificate below is the action
        # that materializes (and truncates) this pass — one job per pass
        # instead of the former checkpoint-job + certificate-job (r13)
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    for _ in range(CC_JUMP_MAX_PASSES):
        prop = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("d").alias("node"), "lab")
            .unionAll(labels)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        x, y = prop.alias("x"), prop.alias("y")
        labels = (
            x.join(y, F.col("x.lab") == F.col("y.node"))
            .select(
                F.col("x.node").alias("node"),
                F.least(F.col("x.lab"), F.col("y.lab")).alias("lab"),
            )
        ).localCheckpoint(eager=False)
        # materialized by the certificate action below (r13, as above)
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"staged CC did not converge within {CC_PROP_STAGE_PASSES} + "
        f"{CC_JUMP_MAX_PASSES} passes — investigate the edge list"
    )


@query(
    "dedup_connected_components",
    oracle=f"""
    -- Clustering step of the production dedup flow: verified near-dup
    -- pairs form an undirected graph; each document gets the min doc_id
    -- of its connected component as the canonical/cluster id. Oracle:
    -- recursive label reachability (lab spreads along symmetric edges;
    -- min reachable origin == component min).
    WITH RECURSIVE {_VERIFIED_PAIRS_DUCK},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM vpairs
      UNION ALL
      SELECT doc_b, doc_a FROM vpairs
    ),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lab) AS component_id FROM reach GROUP BY 1),
    comp_sizes AS (
      SELECT component_id, CAST(count(*) AS BIGINT) AS component_size
      FROM comp GROUP BY 1
    )
    SELECT c.doc_id, c.component_id, s.component_size
    FROM comp c JOIN comp_sizes s USING (component_id)
    ORDER BY doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pair -> cluster: iterative min-label propagation over the verified
    # near-dup graph (the step that turns pairwise matches into "keep one
    # doc per cluster", reference analog: the approved-keys set union
    # extract_subimages.py:22-27 generalized to transitive groups).
    #
    # Scale design:
    # - staged labels (connected_component_labels_auto): cheap one-shuffle
    #   min-label propagation passes while the graph behaves like LSH
    #   near-dup clusters do (near-cliques, ~3 passes), escalating to
    #   pointer jumping — two shuffles per pass but O(log diameter)
    #   passes via the lab(lab(v)) shortcut — for adversarially deep
    #   graphs (cross-shard URL chains). Labels shrink monotonically and
    #   the loop stops at the first unchanged label-sum certificate.
    # - each pass is 1-2 equi-join shuffles + a groupBy-min with map-side
    #   partial agg. The payload is two longs per edge.
    # - localCheckpoint truncates lineage each pass — without it the plan
    #   doubles per iteration and Catalyst re-optimizes an exponentially
    #   growing tree (the classic iterative-algorithm failure on Spark).
    # - the edge list is persisted: it is re-scanned every pass, and
    #   recomputing it would re-run the whole LSH+verify pipeline per
    #   iteration.
    comp = _cc_component_labels(spark, sf_dir)
    sizes = comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("component_size"))
    return comp.join(sizes, "component_id").select(
        "doc_id", "component_id", "component_size"
    ).orderBy("doc_id")


def _cc_component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component_id) labels of the verified near-dup graph — the
    shared interior of dedup_connected_components, split out (r13) so the
    canonical-selection queries built on top (dedup_keep_best_quality,
    dedup_cluster_representatives) consume the labels directly instead of
    the full registered query, whose component_size join and global
    ORDER BY they immediately discarded: the size join added one exchange
    and the sort a range-partitioned pass that the consumers' own window
    re-shuffled anyway. Row set and values are exactly the labels the
    registered query emits."""
    from pyspark import StorageLevel

    # r14: the labels are checkpoint-materialized by the CC loop's own
    # certificate actions BEFORE this function returns, so this query has
    # a safe release point for the whole LSH lineage's persisted
    # intermediates (shingles, signatures, candidate pairs) — the
    # remaining plan references only the checkpointed labels. Mirrors
    # edges.unpersist() below (guide §5: unpersist when done).
    caches: list[DataFrame] = []
    pairs = _verified_pairs_df(spark, sf_dir, caches=caches).select("doc_a", "doc_b")
    # Symmetrize with ONE explode, not union of two selects: each union
    # branch would re-run the whole LSH+verify lineage (union branches
    # don't share unpersisted subtrees — same pitfall as the shingle
    # table, measured 2x the pipeline cost).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")),
                    F.struct(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.d").alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = connected_component_labels_auto(edges)
    edges.unpersist()
    for c in caches:
        c.unpersist()

    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("component_id"))


DELTA_MOD = 5  # docs with doc_id % 5 == 0 play the "newly arrived" batch


@query(
    "dedup_incremental_delta",
    oracle=f"""
    -- Incremental dedup: the daily-ingest shape. The NEW batch (20% of
    -- docs by a deterministic id rule) is checked against the BASE corpus
    -- only — never base-vs-base. Exact digest hits take precedence; LSH
    -- near-dup (verified Jaccard >= 0.5) catches the rest.
    WITH newd AS (SELECT * FROM documents WHERE doc_id % {DELTA_MOD} = 0),
    base AS (SELECT * FROM documents WHERE doc_id % {DELTA_MOD} <> 0),
    ex AS (
      SELECT n.doc_id, min(b.doc_id) AS match_doc_id
      FROM newd n JOIN base b ON md5(n.text) = md5(b.text)
      GROUP BY 1
    ),
    nsig AS (
      SELECT doc_id,
             [{', '.join(_minhash_duck(s) for s in range(N_MINHASH))}] AS sg
      FROM newd
    ),
    bsig AS (
      SELECT doc_id,
             [{', '.join(_minhash_duck(s) for s in range(N_MINHASH))}] AS sg
      FROM base
    ),
    nbands AS (
      SELECT doc_id, k AS band, md5(sg[2*k + 1] || '|' || sg[2*k + 2]) AS bucket
      FROM nsig, (SELECT unnest(range(0, {N_BANDS})) AS k)
    ),
    bbands AS (
      SELECT doc_id, k AS band, md5(sg[2*k + 1] || '|' || sg[2*k + 2]) AS bucket
      FROM bsig, (SELECT unnest(range(0, {N_BANDS})) AS k)
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, b.doc_id AS base_id
      FROM nbands n JOIN bbands b ON n.band = b.band AND n.bucket = b.bucket
    ),
    sh AS (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.new_id, c.base_id, CAST(count(*) AS BIGINT) AS common
      FROM cand c
      JOIN sh a ON a.doc_id = c.new_id
      JOIN sh b ON b.doc_id = c.base_id AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    near AS (
      SELECT m.new_id AS doc_id, min(m.base_id) AS match_doc_id
      FROM common m
      JOIN sizes sa ON sa.doc_id = m.new_id
      JOIN sizes sb ON sb.doc_id = m.base_id
      WHERE m.common * 1.0 / (sa.n_sh + sb.n_sh - m.common) >= 0.5
        AND m.new_id NOT IN (SELECT doc_id FROM ex)
      GROUP BY 1
    )
    SELECT doc_id, 'exact' AS reason, match_doc_id FROM ex
    UNION ALL
    SELECT doc_id, 'near' AS reason, match_doc_id FROM near
    ORDER BY doc_id
    """,
)
def dedup_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale shape: the base corpus is NEVER self-joined — its (tiny,
    # post-agg) digest and band tables are what the new batch probes, so
    # per-ingest cost is O(|new| x bucket occupancy), independent of base
    # re-processing (the band/digest tables would be maintained
    # incrementally as an index in a real deployment; here they derive from
    # the same lineage). Signatures/bands are built ONCE over the full
    # corpus, then filtered per side from a persisted post-agg table — one
    # explode pass, two cheap filters.
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % DELTA_MOD == 0

    digests = d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
    ex = (
        digests.filter(is_new)
        .alias("n")
        .join(digests.filter(~is_new).alias("b"), F.col("n.h") == F.col("b.h"))
        .groupBy(F.col("n.doc_id").alias("doc_id"))
        .agg(F.min(F.col("b.doc_id")).alias("match_doc_id"))
        # consumed twice (the near-side anti-join and the final union):
        # unpersisted, the documents-scan + digest join lineage would
        # execute twice — same convention as bands/sh above (r6 review)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # r14: signature derived from the cached shingle table (one split +
    # explode pass per cold execution instead of two — identical
    # signatures, see _minhash_signature_df). The shingle cache is
    # hoisted above the bands so both consumers share it.
    sh = _exploded_shingles(spark, sf_dir, cache=True)
    sigs = _minhash_signature_df(spark, sf_dir, shingles=sh)
    bands = band_buckets_of(sigs).persist(StorageLevel.MEMORY_AND_DISK)

    cand = (
        bands.filter(is_new)
        .alias("n")
        .join(
            bands.filter(~is_new).alias("b"),
            (F.col("n.band") == F.col("b.band")) & (F.col("n.bucket") == F.col("b.bucket")),
        )
        .select(F.col("n.doc_id").alias("new_id"), F.col("b.doc_id").alias("base_id"))
        .distinct()
    )

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("new_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("base_id"), "shingle")
    common = (
        cand.join(a, "new_id")
        .join(b, ["base_id", "shingle"])
        .groupBy("new_id", "base_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("new_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("base_id"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("common"))
    near = (
        common.join(sa, "new_id")
        .join(sb, "base_id")
        .filter(jac >= 0.5)
        .join(ex.select(F.col("doc_id").alias("new_id")), "new_id", "left_anti")
        .groupBy(F.col("new_id").alias("doc_id"))
        .agg(F.min("base_id").alias("match_doc_id"))
    )

    out = ex.select("doc_id", F.lit("exact").alias("reason"), "match_doc_id").unionAll(
        near.select("doc_id", F.lit("near").alias("reason"), "match_doc_id")
    )
    return out.orderBy("doc_id")


SEG_WORDS = 8  # non-overlapping segment width for inter-document dedup


@query(
    "dedup_interdoc_segments",
    oracle=f"""
    -- Inter-document repetition (CCNet/RefinedWeb paragraph-dedup shape):
    -- chunk each doc into non-overlapping {SEG_WORDS}-word segments, find
    -- segments occurring in >= 2 distinct docs corpus-wide, and report per
    -- doc how much of it is corpus-duplicated text.
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    seg AS (
      SELECT doc_id, len(ws) // {SEG_WORDS} AS n_segments,
             unnest(list_transform(range(0, len(ws) // {SEG_WORDS}),
                    i -> array_to_string(
                           list_slice(ws, i * {SEG_WORDS} + 1, i * {SEG_WORDS} + {SEG_WORDS}),
                           ' '))) AS seg
      FROM w WHERE len(ws) >= {SEG_WORDS}
    ),
    sd AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY 1)
    SELECT s.doc_id,
           CAST(s.n_segments AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN sd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_segments,
           round(sum(CASE WHEN sd.nd >= 2 THEN 1 ELSE 0 END) * 1.0
                 / s.n_segments, 6) AS shared_frac
    FROM seg s JOIN sd USING (seg)
    GROUP BY s.doc_id, s.n_segments ORDER BY doc_id
    """,
)
def dedup_interdoc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The exploded segment table feeds two consumers shuffling on the same
    # key (the corpus-wide doc-frequency agg, then the join back) — like
    # the Jaccard family it is persisted once rather than recomputed, and
    # the per-doc segment count rides along the explode so no third pass
    # over the text is needed. Docs with zero shared segments survive
    # because the join is against per-segment doc-frequency (every segment
    # has a row), not against the shared subset.
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    segs = F.expr(
        f"transform(sequence(0, CAST(size(ws) / {SEG_WORDS} AS INT) - 1),"
        f" i -> concat_ws(' ', slice(ws, i * {SEG_WORDS} + 1, {SEG_WORDS})))"
    )
    ex = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= SEG_WORDS)
        .select(
            "doc_id",
            (F.size("ws") / SEG_WORDS).cast("long").alias("n_segments"),
            F.explode(segs).alias("seg"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sd = ex.groupBy("seg").agg(F.count_distinct("doc_id").alias("nd"))
    shared = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        ex.join(sd, "seg")
        .groupBy("doc_id", "n_segments")
        .agg(
            shared.alias("n_shared_segments"),
            F.round(shared / F.col("n_segments"), 6).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_cluster_representatives",
    oracle=f"""
    -- The KEEP decision that closes the near-dedup flow: per connected
    -- near-dup cluster, elect the highest-quality member (longest text,
    -- doc_id tiebreak) as the representative and account for the drops.
    WITH RECURSIVE {_VERIFIED_PAIRS_DUCK},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM vpairs
      UNION ALL
      SELECT doc_b, doc_a FROM vpairs
    ),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lab) AS component_id FROM reach GROUP BY 1),
    q AS (SELECT doc_id, length(text) AS n_chars FROM documents),
    ranked AS (
      SELECT c.component_id, c.doc_id, q.n_chars,
             row_number() OVER (PARTITION BY c.component_id
                                ORDER BY q.n_chars DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component_id) AS sz
      FROM comp c JOIN q USING (doc_id)
    )
    SELECT component_id, doc_id AS representative_id,
           CAST(n_chars AS BIGINT) AS rep_n_chars,
           CAST(sz AS BIGINT) AS component_size,
           CAST(sz - 1 AS BIGINT) AS n_dropped
    FROM ranked WHERE rn = 1 ORDER BY component_id
    """,
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Composition on top of the iterative CC clustering: clusters are tiny
    # relative to the corpus (only docs with a verified near-dup partner),
    # so the quality join pulls length for cluster members only (the join
    # pruning direction that matters at 100 TB — never decorate the whole
    # corpus to score a few clusters). One window over component_id elects
    # representatives; sizes ride the same window spec.
    from pyspark.sql.window import Window

    # r13: consume the shared label helper — the registered CC query's
    # component_size join and ORDER BY were dead weight here (see
    # _cc_component_labels); output rows are unchanged.
    cc = _cc_component_labels(spark, sf_dir)
    # r14 (guide §2.3): n_chars projected AFTER the membership join — the
    # before-plan decorated the whole corpus and broadcast it (see
    # dedup_keep_best_quality, same shape); length() is cheap per row but
    # the corpus-sized broadcast build side is the scale problem. Join
    # and projection share a codegen stage, so text never crosses an
    # exchange.
    member_quality = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .join(cc, "doc_id")
        .select("doc_id", "component_id", F.length("text").alias("n_chars"))
    )
    w = Window.partitionBy("component_id").orderBy(F.desc("n_chars"), "doc_id")
    wsz = Window.partitionBy("component_id")
    return (
        member_quality.select(
            "component_id",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wsz).alias("sz"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("representative_id"),
            F.col("n_chars").cast("long").alias("rep_n_chars"),
            F.col("sz").alias("component_size"),
            (F.col("sz") - 1).alias("n_dropped"),
        )
        .orderBy("component_id")
    )


EDIT_PFX = 80  # verify on a bounded prefix: levenshtein is O(len^2)
EDIT_NEAR = 10  # near-dup iff prefix edit distance <= this


@query(
    "dedup_edit_distance_verified",
    oracle=f"""
    -- Bucketed edit-distance near-dup: candidates share (lang, length
    -- bucket, first token) — a cheap inverted-index equi-join — then each
    -- candidate pair is verified with levenshtein on a bounded {EDIT_PFX}-char
    -- prefix. The O(len^2) DP never runs on the full cross product.
    WITH d AS (
      SELECT doc_id, lang,
             length(text) // 25 AS len_bucket,
             string_split(text, ' ')[1] AS w1,
             substr(text, 1, {EDIT_PFX}) AS pfx
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS prefix_edit_dist,
           levenshtein(a.pfx, b.pfx) <= {EDIT_NEAR} AS is_near
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.w1 = b.w1
     AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def dedup_edit_distance_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Candidate generation is a self equi-join on a composite blocking key
    # (one shuffle on (lang, len_bucket, w1), AQE handles hot buckets);
    # levenshtein runs JVM-side (built-in) only on pairs that share the
    # block — the classic blocking+verify shape that bounds cost by bucket
    # occupancy, not corpus size. Prefix bounding keeps the DP matrix
    # <= 80x80 regardless of document length.
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(F.length("text") / 25).alias("len_bucket"),
        F.split("text", " ").getItem(0).alias("w1"),
        F.substring("text", 1, EDIT_PFX).alias("pfx"),
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.pfx"), F.col("b.pfx"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.w1") == F.col("b.w1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang"),
            dist.cast("long").alias("prefix_edit_dist"),
            (dist <= EDIT_NEAR).alias("is_near"),
        )
        .orderBy("doc_a", "doc_b")
    )


PR_ITERS = 10
PR_DAMPING = 0.85


def pagerank_ranks(
    spark: SparkSession,
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    release_edges: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list (s, d) with no
    dangling nodes (every s has out-degree >= 1). Per pass ONE shuffle
    (contributions grouped by destination); contribution = rank/out_degree
    computed map-side; lineage truncated per pass with localCheckpoint
    (lazy until the final pass, so the whole fixed-K loop executes as one
    chained job — r13) so the plan stays constant-size across
    iterations. Returns (doc_id, rank), materialized.

    CALLER CONTRACT (r14, documenting the r13 optimization): every node
    must ALSO have in-degree >= 1 — i.e. the node set must equal the
    destination set, which a SYMMETRIZED edge list guarantees. r13
    removed the per-pass ``nodes LEFT JOIN contribs`` because on such
    graphs the contribution aggregate already emits exactly one row per
    node; on a general directed edge list a node with out-edges but no
    in-edges receives no contribution row and SILENTLY VANISHES from the
    output (and a sink-only destination appears), instead of surfacing
    with the base rank. The one production caller
    (dedup_pagerank_representatives) symmetrizes; a future caller with
    asymmetric edges must restore the left join against the node set or
    pre-symmetrize. Pinned by tests/test_pagerank.py's asymmetric-graph
    test.

    ``release_edges`` (r14): callers that still need the shared edge
    cache after this returns — dedup_pagerank_representatives runs the
    CC label loop CONCURRENTLY over the same persisted edges — pass
    False and unpersist it themselves; unpersisting here would drop the
    cached blocks out from under the sibling loop mid-pass and re-run
    the whole LSH lineage from parquet."""
    from pyspark import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = edges.select(F.col("s").alias("doc_id")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_nodes = nodes.count()  # scalar; bounded by graph size
    if n_nodes == 0:
        return spark.createDataFrame([], "doc_id long, rank double")
    # Decorate each edge with its source's out-degree ONCE, outside the
    # loop (r10 census): out_deg is static across iterations, but the old
    # loop re-joined it inside every pass — K redundant shuffles of the
    # same aggregate. The decorated edge list is what every pass re-scans;
    # contribution = rank/deg stays map-side exactly as before.
    edges_deg = (
        edges.join(edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg")), "s")
        .select("s", "d", "deg")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    ranks = nodes.select("doc_id", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    # r13 (optimization round): two per-pass changes, value-identical.
    # (1) The old per-pass `nodes LEFT JOIN contribs` + coalesce(in_sum, 0)
    #     is redundant on THIS graph: the edge list is symmetrized, so
    #     every node has in-degree >= 1 and the contribution aggregate
    #     already emits exactly one row per node — the left join never
    #     produced a null-padded row, it only added a join (an exchange
    #     of the node table) to every one of the K passes. Plan diff:
    #     3 -> 2 operators per pass, one fewer join input per pass.
    # (2) localCheckpoint is EAGER only on the final pass: the lazy
    #     intermediate checkpoints still truncate lineage once
    #     materialized (retry safety at scale is unchanged), but all K
    #     passes now execute as ONE chained job at the final eager
    #     materialization instead of K separate jobs — per-pass job
    #     launch + scheduling was the dominant wall cost of the loop at
    #     bench scale (the shuffles are tiny). The caches released below
    #     are only released AFTER that materialization, so no pass ever
    #     recomputes the LSH lineage.
    for it in range(iters):
        ranks = (
            edges_deg.join(ranks, edges_deg.s == ranks.doc_id)
            .select(F.col("d").alias("doc_id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("doc_id")
            .agg(F.sum("c").alias("in_sum"))
            .select(
                "doc_id",
                (F.lit(base) + F.lit(damping) * F.col("in_sum")).alias("rank"),
            )
            .localCheckpoint(eager=(it == iters - 1))
        )
    # the eager checkpoint above materialized the final ranks, so the
    # edge/node caches are dead weight — release them here instead of
    # pinning one pair per call until session end (r6 review; the CC
    # sibling already does this)
    if release_edges:
        edges.unpersist()
    edges_deg.unpersist()
    nodes.unpersist()
    return ranks


def _pagerank_duck(iters: int, damping: float) -> str:
    """Oracle for the fixed-K power iteration: the K update steps are
    UNROLLED as chained CTEs (pr0..pr{K}) — standard SQL forbids aggregates
    in a recursive term, and a fixed iteration count needs no recursion.
    Float literals go through CAST('<repr>' AS DOUBLE) so the oracle uses
    the exact same IEEE doubles as the Python driver constants (a bare
    decimal literal would round-trip through DuckDB DECIMAL and can be off
    by an ulp)."""
    base_lit = f"CAST('{(1.0 - damping)!r}' AS DOUBLE)"
    d_lit = f"CAST('{damping!r}' AS DOUBLE)"
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    pr{k} AS (
      SELECT n.node AS doc_id,
             ({base_lit} / nn.n) + {d_lit} * COALESCE(c.in_sum, CAST(0.0 AS DOUBLE))
               AS rank
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.d AS doc_id, sum(p.rank / o.deg) AS in_sum
        FROM edges e
        JOIN pr{k - 1} p ON p.doc_id = e.s
        JOIN outdeg o ON o.s = e.s
        GROUP BY e.d
      ) c ON c.doc_id = n.node
    )""")
    return ",".join(steps)


_PAGERANK_REPS_ORACLE = f"""
    -- PageRank canonical selection: {PR_ITERS} unrolled power-iteration
    -- steps over the symmetrized verified near-dup graph (no dangling
    -- nodes), then each connected component keeps its highest-rank member.
    WITH RECURSIVE {_VERIFIED_PAIRS_DUCK},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM vpairs
      UNION ALL
      SELECT doc_b, doc_a FROM vpairs
    ),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (SELECT s, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY s),
    pr0 AS (SELECT node AS doc_id, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn),
    {_pagerank_duck(PR_ITERS, PR_DAMPING)},
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lab) AS component_id FROM reach GROUP BY 1),
    ranked AS (
      SELECT c.component_id, c.doc_id, p.rank,
             row_number() OVER (PARTITION BY c.component_id
                                ORDER BY p.rank DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component_id) AS csize
      FROM comp c JOIN pr{PR_ITERS} p ON p.doc_id = c.doc_id
    )
    SELECT component_id, doc_id AS representative_id,
           round(rank, 9) AS pagerank,
           CAST(csize AS BIGINT) AS component_size
    FROM ranked WHERE rn = 1
    ORDER BY component_id
"""


@query("dedup_pagerank_representatives", oracle=_PAGERANK_REPS_ORACLE)
def dedup_pagerank_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality-based canonical selection (PageRank is iterative but
    fixed-K deterministic, so the oracle unrolls the K steps): PageRank
    over the verified near-dup graph, then each component keeps its
    highest-centrality member — the 'most linked-to duplicate is the
    canonical copy' policy, vs the quality policy of
    dedup_cluster_representatives.

    Power iteration, Spark-shaped like the CC loop above: per pass ONE
    shuffle (contributions grouped by destination), contribution =
    rank/out_degree computed map-side, lineage truncated per pass with
    localCheckpoint so the plan stays constant-size. Driver state: nothing —
    ranks live in the cluster; only convergence is fixed-K (deterministic
    across runs and partitionings since the merge is an exact sum of
    rationals rounded at emit).

    Both iterative algorithms (PageRank + CC labels) run over ONE
    persisted edge list (r10 census fix): the old form called
    dedup_connected_components() for labels, re-executing the whole
    LSH+verify pipeline a second time for the same edges PageRank already
    built — measured 11.8 s in the sf0.1 census, ~2x the sum of its
    parts. connected_component_labels_auto on the shared cache produces
    bit-identical labels (same function dedup_connected_components
    uses on the same symmetrized edges)."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    # r14: same release point as _cc_component_labels — labels and ranks
    # are both checkpoint-materialized below, so the LSH lineage's
    # persisted intermediates are dead weight after pagerank_ranks
    # returns (guide §5).
    caches: list[DataFrame] = []
    pairs = _verified_pairs_df(spark, sf_dir, caches=caches).select("doc_a", "doc_b")
    # symmetrized near-dup graph: no dangling nodes (every node has
    # out-degree >= 1), so PageRank mass is conserved without a dangling term
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")),
                    F.struct(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.d").alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # r14 session 2 (guide §2.6 "overlap independent jobs"): the CC label
    # loop and the PageRank power iteration are INDEPENDENT consumers of
    # the same persisted edge list, but the old code ran them serially —
    # the CC loop's blocking per-pass certificate collects left the
    # cluster idle between passes while PageRank's single chained job
    # waited its turn. Submitting them from two driver threads lets the
    # scheduler back-fill: PageRank's long chained job fills the gaps
    # between CC certificate passes. Safety: the first task to touch an
    # uncomputed cached edge partition computes it under the block lock
    # while the other job's task blocks and reads (no duplicated LSH
    # lineage); results are unchanged because both loops are
    # deterministic functions of the edge list and share no state beyond
    # the read-only cache. pagerank_ranks gets release_edges=False so it
    # cannot drop the shared cache while the CC loop is mid-pass; the
    # release happens here, after BOTH results are checkpoint-
    # materialized.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_labels = pool.submit(connected_component_labels_auto, edges)
        f_ranks = pool.submit(
            pagerank_ranks, spark, edges, PR_ITERS, PR_DAMPING, False
        )
        labels = f_labels.result()
        ranks = f_ranks.result()
    edges.unpersist()
    comp = labels.select(
        F.col("node").alias("doc_id"), F.col("lab").alias("component_id")
    )
    for c in caches:
        c.unpersist()
    if not ranks.head(1):
        return spark.createDataFrame(
            [], "component_id long, representative_id long, pagerank double, component_size long"
        )
    w = Window.partitionBy("component_id").orderBy(F.desc("rank"), F.asc("doc_id"))
    return (
        comp.join(ranks, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("component_size", F.count(F.lit(1)).over(Window.partitionBy("component_id")))
        .filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("representative_id"),
            F.round("rank", 9).alias("pagerank"),
            F.col("component_size").cast("long"),
        )
        .orderBy("component_id")
    )


# --- graph analytics on the near-dup graph ----------------------------------


@query(
    "dedup_triangle_count",
    oracle=f"""
    -- Triangle count over the verified near-dup graph (node-iterator
    -- form): triangles indicate clique-like dup clusters that pairwise
    -- keep-rules under-merge; their count is a standard graph-health
    -- metric for dedup quality audits.
    WITH {_VERIFIED_PAIRS_DUCK},
    e AS (SELECT doc_a AS u, doc_b AS v FROM vpairs),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT a AS doc_a, b AS doc_b, c AS doc_c
    FROM tri ORDER BY a, b, c
    """,
)
def dedup_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the near-dup graph, enumerated via the ordered
    two-path + closing-edge equi-join. Edges already satisfy u < v (the
    verified-pairs contract), so each triangle is produced exactly once as
    a < b < c — the degree-ordering trick that bounds the path fan-out by
    the forward-degree, not the total degree.

    Scale shape: two equi-joins on vertex ids over an edge list the LSH
    pipeline already bounded (never corpus^2); the classic MapReduce
    triangle enumeration. At skewed degrees, AQE skew-join splits the hot
    vertices; the edge list is persisted so the three join legs share one
    materialization."""
    from pyspark import StorageLevel

    e = (
        _verified_pairs_df(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    return (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(
            F.col("e1.u").alias("doc_a"),
            F.col("e1.v").alias("doc_b"),
            F.col("e2.v").alias("doc_c"),
        )
        .orderBy("doc_a", "doc_b", "doc_c")
    )


# --- URL canonicalization dedup ---------------------------------------------


@query(
    "dedup_url_canonical",
    oracle="""
    -- Web-corpus URL dedup: the same landing page arrives under many URL
    -- spellings (tracking params, fragments, default ports, trailing
    -- slashes, host case). Canonicalize, then group. URLs are synthesized
    -- deterministically from (source, doc_id) with doc_id%4 spelling
    -- variants so every engine sees the same corpus.
    WITH urls AS (
      SELECT doc_id, source,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'https://' || source || '.example.com/item/' || CAST(doc_id // 4 AS VARCHAR)
               WHEN 1 THEN 'https://' || upper(source) || '.Example.COM/item/' || CAST(doc_id // 4 AS VARCHAR) || '/'
               WHEN 2 THEN 'https://' || source || '.example.com:443/item/' || CAST(doc_id // 4 AS VARCHAR) || '?utm_source=feed&utm_campaign=x'
               ELSE 'https://' || source || '.example.com/item/' || CAST(doc_id // 4 AS VARCHAR) || '?ref=tw#frag'
             END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(url), '#.*$', ''),
                     '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
                   '[?&]$', ''),
                 ':443/', '/'),
               '/+$', '') AS curl
      FROM urls
    )
    SELECT curl AS canonical_url,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM canon
    GROUP BY curl
    ORDER BY curl
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup: lowercase, strip fragments, tracking
    params (utm_*/ref), default :443 port, and trailing slash, then group
    by the canonical form keeping the lowest doc_id.

    Scale shape: canonicalization is a pure per-row expression chain
    (whole-stage codegen, no UDF), so the only shuffle is the final
    groupBy(canonical_url) with map-side partial aggregation — the same
    plan at 100 TB, and the canonical column is what the corpus would be
    bucketed/sorted by at ingest so recrawls dedup shuffle-free."""
    d = table(spark, sf_dir, "documents")
    variant = (F.col("doc_id") % 4).cast("int")
    base_path = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/item/"),
        (F.col("doc_id") / 4).cast("long").cast("string"),
    )
    url = (
        F.when(variant == 0, base_path)
        .when(
            variant == 1,
            F.concat(
                F.lit("https://"), F.upper("source"), F.lit(".Example.COM/item/"),
                (F.col("doc_id") / 4).cast("long").cast("string"), F.lit("/"),
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com:443/item/"),
                (F.col("doc_id") / 4).cast("long").cast("string"),
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .otherwise(F.concat(base_path, F.lit("?ref=tw#frag")))
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lower(url), "#.*$", ""),
                    "(utm_[a-z]+|ref)=[^&]*&?", ""),
                "[?&]$", ""),
            ":443/", "/"),
        "/+$", "")
    return (
        d.select(curl.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
    -- ASYMMETRIC near-dup: containment(a in b) = |A n B| / |A| catches a
    -- short doc quoted inside a longer one — a case symmetric Jaccard
    -- misses (the union denominator dilutes it). Same DF-capped inverted
    -- index as dedup_jaccard_dfcap; both directions of every candidate
    -- pair are tested and the contained (smaller) side is reported.
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
    ),
    df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    rare AS (
      SELECT s.doc_id, s.shingle FROM sh s JOIN df ON s.shingle = df.shingle
      WHERE df.df <= {DF_CAP}
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM rare GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS common
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    directed AS (
      SELECT CASE WHEN sa.n_sh <= sb.n_sh THEN p.doc_a ELSE p.doc_b END AS contained_doc,
             CASE WHEN sa.n_sh <= sb.n_sh THEN p.doc_b ELSE p.doc_a END AS container_doc,
             round(p.common * 1.0 / least(sa.n_sh, sb.n_sh), 6) AS containment
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
    )
    SELECT contained_doc, container_doc, containment
    FROM directed WHERE containment >= 0.8
    ORDER BY contained_doc, container_doc
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-based doc-in-doc detection over the DF-capped inverted
    index: score = |A n B| / min(|A|, |B|) — the smaller document's
    coverage — reported as (contained, container) when >= 0.8.

    Scale shape identical to dedup_jaccard_dfcap (the hot-shingle cap
    bounds the self-join fan-out); the asymmetric denominator costs
    nothing extra — same pair aggregation, different final expression."""
    from pyspark import StorageLevel

    sh = _exploded_shingles(spark, sf_dir, cache=True)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("shingle")
    )
    rare = sh.join(hot, "shingle", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            F.when(F.col("sa.n_sh") <= F.col("sb.n_sh"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
            F.when(F.col("sa.n_sh") <= F.col("sb.n_sh"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("container_doc"),
            F.round(
                F.col("common") / F.least(F.col("sa.n_sh"), F.col("sb.n_sh")), 6
            ).alias("containment"),
        )
    )
    return (
        j.filter(F.col("containment") >= 0.8)
        .orderBy("contained_doc", "container_doc")
    )


@query(
    "dedup_lsh_quality_eval",
    oracle=f"""
    -- Measured quality of the production near-dup path: the LSH-verified
    -- pair set vs exhaustive exact-Jaccard ground truth at the same
    -- threshold. Verification makes precision 1.0 BY CONSTRUCTION (every
    -- candidate is exact-checked); recall is where banding loses pairs —
    -- this harness is how that loss is measured rather than assumed
    -- (the dedup twin of ann_recall_eval).
    WITH {_VERIFIED_PAIRS_DUCK},
    sh_all AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
    ),
    sizes_all AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh_all GROUP BY doc_id),
    truth AS (
      SELECT p.doc_a, p.doc_b
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS common
        FROM sh_all a JOIN sh_all b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) p
      JOIN sizes_all sa ON sa.doc_id = p.doc_a
      JOIN sizes_all sb ON sb.doc_id = p.doc_b
      WHERE p.common * 1.0 / (sa.n_sh + sb.n_sh - p.common) >= 0.5
    ),
    found AS (SELECT doc_a, doc_b FROM vpairs)
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
      (SELECT CAST(count(*) AS BIGINT) FROM found) AS n_found,
      (SELECT CAST(count(*) AS BIGINT) FROM found f
        WHERE EXISTS (SELECT 1 FROM truth t
                      WHERE t.doc_a = f.doc_a AND t.doc_b = f.doc_b)) AS n_correct,
      round((SELECT count(*) FROM found f
             WHERE EXISTS (SELECT 1 FROM truth t
                           WHERE t.doc_a = f.doc_a AND t.doc_b = f.doc_b)) * 1.0
            / greatest((SELECT count(*) FROM found), 1), 6) AS precision,
      round((SELECT count(*) FROM found f
             WHERE EXISTS (SELECT 1 FROM truth t
                           WHERE t.doc_a = f.doc_a AND t.doc_b = f.doc_b)) * 1.0
            / greatest((SELECT count(*) FROM truth), 1), 6) AS recall
    """,
)
def dedup_lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the LSH-verified near-dup pairs against the
    exhaustive exact-Jaccard truth at the same threshold.

    At 100 TB the truth side runs on a SAMPLE (it is the all-pairs
    diagnostic); the found side is the production path. Here both run on
    the full small-sf corpus so the numbers are exact. One plan, one
    action: the five scalars are single-row aggregates joined together,
    sharing the exploded-shingle cache underneath.

    r14: BOTH pair interiors are persisted — each is consumed twice (its
    own count aggregate + the semi-join), and the r14 before-plan showed
    the full truth and found pipelines duplicated (21 parquet scans, 45
    cache scans, zero ReusedExchange: exchange reuse does not collapse
    the pair joins), i.e. the all-pairs truth join and the LSH+verify
    pipeline each executed twice per invocation — measured 17.5 cpu-s,
    ~= 2 x (truth 4.3 + found 4.4). One materialization each now."""
    from pyspark import StorageLevel

    truth = (
        _ngram_jaccard_pairs_df(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    found = (
        _verified_pairs_df(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    correct = found.join(truth, ["doc_a", "doc_b"], "left_semi")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    n_correct = correct.agg(F.count(F.lit(1)).alias("n_correct"))
    return (
        n_truth.crossJoin(n_found)
        .crossJoin(n_correct)
        .select(
            "n_truth",
            "n_found",
            "n_correct",
            F.round(F.col("n_correct") / F.greatest(F.col("n_found"), F.lit(1)), 6).alias(
                "precision"
            ),
            F.round(F.col("n_correct") / F.greatest(F.col("n_truth"), F.lit(1)), 6).alias(
                "recall"
            ),
        )
    )


@query(
    "dedup_keep_best_quality",
    oracle=f"""
    -- Canonical selection POLICY on near-dup clusters: instead of
    -- keep-lowest-id (dedup_keep_canonical / cluster_representatives),
    -- keep the highest-QUALITY member of each connected component —
    -- the policy production corpora actually want (drop the mirrored
    -- boilerplate copy, keep the clean original). Quality = lexical
    -- diversity, rounded to 6dp so the ranking is engine-stable.
    WITH RECURSIVE {_VERIFIED_PAIRS_DUCK},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM vpairs
      UNION ALL
      SELECT doc_b, doc_a FROM vpairs
    ),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node AS doc_id, min(lab) AS component_id FROM reach GROUP BY 1),
    q AS (
      SELECT doc_id,
             round(len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')), 6) AS quality
      FROM documents
    ),
    ranked AS (
      SELECT c.doc_id, c.component_id, q.quality,
             row_number() OVER (PARTITION BY c.component_id
                                ORDER BY q.quality DESC, c.doc_id) AS rn
      FROM comp c JOIN q USING (doc_id)
    )
    SELECT doc_id, component_id, quality, rn = 1 AS kept
    FROM ranked ORDER BY doc_id
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked canonical selection per near-dup cluster: the
    component labels come from the SAME iterative min-label propagation as
    dedup_connected_components (one extra broadcast join + per-component
    window on cluster-sized groups — clusters are small by construction,
    so the window never sees a skewed partition). Swapping the keep
    policy is a one-line ORDER BY change; the expensive parts (LSH,
    verification, clustering) are untouched."""
    # r13: shared label helper, not the registered CC query — the size
    # join + global sort it appends were discarded here (see
    # _cc_component_labels); output rows are unchanged.
    labels = _cc_component_labels(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    # r14 (guide §2.3): quality is projected AFTER the membership join,
    # not before — the r14 before-plan computed the double-split
    # array_distinct quality expression for EVERY corpus row and then
    # broadcast the decorated corpus as the join's build side; at 100 TB
    # that is a full-corpus pass feeding an illegal broadcast. Joining
    # first restricts the expression to cluster members, and the join +
    # projection share one codegen stage, so the text column never
    # crosses an exchange either way. Same expression per surviving row,
    # so values are unchanged.
    member = d.select("doc_id", "text").join(labels, "doc_id")
    ranked = member.select(
        "doc_id",
        "component_id",
        F.round(
            F.size(F.array_distinct(F.split("text", " ")))
            / F.size(F.split("text", " ")),
            6,
        ).alias("quality"),
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("component_id").orderBy(F.desc("quality"), F.asc("doc_id"))
        ),
    )
    return (
        ranked.select("doc_id", "component_id", "quality", (F.col("rn") == 1).alias("kept"))
        .orderBy("doc_id")
    )


@query(
    "dedup_split_leakage_matrix",
    oracle=f"""
    -- Train/test contamination audit: near-duplicate pairs whose members
    -- land in DIFFERENT training splits leak eval signal. The matrix
    -- counts verified near-dup pairs per (split, split) cell —
    -- canonicalized so (train,val) == (val,train) — with the leak flag
    -- on off-diagonal cells. Split = the stateless md5-bucket rule
    -- (group-consistent by doc), so the audit is a pure function of the
    -- corpus, reproducible on any engine.
    WITH {{vpairs}},
    split_of AS (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    tagged AS (
      SELECT least(sa.split, sb.split) AS split_a,
             greatest(sa.split, sb.split) AS split_b
      FROM vpairs v
      JOIN split_of sa ON sa.doc_id = v.doc_a
      JOIN split_of sb ON sb.doc_id = v.doc_b
    )
    SELECT split_a, split_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           split_a <> split_b AS leaking
    FROM tagged
    GROUP BY 1, 2
    ORDER BY split_a, split_b
    """.replace("{vpairs}", _VERIFIED_PAIRS_DUCK),
)
def dedup_split_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup leakage across training splits — the audit run BEFORE
    shipping a split: any verified near-dup pair with one member in train
    and the other in val/test leaks evaluation signal.

    Scale shape: the pair relation is the already-bounded LSH+verify
    output (never all-pairs); the split is the stateless md5-bucket rule
    (a projection — no split table to join, the same expression both
    engines compute), so the audit costs two broadcast-free equi-joins
    of the pair list against a (doc_id, split) projection plus a 6-cell
    aggregate. Cells are canonicalized unordered, so 'train|val' counts
    one way."""
    pairs = _verified_pairs_df(spark, sf_dir).select("doc_a", "doc_b")
    d = table(spark, sf_dir, "documents").select("doc_id")
    hx = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4)
    split_of = d.select(
        "doc_id",
        F.when(hx < "cccc", "train").when(hx < "e666", "val").otherwise("test").alias(
            "split"
        ),
    )
    sa = split_of.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = split_of.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaking", F.col("split_a") != F.col("split_b"))
        .orderBy("split_a", "split_b")
    )


@query(
    "dedup_rate_by_source",
    oracle=f"""
    -- Per-source dedup-rate report: the corpus-health rollup a crawl
    -- pipeline publishes per ingest — how much of each source is exact
    -- duplicate (non-canonical member of an identical-text group) or
    -- near-duplicate (verified LSH pair with a smaller-id partner).
    WITH {{vpairs}},
    canon AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ),
    near AS (SELECT DISTINCT doc_b AS doc_id FROM vpairs)
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN c.rn > 1 THEN 1 END) AS BIGINT) AS n_exact_dup,
           CAST(count(n.doc_id) AS BIGINT) AS n_near_dup,
           round(count(CASE WHEN c.rn > 1 THEN 1 END) * 1.0 / count(*), 6)
               AS exact_dup_rate,
           round(count(n.doc_id) * 1.0 / count(*), 6) AS near_dup_rate
    FROM canon c LEFT JOIN near n ON n.doc_id = c.doc_id
    GROUP BY 1 ORDER BY 1
    """.replace("{vpairs}", _VERIFIED_PAIRS_DUCK),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup health per source: exact-dup members (identical-text groups,
    canonical = lowest doc_id) and near-dup members (verified pair with a
    smaller partner), as counts and rates.

    Scale shape: the exact-dup rank partitions on the text DIGEST —
    groups are identical-copy sets (bounded fan-in), never
    data-volume-sized, so the window is safe; the near-dup side is the
    bounded LSH+verify pair list reduced to a distinct id set; the final
    rollup is one map-side-combined groupBy(source)."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    canon = d.select(
        "doc_id", "source", F.row_number().over(w).alias("rn")
    )
    near = (
        _verified_pairs_df(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    return (
        canon.join(near, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("rn") > 1, 1)).alias("n_exact_dup"),
            F.count("is_near").alias("n_near_dup"),
            F.round(
                F.count(F.when(F.col("rn") > 1, 1)) * 1.0 / F.count(F.lit(1)), 6
            ).alias("exact_dup_rate"),
            F.round(F.count("is_near") * 1.0 / F.count(F.lit(1)), 6).alias(
                "near_dup_rate"
            ),
        )
        .orderBy("source")
    )
