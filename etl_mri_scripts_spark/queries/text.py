"""Text analysis for training-data pipelines (BASELINE.json north star):
language-ID, quality scoring, token counting, fingerprinting — all as pure
Catalyst expressions (no Python UDFs) so they run JVM-side inside
whole-stage codegen and scale linearly with no shuffle at all (per-row maps;
the only shuffles are the final reporting groupBys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .registry import query

# Per-language stopword marker sets for the n-gram-free heuristic language
# ID. Tiny on purpose: the point is the *pattern* (vectorized membership
# scoring + deterministic argmax), swappable for real profiles.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "value"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "una", "por", "con"),
}

STOPWORDS = ("the", "a", "of", "and", "or", "to", "in")


def _words(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _marker_hits(markers: tuple[str, ...], over: str = "split(text, ' ')") -> Column:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return F.size(F.expr(f"filter({over}, w -> w IN ({in_list}))"))


def _marker_hits_sql(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({in_list})))"


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           round(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS avg_word_len,
           round({_marker_hits_sql(STOPWORDS)} * 1.0 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_words,
           round(len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')), 6) AS lexical_diversity
    FROM documents ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality features (length / stopword ratio / lexical diversity) used to
    # filter web-scale corpora; all narrow per-row expressions, no shuffle.
    # Staged projections: the words array (and each count over it) is
    # computed once per row — multi-referenced non-cheap expressions keep
    # CollapseProject from re-inlining split() per feature.
    d = table(spark, sf_dir, "documents")
    staged = d.select("doc_id", F.length("text").alias("n_chars"), _words().alias("ws"))
    feats = staged.select(
        "doc_id",
        "n_chars",
        F.size("ws").alias("nw"),
        F.size(F.array_distinct("ws")).alias("nu"),
        _marker_hits(STOPWORDS, over="ws").alias("sw"),
    )
    return feats.select(
        "doc_id",
        F.col("n_chars").alias("n_chars_measured"),
        F.col("nw").cast("long").alias("n_words"),
        F.round(F.col("n_chars") * 1.0 / F.col("nw"), 6).alias("avg_word_len"),
        F.round(F.col("sw") * 1.0 / F.col("nw"), 6).alias("stopword_ratio"),
        F.col("nu").cast("long").alias("n_unique_words"),
        F.round(F.col("nu") * 1.0 / F.col("nw"), 6).alias("lexical_diversity"),
    ).orderBy("doc_id")


@query(
    "text_quality_filter",
    oracle=f"""
    -- the materializing corpus-clean op: keep docs passing all quality
    -- gates; emit the failure reason for dropped docs (audit trail)
    WITH f AS (
      SELECT doc_id, lang,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_words,
             {_marker_hits_sql(STOPWORDS)} * 1.0 / len(string_split(text, ' ')) AS stop_r,
             len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')) AS lex_d
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN n_chars < 80 THEN 'too_short'
                WHEN n_words < 12 THEN 'too_few_words'
                WHEN lex_d < 0.3 THEN 'repetitive'
                ELSE 'keep' END AS verdict
    FROM f ORDER BY doc_id
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The corpus-clean gate built on the staged features: one narrow pass,
    # verdict as a column so the drop reasons are auditable (and the kept
    # set is a pushdown-friendly filter on this same expression).
    d = table(spark, sf_dir, "documents")
    staged = d.select("doc_id", "lang", F.length("text").alias("n_chars"), _words().alias("ws"))
    feats = staged.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size("ws").alias("nw"),
        F.size(F.array_distinct("ws")).alias("nu"),
    )
    verdict = (
        F.when(F.col("n_chars") < 80, "too_short")
        .when(F.col("nw") < 12, "too_few_words")
        .when(F.col("nu") * 1.0 / F.col("nw") < 0.3, "repetitive")
        .otherwise("keep")
    )
    return feats.select("doc_id", "lang", verdict.alias("verdict")).orderBy("doc_id")


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
             {_marker_hits_sql(LANG_MARKERS['en'])} AS s_en,
             {_marker_hits_sql(LANG_MARKERS['de'])} AS s_de,
             {_marker_hits_sql(LANG_MARKERS['fr'])} AS s_fr,
             {_marker_hits_sql(LANG_MARKERS['es'])} AS s_es
      FROM documents
    )
    SELECT doc_id, actual_lang,
           CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
                WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                WHEN s_es > 0 THEN 'es'
                ELSE 'und' END AS predicted_lang
    FROM scored ORDER BY doc_id
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Heuristic language ID: vectorized marker-set scoring with a
    # deterministic priority argmax (en > de > fr > es on ties).
    # The words array and the four marker scores are staged so split() runs
    # once per row and each score once (not per CASE-branch reference).
    d0 = table(spark, sf_dir, "documents")
    staged = d0.select("doc_id", "lang", _words().alias("ws"))
    d = staged.select(
        "doc_id",
        "lang",
        *[_marker_hits(v, over="ws").alias(f"s_{k}") for k, v in LANG_MARKERS.items()],
    )
    s = {k: F.col(f"s_{k}") for k in LANG_MARKERS}
    predicted = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] > 0), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), "fr")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )
    return d.select(
        "doc_id", F.col("lang").alias("actual_lang"), predicted.alias("predicted_lang")
    ).orderBy("doc_id")


@query(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(list_filter(string_split_regex(text, '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS re_tokens,
           CAST(CAST(ceil(length(text) / 4.0) AS BIGINT) AS BIGINT) AS approx_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token counting three ways: whitespace, regex word-split, and the
    # chars/4 BPE approximation used for corpus budgeting.
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).cast("long").alias("ws_tokens"),
        F.size(F.expr("filter(split(text, '[^a-z0-9]+'), t -> t <> '')")).cast("long").alias("re_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("approx_bpe_tokens"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint_minshingle",
    oracle="""
    -- Winnowing-style document fingerprint: minimum md5 over 3-word
    -- shingles (the 1-hash special case of minhash).
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           CASE WHEN len(words) >= 3 THEN
             list_min(list_transform(range(1, len(words) - 1),
                      i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2])))
           ELSE md5(array_to_string(words, ' ')) END AS fingerprint
    FROM w ORDER BY doc_id
    """,
)
def text_fingerprint_minshingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Staged words array: split(text) runs once per row, not once per
    # lambda reference inside the shingle transform.
    d = table(spark, sf_dir, "documents")
    staged = d.select("doc_id", "text", _words().alias("ws"))
    fp = F.expr(
        """
        CASE WHEN size(ws) >= 3 THEN
          array_min(transform(sequence(1, size(ws) - 2),
            i -> md5(cast(concat_ws(' ', element_at(ws, i),
                                    element_at(ws, i + 1),
                                    element_at(ws, i + 2)) as binary))))
        ELSE md5(cast(text as binary)) END
        """
    )
    return staged.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


@query(
    "text_corpus_stats_by_lang",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
           round(avg(length(text)), 6) AS avg_doc_len
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def text_corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.size(_words()).cast("long")).alias("total_words"),
            F.round(F.avg(F.length("text")), 6).alias("avg_doc_len"),
        )
        .orderBy("lang")
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    -- Top-3 TF-IDF terms per language: tf = occurrences within the
    -- language, idf = ln((N_docs+1)/(df+1)) over the whole corpus.
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    tf AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2),
    scored AS (
      SELECT tf.lang, tf.w AS term, tf.tf,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf,
             row_number() OVER (
               PARTITION BY tf.lang
               ORDER BY tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) DESC, tf.w
             ) AS rk
      FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
    )
    SELECT lang, term, tf, tfidf, rk FROM scored WHERE rk <= 3
    ORDER BY lang, rk
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus-scale shape: ONE explode of the corpus feeds both the df agg
    # (distinct docs per word) and the per-language tf agg — the exploded
    # words table is persisted so the two different shuffle keys don't
    # re-split the corpus. idf joins back on the word (the df table is
    # orders of magnitude smaller than the corpus; AQE broadcasts it), the
    # doc count is a 1-row broadcast, and top-3 is a window over lang.
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    df_tab = words.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    # corpus size as a broadcast 1-row aggregate (same pattern as
    # curation.corpus_mix_plan) — keeps query construction lazy instead of
    # running an eager count() job per invocation.
    n_tab = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs")))
    tf = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("tf"))
    score = F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    w_rank = Window.partitionBy("lang").orderBy(F.desc_nulls_last("score"), F.asc("w"))
    return (
        tf.join(df_tab, "w")
        .crossJoin(n_tab)
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= 3)
        .select(
            "lang",
            F.col("w").alias("term"),
            "tf",
            F.round("score", 6).alias("tfidf"),
            "rk",
        )
        .orderBy("lang", "rk")
    )


@query(
    "text_vocabulary_ranked",
    oracle="""
    -- Vocabulary construction: token table ranked by frequency (the BPE /
    -- tokenizer-training primitive). token_id is dense, most-frequent
    -- first, lexicographic tiebreak so ids are reproducible.
    WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    counts AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY 1)
    SELECT word, n,
           CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS token_id
    FROM counts WHERE n >= 2 ORDER BY token_id
    """,
)
def text_vocabulary_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus-scale shape: the heavy part (explode + count) is a map-side
    # combined groupBy on the word; min-count pruning happens before
    # ranking. Web-scale vocabularies (typos, URLs, code tokens) grow
    # with the corpus, so the dense token_id comes from the two-phase
    # offset rank (operators/rank.py) — a range-partitioned parallel
    # sort, not a single-partition row_number window.
    from ..operators.rank import global_row_number

    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    ranked, _n = global_row_number(
        counts, [F.desc("n"), F.asc("word")], rank_col="token_id"
    )
    return ranked.select("word", "n", "token_id").orderBy("token_id")


BIGRAM_MIN_COUNT = 3


@query(
    "text_bigram_pmi",
    oracle=f"""
    -- Co-occurrence statistics: adjacent-bigram PMI over the corpus.
    -- pmi = ln( p(w1 w2) / (p(w1) p(w2)) ), probabilities over bigram and
    -- unigram totals respectively; low-count bigrams pruned.
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    uni AS (SELECT unnest(ws) AS word FROM w),
    ucnt AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
    nw AS (SELECT count(*) AS n FROM uni),
    big AS (
      SELECT unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bg
      FROM w
    ),
    bcnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM big GROUP BY 1),
    nb AS (SELECT count(*) AS n FROM big)
    SELECT string_split(bg, ' ')[1] AS w1,
           string_split(bg, ' ')[2] AS w2,
           cb AS n_bigram,
           round(ln((cb * 1.0 / nb.n) / ((u1.c * 1.0 / nw.n) * (u2.c * 1.0 / nw.n))), 6) AS pmi
    FROM bcnt CROSS JOIN nb CROSS JOIN nw
    JOIN ucnt u1 ON u1.word = string_split(bg, ' ')[1]
    JOIN ucnt u2 ON u2.word = string_split(bg, ' ')[2]
    WHERE cb >= {BIGRAM_MIN_COUNT}
    ORDER BY w1, w2
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One split per document feeds BOTH the unigram and the bigram counts
    # (persisted — two different shuffle keys, exchange reuse won't merge
    # them). The two totals are scalars; the unigram join sides are
    # post-aggregation vocab-sized tables, broadcast under AQE. The pruned
    # bigram table (cb >= {N}) is what ships to the join — pruning before
    # the join, not after.
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    wsdf = d.select(F.split("text", " ").alias("ws")).persist(StorageLevel.MEMORY_AND_DISK)
    uni = wsdf.select(F.explode("ws").alias("word"))
    ucnt = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    # Scalar totals ride as broadcast 1-row aggregates (same convention as
    # text_tfidf_top_terms's n_docs): an eager .count() here would run two
    # full explode-and-count jobs on every invocation, including plan-only
    # uses, before a lazy frame is even returned.
    nw = F.broadcast(uni.agg(F.count(F.lit(1)).alias("_nw")))
    big = wsdf.filter(F.size("ws") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(element_at(ws, i) as w1, element_at(ws, i + 1) as w2))"
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bcnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_bigram")).filter(
        F.col("n_bigram") >= BIGRAM_MIN_COUNT
    )
    nb = F.broadcast(big.agg(F.count(F.lit(1)).alias("_nb")))
    u1 = ucnt.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("n_bigram") / F.col("_nb").cast("double"))
        / (
            (F.col("c1") / F.col("_nw").cast("double"))
            * (F.col("c2") / F.col("_nw").cast("double"))
        )
    )
    return (
        bcnt.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(nw)
        .crossJoin(nb)
        .select("w1", "w2", "n_bigram", F.round(pmi, 6).alias("pmi"))
        .orderBy("w1", "w2")
    )


@query(
    "text_repetition_signals",
    oracle="""
    -- Gopher/RefinedWeb-style repetition filter signals: per document, the
    -- duplicated-word fraction and the coverage of the single most frequent
    -- adjacent bigram, plus the combined repetitive flag. The flag uses
    -- exact integer cross-multiplication (no float thresholds), so both
    -- engines decide identically.
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    s AS (
      SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_unique,
             unnest(list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w WHERE len(ws) >= 2
    ),
    bc AS (
      SELECT doc_id, n_words, n_unique, bigram, count(*) AS c
      FROM s GROUP BY 1, 2, 3, 4
    ),
    top AS (
      SELECT doc_id, n_words, n_unique,
             max(c) AS top_bigram_count, CAST(sum(c) AS BIGINT) AS n_bigrams
      FROM bc GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(1.0 - n_unique * 1.0 / n_words, 6) AS dup_word_frac,
           CAST(top_bigram_count AS BIGINT) AS top_bigram_count,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(top_bigram_count * 1.0 / n_bigrams, 6) AS top_bigram_frac,
           (top_bigram_count * 8 > n_bigrams)
             OR ((n_words - n_unique) * 5 > n_words * 3) AS is_repetitive
    FROM top ORDER BY doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split(text) runs EXACTLY once per row (posexplode of words); bigrams
    # come from lead(word) over the per-doc position window instead of
    # array slicing, because an array-expression formulation re-evaluates
    # the split in every referencing operator (Filter, Project, Generate) —
    # measured 2.1x slower at sf0.1. Word stats and bigram counts both
    # consume the same window-shuffled frame (one exchange on doc_id,
    # reused), and the bigram agg gets map-side combine. The repetitive
    # flag compares integers cross-multiplied (c*8 > n, dup*5 > 3*n) —
    # exact in both engines.
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    wx = d.filter(F.col("text").contains(" ")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bx = wx.select("doc_id", "word", F.lead("word").over(w).alias("nxt"))
    stats = bx.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.count_distinct("word").alias("n_unique"),
    )
    bc = (
        bx.filter(F.col("nxt").isNotNull())
        .groupBy("doc_id", "word", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = bc.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams")
    )
    return (
        stats.join(top, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.round(1.0 - F.col("n_unique") / F.col("n_words"), 6).alias(
                "dup_word_frac"
            ),
            "top_bigram_count",
            "n_bigrams",
            F.round(F.col("top_bigram_count") / F.col("n_bigrams"), 6).alias(
                "top_bigram_frac"
            ),
            (
                (F.col("top_bigram_count") * 8 > F.col("n_bigrams"))
                | ((F.col("n_words") - F.col("n_unique")) * 5 > F.col("n_words") * 3)
            ).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_perplexity_proxy",
    oracle="""
    -- CCNet-style LM quality filter, self-trained: score each doc by the
    -- average bigram log-probability under the corpus's own bigram LM
    -- (ln c(w1,w2) / c(w1,*)), and the implied perplexity. Low-probability
    -- docs are the weird ones — the relational skeleton of "perplexity
    -- filtering" with the n-gram LM standing in for the neural scorer.
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    bgd AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bg
      FROM w
    ),
    cb AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgd GROUP BY 1),
    cu AS (
      SELECT string_split(bg, ' ')[1] AS w1, CAST(sum(c2) AS BIGINT) AS c1
      FROM cb GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(cb.c2 * 1.0 / cu.c1)), 6) AS avg_logprob,
           round(exp(-avg(ln(cb.c2 * 1.0 / cu.c1))), 6) AS ppl
    FROM bgd d
    JOIN cb ON d.bg = cb.bg
    JOIN cu ON string_split(d.bg, ' ')[1] = cu.w1
    GROUP BY d.doc_id ORDER BY d.doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The doc-level bigram table is built once and persisted (three
    # consumers: LM numerator, LM denominator, the scoring join — three
    # different shuffle keys, exchange reuse won't merge them). Both LM
    # tables are post-aggregation vocab-sized — broadcast under AQE — so
    # scoring is a map-side decoration of the bigram stream followed by
    # one doc_id aggregation. Self-training on the corpus costs one extra
    # pass, never a model server.
    #
    # Bigrams come straight from the split array (adjacent-element structs
    # exploded in one Generate), NOT from lead() over a per-doc position
    # window: the window form shuffles + sorts the whole exploded word
    # stream on doc_id before a single LM count runs. The usual objection
    # to array-expression bigrams — split re-inlined at every referencing
    # operator (the measured 2.1x in text_repetition_signals) — doesn't
    # apply here because the bigram table is persisted: split runs once
    # per row into the cache and every consumer reads materialized rows.
    # size(ws) < 2 docs are filtered BEFORE the sequence (sequence(1, 0)
    # would generate the DESCENDING [1, 0], not an empty array).
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> struct(element_at(ws, i) AS word, element_at(ws, i + 1) AS nxt))"
    )
    bgd = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.word").alias("word"), F.col("bg.nxt").alias("nxt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cb = bgd.groupBy("word", "nxt").agg(F.count(F.lit(1)).alias("c2"))
    cu = cb.groupBy("word").agg(F.sum("c2").alias("c1"))
    logp = F.log(F.col("c2") / F.col("c1"))
    return (
        bgd.join(cb, ["word", "nxt"])
        .join(cu, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
            F.round(F.exp(-F.avg(logp)), 6).alias("ppl"),
        )
        .orderBy("doc_id")
    )


ZIPF_TOP = 100


@query(
    "vocab_zipf_slope",
    oracle=f"""
    -- Corpus health diagnostic: the Zipf slope — OLS fit of ln(freq) vs
    -- ln(rank) over the top-{ZIPF_TOP} vocabulary (natural corpora sit
    -- near -1; synthetic/templated text flattens). Built-in regression
    -- aggregates over the tiny ranked frame.
    WITH u AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    c AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM u GROUP BY 1),
    r AS (SELECT w, f, row_number() OVER (ORDER BY f DESC, w) AS rnk FROM c)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(f), ln(rnk)), 6) AS zipf_slope,
           round(regr_r2(ln(f), ln(rnk)), 6) AS r2
    FROM r WHERE rnk <= {ZIPF_TOP}
    """,
)
def vocab_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One corpus-scale shuffle (the word count, map-side combined); the
    # ranked top-{N} frame and the regression aggregates are driver-trivial.
    # regr_slope/regr_r2 are built-in JVM aggregates in both engines —
    # the "fit a line in SQL" pattern that replaces a collect()+numpy hop.
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    u = d.select(F.explode(F.split("text", " ")).alias("w"))
    c = u.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    r = c.select(
        "f", F.row_number().over(Window.orderBy(F.desc("f"), "w")).alias("rnk")
    ).filter(F.col("rnk") <= ZIPF_TOP)
    return r.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.expr("regr_slope(ln(f), ln(rnk))"), 6).alias("zipf_slope"),
        F.round(F.expr("regr_r2(ln(f), ln(rnk))"), 6).alias("r2"),
    )


CHUNK_LEN = 120  # characters per chunk
CHUNK_STRIDE = 90  # 25% overlap — the RAG-standard sliding window


@query(
    "text_chunk_overlapping",
    oracle=f"""
    -- Overlapping chunk extraction: the text analog of the reference's
    -- sliding-window patch grid (P8, v2/patch_utils.py:36-46), including
    -- its trailing-edge rule — if the last regular window leaves a
    -- remainder, emit one extra chunk flush against the end (thresh 0).
    -- Chunk identity is the start offset, so keys need no ordinality.
    WITH g AS (
      SELECT doc_id, text, length(text) AS n,
             CASE WHEN length(text) > {CHUNK_LEN}
                   AND (length(text) - {CHUNK_LEN}) % {CHUNK_STRIDE} > 0
               THEN list_append(
                 generate_series(1, greatest(1, length(text) - {CHUNK_LEN} + 1), {CHUNK_STRIDE}),
                 length(text) - {CHUNK_LEN} + 1)
               ELSE generate_series(1, greatest(1, length(text) - {CHUNK_LEN} + 1), {CHUNK_STRIDE})
             END AS starts
      FROM documents
    ),
    c AS (SELECT doc_id, n, unnest(starts) AS chunk_start, text FROM g)
    SELECT doc_id, chunk_start,
           printf('%d__c%06d', doc_id, chunk_start) AS chunk_key,
           CAST(length(substr(text, chunk_start, {CHUNK_LEN})) AS BIGINT) AS chunk_len,
           md5(substr(text, chunk_start, {CHUNK_LEN})) AS chunk_md5
    FROM c ORDER BY doc_id, chunk_start
    """,
)
def text_chunk_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The patch-grid pattern (SURVEY §2.3 P8) applied to text: the start
    # grid is GENERATED as an array column (sequence + conditional
    # trailing element) and posexploded — fan-out is metadata-predictable
    # (~n/stride per doc), no UDF, no shuffle at all until the final
    # orderBy; at 100 TB this is a pure map stage that chains into
    # whatever consumes the chunks. Emitting md5(chunk) instead of the
    # chunk body keeps the verified output narrow.
    d = table(spark, sf_dir, "documents")
    n = F.length("text")
    base = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - CHUNK_LEN + 1), F.lit(CHUNK_STRIDE)
    )
    trailing = (n > CHUNK_LEN) & (((n - CHUNK_LEN) % CHUNK_STRIDE) > 0)
    starts = F.when(
        trailing, F.concat(base, F.array(n - CHUNK_LEN + 1))
    ).otherwise(base)
    c = d.select(
        "doc_id", "text", F.explode(starts).alias("chunk_start")
    )
    chunk = F.substring(F.col("text"), F.col("chunk_start"), F.lit(CHUNK_LEN))
    return c.select(
        "doc_id",
        "chunk_start",
        F.format_string("%d__c%06d", "doc_id", "chunk_start").alias("chunk_key"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_start")


# One pattern string each, valid in BOTH regex engines (Java on the Spark
# side, RE2 in DuckDB): no backrefs, no lookaround, ASCII word boundaries.
_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@query(
    "text_pii_scrub",
    oracle=f"""
    -- PII scrubbing (emails / phone numbers / IPv4) — the synthetic corpus
    -- carries no PII, so both engines inject identical deterministic PII
    -- per doc, then scrub; matching counts AND scrubbed-text md5 proves the
    -- replacement semantics, not just the tallies.
    WITH injected AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
             '-4567 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                 '{_IP_RE}', '[IP]', 'g'),
               '{_PHONE_RE}', '[PHONE]', 'g') AS clean
      FROM injected
    )
    SELECT doc_id, n_emails, n_phones,
           CAST(length(clean) AS BIGINT) AS clean_len,
           md5(clean) AS clean_md5
    FROM scrubbed
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scrub order matters: emails first (their local part can contain
    # digit runs), then IPv4 (dotted quads), then phones — each pass is a
    # JVM-side regexp_replace, so the whole scrub is one codegen'd
    # projection over the corpus: zero shuffles, zero Python.
    d = table(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-4567 from 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".1"),
        ).alias("t"),
    )
    email, phone, ip = _EMAIL_RE, _PHONE_RE, _IP_RE
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), email, "[EMAIL]"), ip, "[IP]"
        ),
        phone,
        "[PHONE]",
    )
    return injected.select(
        "doc_id",
        F.regexp_count("t", F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count("t", F.lit(phone)).cast("long").alias("n_phones"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    ).orderBy("doc_id")


@query(
    "text_adaptive_quality_threshold",
    oracle="""
    -- Per-language ADAPTIVE quality cutoffs (the FineWeb-style move):
    -- a global threshold over-prunes low-resource languages, so the
    -- cutoff is the per-language quantile of the quality signal — here
    -- lexical diversity at the 25th percentile, exact for parity — and
    -- the report shows each language's cutoff and keep rate.
    WITH f AS (
      SELECT doc_id, lang,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS ld
      FROM documents
    ),
    cuts AS (
      SELECT lang, quantile_cont(ld, 0.25) AS cutoff FROM f GROUP BY lang
    )
    SELECT f.lang,
           round(any_value(c.cutoff), 6) AS cutoff,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN f.ld >= c.cutoff THEN 1 END) AS BIGINT) AS n_kept,
           round(count(CASE WHEN f.ld >= c.cutoff THEN 1 END) * 1.0 / count(*), 6) AS keep_rate
    FROM f JOIN cuts c ON c.lang = f.lang
    GROUP BY f.lang
    ORDER BY f.lang
    """,
)
def text_adaptive_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality cutoffs at a fixed quantile, plus keep rates.

    Scale shape: the per-lang exact quantile is a groupBy over (lang,
    score) — one shuffle keyed by lang; the cutoff table (|langs| rows)
    broadcasts back onto the doc stream, so the gating pass is map-side
    only. At 100 TB swap percentile for percentile_approx (same plan,
    partial-aggregable) — exact is kept here for oracle parity."""
    d = table(spark, sf_dir, "documents")
    f = d.select(
        "doc_id",
        "lang",
        (F.size(F.array_distinct(F.split("text", " ")))
         / F.size(F.split("text", " "))).alias("ld"),
    )
    cuts = f.groupBy("lang").agg(F.percentile("ld", F.lit(0.25)).alias("cutoff"))
    return (
        f.join(F.broadcast(cuts), "lang")
        .groupBy("lang")
        .agg(
            F.round(F.any_value("cutoff"), 6).alias("cutoff"),
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("ld") >= F.col("cutoff"), 1)).alias("n_kept"),
            F.round(
                F.count(F.when(F.col("ld") >= F.col("cutoff"), 1)) / F.count(F.lit(1)), 6
            ).alias("keep_rate"),
        )
        .orderBy("lang")
    )


@query(
    "text_langid_confusion",
    oracle=f"""
    -- Classifier eval as a query: confusion matrix of the heuristic
    -- language-ID against the corpus labels, with per-cell share of the
    -- actual class (the recall decomposition). The matrix is the audit
    -- artifact a labeling pipeline gates on before trusting predicted
    -- lang for downstream routing (adaptive thresholds, per-lang caps).
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
             {_marker_hits_sql(LANG_MARKERS['en'])} AS s_en,
             {_marker_hits_sql(LANG_MARKERS['de'])} AS s_de,
             {_marker_hits_sql(LANG_MARKERS['fr'])} AS s_fr,
             {_marker_hits_sql(LANG_MARKERS['es'])} AS s_es
      FROM documents
    ),
    pred AS (
      SELECT actual_lang,
             CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
                  WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
                  WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                  WHEN s_es > 0 THEN 'es'
                  ELSE 'und' END AS predicted_lang
      FROM scored
    ),
    cells AS (
      SELECT actual_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY 1, 2
    ),
    tot AS (
      SELECT actual_lang, sum(n_docs) AS actual_total FROM cells GROUP BY 1
    )
    SELECT c.actual_lang, c.predicted_lang, c.n_docs,
           round(c.n_docs * 1.0 / t.actual_total, 6) AS share_of_actual,
           c.actual_lang = c.predicted_lang AS correct
    FROM cells c JOIN tot t USING (actual_lang)
    ORDER BY actual_lang, predicted_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID vs corpus labels.

    Scale shape: the marker scoring is the same single codegen'd
    projection as q:text_language_id (split() staged once per row), the
    matrix is one map-side-combined groupBy over |langs|^2 cells, and
    the per-actual totals ride a second tiny aggregate joined back —
    text never leaves the scan stage."""
    d0 = table(spark, sf_dir, "documents")
    staged = d0.select("doc_id", "lang", _words().alias("ws"))
    d = staged.select(
        "doc_id",
        "lang",
        *[_marker_hits(v, over="ws").alias(f"s_{k}") for k, v in LANG_MARKERS.items()],
    )
    s = {k: F.col(f"s_{k}") for k in LANG_MARKERS}
    predicted = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] > 0), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), "fr")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )
    cells = (
        d.select(F.col("lang").alias("actual_lang"), predicted.alias("predicted_lang"))
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = cells.groupBy("actual_lang").agg(F.sum("n_docs").alias("actual_total"))
    return (
        cells.join(F.broadcast(tot), "actual_lang")
        .select(
            "actual_lang",
            "predicted_lang",
            "n_docs",
            F.round(F.col("n_docs") * 1.0 / F.col("actual_total"), 6).alias(
                "share_of_actual"
            ),
            (F.col("actual_lang") == F.col("predicted_lang")).alias("correct"),
        )
        .orderBy("actual_lang", "predicted_lang")
    )
