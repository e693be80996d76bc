"""Distributed BPE tokenizer training + application.

The classic byte-pair-encoding trainer (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public algorithm)
re-expressed for a 100 TB corpus:

* The corpus-heavy step is ONE distributed word-frequency aggregate
  (explode -> groupBy(word).count with map-side combine). Everything after
  operates on the word-count table, whose size is the vocabulary (|V| ~
  10^5-10^6 regardless of corpus bytes) — the same bounded-driver-state
  pattern as the k-means centroids in similarity.py (MLlib's design).
* The merge loop runs driver-side over that bounded table: each iteration
  is O(|V| * avg_word_len) pure-python over ~10^5 entries, never a Spark
  job — at scale the alternative (a Spark job per merge, 30k merges) would
  be 30k shuffles. This is why every production BPE trainer (HF tokenizers,
  SentencePiece) trains on word counts, not raw text.
* Applying the tokenizer is embarrassingly parallel: merges broadcast to
  executors once, an Arrow-batched pandas iterator maps text -> token ids.

Determinism: merge ties break on (count desc, pair lexicographic), so the
merge table is reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .registry import query

END = "</w>"  # end-of-word marker (Sennrich-style)
PRETOKEN_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")


def pretokenize(text: str) -> list[str]:
    """Lowercased GPT-ish pre-tokens: runs of [a-z0-9] or single symbols."""
    return PRETOKEN_RE.findall(text.lower())


def word_counts(docs: DataFrame) -> DataFrame:
    """The one corpus-heavy step: distributed word-frequency table.
    regexp_extract_all runs JVM-side; the groupBy combines map-side, so the
    shuffle carries |V| rows per task, not corpus tokens."""
    return (
        docs.select(
            # (?U): Java's \s is ASCII-only by default while Python's re
            # (pretokenize, the apply side) treats \s as Unicode — without
            # the flag a U+00A0 in web text is a "symbol" at train time
            # but whitespace at apply time, so the two halves of the
            # tokenizer disagree (r6 review finding). UNICODE_CHARACTER
            # _CLASS aligns the JVM side with Python.
            F.explode(
                F.expr(r"regexp_extract_all(lower(text), '(?U)[a-z0-9]+|[^a-z0-9\\s]', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe_merges(
    wc: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE over a word-count table (pure python, bounded input).

    Each word is a symbol sequence (chars + trailing END); repeatedly merge
    the most frequent adjacent pair. Ties break (count desc, pair lex asc)
    for determinism.
    """
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [END], c) for w, c in wc if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, cnt in seqs:
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i, (sym, cnt) in enumerate(seqs):
            j, out = 0, []
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == best[0] and sym[j + 1] == best[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            seqs[i] = (out, cnt)
    return merges


def apply_bpe(word: str, merges_ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word with trained merges (greedy lowest-rank-first,
    identical to HF tokenizers' bpe())."""
    sym = list(word) + [END]
    while len(sym) > 1:
        ranked = [
            (merges_ranks.get((a, b)), i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
        ]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2 :]
    return sym


def train_bpe(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = 200,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """End-to-end trainer. The collect is bounded by max_vocab_words
    (most-frequent words dominate BPE statistics; the tail adds noise-level
    counts), ordered deterministically."""
    docs = table(spark, sf_dir, "documents")
    wc_rows = (
        word_counts(docs)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_vocab_words)
        .collect()
    )
    return train_bpe_merges([(r["word"], r["cnt"]) for r in wc_rows], n_merges)


@query("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (BPE is iterative, not SQL-expressible): the trained merge
    table, rank-ordered — deterministic for the driver's rows/schema check."""
    merges = train_bpe(spark, sf_dir, n_merges=120)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    ).orderBy("rank")


@query("bpe_tokenize_counts")
def bpe_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: per-document BPE token counts + compression ratio vs
    whitespace tokens. Merges broadcast once; tokenization is an
    Arrow-batched map with an lru-cached per-word encode (Zipf makes the
    cache hit rate ~= 1 - |V|/tokens)."""
    merges = train_bpe(spark, sf_dir, n_merges=120)
    ranks = {m: i for i, m in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches):
        ranks_local = bc.value

        @lru_cache(maxsize=1 << 16)
        def encode_word(w: str) -> int:
            return len(apply_bpe(w, ranks_local))

        for pdf in batches:
            n_tokens = []
            n_words = []
            for text in pdf["text"]:
                # NULL text contributes zero tokens, matching the train
                # side where lower(NULL) rows vanish at explode —
                # str(None) would tokenize the literal 'None' (r6 review)
                words = pretokenize(text) if text is not None else []
                n_words.append(len(words))
                n_tokens.append(sum(encode_word(w) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_pretokens": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_tokens, dtype="int64"),
                }
            )

    out_schema = "doc_id long, n_pretokens long, n_bpe_tokens long"
    return (
        docs.mapInPandas(gen, schema=out_schema)
        .withColumn(
            "tokens_per_word",
            F.round(F.col("n_bpe_tokens") / F.greatest(F.col("n_pretokens"), F.lit(1)), 6),
        )
        .orderBy("doc_id")
    )
