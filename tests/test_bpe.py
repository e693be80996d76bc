"""Distributed BPE trainer/tokenizer: algorithm-level known-answer tests
plus end-to-end determinism through Spark."""

from __future__ import annotations

from etl_mri_scripts_spark.queries.bpe import (
    END,
    apply_bpe,
    pretokenize,
    train_bpe_merges,
)


def test_pretokenize_runs_and_symbols():
    assert pretokenize("Hello, world! x2") == ["hello", ",", "world", "!", "x2"]


def test_train_bpe_known_answer():
    # classic textbook corpus: low/lower/newest/widest weighted counts
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wc, n_merges=4)
    # 'es' appears in newest+widest = 9 occurrences -> first merge;
    # then 'es'+'t' (9), then 'est'+'</w>' (9), then 'l'+'o' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_train_bpe_tie_break_deterministic():
    # two pairs with equal counts: lexicographically smaller pair wins
    wc = [("ab", 3), ("cd", 3)]
    merges = train_bpe_merges(wc, n_merges=1)
    assert merges[0] == ("a", "b")  # ('a','b') < ('c','d')


def test_apply_bpe_matches_training_segmentation():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wc, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    # 'newest' was in training: should reduce to few symbols
    toks = apply_bpe("newest", ranks)
    assert "".join(toks) == "newest" + END
    assert len(toks) <= 3
    # unseen word still tokenizes (falls back to chars + any applicable merges)
    toks2 = apply_bpe("lowest", ranks)
    assert "".join(toks2) == "lowest" + END


def test_apply_bpe_no_merges_is_chars():
    assert apply_bpe("abc", {}) == ["a", "b", "c", END]


def test_bpe_queries_deterministic_on_spark(spark, sf_dir):
    from etl_mri_scripts_spark.queries import QUERIES

    a = QUERIES["bpe_train_merges"](spark, sf_dir).collect()
    b = QUERIES["bpe_train_merges"](spark, sf_dir).collect()
    assert a == b
    assert len(a) > 50  # enough signal in the corpus for 120 merges
    # ranks are dense 0..n-1
    assert [r["rank"] for r in a] == list(range(len(a)))


def test_bpe_tokenize_compresses(spark, sf_dir):
    from etl_mri_scripts_spark.queries import QUERIES

    rows = QUERIES["bpe_tokenize_counts"](spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        # BPE tokens per word in [1, word_len]: strictly fewer tokens than
        # characters, at least one per pre-token
        assert r["n_bpe_tokens"] >= r["n_pretokens"]
        assert r["tokens_per_word"] >= 1.0
    # trained merges must compress: average well under chars-per-word
    avg = sum(r["tokens_per_word"] for r in rows) / len(rows)
    assert avg < 4.0
