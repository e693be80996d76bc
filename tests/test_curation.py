"""Invariant tests for the corpus-curation operators (sampling, dedup
clustering, quantization) — properties the oracle hash can't express:
exactness of quotas, stability under corpus growth, transitive closure,
and reconstruction error bounds.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_mri_scripts_spark.queries.dedup import (
    dedup_connected_components,
    dedup_lsh_verified_pairs,
)
from etl_mri_scripts_spark.queries.sampling import (
    FRACTION_PCT,
    KEEP_BUCKETS,
    N_BUCKETS,
    sample_hash_bernoulli,
    sample_stratified_exact,
)
from etl_mri_scripts_spark.queries.similarity import embedding_quantize_int8
from etl_mri_scripts_spark.tables import table


def test_stratified_sample_quota_is_exact(spark, sf_dir):
    # ceil(10%) per stratum, exactly — the reference's exact-count split
    # semantics (utils_scripts.py:46-51), not Bernoulli.
    totals = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sampled = {
        r["lang"]: r["n"]
        for r in sample_stratified_exact(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(sampled) == set(totals)
    for lang, n in totals.items():
        assert sampled[lang] == math.ceil(n * FRACTION_PCT / 100.0)


def test_bernoulli_sample_is_stable_under_corpus_subset(spark, sf_dir):
    # Membership is a pure function of doc_id: sampling half the corpus
    # must agree with the full-corpus sample restricted to that half (the
    # property rand()-based sampling does NOT have). Also the kept ids are
    # exactly the full sample's ids with even doc_id.
    full = {r["doc_id"] for r in sample_hash_bernoulli(spark, sf_dir).collect()}
    sub_tbl = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10
    ).cast("long")
    sub = {
        r["doc_id"]
        for r in sub_tbl.select("doc_id", bucket.alias("bucket"))
        .filter(F.col("bucket") < KEEP_BUCKETS)
        .collect()
    }
    assert sub == {d for d in full if d % 2 == 0}
    assert 0 < len(full)  # ~KEEP_BUCKETS/N_BUCKETS of corpus; sanity only
    assert KEEP_BUCKETS < N_BUCKETS


def test_connected_components_partition_closure(spark, sf_dir):
    comp = dedup_connected_components(spark, sf_dir).collect()
    label = {r["doc_id"]: r["component_id"] for r in comp}
    sizes = {r["doc_id"]: r["component_size"] for r in comp}
    pairs = dedup_lsh_verified_pairs(spark, sf_dir).collect()
    assert pairs, "fixture corpus must contain near-dup pairs"
    # 1. every edge endpoint is labeled, and both ends share a label
    for p in pairs:
        assert label[p["doc_a"]] == label[p["doc_b"]]
    # 2. the component id is the min member (canonical-doc policy)
    members: dict[int, list[int]] = {}
    for d, c in label.items():
        members.setdefault(c, []).append(d)
    for c, ms in members.items():
        assert c == min(ms)
        assert all(sizes[m] == len(ms) for m in ms)
    # 3. no label refers outside the node set (labels are doc_ids)
    assert set(members) <= set(label)


def test_int8_quantization_error_bound(spark, sf_dir):
    # Reconstruction error of symmetric int8 quantization is <= scale/2
    # per coordinate, and every code fits in [-127, 127].
    rows = (
        embedding_quantize_int8(spark, sf_dir)
        .join(
            table(spark, sf_dir, "embeddings").select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            ),
            "vec_id",
        )
        .collect()
    )
    assert rows
    for r in rows:
        codes = [int(t) for t in r["q"].split("|")]
        assert len(codes) == len(r["e"])
        assert all(-127 <= q <= 127 for q in codes)
        # scale column is rounded for the oracle; recover the true scale
        true_scale = max(max(abs(x) for x in r["e"]) / 127.0, 1e-12)
        for x, q in zip(r["e"], codes):
            assert abs(x - q * true_scale) <= true_scale / 2 + 1e-12


def test_bestfit_packing_invariants(spark, sf_dir):
    from collections import defaultdict

    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.queries.curation import BFD_CAP

    rows = QUERIES["pack_sequences_bestfit"](spark, sf_dir).collect()
    assert rows
    fill = defaultdict(int)
    for r in rows:
        fill[(r["lang"], r["bin_id"])] += r["n_tokens"]
        if r["oversize"]:
            assert r["n_tokens"] > BFD_CAP
    for (lang, b), tot in fill.items():
        # non-oversize bins respect capacity
        members = [r for r in rows if r["lang"] == lang and r["bin_id"] == b]
        if not any(m["oversize"] for m in members):
            assert tot <= BFD_CAP, (lang, b, tot)
            # oversize bins are singletons
        else:
            assert len(members) == 1
    # packing is reasonably tight: bins used within 30% of the lower bound
    for lang in {r["lang"] for r in rows}:
        lang_rows = [r for r in rows if r["lang"] == lang and not r["oversize"]]
        if not lang_rows:
            continue
        used = len({r["bin_id"] for r in lang_rows})
        lower = -(-sum(r["n_tokens"] for r in lang_rows) // BFD_CAP)
        assert used <= 1.3 * lower + 1, (lang, used, lower)


def test_bestfit_packing_deterministic(spark, sf_dir):
    from etl_mri_scripts_spark.queries import QUERIES

    a = QUERIES["pack_sequences_bestfit"](spark, sf_dir).collect()
    b = QUERIES["pack_sequences_bestfit"](spark, sf_dir).collect()
    assert a == b
