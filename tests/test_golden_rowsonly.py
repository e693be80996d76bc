"""Pinned output hashes for deterministic rows-only queries (no SQL
oracle exists, so without a pin a regression could hide behind the
driver's weaker rows>0 check). The queries round at emit, so their
output is bit-stable across runs/partitionings; the hash is specific to
sf0.001 and must be re-pinned intentionally whenever the algorithm
changes (that's the point).
"""

from __future__ import annotations

import hashlib

import pytest

from etl_mri_scripts_spark.queries import QUERIES

GOLDEN = {
    # name: (sha256[:16] of sorted canonical rows, row count)
    # EVERY registered no-oracle query is pinned here, so the weaker
    # rows-only driver check is always backed by a bit-exact local gate.
    # (ann_pq_adc_topk graduated to a real DuckDB oracle — no pin needed.)
    "bpe_train_merges": ("dc75d333de0869db", 105),
    "bpe_tokenize_counts": ("ee5729e5424e39f4", 500),
    "pack_sequences_bestfit": ("4886fd964d3eb8b6", 500),
    "imaging_pipeline_patches": ("2b18d392403cfae3", 80),
    "imaging_snr_metrics": ("b45d1e1a27d67062", 3),
    "multimodal_feature_extract": ("68afe1f7481bc1c0", 12),
    "multimodal_frame_sample": ("6f1277fef5b97cf9", 16),
    "imaging_triptych_render": ("76746811f5b3549b", 2),
    "hll_sketch_rollup_nation_region": ("7363c16bd2ecdd8c", 5),
    "image_dhash_near_dup": ("0c9535d33503cd4e", 8),
}


def test_every_no_oracle_query_is_pinned():
    from etl_mri_scripts_spark.queries import ORACLES

    unpinned = set(QUERIES) - set(ORACLES) - set(GOLDEN)
    assert not unpinned, (
        f"no-oracle queries without a golden pin: {sorted(unpinned)} — "
        "add a hash here or give them a DuckDB oracle"
    )


def _canon_hash(df) -> tuple[str, int]:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(repr(tuple(r)) for r in pdf.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16], len(pdf)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_hash(spark, sf_dir, name):
    if not sf_dir.rstrip("/").endswith("sf0.001"):
        pytest.skip("golden hashes pinned at sf0.001")
    h, n = _canon_hash(QUERIES[name](spark, sf_dir))
    want_h, want_n = GOLDEN[name]
    assert n == want_n, f"{name}: row count {n} != pinned {want_n}"
    assert h == want_h, (
        f"{name}: output hash {h} != pinned {want_h} — if the algorithm "
        "changed intentionally, re-pin with the snippet in this file"
    )
