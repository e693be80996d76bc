"""Pinned output hashes for deterministic rows-only queries (no SQL
oracle exists, so without a pin a regression could hide behind the
driver's weaker rows>0 check). The queries round at emit, so their
output is bit-stable across runs/partitionings; hashes are pinned at
BOTH sf0.001 and sf0.01 (round-5: a pixel/packing bug that only
manifests with more data would slip past a single-scale pin) and must
be re-pinned intentionally whenever the algorithm changes (that's the
point).

Note several imaging/multimodal pins are identical across scales — their
inputs are synthetic fixed-seed volumes, not the sf-scaled tables; the
scale-sensitive ones (bpe_*, hll_*, pack_*) do diverge and are the
reason for the second pin set.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from etl_mri_scripts_spark.queries import QUERIES

GOLDEN = {
    # sf dir -> {name: (sha256[:16] of sorted canonical rows, row count)}
    # EVERY registered no-oracle query is pinned at every scale, so the
    # weaker rows-only driver check is always backed by bit-exact local
    # gates. (ann_pq_adc_topk graduated to a real DuckDB oracle.)
    "/root/testdata/sf0.001": {
        "bpe_train_merges": ("dc75d333de0869db", 105),
        "bpe_tokenize_counts": ("ee5729e5424e39f4", 500),
        "pack_sequences_bestfit": ("4886fd964d3eb8b6", 500),
        "imaging_pipeline_patches": ("2b18d392403cfae3", 80),
        "imaging_snr_metrics": ("9de41867f10f83a6", 3),  # r5: thr from brain_air_masks
        "multimodal_feature_extract": ("68afe1f7481bc1c0", 12),
        "multimodal_frame_sample": ("6f1277fef5b97cf9", 16),
        "imaging_triptych_render": ("76746811f5b3549b", 2),
        "hll_sketch_rollup_nation_region": ("7363c16bd2ecdd8c", 5),
        "image_dhash_near_dup": ("0c9535d33503cd4e", 8),
    },
    "/root/testdata/sf0.01": {
        "bpe_train_merges": ("fd4ad5913868f82b", 106),
        "bpe_tokenize_counts": ("caa734364f1f74ff", 500),
        "pack_sequences_bestfit": ("05fda59b2db58251", 500),
        "imaging_pipeline_patches": ("2b18d392403cfae3", 80),
        "imaging_snr_metrics": ("9de41867f10f83a6", 3),  # r5: thr from brain_air_masks
        "multimodal_feature_extract": ("68afe1f7481bc1c0", 12),
        "multimodal_frame_sample": ("6f1277fef5b97cf9", 16),
        "imaging_triptych_render": ("76746811f5b3549b", 2),
        "hll_sketch_rollup_nation_region": ("999e21af951c6d35", 5),
        "image_dhash_near_dup": ("0c9535d33503cd4e", 8),
    },
    # r9 (r8 verdict demand #4): the BENCH scale factor. sf0.1 was
    # exercised by bench.py but never PINNED, so a scale-dependent drift
    # in BPE/HLL/packing would have surfaced as a bench anomaly instead
    # of a test failure. Hashes verified bit-stable across two sessions
    # with different parallelism (16 vs 8 cpus) and shuffle partitioning
    # (32 vs 17) before pinning.
    "/root/testdata/sf0.1": {
        "bpe_train_merges": ("2a6a5c8288edd049", 107),
        "bpe_tokenize_counts": ("279f7687b27a4f5e", 5000),
        "pack_sequences_bestfit": ("f909771cd7dd7e07", 5000),
        "imaging_pipeline_patches": ("2b18d392403cfae3", 80),
        "imaging_snr_metrics": ("9de41867f10f83a6", 3),
        "multimodal_feature_extract": ("68afe1f7481bc1c0", 12),
        "multimodal_frame_sample": ("6f1277fef5b97cf9", 16),
        "imaging_triptych_render": ("76746811f5b3549b", 2),
        "hll_sketch_rollup_nation_region": ("2921490f43e036b2", 5),
        "image_dhash_near_dup": ("0c9535d33503cd4e", 8),
    },
}


def test_every_no_oracle_query_is_pinned():
    from etl_mri_scripts_spark.queries import ORACLES

    # Three scale factors, including the bench SF (r9): a query pinned at
    # fewer scales has an unguarded regime — drop a pin set and this
    # meta-test, not a reviewer, notices.
    assert set(GOLDEN) == {
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    }
    no_oracle = set(QUERIES) - set(ORACLES)
    for sf, pins in GOLDEN.items():
        unpinned = no_oracle - set(pins)
        assert not unpinned, (
            f"no-oracle queries without a golden pin at {sf}: "
            f"{sorted(unpinned)} — add a hash here or give them a DuckDB oracle"
        )


def _canon_hash(df) -> tuple[str, int]:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(repr(tuple(r)) for r in pdf.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16], len(pdf)


@pytest.mark.parametrize(
    "sf,name",
    [(sf, n) for sf in sorted(GOLDEN) for n in sorted(GOLDEN[sf])],
    ids=[f"{os.path.basename(sf)}-{n}" for sf in sorted(GOLDEN) for n in sorted(GOLDEN[sf])],
)
def test_golden_hash(spark, sf, name):
    if not os.path.isdir(sf):
        pytest.skip(f"fixture dir {sf} absent")
    h, n = _canon_hash(QUERIES[name](spark, sf))
    want_h, want_n = GOLDEN[sf][name]
    assert n == want_n, f"{name}@{os.path.basename(sf)}: row count {n} != pinned {want_n}"
    assert h == want_h, (
        f"{name}@{os.path.basename(sf)}: output hash {h} != pinned {want_h} — "
        "if the algorithm changed intentionally, re-pin with the snippet in "
        "this file"
    )
