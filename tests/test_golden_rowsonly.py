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
    "bpe_train_merges": ("dc75d333de0869db", 105),
    "ann_pq_adc_topk": ("33fd8b6d87b5b450", 50),
    "pack_sequences_bestfit": ("4886fd964d3eb8b6", 500),
}


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
