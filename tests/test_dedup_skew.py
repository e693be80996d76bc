"""Hot-shingle skew guard for the Jaccard near-dup family.

A boilerplate-heavy corpus (every doc shares the same header shingles) makes
the uncapped inverted-index self-join fan out d^2 candidate rows per hot
shingle. The production path (dedup_jaccard_dfcap) must drop those shingles
BEFORE the pair join, keeping per-shingle fan-out <= DF_CAP^2.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


BOILER = "terms of service apply all rights reserved contact us for details"
N_DOCS = 120  # every doc shares the boilerplate -> hot shingles with df=120


@pytest.fixture(scope="module")
def boiler_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("boilerdocs")
    texts = []
    for i in range(N_DOCS):
        # unique body per doc + shared boilerplate header; docs 0/1 are true
        # near-dups of each other beyond the boilerplate.
        body = f"unique body {i} alpha beta gamma delta token{i} end" if i > 1 else (
            "shared near duplicate body alpha beta gamma delta epsilon zeta end"
        )
        texts.append(f"{BOILER} {body}")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * N_DOCS),
            "source": pa.array(["synthetic"] * N_DOCS),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_dfcap_survives_boilerplate_corpus(spark, boiler_dir):
    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.queries.dedup import DF_CAP

    rows = QUERIES["dedup_jaccard_dfcap"](spark, boiler_dir).collect()
    # The boilerplate-only "similarity" must be gone: after the df cap the
    # only surviving high-Jaccard pair is the genuine near-dup (0, 1).
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert pairs == {(0, 1)}, pairs


def test_dfcap_bounds_candidate_fanout(spark, boiler_dir):
    # Measure the actual candidate-pair volume the inverted-index join
    # produces pre-aggregation: capped path must be O(DF_CAP^2 * shingles),
    # while the uncapped diagnostic would be O(N_DOCS^2) per hot shingle.
    from etl_mri_scripts_spark.queries.dedup import DF_CAP, _exploded_shingles

    sh = _exploded_shingles(spark, boiler_dir, cache=False)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("shingle")
    )
    rare = sh.join(hot, "shingle", "left_anti")
    a, b = rare.alias("a"), rare.alias("b")
    capped_candidates = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    # every surviving shingle pairs at most DF_CAP docs -> C(DF_CAP,2) pairs
    n_shingles = rare.select("shingle").distinct().count()
    assert capped_candidates <= n_shingles * DF_CAP * (DF_CAP - 1) / 2

    # and the uncapped join really is quadratic on this corpus (sanity that
    # the guard is guarding something): one hot shingle alone yields
    # C(N_DOCS, 2) candidates.
    a2, b2 = sh.alias("a"), sh.alias("b")
    uncapped_candidates = a2.join(
        b2,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    assert uncapped_candidates >= N_DOCS * (N_DOCS - 1) / 2
    assert uncapped_candidates > 10 * capped_candidates
