"""Streaming near-dup dedup (run_incremental_neardedup): the streaming
twin of q:dedup_incremental_delta — per-micro-batch exact + MinHash-LSH
probe of an accumulating signature index, min-id canonicals, survivors
extend the index, dropped docs never do. Also locks the replay-idempotency
contract (a replayed batch must not see its own earlier partial index
write) and the hash-family identity with the batch queries.
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_mri_scripts_spark.queries.dedup import (
    N_MINHASH,
    minhash_signature_of,
)
from etl_mri_scripts_spark.streaming.pipeline import (
    DOC_SCHEMA,
    neardedup_process_batch,
    run_incremental_neardedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronomers catalogue distant spiral galaxies every clear night "
    "using carefully calibrated telescopes on the high desert plateau"
)
NEAR = BASE.replace("plateau", "mesa")  # one trailing word differs
FRESH = (
    "completely different content about maritime navigation charts "
    "drawn by renaissance cartographers tracing coastlines from "
    "portolan measurements and compass bearings across the old world"
)
NEAR_FRESH = FRESH.replace("world", "basin")


def _doc(doc_id: int, text: str) -> Row:
    return Row(
        doc_id=doc_id, text=text, lang="en", source="s", n_chars=len(text)
    )


def _write_batch(spark, in_dir: str, name: str, rows) -> None:
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(in_dir, name))


def _agree(spark, text_a: str, text_b: str) -> int:
    """Signature agreement count between two texts via the SAME batch
    helper the stream uses — self-validates the fixtures (a NEAR pair
    must cross the tau*N_MINHASH threshold, FRESH vs BASE must not)."""
    sigs = minhash_signature_of(
        spark.createDataFrame([_doc(0, text_a), _doc(1, text_b)], DOC_SCHEMA)
    ).collect()
    a = next(r for r in sigs if r["doc_id"] == 0)
    b = next(r for r in sigs if r["doc_id"] == 1)
    return sum(a[f"m{s}"] == b[f"m{s}"] for s in range(N_MINHASH))


def _decisions(spark, out_dir: str) -> dict[int, tuple[str, int]]:
    rows = spark.read.parquet(os.path.join(out_dir, "decisions")).collect()
    return {r["doc_id"]: (r["reason"], r["match_doc_id"]) for r in rows}


def _survivors(spark, out_dir: str) -> set[int]:
    rows = spark.read.parquet(os.path.join(out_dir, "docs")).collect()
    return {r["doc_id"] for r in rows}


def test_fixture_signature_geometry(spark):
    # the test corpus is meaningful only if the near pairs actually agree
    # on >= ceil(0.5 * N_MINHASH) signature components and the distinct
    # texts do not — asserted via the same kernel, so a hash-family change
    # re-validates the fixtures instead of silently weakening the test
    assert _agree(spark, BASE, NEAR) >= N_MINHASH // 2
    assert _agree(spark, FRESH, NEAR_FRESH) >= N_MINHASH // 2
    assert _agree(spark, BASE, FRESH) < N_MINHASH // 2


def test_stream_dedups_across_and_within_batches(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt, idx = str(tmp_path / "ckpt"), str(tmp_path / "idx")
    os.makedirs(in_dir)

    # batch 0: two distinct docs + one exact in-batch dup of the first
    _write_batch(
        spark, in_dir, "drop0", [_doc(1, BASE), _doc(2, FRESH), _doc(3, BASE)]
    )
    q = run_incremental_neardedup(spark, in_dir + "/*", out_dir, ckpt, idx)
    q.awaitTermination(120_000)

    assert _survivors(spark, out_dir) == {1, 2}
    assert _decisions(spark, out_dir) == {3: ("exact", 1)}

    # batch 1: exact dup of indexed doc 1, near-dup of indexed doc 2,
    # one genuinely new doc
    extra = (
        "entirely novel passage discussing fermentation chemistry in "
        "traditional bread baking with wild yeast cultures and long "
        "cold proofing schedules developed by patient village bakers"
    )
    _write_batch(
        spark, in_dir, "drop1",
        [_doc(10, BASE), _doc(11, NEAR_FRESH), _doc(12, extra)],
    )
    q = run_incremental_neardedup(spark, in_dir + "/*", out_dir, ckpt, idx)
    q.awaitTermination(120_000)

    assert _survivors(spark, out_dir) == {1, 2, 12}
    d = _decisions(spark, out_dir)
    assert d[10] == ("exact", 1)
    assert d[11] == ("near", 2)

    # batch 2: an exact copy of DROPPED doc 11 — 11 never entered the
    # index, so the digest misses, but its signature equals 11's and
    # LSH-matches the CANONICAL doc 2 (dropped docs don't become match
    # targets; canonicals do)
    _write_batch(spark, in_dir, "drop2", [_doc(20, NEAR_FRESH)])
    q = run_incremental_neardedup(spark, in_dir + "/*", out_dir, ckpt, idx)
    q.awaitTermination(120_000)

    assert _survivors(spark, out_dir) == {1, 2, 12}
    assert _decisions(spark, out_dir)[20] == ("near", 2)

    # checkpoint held: three micro-batches total, no file re-processed
    # (each decision/doc row carries the batch that wrote it)
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    assert docs.count() == 3  # 1, 2, 12 exactly once each
    assert docs.select("batch_id").distinct().count() <= 3


def test_within_batch_near_dup_min_id_wins(spark, tmp_path):
    out_dir, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [_doc(5, NEAR), _doc(7, BASE)], DOC_SCHEMA
    )
    neardedup_process_batch(spark, batch, 0, out_dir, idx)
    assert _survivors(spark, out_dir) == {5}
    assert _decisions(spark, out_dir) == {7: ("near", 5)}
    # only the survivor is indexed
    idx_ids = {
        r["indexed_doc_id"]
        for r in spark.read.parquet(os.path.join(idx, "digests")).collect()
    }
    assert idx_ids == {5}


def test_relative_dirs_resolve_to_one_anchor(spark, tmp_path, monkeypatch):
    """A scheme-less RELATIVE index_dir/out_dir is absolutized against
    the Python CWD at entry (r12, r11 ADVICE): the Hadoop existence
    probe and Spark's read/write resolve relative paths against
    DIFFERENT working directories (FileSystem working dir vs the JVM's
    user.dir, which a Python os.chdir never moves), so without the
    normalization a relative path could pass the probe yet read or
    write elsewhere. With it, batch 1 must find batch 0's index — the
    dedup hit proves probe, write and read named one directory — and
    everything lands under the chdir target, not the JVM's CWD."""
    monkeypatch.chdir(tmp_path)
    b0 = spark.createDataFrame([_doc(1, BASE)], DOC_SCHEMA)
    neardedup_process_batch(spark, b0, 0, "rel_out", "rel_idx")
    b1 = spark.createDataFrame([_doc(2, BASE)], DOC_SCHEMA)
    neardedup_process_batch(spark, b1, 1, "rel_out", "rel_idx")
    out_abs = str(tmp_path / "rel_out")
    assert _survivors(spark, out_abs) == {1}
    assert _decisions(spark, out_abs) == {2: ("exact", 1)}
    assert (tmp_path / "rel_idx" / "digests").is_dir()


def test_replayed_batch_ignores_its_own_partial_index_write(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the index write for
    batch N and the offset commit replays batch N. The probe excludes
    partitions with batch_id >= N, so the replay reproduces the original
    decisions instead of matching every doc against its own earlier
    write; the dynamic-overwrite sinks rewrite rather than duplicate."""
    out_dir, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    b0 = spark.createDataFrame([_doc(1, BASE)], DOC_SCHEMA)
    neardedup_process_batch(spark, b0, 0, out_dir, idx)
    b1 = spark.createDataFrame([_doc(2, FRESH), _doc(3, NEAR)], DOC_SCHEMA)
    neardedup_process_batch(spark, b1, 1, out_dir, idx)
    first = (_survivors(spark, out_dir), _decisions(spark, out_dir))
    # simulate the replay: batch 1 runs again with its index partitions
    # already on disk
    neardedup_process_batch(spark, b1, 1, out_dir, idx)
    assert (_survivors(spark, out_dir), _decisions(spark, out_dir)) == first
    assert first[0] == {1, 2}
    assert first[1] == {3: ("near", 1)}
    # index rows not duplicated by the replay
    sigs = spark.read.parquet(os.path.join(idx, "signatures"))
    assert sigs.count() == 2
    assert sigs.select("indexed_doc_id").distinct().count() == 2


# ------------------- stream-vs-batch parity (r11) --------------------------
# The same corpus through run_incremental_neardedup (3 batches) and through
# the batch family on the union (dedup_connected_components over the SAME
# shingle/minhash/band kernels, min-id survivor rule). Where the policies
# are deterministic they must agree EXACTLY; where they legitimately differ
# (streaming first-arrival-wins vs batch min-id; an exact copy of a DROPPED
# doc downgrades to a near-match against the canonical, because dropped
# docs never enter the index) the difference is asserted explicitly, the
# way t:test_streaming's attribution/TWA parity tests do.

EXTRA2 = (
    "orchestral scores from the late romantic period demand enormous "
    "brass sections layered against divided strings while the conductor "
    "shapes rubato phrasing through every extended crescendo passage"
)
EXTRA3 = (
    "volcanic soil profiles on terraced hillsides drain quickly after "
    "seasonal storms letting old vine roots reach mineral layers that "
    "give the wine its characteristic saline finish and long structure"
)

# 3 clusters + 3 singletons; ids chosen so ascending batches are
# {1,2,3} -> {11,12,13} -> {21,22,23}
_PARITY_DOCS = {
    1: BASE, 11: NEAR, 21: BASE,            # cluster A (21 = exact copy)
    2: FRESH, 12: NEAR_FRESH, 22: NEAR_FRESH,  # cluster B (22 = exact copy)
    3: (
        "quantum error correction codes stabilize fragile qubit states "
        "by spreading logical information across entangled physical "
        "qubits measured through carefully chosen syndrome circuits"
    ),
    13: EXTRA2,
    23: EXTRA3,
}


def _run_stream_over(spark, tmp_path, sub: str, batches) -> tuple[set, dict]:
    """Feed `batches` (list of id-lists) as successive drops; return the
    final (survivor set, decisions)."""
    in_dir = str(tmp_path / sub / "in")
    out_dir = str(tmp_path / sub / "out")
    ckpt, idx = str(tmp_path / sub / "ckpt"), str(tmp_path / sub / "idx")
    os.makedirs(in_dir)
    for i, ids in enumerate(batches):
        _write_batch(
            spark, in_dir, f"drop{i}",
            [_doc(d, _PARITY_DOCS[d]) for d in ids],
        )
        q = run_incremental_neardedup(spark, in_dir + "/*", out_dir, ckpt, idx)
        q.awaitTermination(120_000)
    return _survivors(spark, out_dir), _decisions(spark, out_dir)


def _batch_family_components(spark, tmp_path) -> dict[int, int]:
    """doc_id -> component_id from the batch family's connected
    components over the union corpus (exact-Jaccard verify on the same
    LSH hash family)."""
    from etl_mri_scripts_spark.queries.dedup import dedup_connected_components

    sf_dir = str(tmp_path / "union_sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        [_doc(d, t) for d, t in sorted(_PARITY_DOCS.items())], DOC_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    rows = dedup_connected_components(spark, sf_dir).collect()
    return {r["doc_id"]: r["component_id"] for r in rows}


def test_stream_vs_batch_parity_ascending_ids(spark, tmp_path):
    """Batches arriving in ascending doc_id order make streaming's
    first-arrival-wins coincide with the batch family's min-id rule: the
    survivor sets must be IDENTICAL, and every streamed drop decision
    must land inside its doc's batch-side component."""
    comp = _batch_family_components(spark, tmp_path)
    # batch-side fixture validation: the exact-Jaccard verify clusters
    # exactly {1,11,21} and {2,12,22}; singletons join no component
    assert {d for d in comp} == {1, 11, 21, 2, 12, 22}
    assert comp[1] == comp[11] == comp[21] == 1
    assert comp[2] == comp[12] == comp[22] == 2
    batch_survivors = {min(c for c in (1, 11, 21)), min(c for c in (2, 12, 22))} | {
        3, 13, 23
    }

    surv, dec = _run_stream_over(
        spark, tmp_path, "asc", [[1, 2, 3], [11, 12, 13], [21, 22, 23]]
    )
    assert surv == batch_survivors == {1, 2, 3, 13, 23}
    # deterministic decisions, exactly: 21 is an exact hit on indexed 1;
    # 22 (exact copy of DROPPED 12) legitimately downgrades to a near
    # match against the CANONICAL 2 — dropped docs never enter the index,
    # so the digest probe cannot see 12 (the documented stream/batch
    # divergence in reason labels; the survivor sets still agree)
    assert dec == {
        11: ("near", 1),
        21: ("exact", 1),
        12: ("near", 2),
        22: ("near", 2),
    }
    # cluster-consistency: every drop's match resolves inside its own
    # batch-side component
    for doc_id, (_, match_id) in dec.items():
        assert comp[doc_id] == comp[match_id]


def test_stream_vs_batch_parity_descending_ids(spark, tmp_path):
    """Batches arriving in DESCENDING id order expose the one legitimate
    policy difference: streaming keeps the FIRST arrival per cluster
    (here the largest ids), the batch family keeps the MIN id. Both keep
    exactly one doc per component and agree on every singleton; the
    elected canonicals differ exactly on the two clusters."""
    comp = _batch_family_components(spark, tmp_path)
    surv, dec = _run_stream_over(
        spark, tmp_path, "desc", [[21, 22, 23], [11, 12, 13], [1, 2, 3]]
    )
    assert surv == {21, 22, 23, 13, 3}  # first-arrival-wins
    batch_survivors = {1, 2, 3, 13, 23}  # min-id rule
    # identical singleton treatment
    singletons = {d for d in _PARITY_DOCS if d not in comp}
    assert singletons == {3, 13, 23}
    assert surv & singletons == batch_survivors & singletons
    # exactly one survivor per component under BOTH policies
    for c in set(comp.values()):
        members = {d for d, cc in comp.items() if cc == c}
        assert len(surv & members) == 1
        assert len(batch_survivors & members) == 1
    # the canonical choice is the ONLY divergence
    assert surv ^ batch_survivors == {1, 2, 21, 22}
    # decisions: exact where digests matched an indexed doc, near
    # otherwise; matches stay inside the component
    assert dec == {
        11: ("near", 21),
        1: ("exact", 21),
        12: ("exact", 22),
        2: ("near", 22),
    }
    for doc_id, (_, match_id) in dec.items():
        assert comp[doc_id] == comp[match_id]
