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
