"""Multimodal plumbing: schema, decode stub gating, numpy resize, frame
sampling fan-out, feature extraction + ANN-compatible embeddings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_mri_scripts_spark.sources.multimodal import (
    _area_resize,
    codec_decode,
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from etl_mri_scripts_spark.sources.volumes import np_to_npy_bytes, npy_bytes_to_np


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=12, seed=21).cache()


def test_media_schema_and_kinds(media):
    kinds = {r["kind"]: r["n"] for r in media.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert kinds == {"image": 4, "audio": 4, "video": 4}
    img = media.filter(F.col("kind") == "image").first()
    assert img["channels"] == 3 and img["mime"] == "image/x-npy"
    arr = npy_bytes_to_np(img["payload"])
    assert arr.shape == (img["height"], img["width"], 3)


def test_codec_decode_stub_gating():
    arr = np.ones((4, 4), dtype=np.float32)
    out = codec_decode(np_to_npy_bytes(arr), "image/x-npy")
    np.testing.assert_array_equal(out, arr)
    with pytest.raises(NotImplementedError):
        codec_decode(b"\xff\xd8\xff", "image/jpeg")  # real JPEG needs PIL


def test_area_resize_block_mean():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = _area_resize(img, 2, 2)
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])
    # non-integer factor falls back to nearest
    out2 = _area_resize(img, 3, 3)
    assert out2.shape == (3, 3)


def test_resize_images_spark(media):
    resized = resize_images(media, 16, 16)
    rows = resized.collect()
    assert len(rows) == 4  # only images
    for r in rows:
        arr = npy_bytes_to_np(r["payload"])
        assert arr.shape[:2] == (16, 16)
        assert r["height"] == 16 and r["width"] == 16


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_k=2)
    rows = frames.collect()
    # 4 videos x 8 frames / 2
    assert len(rows) == 4 * 4
    assert {r["frame_i"] for r in rows} == {0, 2, 4, 6}
    f = npy_bytes_to_np(rows[0]["payload"])
    assert f.shape == (rows[0]["height"], rows[0]["width"])


def test_extract_features_embedding_contract(media):
    feats = extract_features(media, embed_dim=16).cache()
    assert feats.count() == 12
    r = feats.first()
    assert len(r["embedding"]) == 16
    assert abs(sum(r["embedding"]) - 1.0) < 1e-5  # histogram normalized
    # deterministic across runs
    a = {r["media_id"]: tuple(r["embedding"]) for r in feats.collect()}
    b = {r["media_id"]: tuple(r["embedding"]) for r in extract_features(media, 16).collect()}
    assert a == b
    # features are joinable with ANN machinery (cosine on array<float>)
    v = feats.select("media_id", F.col("embedding").cast("array<double>").alias("e"))
    pair = v.alias("a").crossJoin(v.alias("b")).filter(F.col("a.media_id") < F.col("b.media_id"))
    dot = F.expr("aggregate(zip_with(a.e, b.e, (x, y) -> x * y), 0.0D, (acc, z) -> acc + z)")
    assert pair.select(dot.alias("d")).filter(F.col("d") > 0).count() > 0


def test_kind_filtered_partitions_yield_schema(spark):
    # a partition containing no image (or no video) rows must still yield a
    # schema-complete empty frame from the mapInPandas generators
    from etl_mri_scripts_spark.sources.multimodal import (
        resize_images,
        sample_frames,
        synthetic_media,
    )

    audio_only = synthetic_media(spark, n=9, seed=4).filter(F.col("kind") == "audio")
    assert resize_images(audio_only, 16, 16).count() == 0
    assert sample_frames(audio_only, every_k=2).count() == 0


def test_chunk_audio_fanout_and_overlap(media):
    from etl_mri_scripts_spark.sources.multimodal import chunk_audio

    # non-overlapping: 1 s of 16 kHz audio in 0.25 s chunks -> 4 per item
    chunks = chunk_audio(media, chunk_sec=0.25).cache()
    per = {r["media_id"]: r["n"] for r in
           chunks.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert set(per.values()) == {4}
    assert chunks.count() == 4 * 4  # 4 audio items

    # overlapping hop: (16000 - 4000) // 2000 + 1 = 7 windows
    overlap = chunk_audio(media, chunk_sec=0.25, hop_sec=0.125)
    assert overlap.groupBy("media_id").count().first()["count"] == 7

    # payload values are exact slices of the source signal
    row = chunks.filter((F.col("media_id") == 1) & (F.col("chunk_i") == 2)).first()
    src = media.filter(F.col("media_id") == 1).first()
    wav = npy_bytes_to_np(bytes(src["payload"]))
    got = npy_bytes_to_np(bytes(row["payload"]))
    np.testing.assert_array_equal(got, wav[row["start_sample"]: row["start_sample"] + row["n_samples"]])

    # image/video rows never produce chunks; schema survives empty partitions
    assert chunks.join(
        media.filter(F.col("kind") != "audio").select("media_id"), "media_id"
    ).count() == 0
