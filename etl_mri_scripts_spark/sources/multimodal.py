"""Multimodal columns (BASELINE.json north star): image/audio/video as
opaque binary payloads with typed metadata columns.

The Spark-side plumbing — schema, Arrow batching, partitioning, fan-out
shape — is real and tested. PNG decode/encode is REAL (the engine's
zero-dependency codec, sources/codecs.py), as is the deterministic `.npy`
payload path. JPEG/WAV/MP4 need cv2/PIL/soundfile, absent from this
container, so those mimes raise NotImplementedError behind an import-try.

Scale notes: payloads never enter group-by keys or join keys; every
operation below is a narrow per-row map (mapInPandas) or an explode whose
fan-out Spark can repartition. Feature rows (tiny) separate from payload
rows (fat) as early as possible so shuffles move features, not media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .volumes import np_to_npy_bytes, npy_bytes_to_np

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, payload binary, "
    "width int, height int, channels int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, mean double, std double, p01 double, p99 double, "
    "dark_frac double, embedding array<float>"
)


def synthetic_media(spark: SparkSession, n: int = 12, seed: int = 21) -> DataFrame:
    """Deterministic fake media: images (h, w, c), audio (n,), video
    (f, h, w) float32 arrays as .npy payloads, generated on executors."""
    meta = spark.createDataFrame(
        [(i, ("image", "audio", "video")[i % 3], seed ^ (i * 0x85EBCA6B)) for i in range(n)],
        "media_id long, kind string, mseed long",
    ).repartition(4, "media_id")

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rng = np.random.default_rng(int(r.mseed) & 0x7FFFFFFF)
                if r.kind == "image":
                    h, w, c = 32 + 8 * int(rng.integers(0, 3)), 32, 3
                    arr = rng.random((h, w, c), dtype=np.float32)
                    rows.append(dict(media_id=r.media_id, kind="image", mime="image/x-npy",
                                     payload=np_to_npy_bytes(arr), width=w, height=h,
                                     channels=c, sample_rate=0, n_frames=1))
                elif r.kind == "audio":
                    sr, n_samp = 16000, 16000
                    t = np.arange(n_samp) / sr
                    arr = (0.5 * np.sin(2 * np.pi * (200 + 50 * int(r.media_id)) * t)
                           + 0.05 * rng.standard_normal(n_samp)).astype(np.float32)
                    rows.append(dict(media_id=r.media_id, kind="audio", mime="audio/x-npy",
                                     payload=np_to_npy_bytes(arr), width=0, height=0,
                                     channels=1, sample_rate=sr, n_frames=0))
                else:
                    f, h, w = 8, 24, 24
                    arr = rng.random((f, h, w), dtype=np.float32)
                    rows.append(dict(media_id=r.media_id, kind="video", mime="video/x-npy",
                                     payload=np_to_npy_bytes(arr), width=w, height=h,
                                     channels=1, sample_rate=0, n_frames=f))
            yield pd.DataFrame(rows)

    return meta.mapInPandas(gen, schema=MEDIA_SCHEMA)


def codec_decode(payload: bytes, mime: str) -> np.ndarray:
    """Codec decode. Natively supported with zero third-party deps:
      * */x-npy — the deterministic synthetic payload format,
      * image/png — via the engine's spec-compliant PNG codec
        (sources/codecs.py; ref: extract_subimages.py:52 cv2.imread).
    JPEG/WAV/MP4 require cv2/PIL/soundfile, absent from this container —
    those mimes raise NotImplementedError behind an import-try."""
    if mime.endswith("/x-npy"):
        return npy_bytes_to_np(payload)
    if mime == "image/png":
        from .codecs import decode_png

        return decode_png(bytes(payload))
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"codec decode for {mime} requires image/audio libraries not "
            "present in this container; */x-npy and image/png decode natively"
        ) from exc
    raise NotImplementedError(f"unsupported mime {mime}")


def scan_png_tree(spark: SparkSession, root: str) -> DataFrame:
    """S7/K1 read side: recursive binary scan of a PNG tree -> decoded
    media rows (ref: extract_subimages.py:43-52 glob + cv2.imread). Decode
    runs on executors in Arrow batches via the engine's PNG codec; pixels
    re-enter the engine as .npy payloads so every downstream operator is
    codec-agnostic."""
    from .codecs import decode_png

    scanned = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.png")
        .load(root)
        .select("path", "content")
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img = decode_png(bytes(content))
                h, w = img.shape[:2]
                c = 1 if img.ndim == 2 else img.shape[2]
                # 64-bit id over the FULL path: a stem-only crc32 made
                # train/0001.png and val/0001.png share one media_id
                # (and 32-bit ids birthday-collide around ~100k files)
                mid = np.int64(
                    int.from_bytes(
                        hashlib.md5(str(path).encode()).digest()[:8], "big", signed=True
                    )
                )
                rows.append(dict(
                    media_id=mid, kind="image",
                    mime="image/x-npy", payload=np_to_npy_bytes(img, "uint8"),
                    width=w, height=h, channels=c, sample_rate=0, n_frames=1,
                ))
            yield pd.DataFrame(
                rows, columns=[f.split(" ")[0] for f in MEDIA_SCHEMA.split(", ")]
            )

    return scanned.mapInPandas(gen, schema=MEDIA_SCHEMA)


def write_png_tree(df: DataFrame, out_dir: str, compression: int = 6) -> None:
    """K1/K2: write each row's uint8 payload as a real .png file named by
    ``key`` (ref: slice PNG tree, extract_subimages.py:80-86 cv2.imwrite
    with IMWRITE_PNG_COMPRESSION). One foreachPartition writer per task —
    executors write files in parallel, the driver moves no pixels. Expects
    columns (key string, payload binary[.npy uint8])."""
    from .codecs import encode_png

    def write_partition(rows):
        import os

        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            img = npy_bytes_to_np(bytes(r["payload"]))
            with open(os.path.join(out_dir, f"{r['key']}.png"), "wb") as f:
                f.write(encode_png(np.ascontiguousarray(img), compression))

    df.select("key", "payload").foreachPartition(write_partition)


def _area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """NumPy-only INTER_AREA resize (P7 analog of cv2.resize(...,
    INTER_AREA) without cv2): exact block mean for integer downscale
    factors, fractional box-mean otherwise. Each output pixel averages its
    exact source box, so resizing commutes with integer block-mean
    downscales — the scale-consistency perceptual_dhash relies on."""
    h, w = img.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        fy, fx = h // out_h, w // out_w
        trimmed = img[: out_h * fy, : out_w * fx]
        shape = (out_h, fy, out_w, fx) + img.shape[2:]
        return trimmed.reshape(shape).mean(axis=(1, 3)).astype(img.dtype)

    def axis_box(x: np.ndarray, n_out: int, axis: int) -> np.ndarray:
        n_in = x.shape[axis]
        if n_in == n_out:
            return x
        cs = np.cumsum(x, axis=axis)
        cs = np.concatenate(
            [np.zeros_like(np.take(cs, [0], axis=axis)), cs], axis=axis
        )
        edges = np.linspace(0, n_in, n_out + 1)
        parts = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            li, ri = int(np.floor(lo)), int(np.ceil(hi))
            s = np.take(cs, [ri], axis=axis) - np.take(cs, [li], axis=axis)
            if li < lo:
                s = s - (lo - li) * np.take(x, [li], axis=axis)
            if ri > hi:
                s = s - (ri - hi) * np.take(x, [ri - 1], axis=axis)
            parts.append(s / (hi - lo))
        return np.concatenate(parts, axis=axis)

    out = axis_box(axis_box(img.astype(np.float64), out_h, 0), out_w, 1)
    return out.astype(img.dtype)


def extract_features(media: DataFrame, embed_dim: int = 16) -> DataFrame:
    """Per-item stats + a deterministic pseudo-embedding (histogram-based
    stand-in for a model encoder; the contract — fixed-dim array<float>
    per row — is what downstream ANN queries consume)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec_decode(bytes(r.payload), r.mime).astype(np.float64)
                flat = arr.ravel()
                hist, _ = np.histogram(flat, bins=embed_dim,
                                       range=(float(flat.min()), float(flat.max()) + 1e-9))
                emb = (hist / max(flat.size, 1)).astype(np.float32)
                rows.append(dict(
                    media_id=r.media_id, kind=r.kind,
                    mean=float(flat.mean()), std=float(flat.std()),
                    p01=float(np.percentile(flat, 1)), p99=float(np.percentile(flat, 99)),
                    dark_frac=float((flat < 0.1).mean()),
                    embedding=emb.tolist(),
                ))
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Image resize as a payload->payload map; metadata columns updated so
    the optimizer still never inspects pixels."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                arr = codec_decode(bytes(r.payload), r.mime)
                res = _area_resize(arr, out_h, out_w)
                # the output payload is npy bytes in the resize's own
                # dtype (_area_resize preserves the input dtype): the
                # previous np_to_npy_bytes default silently converted
                # uint8 pixels to float32, and copying r.mime verbatim
                # mislabeled rows whose input was a real codec (e.g.
                # image/png) — the next codec_decode then failed
                out.append(dict(media_id=r.media_id, kind=r.kind, mime="image/x-npy",
                                payload=np_to_npy_bytes(res, str(res.dtype)),
                                width=out_w, height=out_h,
                                channels=r.channels, sample_rate=0, n_frames=1))
            # explicit columns: a partition with no image rows must still
            # yield a frame matching MEDIA_SCHEMA
            yield pd.DataFrame(out, columns=[f.split(" ")[0] for f in MEDIA_SCHEMA.split(", ")])

    return media.mapInPandas(gen, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video -> frame rows (the P2 slice-explode shape for video): every
    k-th frame becomes its own payload row keyed (media_id, frame_i)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                vid = codec_decode(bytes(r.payload), r.mime)
                for i in range(0, vid.shape[0], every_k):
                    out.append(dict(media_id=r.media_id, frame_i=i,
                                    payload=np_to_npy_bytes(vid[i]),
                                    height=vid.shape[1], width=vid.shape[2]))
            yield pd.DataFrame(out, columns=["media_id", "frame_i", "payload", "height", "width"])

    return media.mapInPandas(
        gen, schema="media_id long, frame_i int, payload binary, height int, width int"
    )


def chunk_audio(media: DataFrame, chunk_sec: float = 0.25, hop_sec: float | None = None) -> DataFrame:
    """Audio -> fixed-duration chunk rows (the speech-pipeline segmentation
    shape: feature windows for VAD/ASR). Hop < chunk gives overlapping
    windows, the audio twin of the P8 overlapping patch grid. Chunk COUNT
    is pure metadata arithmetic (sample_rate, payload length) — the plan
    can predict fan-out without touching payloads; only the slice copy
    reads bytes. Trailing partial windows are dropped (thresh_size=0
    analog)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio" or not r.sample_rate:
                    continue
                wav = codec_decode(bytes(r.payload), r.mime)
                n = int(wav.shape[0])
                width = int(round(chunk_sec * r.sample_rate))
                hop = int(round((hop_sec if hop_sec is not None else chunk_sec) * r.sample_rate))
                for ci, start in enumerate(range(0, n - width + 1, max(hop, 1))):
                    out.append(dict(
                        media_id=r.media_id, chunk_i=ci, start_sample=start,
                        n_samples=width, sample_rate=r.sample_rate,
                        payload=np_to_npy_bytes(wav[start : start + width]),
                    ))
            yield pd.DataFrame(
                out,
                columns=["media_id", "chunk_i", "start_sample", "n_samples",
                         "sample_rate", "payload"],
            )

    return media.mapInPandas(
        gen,
        schema="media_id long, chunk_i int, start_sample long, n_samples int, "
               "sample_rate int, payload binary",
    )


def perceptual_dhash(media: DataFrame) -> DataFrame:
    """Image rows -> 64-bit difference hash (dHash): grayscale, area-resize
    to 8x9, emit one bit per horizontal gradient sign. Near-duplicate
    images (re-encodes, mild noise, uniform rescales, resizes) agree on
    most bits, so Hamming distance on the hash replaces pixel comparison.

    The hash is returned as a LONG, so downstream banding/verification is
    pure JVM column algebra (shiftright/bit_and for band keys,
    bit_count(a ^ b) for Hamming) — pixels are touched exactly once here
    and never cross a shuffle."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                arr = codec_decode(bytes(r.payload), r.mime).astype(np.float64)
                if arr.ndim == 3:
                    arr = arr.mean(axis=2)
                g = _area_resize(arr, 8, 9)
                bits = (g[:, 1:] > g[:, :-1]).ravel()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                if val >= 1 << 63:  # two's-complement into a Spark long
                    val -= 1 << 64
                out.append(dict(media_id=r.media_id, dhash=val))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.mapInPandas(gen, schema="media_id long, dhash long")
