"""Volume sources (SURVEY.md §2.1 S1-S6).

Real NIfTI ingest = binaryFile scan + nibabel decode in mapInPandas. The
nibabel dependency is absent in this environment, so the decode step is
gated behind an import-try and raises NotImplementedError with the exact
plumbing (schema, batching, partitioning) in place and tested through the
synthetic generator, which produces deterministic brain-like volumes.

Payload convention (K6 analog): float32 arrays serialized as .npy bytes in
a BinaryType column; shape/dtype mirrored in typed metadata columns so
Catalyst can plan on them without touching pixels.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

VOLUME_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("base", StringType()),
        StructField("sx", IntegerType()),
        StructField("sy", IntegerType()),
        StructField("sz", IntegerType()),
        StructField("zoom_x", DoubleType()),
        StructField("zoom_y", DoubleType()),
        StructField("zoom_z", DoubleType()),
        StructField("voxels", BinaryType()),
    ]
)


def np_to_npy_bytes(arr: np.ndarray, dtype_out: str = "float32") -> bytes:
    """Serialize an array as .npy bytes (ref semantics: v2/lmdb_npy.py:10-22;
    f32/f16 supported)."""
    if dtype_out not in ("float32", "float16", "uint8"):
        raise ValueError(f"unsupported dtype_out {dtype_out}")
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr).astype(dtype_out), allow_pickle=False)
    return buf.getvalue()


def npy_bytes_to_np(b: bytes) -> np.ndarray:
    return np.load(io.BytesIO(b), allow_pickle=False)


def scan_nifti(spark: SparkSession, root: str, path_regex: str = r".*/anat/.*\.nii(\.gz)?$") -> DataFrame:
    """S1: recursive binary scan with the reference's path-regex predicate
    (ref: slice_generator.py:208-213). Returns (path, content) rows; feed
    to decode_nifti."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.nii*")
        .load(root)
        .filter(F.col("path").rlike(path_regex))
        .select("path", "content")
    )


def _decode_one_nifti(content: bytes) -> tuple[np.ndarray, tuple[float, float, float]]:
    """Decode one NIfTI blob: nibabel when installed (full format coverage),
    else the engine's spec-compliant pure-numpy NIfTI-1 reader
    (sources/codecs.py) — both return (float32 volume, zooms), matching the
    reference's nib.load(...).get_fdata() at slice_generator.py:69-70."""
    try:
        import nibabel as nib
    except ImportError:
        from .codecs import decode_nifti1

        return decode_nifti1(bytes(content))
    import os
    import tempfile

    # nibabel picks gzip handling from the filename — sniff the 1f 8b
    # magic so a plain .nii payload (which scan_nifti's regex accepts)
    # is not gzip-opened and killed with BadGzipFile.
    suffix = ".nii.gz" if bytes(content[:2]) == b"\x1f\x8b" else ".nii"
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(content)
        tmp = f.name
    try:
        img = nib.load(tmp)
        vol = np.asarray(img.get_fdata(), dtype=np.float32)
        # same contract as the pure-numpy fallback: 3-D volumes only —
        # squeeze trailing singleton dims, refuse a true 4D series (the
        # slice pipeline transposes 3-D arrays; silently taking
        # timepoint 0 would diverge between environments)
        if vol.ndim > 3:
            if all(s == 1 for s in vol.shape[3:]):
                vol = vol.reshape(vol.shape[:3])
            else:
                raise ValueError(
                    f"decode_nifti supports 3-D volumes only (got {vol.shape})"
                )
        zooms = tuple(float(z) for z in img.header.get_zooms()[:3])
    finally:
        os.unlink(tmp)
    return vol, zooms


def decode_nifti(scanned: DataFrame) -> DataFrame:
    """S4-S6: NIfTI decode to VOLUME_SCHEMA via mapInPandas (Arrow batches;
    pixels stay in one binary column, metadata in optimizer-visible
    columns)."""

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                vol, zooms = _decode_one_nifti(bytes(content))
                base = (
                    str(path).rsplit("/", 1)[-1].replace(".nii.gz", "").replace(".nii", "")
                )
                rows.append(
                    {
                        "path": str(path),
                        "base": base,
                        "sx": vol.shape[0],
                        "sy": vol.shape[1],
                        "sz": vol.shape[2],
                        "zoom_x": zooms[0],
                        "zoom_y": zooms[1],
                        "zoom_z": zooms[2],
                        "voxels": np_to_npy_bytes(vol),
                    }
                )
            yield pd.DataFrame(rows)

    return scanned.mapInPandas(decode, schema=VOLUME_SCHEMA)


def synthetic_volumes(
    spark: SparkSession,
    n_volumes: int = 4,
    shape: tuple[int, int, int] = (48, 48, 10),
    seed: int = 7,
) -> DataFrame:
    """Deterministic brain-like volumes: a bright ellipsoid over dark
    background + texture, generated ON EXECUTORS (the driver only ships
    (base, seed) rows) so the pattern scales to any volume count."""
    sx, sy, sz = shape
    meta = spark.createDataFrame(
        [(f"sub-{i:03d}_T1w", seed ^ (i * 0x9E3779B1)) for i in range(n_volumes)],
        "base string, vseed long",
    ).repartition(max(n_volumes // 2, 1), "base")

    def gen(batches):
        for pdf in batches:
            rows = []
            for base, vseed in zip(pdf["base"], pdf["vseed"]):
                rng = np.random.default_rng(int(vseed) & 0x7FFFFFFF)
                zz, yy, xx = np.meshgrid(
                    np.linspace(-1, 1, sz), np.linspace(-1, 1, sy), np.linspace(-1, 1, sx),
                    indexing="ij",
                )
                # ellipsoid "brain" with per-volume eccentricity + texture
                a, b, c = 0.62 + 0.1 * rng.random(3)
                r2 = (xx / a) ** 2 + (yy / b) ** 2 + (zz / c) ** 2
                brain = np.clip(1.0 - r2, 0.0, None)
                tex = rng.standard_normal((sz, sy, sx)) * 0.05
                vol = (brain * (0.6 + tex) + rng.random((sz, sy, sx)) * 0.01) * 1000.0
                vol = np.transpose(vol, (2, 1, 0)).astype(np.float32)  # (sx, sy, sz)
                rows.append(
                    {
                        "path": f"/synthetic/anat/{base}.nii.gz",
                        "base": str(base),
                        "sx": sx,
                        "sy": sy,
                        "sz": sz,
                        "zoom_x": 0.2,
                        "zoom_y": 0.2,
                        "zoom_z": 0.2,
                        "voxels": np_to_npy_bytes(vol),
                    }
                )
            yield pd.DataFrame(rows)

    return meta.mapInPandas(gen, schema=VOLUME_SCHEMA)
