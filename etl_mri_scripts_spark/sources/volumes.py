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

# Hard ceiling for a single whole-volume binary cell. Spark's python-runner
# stream buffer (DirectByteBufferOutputStream) grows by capacity-doubling;
# past 1 GiB `capacity << 1` overflows int and every subsequent chunk write
# reallocates + copies the entire buffer — O(n^2) memcpy that turns a
# 2 GB cell into hours of serializer CPU (observed live: a (960,840,640)
# float32 volume pinned one executor thread in ...OutputStream.grow for
# 400+ s with zero progress). Cells past 2^31-1 bytes fail outright
# (int32 Arrow offsets). Volumes near or over this limit must ingest
# slab-wise: decode_nifti_slabs / synthetic_volume_slabs below.
MAX_ARROW_CELL_BYTES = 768 * 1024 * 1024

# Default slab payload bound. 32 MB keeps a 16-row Arrow batch
# (operators/pipeline.py ARROW_VOLUME_BATCH) at ~512 MB — two doublings
# under the 1 GiB transport cliff — and splits a (960,840,640) volume
# into ~280 slabs, so the big-volume explode parallelizes across the
# cluster instead of running as one straggler task.
DEFAULT_SLAB_BYTES = 32 * 1024 * 1024

SLAB_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("base", StringType()),
        StructField("sx", IntegerType()),
        StructField("sy", IntegerType()),
        StructField("sz", IntegerType()),
        StructField("zoom_x", DoubleType()),
        StructField("zoom_y", DoubleType()),
        StructField("zoom_z", DoubleType()),
        # slab addressing: axis "z" serves axial+coronal slice indices
        # [lo, hi); axis "y" serves sagittal indices [lo, hi)
        StructField("slab_axis", StringType()),
        StructField("lo", IntegerType()),
        StructField("hi", IntegerType()),
        # per-VOLUME robust percentiles, computed file-locally at ingest
        # (a volume lives in one file, so its stats never need a
        # distributed pass) and carried on every slab so downstream
        # normalization is identical to the whole-volume path
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
        StructField("voxels", BinaryType()),
    ]
)


def _check_cell_size(payload: bytes, base: str) -> bytes:
    if len(payload) > MAX_ARROW_CELL_BYTES:
        raise ValueError(
            f"volume {base!r} is {len(payload) / 1e9:.2f} GB as a single binary "
            f"cell (limit {MAX_ARROW_CELL_BYTES / 1e9:.2f} GB). Spark's "
            "python-runner transport degenerates to O(n^2) buffer copies past "
            "1 GiB per Arrow batch; ingest this volume slab-wise instead "
            "(decode_nifti_slabs / synthetic_volume_slabs)."
        )
    return payload


def volume_to_slab_rows(
    vol: np.ndarray,
    *,
    base: str,
    path: str,
    zooms: tuple[float, float, float],
    pmin: float = 1.0,
    pmax: float = 99.0,
    max_slab_bytes: int = DEFAULT_SLAB_BYTES,
):
    """Split one decoded (sx, sy, sz) float32 volume into bounded slab rows.

    Yields z-axis slabs ``vol[:, :, lo:hi]`` (source of axial AND coronal
    slices — both iterate z, the reference's coronal quirk,
    v2/nii_to_lmdb.py:77-79) and y-axis slabs ``vol[:, lo:hi, :]`` (source
    of sagittal slices). The two families each cover the volume exactly
    once; the 2x payload vs a monolithic cell is the price of bounded
    rows — the real S5 lazy reader pays it as two file-read passes, never
    as resident memory.

    Percentile stats are computed here, over the WHOLE volume, before
    splitting — so slab-wise normalization downstream is bit-identical to
    explode_slices' in-UDF normalization.
    """
    sx, sy, sz = vol.shape
    pcts = np.nanpercentile(vol, [pmin, pmax])
    vmin, vmax = float(pcts[0]), float(pcts[1])
    meta = {
        "path": path,
        "base": base,
        "sx": sx,
        "sy": sy,
        "sz": sz,
        "zoom_x": zooms[0],
        "zoom_y": zooms[1],
        "zoom_z": zooms[2],
        "vmin": vmin,
        "vmax": vmax,
    }
    z_bytes = sx * sy * 4  # one z-slice, float32
    y_bytes = sx * sz * 4  # one y-slice, float32
    # The step floors at 1 slice, so a pathological in-plane shape (e.g.
    # 16k x 16k = 1 GiB per slice) would emit single-slice slabs that
    # re-enter the very Arrow transport cliff slabs exist to avoid —
    # and slab rows never pass through _check_cell_size. Fail loudly
    # instead of silently degrading (r6 verdict demand #7).
    worst = max(z_bytes, y_bytes)
    if worst > MAX_ARROW_CELL_BYTES:
        raise ValueError(
            f"volume {base!r} has a single slice of {worst / 1e9:.2f} GB "
            f"(shape {vol.shape}); even a 1-slice slab exceeds the Arrow "
            f"cell limit ({MAX_ARROW_CELL_BYTES / 1e9:.2f} GB). Split the "
            "in-plane dimensions upstream before slab ingest."
        )
    z_step = max(1, max_slab_bytes // max(z_bytes, 1))
    y_step = max(1, max_slab_bytes // max(y_bytes, 1))
    for lo in range(0, sz, z_step):
        hi = min(lo + z_step, sz)
        yield {
            **meta,
            "slab_axis": "z",
            "lo": lo,
            "hi": hi,
            "voxels": np_to_npy_bytes(np.ascontiguousarray(vol[:, :, lo:hi])),
        }
    for lo in range(0, sy, y_step):
        hi = min(lo + y_step, sy)
        yield {
            **meta,
            "slab_axis": "y",
            "lo": lo,
            "hi": hi,
            "voxels": np_to_npy_bytes(np.ascontiguousarray(vol[:, lo:hi, :])),
        }


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


def scan_nifti(
    spark: SparkSession,
    root: str,
    path_regex: str = r".*/anat/.*\.nii(\.gz)?$",
    max_length: int | None = None,
) -> DataFrame:
    """S1: recursive binary scan with the reference's path-regex predicate
    (ref: slice_generator.py:208-213). Returns (path, content) rows; feed
    to decode_nifti.

    ``max_length`` (optional) filters on the file-size metadata column
    BEFORE content is selected — a plain comparison binaryFile pushes down
    to the source, so larger files' bytes are never read. Used by
    ingest_nifti's monolithic branch, and kept HERE so the glob/regex/scan
    definition exists in exactly one place per column shape."""
    scanned = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.nii*")
        .load(root)
        .filter(F.col("path").rlike(path_regex))
    )
    if max_length is not None:
        scanned = scanned.filter(F.col("length") <= F.lit(max_length))
    return scanned.select("path", "content")


def scan_nifti_paths(
    spark: SparkSession, root: str, path_regex: str = r".*/anat/.*\.nii(\.gz)?$"
) -> DataFrame:
    """Path-only scan for the slab ingest of LARGE files: selects only the
    binaryFile source's metadata columns, so file CONTENT never enters a
    row (binaryFile supports column pruning — the scan reads directory
    listings, not bytes). A >1 GiB file shipped as a `content` cell would
    hit the same transport cliff MAX_ARROW_CELL_BYTES documents before
    any slab could be cut; with this scan the bytes are first read
    INSIDE the slab decoder's executor task, where file I/O is
    task-local and never crosses Arrow whole."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.nii*")
        .load(root)
        .filter(F.col("path").rlike(path_regex))
        .select("path", "length")
    )


def _local_path(uri: str) -> str:
    """binaryFile yields file URIs; the in-task reader needs an OS path.
    Non-file schemes need a mounted path or an fsspec-style reader —
    refuse loudly rather than mis-read."""
    if uri.startswith("file:"):
        path = uri[5:]
        while path.startswith("//"):
            path = path[1:]
        return path
    if "://" in uri:
        raise NotImplementedError(
            f"decode_nifti_slabs reads by path on the executor; scheme of "
            f"{uri!r} is not a local filesystem. Mount the store or extend "
            "_local_path with the appropriate reader."
        )
    return uri


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
                        "voxels": _check_cell_size(np_to_npy_bytes(vol), base),
                    }
                )
            yield pd.DataFrame(rows)

    return scanned.mapInPandas(decode, schema=VOLUME_SCHEMA)


def decode_nifti_slabs(
    scanned: DataFrame,
    *,
    pmin: float = 1.0,
    pmax: float = 99.0,
    max_slab_bytes: int = DEFAULT_SLAB_BYTES,
) -> DataFrame:
    """S4/S5 slab-wise ingest for volumes too large for a single binary cell
    (see MAX_ARROW_CELL_BYTES). One file -> many bounded SLAB_SCHEMA rows;
    per-volume percentile stats are computed file-locally and carried on
    every slab. Feed to operators.pipeline.explode_slab_slices — its output
    is bit-identical to decode_nifti + explode_slices, but no Arrow batch
    ever exceeds ~max_slab_bytes per row and the slice explode of ONE huge
    volume spreads across the cluster instead of one straggler task.

    ``scanned`` should come from scan_nifti_paths (path-only rows): the
    file bytes are then read INSIDE this task, task-locally, so even a
    2 GB source file never crosses the Arrow transport whole. Rows that
    do carry a ``content`` column (scan_nifti) are also accepted for
    small-file compatibility — but such cells were already subject to
    the transport cliff upstream, which is the reason this path exists."""

    def decode(batches):
        for pdf in batches:
            contents = pdf["content"] if "content" in pdf.columns else [None] * len(pdf)
            for path, content in zip(pdf["path"], contents):
                if content is None:
                    with open(_local_path(str(path)), "rb") as f:
                        content = f.read()
                vol, zooms = _decode_one_nifti(bytes(content))
                base = (
                    str(path).rsplit("/", 1)[-1].replace(".nii.gz", "").replace(".nii", "")
                )
                yield from _slab_frames(
                    volume_to_slab_rows(
                        vol,
                        base=base,
                        path=str(path),
                        zooms=zooms,
                        pmin=pmin,
                        pmax=pmax,
                        max_slab_bytes=max_slab_bytes,
                    )
                )

    return scanned.mapInPandas(decode, schema=SLAB_SCHEMA)


def _slab_frames(slab_rows, flush_bytes: int = 128 * 1024 * 1024):
    """Group slab row dicts into bounded pandas frames: peak task memory
    stays ~(one volume + one flush buffer) however large the volume is."""
    rows, pending = [], 0
    for row in slab_rows:
        rows.append(row)
        pending += len(row["voxels"])
        if pending >= flush_bytes:
            yield pd.DataFrame(rows)
            rows, pending = [], 0
    if rows:
        yield pd.DataFrame(rows)


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
    meta = _synth_meta(spark, n_volumes, seed)

    def gen(batches):
        for pdf in batches:
            rows = []
            for base, vseed in zip(pdf["base"], pdf["vseed"]):
                vol = _synth_vol(int(vseed), (sx, sy, sz))
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
                        "voxels": _check_cell_size(np_to_npy_bytes(vol), str(base)),
                    }
                )
            yield pd.DataFrame(rows)

    return meta.mapInPandas(gen, schema=VOLUME_SCHEMA)


def _synth_meta(spark: SparkSession, n_volumes: int, seed: int) -> DataFrame:
    return spark.createDataFrame(
        [(f"sub-{i:03d}_T1w", seed ^ (i * 0x9E3779B1)) for i in range(n_volumes)],
        "base string, vseed long",
    ).repartition(max(n_volumes // 2, 1), "base")


def _synth_vol(vseed: int, shape: tuple[int, int, int]) -> np.ndarray:
    """Deterministic brain-like (sx, sy, sz) float32 volume for one seed."""
    sx, sy, sz = shape
    rng = np.random.default_rng(vseed & 0x7FFFFFFF)
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
    return np.transpose(vol, (2, 1, 0)).astype(np.float32)  # (sx, sy, sz)


def synthetic_volume_slabs(
    spark: SparkSession,
    n_volumes: int = 1,
    shape: tuple[int, int, int] = (48, 48, 10),
    seed: int = 7,
    *,
    pmin: float = 1.0,
    pmax: float = 99.0,
    max_slab_bytes: int = DEFAULT_SLAB_BYTES,
) -> DataFrame:
    """Slab-wise twin of synthetic_volumes: same deterministic volumes (same
    seeds, same voxel values), emitted as bounded SLAB_SCHEMA rows — the
    generator holds one whole volume in task-local numpy memory (exactly as
    the lazy NIfTI reader holds the mmap'd file) but never ships a cell
    larger than max_slab_bytes through Arrow."""
    sx, sy, sz = shape
    meta = _synth_meta(spark, n_volumes, seed)

    def gen(batches):
        for pdf in batches:
            for base, vseed in zip(pdf["base"], pdf["vseed"]):
                vol = _synth_vol(int(vseed), (sx, sy, sz))
                yield from _slab_frames(
                    volume_to_slab_rows(
                        vol,
                        base=str(base),
                        path=f"/synthetic/anat/{base}.nii.gz",
                        zooms=(0.2, 0.2, 0.2),
                        pmin=pmin,
                        pmax=pmax,
                        max_slab_bytes=max_slab_bytes,
                    )
                )

    return meta.mapInPandas(gen, schema=SLAB_SCHEMA)
