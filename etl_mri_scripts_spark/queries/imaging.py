"""Imaging-pipeline queries (SURVEY.md §2.3/§2.6 + §7 Phase 2).

The grid/key/gating ARITHMETIC is SQL-expressible and oracle-verified here
on synthetic shape/key tables derived from the star schema. The pixel
operators (degradation, crops, dark filter) are exercised end-to-end by the
rows-only queries at the bottom (deterministic seeded synthetic volumes)
and golden-tested in tests/test_degradation.py / test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.patches import crop_space_col
from ..tables import table
from .registry import query

CROP, STEP, THRESH = 32, 16, 0


@query(
    "imaging_patch_grid",
    oracle=f"""
    -- crop-grid arithmetic with the trailing-edge rule
    -- (v2/patch_utils.py:36-46): starts = range(0, dim-crop+1, step),
    -- plus dim-crop if the remainder past the last window > thresh.
    WITH shapes AS (
      SELECT p_partkey AS shape_id,
             64 + CAST(p_partkey % 128 AS INT) AS h,
             48 + CAST((p_partkey * 7) % 160 AS INT) AS w
      FROM part
    ),
    grids AS (
      SELECT shape_id, h, w,
             CASE WHEN h - (list_last(range(0, greatest(h - {CROP}, 0) + 1, {STEP})) + {CROP}) > {THRESH}
                  THEN list_append(range(0, greatest(h - {CROP}, 0) + 1, {STEP}), h - {CROP})
                  ELSE range(0, greatest(h - {CROP}, 0) + 1, {STEP}) END AS h_space,
             CASE WHEN w - (list_last(range(0, greatest(w - {CROP}, 0) + 1, {STEP})) + {CROP}) > {THRESH}
                  THEN list_append(range(0, greatest(w - {CROP}, 0) + 1, {STEP}), w - {CROP})
                  ELSE range(0, greatest(w - {CROP}, 0) + 1, {STEP}) END AS w_space
      FROM shapes
    )
    SELECT shape_id, h, w,
           CAST(len(h_space) AS INT) AS n_y,
           CAST(len(w_space) AS INT) AS n_x,
           CAST(len(h_space) * len(w_space) AS INT) AS n_patches,
           CAST(list_last(h_space) AS INT) AS last_y,
           CAST(list_last(w_space) AS INT) AS last_x
    FROM grids ORDER BY shape_id
    """,
)
def imaging_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    shapes = p.select(
        F.col("p_partkey").alias("shape_id"),
        (64 + (F.col("p_partkey") % 128).cast("int")).alias("h"),
        (48 + ((F.col("p_partkey") * 7) % 160).cast("int")).alias("w"),
    )
    g = shapes.withColumn("h_space", crop_space_col(F.col("h"), CROP, STEP, THRESH)).withColumn(
        "w_space", crop_space_col(F.col("w"), CROP, STEP, THRESH)
    )
    return g.select(
        "shape_id",
        "h",
        "w",
        F.size("h_space").alias("n_y"),
        F.size("w_space").alias("n_x"),
        (F.size("h_space") * F.size("w_space")).alias("n_patches"),
        F.element_at("h_space", -1).cast("int").alias("last_y"),
        F.element_at("w_space", -1).cast("int").alias("last_x"),
    ).orderBy("shape_id")


@query(
    "imaging_slice_plan",
    oracle="""
    -- metadata-only slice enumeration (M3/P2, v2/nii_to_lmdb.py:47-120):
    -- slice counts from shapes alone, with the reference's coronal quirk
    -- (coronal iterates sz, like axial; sagittal iterates sy).
    WITH vols AS (
      SELECT s_suppkey AS vol_id,
             printf('sub-%03d_T1w', CAST(s_suppkey AS INT)) AS base,
             32 + CAST(s_suppkey % 16 AS INT) AS sx,
             32 + CAST((s_suppkey * 3) % 16 AS INT) AS sy,
             8 + CAST(s_suppkey % 6 AS INT) AS sz
      FROM supplier
    ),
    plan AS (
      SELECT base, orient,
             CASE orient WHEN 'sagittal' THEN sy ELSE sz END AS n_slices
      FROM vols, (SELECT unnest(['axial', 'coronal', 'sagittal']) AS orient)
    )
    SELECT base, orient,
           printf('%s__%s__slice_%03d', base, orient, i) AS slice_id
    FROM plan, LATERAL (SELECT unnest(range(0, n_slices)) AS i)
    ORDER BY base, orient, slice_id
    """,
)
def imaging_slice_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    vols = s.select(
        F.format_string("sub-%03d_T1w", F.col("s_suppkey").cast("int")).alias("base"),
        (32 + (F.col("s_suppkey") % 16).cast("int")).alias("sx"),
        (32 + ((F.col("s_suppkey") * 3) % 16).cast("int")).alias("sy"),
        (8 + (F.col("s_suppkey") % 6).cast("int")).alias("sz"),
    )
    plan = vols.select(
        "base",
        F.explode(F.array(F.lit("axial"), F.lit("coronal"), F.lit("sagittal"))).alias("orient"),
        "sy",
        "sz",
    ).withColumn(
        "n_slices", F.when(F.col("orient") == "sagittal", F.col("sy")).otherwise(F.col("sz"))
    )
    return (
        plan.select(
            "base",
            "orient",
            F.explode(F.sequence(F.lit(0), F.col("n_slices") - 1)).alias("i"),
        )
        .select("base", "orient", F.format_string("%s__%s__slice_%03d", "base", "orient", "i").alias("slice_id"))
        .orderBy("base", "orient", "slice_id")
    )


@query(
    "imaging_key_parity_gate",
    oracle="""
    -- J2 approved-keys gate + J4 parity check on synthetic patch keys:
    -- HR dark verdict derived from md5(key); LR keeps only approved keys;
    -- the output must show lr_kept == hr_kept and zero violations.
    WITH hr AS (
      SELECT printf('vol%02d__axial__slice_%03d__s%03d',
                    CAST(l_orderkey % 20 AS INT), l_linenumber,
                    CAST(l_partkey % 30 AS INT)) AS key
      FROM lineitem
      GROUP BY 1
    ),
    verdicts AS (
      SELECT key, substr(md5(key), 1, 1) IN ('0', '1', '2', '3') AS is_dark FROM hr
    ),
    approved AS (SELECT key FROM verdicts WHERE NOT is_dark),
    lr AS (SELECT key FROM hr),
    lr_kept AS (SELECT l.key FROM lr l WHERE EXISTS (SELECT 1 FROM approved a WHERE a.key = l.key))
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM hr) AS hr_total,
      (SELECT CAST(count(*) AS BIGINT) FROM approved) AS hr_kept,
      (SELECT CAST(count(*) AS BIGINT) FROM lr_kept) AS lr_kept,
      (SELECT CAST(count(*) AS BIGINT) FROM approved a
        WHERE NOT EXISTS (SELECT 1 FROM lr_kept l WHERE l.key = a.key)) AS parity_violations
    """,
)
def imaging_key_parity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    hr = li.select(
        F.format_string(
            "vol%02d__axial__slice_%03d__s%03d",
            (F.col("l_orderkey") % 20).cast("int"),
            F.col("l_linenumber"),
            (F.col("l_partkey") % 30).cast("int"),
        ).alias("key")
    ).distinct()
    from pyspark import StorageLevel

    # The distinct-keys+verdict table feeds all four count branches, which
    # aggregate/join on different shapes (no exchange reuse possible) —
    # persist it so the lineitem scan + distinct runs once, not per branch.
    verdicts = hr.withColumn(
        "is_dark", F.substring(F.md5(F.col("key").cast("binary")), 1, 1).isin("0", "1", "2", "3")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hr = verdicts.select("key")
    approved = verdicts.filter(~F.col("is_dark")).select("key")
    lr_kept = hr.join(approved, "key", "left_semi")
    violations = approved.join(lr_kept, "key", "left_anti")
    # One plan, one action: each count is a single-row agg, cross-joined.
    # (Four driver-side .count() calls would recompute the distinct over
    # lineitem four times; here exchange reuse shares the common subplan.)
    return (
        hr.agg(F.count(F.lit(1)).alias("hr_total"))
        .crossJoin(approved.agg(F.count(F.lit(1)).alias("hr_kept")))
        .crossJoin(lr_kept.agg(F.count(F.lit(1)).alias("lr_kept")))
        .crossJoin(violations.agg(F.count(F.lit(1)).alias("parity_violations")))
    )


# --- rows-only end-to-end pipeline queries (non-SQL-expressible pixels) ---


@query("imaging_pipeline_patches")
def imaging_pipeline_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full imaging dataflow on deterministic synthetic volumes: returns
    per-patch metadata + a payload checksum. Pixel semantics are golden-
    tested in pytest; this exposes the whole lineage to the driver."""
    from ..operators.pipeline import PipelineConfig, run_pipeline
    from ..sources.volumes import synthetic_volumes

    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))
    vols = synthetic_volumes(spark, 2, (32, 32, 6), seed=11)
    return (
        run_pipeline(spark, vols, cfg)
        .select("key", "resolution", "split", "x", "y", "h", "w", "dtype",
                F.md5("value").alias("checksum"))
        .orderBy("key", "resolution")
    )


@query("imaging_snr_metrics")
def imaging_snr_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-volume SNR analytics table (A5-A7/F6-F7) on synthetic volumes."""
    from ..operators.snr import snr_metrics
    from ..sources.volumes import synthetic_volumes

    vols = synthetic_volumes(spark, 3, (24, 24, 8), seed=5)
    m = snr_metrics(vols, mode="chi", n_coils=8)
    return m.select(
        "base",
        F.round("otsu_threshold", 4).alias("otsu_threshold"),
        F.round("brain_frac", 6).alias("brain_frac"),
        F.round("snr_corrected", 4).alias("snr_corrected"),
        "noise_mode",
    ).orderBy("base")


@query("multimodal_feature_extract")
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end (rows-only): synthetic media ->
    decode -> per-item stats + histogram pseudo-embedding. The codec decode
    for real formats is stubbed (no image/audio libs in this container);
    the Spark-side schema/batching/fan-out is the real deliverable."""
    from ..sources.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, n=12, seed=21)
    feats = extract_features(media, embed_dim=16)
    return feats.select(
        "media_id",
        "kind",
        F.round("mean", 6).alias("mean"),
        F.round("std", 6).alias("std"),
        F.round("dark_frac", 6).alias("dark_frac"),
        F.size("embedding").alias("embed_dim"),
    ).orderBy("media_id")


@query("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out (rows-only): every 2nd frame, payload
    checksummed so the driver sees deterministic content."""
    from ..sources.multimodal import sample_frames, synthetic_media

    media = synthetic_media(spark, n=12, seed=21)
    return (
        sample_frames(media, every_k=2)
        .select("media_id", "frame_i", "height", "width", F.md5("payload").alias("checksum"))
        .orderBy("media_id", "frame_i")
    )


@query("imaging_triptych_render")
def imaging_triptych_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 (rows-only): degradation triptych render (HR | 3T | 1.5T) on
    deterministic synthetic volumes — real PNG payloads via the engine's
    codec, exposed to the driver as metadata + content checksums
    (ref: v2/viz_degradation.py:30-91)."""
    from ..operators.viz import render_triptychs
    from ..sources.volumes import synthetic_volumes

    vols = synthetic_volumes(spark, 2, (24, 24, 6), seed=11)
    return (
        render_triptychs(vols, axis="axial", seed=123)
        .select(
            "base", "axis", "slice_idx", "height", "width",
            F.md5("hr_png").alias("hr_checksum"),
            F.md5("triptych_png").alias("triptych_checksum"),
        )
        .orderBy("base")
    )


@query("image_dhash_near_dup")
def image_dhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection via perceptual dHash (rows-only:
    pixels are engine-internal). Corpus = synthetic images plus their
    2x area-downscaled twins; a twin must land within a few Hamming bits
    of its source while unrelated images stay far.

    Scale shape: pixels -> 64-bit hash once (mapInPandas), then banding:
    each hash is keyed by its eight 8-bit sub-bands, candidates come from
    an equi-join on (band_i, band_value) — the pigeonhole guarantee that
    any pair within Hamming distance 7 shares at least one of 8 exact
    bands, so the <= 4 verify threshold below is fully covered (4-band/
    16-bit banding only guaranteed distance 3 and silently missed
    distance-4 pairs whose bits straddled all four bands) — and the
    Hamming verify is bit_count(xor) on longs. No pixel ever crosses a
    shuffle; no all-pairs join exists."""
    import numpy as np
    import pandas as pd
    from pyspark import StorageLevel

    from ..sources.multimodal import MEDIA_SCHEMA, perceptual_dhash, resize_images
    from ..sources.volumes import np_to_npy_bytes

    # Structured (non-separable wave) images: content a resize preserves.
    # dHash is a STRUCTURE hash — on pure white noise, downscaling changes
    # every gradient and no perceptual hash can (or should) match.
    meta = spark.range(8).select(F.col("id").alias("media_id")).repartition(4)

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                i = int(r.media_id)
                y, x = np.mgrid[0:32, 0:32].astype(np.float64)
                kx, ky = 1 + i % 3, 1 + (i * 2) % 3
                arr = (
                    np.sin(2 * np.pi * (kx * x + ky * y) / 32 + i * 0.7)
                    * np.cos(2 * np.pi * (x - 0.6 * ky * y) / 32 + 0.3 * i)
                ) / 4 + 0.5
                arr = arr.astype(np.float32)[..., None].repeat(3, axis=2)
                rows.append(dict(media_id=i, kind="image", mime="image/x-npy",
                                 payload=np_to_npy_bytes(arr), width=32, height=32,
                                 channels=3, sample_rate=0, n_frames=1))
            yield pd.DataFrame(
                rows, columns=[f.split(" ")[0] for f in MEDIA_SCHEMA.split(", ")]
            )

    media = meta.mapInPandas(gen, schema=MEDIA_SCHEMA)
    twins = resize_images(media, 16, 16).withColumn(
        "media_id", F.col("media_id") + F.lit(1000)
    )
    hashes = perceptual_dhash(media.unionByName(twins)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands = hashes.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_i"),
                        F.shiftright("dhash", 8 * i)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("band_v"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("band"),
    ).select("media_id", "dhash", "band.band_i", "band.band_v")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_i") == F.col("b.band_i"))
            & (F.col("a.band_v") == F.col("b.band_v"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= 4)
        .select("media_a", "media_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("media_a", "media_b")
    )


@query(
    "imaging_pipeline_manifest",
    oracle="""
    -- The ENTIRE imaging manifest — slice enumeration (incl. the coronal
    -- sz quirk), crop grids with the trailing-edge rule, 1-based y-then-x
    -- patch indexing, key normalization, LR origin derivation (x//scale),
    -- and the md5 volume-consistent split — recomputed from pure
    -- arithmetic. The Spark side runs the REAL distributed pipeline
    -- (ungated) and exposes everything except pixel bytes; a hash match
    -- proves the lineage's bookkeeping end-to-end.
    WITH vols AS (
      SELECT printf('sub-%03d_T1w', i) AS base FROM range(0, 2) t(i)
    ),
    orients AS (
      SELECT * FROM (VALUES ('axial', 32, 32, 6),
                            ('coronal', 32, 32, 6),
                            ('sagittal', 6, 32, 32)) AS o(orient, h, w, n_slices)
    ),
    slices AS (
      SELECT base, orient, h, w, CAST(i AS INT) AS slice_i
      FROM vols, orients, LATERAL (SELECT unnest(range(0, n_slices)) AS i)
    ),
    grids AS (
      SELECT base, orient, slice_i,
             CASE WHEN h - (list_last(hs0) + 16) > 0
                  THEN list_append(hs0, h - 16) ELSE hs0 END AS h_space,
             CASE WHEN w - (list_last(ws0) + 16) > 0
                  THEN list_append(ws0, w - 16) ELSE ws0 END AS w_space
      FROM (SELECT *, range(0, greatest(h - 16, 0) + 1, 8) AS hs0,
                      range(0, greatest(w - 16, 0) + 1, 8) AS ws0
            FROM slices)
    ),
    hr AS (
      SELECT base, orient, slice_i,
             (yi - 1) * len(w_space) + xi AS idx,
             CAST(w_space[xi] AS INT) AS x, CAST(h_space[yi] AS INT) AS y
      FROM grids,
           LATERAL (SELECT unnest(range(1, len(h_space) + 1)) AS yi),
           LATERAL (SELECT unnest(range(1, len(w_space) + 1)) AS xi)
    ),
    res AS (SELECT * FROM (VALUES ('HR', 1), ('LRx2', 2)) r(resolution, s)),
    pat AS (
      SELECT printf('%s__%s__slice_%03d__s%03d', base, orient, slice_i, idx) AS key,
             resolution, base, orient, slice_i,
             CAST(x // s AS INT) AS x, CAST(y // s AS INT) AS y,
             CAST(16 // s AS INT) AS h, CAST(16 // s AS INT) AS w,
             'float32' AS dtype
      FROM hr, res
    )
    SELECT key, resolution, base, orient, slice_i, x, y, h, w, dtype,
           CASE WHEN substr(md5(base), 1, 4) < 'f333' THEN 'train'
                WHEN substr(md5(base), 1, 4) < 'fae1' THEN 'val'
                ELSE 'test' END AS split
    FROM pat
    ORDER BY key, resolution
    """,
)
def imaging_pipeline_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable manifest of the real pipeline: run the full
    distributed lineage (explode -> degrade -> patch -> split) UNGATED so
    every manifest column is deterministic arithmetic, and project away
    the pixel payloads. The dark gate (the only pixel-dependent manifest
    effect) is verified separately by imaging_key_parity_gate and the
    golden-pinned imaging_pipeline_patches."""
    from ..operators.pipeline import PipelineConfig, assign_split, degrade_and_patch, explode_slices
    from ..sources.volumes import synthetic_volumes

    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))
    vols = synthetic_volumes(spark, 2, (32, 32, 6), seed=11)
    patches = assign_split(degrade_and_patch(explode_slices(vols, cfg), cfg, gated=False), cfg)
    return (
        patches.select(
            "key", "resolution", "base", "orient", "slice_i",
            "x", "y", "h", "w", "dtype", "split",
        )
        .orderBy("key", "resolution")
    )
