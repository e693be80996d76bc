"""Command-line surface mirroring the reference's entry-point scripts.

A user of the reference drives it through argparse scripts; this module
maps each of those commands onto the Spark engine so the switch is a
command swap, not a rewrite:

    python -m etl_mri_scripts_spark nii-to-lmdb   ~ v2/nii_to_lmdb.py:336-368
    python -m etl_mri_scripts_spark slice-generate ~ slice_generator.py:192-205
    python -m etl_mri_scripts_spark viz-degradation ~ v2/viz_degradation.py:30-45
    python -m etl_mri_scripts_spark create-sample  ~ create_sample.py:28-78
    python -m etl_mri_scripts_spark estimate-snr   ~ v2/estimate_snr.py:340-411
    python -m etl_mri_scripts_spark show-images    ~ show_images.py:32-40 (contact sheet)
    python -m etl_mri_scripts_spark test-filter    ~ test_filter.py:35-44 (verdict sheet)

Flag names and defaults follow the reference scripts verbatim where the
concept survives (geometry, thresholds, presets, ratios, seeds). Sink
differences are deliberate: the system of record is partitioned parquet
(operators/pipeline.write_dataset) rather than LMDB environments — the
LMDB export remains available via sources/lmdb_export for byte-level
compatibility.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _spark(cpus: int | None = None) -> SparkSession:
    from .session import get_spark

    return get_spark("etl-mri-spark-cli", cpus=cpus)


def _load_volumes(spark: SparkSession, input_dir: str, pattern: str):
    from .sources.volumes import decode_nifti, scan_nifti

    return decode_nifti(scan_nifti(spark, input_dir, path_regex=pattern))


def cmd_nii_to_lmdb(args: argparse.Namespace) -> int:
    """The v2 sequential driver: NIfTI tree -> degraded HR/LR patch dataset
    (ref v2/nii_to_lmdb.py:336-368). Geometry/threshold/preset defaults
    match the reference CLI."""
    from .operators.pipeline import PipelineConfig, run_pipeline, write_dataset

    spark = _spark(args.cpus)
    cfg = PipelineConfig(
        crop_hr=args.crop_hr,
        step_hr=args.step_hr,
        thresh_size=args.thresh_size,
        scales=tuple(args.scales),
        preset=args.preset,
        dtype_out=args.dtype_out,
        pmin=args.pmin,
        pmax=args.pmax,
        split_ratios=(args.train_ratio, args.val_ratio,
                      max(0.0, 1.0 - args.train_ratio - args.val_ratio)),
        seed=args.seed,
    )
    vols = _load_volumes(spark, args.input_dir, args.pattern)
    patches = run_pipeline(spark, vols, cfg)
    write_dataset(patches, args.output_dir)
    print(json.dumps({"command": "nii-to-lmdb", "output": args.output_dir}))
    return 0


def cmd_slice_generate(args: argparse.Namespace) -> int:
    """The v1 driver: volumes -> normalized slices -> patch grid
    (ref slice_generator.py:192-205; v1 geometry crop 480/step 240)."""
    from .operators.pipeline import PipelineConfig, run_pipeline, write_dataset

    spark = _spark(args.cpus)
    cfg = PipelineConfig(
        crop_hr=args.crop_hr,
        step_hr=args.step_hr,
        scales=tuple(args.scales),
        split_ratios=(0.4, 0.3, 0.3),  # v1 ratios (utils_scripts.py:48-50)
    )
    vols = _load_volumes(spark, args.input_dir, args.pattern)
    write_dataset(run_pipeline(spark, vols, cfg), args.output_dir)
    print(json.dumps({"command": "slice-generate", "output": args.output_dir}))
    return 0


def cmd_viz_degradation(args: argparse.Namespace) -> int:
    """Degradation triptych for one volume/axis/slice
    (ref v2/viz_degradation.py:30-45)."""
    from .operators.viz import render_triptychs, write_triptych_tree

    spark = _spark(args.cpus)
    vols = _load_volumes(spark, args.nii_dir, args.pattern)
    trips = render_triptychs(
        vols, axis=args.axis, slice_idx=args.slice, seed=args.seed
    )
    write_triptych_tree(trips, args.out)
    print(json.dumps({"command": "viz-degradation", "output": args.out}))
    return 0


def cmd_create_sample(args: argparse.Namespace) -> int:
    """Middle-N slice HR/LR PNG sampler (ref create_sample.py:28-78):
    num_slices around the volume middle, rot90 for display, written as
    real PNG files."""
    from pyspark.sql import functions as F

    from .operators.pipeline import PipelineConfig, explode_slices
    from .sources.multimodal import write_png_tree

    spark = _spark(args.cpus)
    vols = _load_volumes(spark, args.input_dir, args.pattern)
    slices = explode_slices(vols, PipelineConfig(pmin=args.pmin, pmax=args.pmax))
    # middle-N per volume/orientation on metadata only (no pixel read):
    # slice counts are already columns, so the window is over tiny rows
    from pyspark.sql.window import Window

    mid = (
        slices.filter(F.col("orient") == args.axis)
        .withColumn(
            "n_in_vol",
            F.count(F.lit(1)).over(Window.partitionBy("base", "orient")),
        )
        .withColumn("start", (F.col("n_in_vol") / 2 - args.num_slices / 2).cast("int"))
        .filter(
            (F.col("slice_i") >= F.col("start"))
            & (F.col("slice_i") < F.col("start") + args.num_slices)
        )
    )

    import numpy as np
    import pandas as pd

    from .sources.volumes import np_to_npy_bytes, npy_bytes_to_np

    def to_uint8_png_rows(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = npy_bytes_to_np(bytes(r.pixels))
                img8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
                img8 = np.rot90(img8)  # display rotation (create_sample.py:62)
                rows.append(
                    dict(
                        key=f"{r.base}_{args.axis}_slice_{int(r.slice_i):03d}",
                        payload=np_to_npy_bytes(img8, "uint8"),
                    )
                )
            yield pd.DataFrame(rows, columns=["key", "payload"])

    png_rows = mid.select("base", "slice_i", "pixels").mapInPandas(
        to_uint8_png_rows, schema="key string, payload binary"
    )
    write_png_tree(png_rows, args.output_dir, compression=3)
    print(json.dumps({"command": "create-sample", "output": args.output_dir}))
    return 0


def cmd_estimate_snr(args: argparse.Namespace) -> int:
    """Per-volume SNR analytics report (ref v2/estimate_snr.py:340-411):
    Otsu brain/air masks, de-biased background sigma, SNR table printed as
    JSON lines and optionally written as parquet."""
    from .operators.snr import snr_metrics

    spark = _spark(args.cpus)
    vols = _load_volumes(spark, args.input_dir, args.pattern)
    rep = snr_metrics(vols)
    persisted = False
    try:
        if args.output_dir:
            # write + collect below both consume rep: one decode/analyze pass
            rep = rep.persist()
            persisted = True
            rep.write.mode("overwrite").parquet(args.output_dir)
        for row in rep.collect():
            print(json.dumps(row.asDict(), default=float))
    finally:
        if persisted:
            rep.unpersist()
    return 0


def cmd_show_images(args: argparse.Namespace) -> int:
    """Non-interactive equivalent of the reference's slice viewer
    (ref show_images.py:32-40): instead of a matplotlib window stepping
    through slices, render ONE contact-sheet PNG per (volume, orientation)
    — every k-th slice tiled into a grid — as a distributed grouped map.
    Pixels stay on executors; only finished PNGs land on disk."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from .operators.pipeline import PipelineConfig, explode_slices
    from .sources.multimodal import write_png_tree
    from .sources.volumes import np_to_npy_bytes, npy_bytes_to_np

    spark = _spark(args.cpus)
    vols = _load_volumes(spark, args.input_dir, args.pattern)
    slices = explode_slices(vols, PipelineConfig())
    picked = slices.filter(F.col("slice_i") % args.every_k == 0)

    def mosaic(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("slice_i")
        imgs = [npy_bytes_to_np(bytes(b)) for b in pdf["pixels"]]
        if not imgs:
            return pd.DataFrame(columns=["key", "payload"])
        h = max(a.shape[0] for a in imgs)
        w = max(a.shape[1] for a in imgs)
        cols = max(int(math.ceil(math.sqrt(len(imgs)))), 1)
        rows_n = int(math.ceil(len(imgs) / cols))
        sheet = np.zeros((rows_n * h, cols * w), dtype=np.float32)
        for j, a in enumerate(imgs):
            r, c = divmod(j, cols)
            sheet[r * h : r * h + a.shape[0], c * w : c * w + a.shape[1]] = a
        img8 = np.clip(sheet * 255.0, 0, 255).astype(np.uint8)
        key = f"{pdf['base'].iloc[0]}__{pdf['orient'].iloc[0]}__sheet"
        return pd.DataFrame([{"key": key, "payload": np_to_npy_bytes(img8, "uint8")}])

    sheets = picked.select("base", "orient", "slice_i", "pixels").groupBy(
        "base", "orient"
    ).applyInPandas(mosaic, schema="key string, payload binary")
    write_png_tree(sheets, args.output_dir, compression=3)
    print(json.dumps({"command": "show-images", "output": args.output_dir}))
    return 0


def cmd_test_filter(args: argparse.Namespace) -> int:
    """Non-interactive equivalent of the reference's dark-filter inspector
    (ref test_filter.py:35-44): instead of cv2.imshow + keyboard stepping,
    every patch is written as a PNG whose filename carries the verdict
    (KEEP/DISCARD), plus a JSON summary of the keep rate — reviewable at
    corpus scale instead of one keypress at a time."""
    from pyspark.sql import functions as F

    from .operators.pipeline import PipelineConfig, degrade_and_patch, explode_slices
    from .sources.multimodal import write_png_tree
    from .sources.volumes import np_to_npy_bytes, npy_bytes_to_np

    spark = _spark(args.cpus)
    vols = _load_volumes(spark, args.input_dir, args.pattern)
    cfg = PipelineConfig(crop_hr=args.crop, step_hr=args.step, scales=())
    # Two consumers (PNG tree write, stats aggregate) — persist so the
    # expensive decode+degradation lineage executes once, not twice.
    patches = degrade_and_patch(explode_slices(vols, cfg), cfg, gated=False).filter(
        F.col("resolution") == "HR"
    ).persist()

    import pandas as pd

    def to_png(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = npy_bytes_to_np(bytes(r.value))
                img8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
                verdict = "DISCARD" if r.is_dark else "KEEP"
                rows.append(
                    dict(key=f"{verdict}__{r.full_key}", payload=np_to_npy_bytes(img8, "uint8"))
                )
            yield pd.DataFrame(rows, columns=["key", "payload"])

    try:
        annotated = patches.select("full_key", "is_dark", "value").mapInPandas(
            to_png, schema="key string, payload binary"
        )
        write_png_tree(annotated, args.output_dir, compression=3)
        stats = patches.agg(
            F.count(F.lit(1)).alias("n_patches"),
            F.count(F.when(F.col("is_dark"), 1)).alias("n_dark"),
        ).collect()[0]
    finally:
        patches.unpersist()
    print(
        json.dumps(
            {
                "command": "test-filter",
                "output": args.output_dir,
                "n_patches": stats["n_patches"],
                "n_dark": stats["n_dark"],
            }
        )
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="etl_mri_scripts_spark",
        description="Spark-native drop-in for the reference ETL-MRI scripts",
    )
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    sub = p.add_subparsers(dest="command", required=True)

    nl = sub.add_parser("nii-to-lmdb", help="v2 sequential pipeline")
    nl.add_argument("--input_dir", required=True)
    nl.add_argument("--output_dir", required=True)
    nl.add_argument("--pattern", default=r".*/anat/.*\.nii(\.gz)?$")
    nl.add_argument("--scales", nargs="*", type=int, default=[2])
    nl.add_argument("--crop_hr", type=int, default=128)
    nl.add_argument("--step_hr", type=int, default=64)
    nl.add_argument("--thresh_size", type=int, default=0)
    nl.add_argument("--dtype_out", choices=["float32", "float16"], default="float32")
    nl.add_argument("--preset", default="3tFlash")
    nl.add_argument("--pmin", type=float, default=1.0)
    nl.add_argument("--pmax", type=float, default=99.0)
    nl.add_argument("--seed", type=int, default=123)
    nl.add_argument("--train_ratio", type=float, default=0.95)
    nl.add_argument("--val_ratio", type=float, default=0.03)
    nl.set_defaults(func=cmd_nii_to_lmdb)

    sg = sub.add_parser("slice-generate", help="v1 pipeline")
    sg.add_argument("--input_dir", required=True)
    sg.add_argument("--output_dir", required=True)
    sg.add_argument("--pattern", default=r".*/anat/.*nii.gz")
    sg.add_argument("--scales", nargs="*", type=int, default=[2, 4])
    sg.add_argument("--crop_hr", type=int, default=480)
    sg.add_argument("--step_hr", type=int, default=240)
    sg.set_defaults(func=cmd_slice_generate)

    vd = sub.add_parser("viz-degradation", help="triptych renderer")
    vd.add_argument("--nii_dir", required=True)
    vd.add_argument("--pattern", default=r".*\.nii(\.gz)?$")
    vd.add_argument("--axis", default="axial",
                    choices=["axial", "coronal", "sagittal"])
    vd.add_argument("--slice", type=int, default=None)
    vd.add_argument("--out", required=True)
    vd.add_argument("--seed", type=int, default=123)
    vd.set_defaults(func=cmd_viz_degradation)

    cs = sub.add_parser("create-sample", help="middle-N slice PNG sampler")
    cs.add_argument("--input_dir", required=True)
    cs.add_argument("--output_dir", required=True)
    cs.add_argument("--pattern", default=r".*\.nii(\.gz)?$")
    cs.add_argument("--axis", default="axial",
                    choices=["axial", "coronal", "sagittal"])
    cs.add_argument("--num_slices", type=int, default=100)
    cs.add_argument("--pmin", type=float, default=1.0)
    cs.add_argument("--pmax", type=float, default=99.0)
    cs.set_defaults(func=cmd_create_sample)

    es = sub.add_parser("estimate-snr", help="SNR analytics report")
    es.add_argument("--input_dir", required=True)
    es.add_argument("--pattern", default=r".*\.nii(\.gz)?$")
    es.add_argument("--output_dir", default=None)
    es.set_defaults(func=cmd_estimate_snr)

    si = sub.add_parser("show-images", help="contact-sheet slice viewer (non-interactive)")
    si.add_argument("--input_dir", required=True)
    si.add_argument("--output_dir", required=True)
    si.add_argument("--pattern", default=r".*\.nii(\.gz)?$")
    si.add_argument("--every_k", type=int, default=4)
    si.set_defaults(func=cmd_show_images)

    tf = sub.add_parser("test-filter", help="dark-filter verdict sheet (non-interactive)")
    tf.add_argument("--input_dir", required=True)
    tf.add_argument("--output_dir", required=True)
    tf.add_argument("--pattern", default=r".*\.nii(\.gz)?$")
    tf.add_argument("--crop", type=int, default=64)
    tf.add_argument("--step", type=int, default=64)
    tf.set_defaults(func=cmd_test_filter)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
