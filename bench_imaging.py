"""Imaging-pipeline throughput bench (the flagship capability).

Runs the full lineage — synthetic volumes -> slice explode -> per-volume
robust normalize -> degradation (per scale) -> patch grid -> fused dark/
approved gate -> split — at the reference's v2 geometry (crop 128 / step 64,
v2/nii_to_lmdb.py:343-344) and reports slices/s and patches/s.

Prints ONE JSON line. Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_IMG_VOLS,
SPARK_GRAFT_IMG_SHAPE (e.g. "192,192,48").

Context for the numbers: each slice runs the degradation once per LR scale
(2 scales here = 2 full k-space/motion/bias/chi-noise passes per slice),
matching the reference's per-slice job (v2/nii_to_lmdb_paralel.py:114-221).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def main() -> None:
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, run_pipeline
    from etl_mri_scripts_spark.session import get_spark
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    n_vols = int(os.environ.get("SPARK_GRAFT_IMG_VOLS", "8"))
    shape = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_IMG_SHAPE", "192,192,48").split(",")
    )
    spark = get_spark("bench-imaging")
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PipelineConfig(crop_hr=128, step_hr=64, scales=(2, 4), preset="3tFlash")
    vols = synthetic_volumes(spark, n_vols, shape, seed=3)

    t0 = time.time()
    out = run_pipeline(spark, vols, cfg)
    stats = (
        out.groupBy("resolution")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("value")).alias("bytes"))
        .collect()
    )
    wall = time.time() - t0

    sx, sy, sz = shape
    n_slices = n_vols * (sz + sz + sy)  # axial + coronal (sz quirk) + sagittal
    n_patches = sum(r["n"] for r in stats)
    by_res = {r["resolution"]: r["n"] for r in stats}
    parity_ok = len(set(by_res.values())) == 1  # J4: equal counts per resolution
    print(
        json.dumps(
            {
                "metric": "imaging_pipeline_throughput",
                "value": round(n_slices / wall, 2),
                "unit": "slices/sec",
                "wall_sec": round(wall, 2),
                "n_volumes": n_vols,
                "shape": list(shape),
                "n_slices": n_slices,
                "n_patches": n_patches,
                "patches_per_sec": round(n_patches / wall, 2),
                "payload_mb": round(sum(r["bytes"] for r in stats) / 1e6, 1),
                "key_parity_ok": parity_ok,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
