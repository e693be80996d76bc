"""Imaging-pipeline throughput bench (the flagship capability).

Runs the full lineage — synthetic volumes -> slice explode -> per-volume
robust normalize -> degradation (per scale) -> patch grid -> fused dark/
approved gate -> split — at the reference's v2 geometry (crop 128 / step 64,
v2/nii_to_lmdb.py:343-344) and reports slices/s and patches/s.

Prints ONE JSON line. Env:
  SPARK_GRAFT_CPUS        local[N]
  SPARK_GRAFT_IMG_VOLS    number of (small) volumes, default 8
  SPARK_GRAFT_IMG_SHAPE   small-volume shape, default "192,192,48"
  SPARK_GRAFT_IMG_MODE    "uniform" (default) or "skew"
  SPARK_GRAFT_IMG_BIG_SHAPE  skew mode's single big volume, default
                          "960,840,640" — the reference's worst case
                          (show_images.py:21-23, SURVEY §4 fan-out risk):
                          a 2.06 GB float32 volume fanning out into
                          ~2,100 slices of ~3.2 MB.

Skew mode ingests that one big volume SLAB-WISE (synthetic_volume_slabs
-> explode_slab_slices) and unions its slices with the small monolithic
fleet inside run_pipeline. Slab ingest is not an optimization, it is the
only correct path: shipping the volume as one 2.06 GB Arrow cell trips
Spark's python-runner buffer growth past 1 GiB (capacity<<1 overflows
int; growth degenerates to a full-buffer copy per chunk write — measured
live as 400+ s of serializer CPU with no progress), and anything past
2.147 GB fails outright on int32 Arrow offsets. As ~280 bounded slabs
the big volume's explode also parallelizes across the cluster instead
of running as one straggler task; repartition-after-explode then
spreads patch/degradation work as in the uniform case.

Context for the numbers: each slice runs the degradation once per LR scale
(2 scales here = 2 full k-space/motion/bias/chi-noise passes per slice),
matching the reference's per-slice job (v2/nii_to_lmdb_paralel.py:114-221).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def _slices_for(n_vols: int, shape: tuple[int, int, int]) -> int:
    sx, sy, sz = shape
    return n_vols * (sz + sz + sy)  # axial + coronal (sz quirk) + sagittal


def main() -> None:
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, run_pipeline
    from etl_mri_scripts_spark.session import get_spark
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    n_vols = int(os.environ.get("SPARK_GRAFT_IMG_VOLS", "8"))
    shape = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_IMG_SHAPE", "192,192,48").split(",")
    )
    mode = os.environ.get("SPARK_GRAFT_IMG_MODE", "uniform")
    if mode not in ("uniform", "skew"):
        raise SystemExit(f"SPARK_GRAFT_IMG_MODE must be 'uniform' or 'skew', got {mode!r}")
    spark = get_spark("bench-imaging")
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PipelineConfig(crop_hr=128, step_hr=64, scales=(2, 4), preset="3tFlash")
    vols = synthetic_volumes(spark, n_vols, shape, seed=3)
    n_slices = _slices_for(n_vols, shape)
    big_shape: tuple[int, int, int] | None = None
    slabs = None
    if mode == "skew":
        from etl_mri_scripts_spark.sources.volumes import synthetic_volume_slabs

        big_shape = tuple(
            int(x)
            for x in os.environ.get("SPARK_GRAFT_IMG_BIG_SHAPE", "960,840,640").split(",")
        )
        slabs = synthetic_volume_slabs(
            spark, 1, big_shape, seed=11, pmin=cfg.pmin, pmax=cfg.pmax
        )
        n_slices += _slices_for(1, big_shape)

    from etl_mri_scripts_spark.operators.pipeline import volume_batch_scope

    t0 = time.time()
    # volume_batch_scope: the Arrow batch shrink is live while the collect
    # executes the imaging plan and restored when the job completes, so a
    # session reused after this driver sees the default batch size.
    with volume_batch_scope(spark):
        out = run_pipeline(spark, vols, cfg, slabs=slabs)
        stats = (
            out.groupBy("resolution")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("value")).alias("bytes"))
            .collect()
        )
    wall = time.time() - t0

    n_patches = sum(r["n"] for r in stats)
    by_res = {r["resolution"]: r["n"] for r in stats}
    parity_ok = len(set(by_res.values())) == 1  # J4: equal counts per resolution
    payload_mb = round(sum(r["bytes"] for r in stats) / 1e6, 1)
    result = {
        "metric": "imaging_pipeline_throughput",
        "value": round(n_slices / wall, 2),
        "unit": "slices/sec",
        "wall_sec": round(wall, 2),
        "mode": mode,
        "n_volumes": n_vols + (1 if big_shape else 0),
        "shape": list(shape),
        "n_slices": n_slices,
        "n_patches": n_patches,
        "patches_per_sec": round(n_patches / wall, 2),
        "payload_mb": payload_mb,
        "payload_mb_per_sec": round(payload_mb / wall, 2),
        "key_parity_ok": parity_ok,
    }
    if big_shape:
        result["big_shape"] = list(big_shape)
    result["drift_gate"] = _drift_gate(mode, result)
    print(json.dumps(result))
    spark.stop()


# slices/sec is NOT shape-neutral (a 960x840 slice is ~22x the pixels of a
# 192x192 one) — the drift gate compares only the shape-neutral rates.
DRIFT_GATE_METRICS = ("patches_per_sec", "payload_mb_per_sec")
DRIFT_GATE_MAX = 2.0
PIN_FILES = {
    "uniform": "BENCH_IMAGING_SELF_BASELINE.json",
    "skew": "BENCH_IMAGING_SKEW_SELF_BASELINE.json",
}


def _drift_gate(mode: str, result: dict, pin_dir: str | None = None) -> dict:
    """2x throughput-drift gate against the mode-matched self-pin (r6
    verdict demand #2): ratio = pinned/observed on the shape-neutral
    rates; ok iff every comparable metric is within DRIFT_GATE_MAX. The
    "absent number is not evidence" rule applies to the PIN side only: a
    missing pin file — or a pin with no comparable rate fields — reports
    ok=None (bootstrap/indeterminate), NEVER ok=False. But a metric the
    pin DOES carry that the observed run reports as 0/missing is
    evidence — of a broken measurement — and fails the gate loudly
    (r7 ADVICE: the old falsy-skip masked a zero observed rate as
    indeterminate). ``pin_dir`` overrides the pin location (tests)."""
    pin_path = os.path.join(
        pin_dir or os.path.dirname(os.path.abspath(__file__)), PIN_FILES[mode]
    )
    try:
        with open(pin_path) as f:
            pin = json.load(f)
    except (OSError, ValueError):
        return {"pin_file": PIN_FILES[mode], "pinned": None, "ok": None,
                "note": "no pin recorded for this mode yet"}
    ratios = {}
    broken_run = []  # pinned metrics whose observed value is 0/missing
    broken_pin = []  # metrics the pin carries as 0 — a pin from a broken run
    for m in DRIFT_GATE_METRICS:
        pv = pin.get(m)
        if pv is None:
            continue  # pin never recorded this rate -> not comparable
        if not pv:
            # A pinned rate of 0/0.0 is the same class of broken
            # measurement the observed side fails loudly on — an
            # indeterminate skip here would hide the broken pin forever
            # and let ok=True ride on the remaining metric (r8 review).
            broken_pin.append(m)
            continue
        if result.get(m):
            ratios[m] = round(pv / result[m], 3)
        else:
            broken_run.append(m)
    out = {
        "pin_file": PIN_FILES[mode],
        "pinned": {m: pin.get(m) for m in DRIFT_GATE_METRICS},
        "ratio_pin_over_observed": ratios,
        "max_allowed": DRIFT_GATE_MAX,
        "ok": (
            False
            if broken_run or broken_pin
            else all(r <= DRIFT_GATE_MAX for r in ratios.values()) if ratios else None
        ),
    }
    notes = []
    if broken_run:
        notes.append(
            f"pinned metric(s) {broken_run} observed as 0/missing — broken run"
        )
    if broken_pin:
        notes.append(
            f"pin carries metric(s) {broken_pin} as 0 — broken pin, re-pin "
            "with pin_imaging_baseline.py"
        )
    if notes:
        out["note"] = "; ".join(notes)
    elif not ratios:
        out["note"] = "pin exists but has no comparable rate fields"
    return out


if __name__ == "__main__":
    main()
