#!/usr/bin/env python
"""Pin an imaging-throughput self-baseline (uniform or skew mode) from N
fresh bench_imaging.py runs — median-of-runs per metric, all runs recorded
(the same protocol as the r6 uniform pin, now scripted; r6 verdict demand
#2 asked for the skew pin specifically).

The pinned rates are the SHAPE-NEUTRAL ones (patches/s, payload MB/s):
slices/s is not comparable across modes because a skew run's 960x840
slices carry ~22x the pixels of the uniform 192x192 fleet.

Usage: python pin_imaging_baseline.py [--mode skew] [--runs 3] [--note ...]
Writes BENCH_IMAGING_SKEW_SELF_BASELINE.json (or the uniform pin file) and
preserves the previous pin's numbers under ``history``. bench_imaging.py's
drift gate then compares every future run of that mode against the pin
(ratio <= 2x on each pinned rate).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from statistics import median

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from bench_imaging import PIN_FILES  # noqa: E402 — single source of truth
# for the pin filenames the drift gate reads; a rename that touched only
# one copy would leave the gate permanently reporting "no pin recorded"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("uniform", "skew"), default="skew")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    runs: list[dict] = []
    env = {**os.environ, "SPARK_GRAFT_IMG_MODE": args.mode}
    for i in range(args.runs):
        print(f"{args.mode} pin run {i + 1}/{args.runs} ...", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench_imaging.py")],
            capture_output=True, text=True, check=True, cwd=HERE, env=env,
        )
        run = json.loads(proc.stdout.strip().splitlines()[-1])
        if not run.get("key_parity_ok"):
            print(f"run {i + 1} failed key parity — not pinning", file=sys.stderr)
            return 1
        runs.append(run)
        print(
            f"  wall={run['wall_sec']}s patches/s={run['patches_per_sec']} "
            f"MB/s={run['payload_mb_per_sec']}",
            file=sys.stderr, flush=True,
        )

    out_path = os.path.join(HERE, PIN_FILES[args.mode])
    prev_history = {}
    try:
        with open(out_path) as f:
            prev = json.load(f)
        prev_history = {
            "previous_patches_per_sec": prev.get("patches_per_sec"),
            "previous_payload_mb_per_sec": prev.get("payload_mb_per_sec"),
            "previous_pin_method": prev.get("pin_method"),
        }
    except (OSError, ValueError):
        pass

    med = lambda k: round(median(r[k] for r in runs), 2)
    first = runs[0]
    out = {
        "metric": "imaging_pipeline_throughput",
        "mode": args.mode,
        "patches_per_sec": med("patches_per_sec"),
        "payload_mb_per_sec": med("payload_mb_per_sec"),
        "slices_per_sec_not_pinned_because": (
            "not shape-neutral: a skew run's 960x840 slices are ~22x the "
            "pixels of the uniform 192x192 fleet — compare patches/s or MB/s"
        ),
        "wall_sec_median": med("wall_sec"),
        "n_volumes": first["n_volumes"],
        "shape": first["shape"],
        "n_slices": first["n_slices"],
        "n_patches": first["n_patches"],
        "payload_mb": first["payload_mb"],
        "geometry": "crop 128 / step 64, scales (2,4), preset 3tFlash "
                    "(reference v2 nii_to_lmdb.py:343-344)",
        "pin_method": (
            f"median of {args.runs} runs (per-metric median; all runs "
            "recorded), idle host, local[32], pinned by pin_imaging_baseline.py"
        ),
        "runs": [
            {k: r[k] for k in (
                "value", "wall_sec", "patches_per_sec", "payload_mb_per_sec",
                "n_patches", "key_parity_ok")}
            for r in runs
        ],
        "history": {**prev_history, "note": args.note},
    }
    if "big_shape" in first:
        out["big_shape"] = first["big_shape"]
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in (
        "mode", "patches_per_sec", "payload_mb_per_sec", "wall_sec_median")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
