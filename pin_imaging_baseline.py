#!/usr/bin/env python
"""Pin an imaging-throughput self-baseline (uniform or skew mode) from N
fresh bench_imaging.py runs.

r9 protocol (r8 verdict demand #2 — the skew pin needed a "decisive third
run" narrative because 3 runs + a bare median carried no spread): >= 5
runs, and the pin now records the same statistics pin_bench_baseline.py
records for the relational bench, in rate form:

- ``host_probe_pin``  median over runs of each run's fixed pure-numpy
                      degradation probe (bench_imaging.host_probe) — a
                      recorded DIAGNOSTIC a live run's probe is compared
                      against when adjudicating a non-ok verdict, never
                      multiplied into the statistic (the r9 skew pin
                      measured the probe anti-correlated with pipeline
                      throughput; see bench_imaging.py's probe block).
- ``stats``           per rate metric: {median, outlier-trimmed spread,
                      downward tail} of the RAW rates across the pin
                      runs — the exact statistic a live run's drift gate
                      computes for itself, so the comparison is
                      statistic-matched on both sides.

The pinned headline rates stay the SHAPE-NEUTRAL ones (patches/s,
payload MB/s): slices/s is not comparable across modes because a skew
run's 960x840 slices carry ~22x the pixels of the uniform 192x192 fleet.
The raw-rate medians also remain pinned for the legacy 2x backstop gate.

Usage: python pin_imaging_baseline.py [--mode skew] [--runs 5] [--note ...]
       [--recompute]   (re-derive stats from the runs already recorded in
                        the pin — for statistic-formula changes that need
                        no new measurement; requires an r9 pin whose runs
                        carry host_probe_sec)
Writes BENCH_IMAGING_SKEW_SELF_BASELINE.json (or the uniform pin file) and
preserves the previous pin's numbers under ``history``. bench_imaging.py's
drift gate then adjudicates every future run of that mode: 2x ratio
backstop + machine verdict (ok / noise-band / host-tail / regressed).
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
from bench_imaging import DRIFT_GATE_METRICS, PIN_FILES, pin_stats  # noqa: E402
# single source of truth for the pin filenames and the trim/tail recipe
# the drift gate compares against; a rename or formula change that
# touched only one copy would silently desynchronize pin and gate

RUN_KEYS = (
    "value", "wall_sec", "patches_per_sec", "payload_mb_per_sec",
    "n_patches", "key_parity_ok", "host_probe_sec", "host_probe_start_end",
    # r10: recorded when present (older runs lack it) — the memory-fault
    # capability of the host the pin was taken on. A pin taken below
    # bench.MEM_FAULT_FLOOR_GB_S would encode backend-throttled rates as
    # the baseline, so pinning refuses floored runs (checked in derive).
    "first_touch_gb_s",
    # r12: the floor-insensitive cpu axis (bench.read_user_cpu_sec) —
    # recorded so full pins on healthy hosts also carry cpu_stats.
    "cpu_user_sec", "patches_per_cpu_user_sec",
)

CPU_METRIC = "patches_per_cpu_user_sec"
CPU_PIN_NOTE = (
    "cpu_stats pin the floor-INSENSITIVE auxiliary rate (patches per "
    "system-wide user-CPU-second, bench.read_user_cpu_sec): the lazy "
    "page backend's fault cost is accounted to stime/off-CPU, never "
    "utime (measured r12, FINDINGS_HOST_MEMORY.md: cold 256 MB "
    "first-touch fill = 10.17 s wall / 10.12 stime / 0.048 utime; "
    "resident re-fill 0.075 s all-utime), so unlike the wall rates this "
    "statistic MAY be pinned on a floored host — a healthy host would "
    "pin the same band. The drift gate consults it advisory-only "
    "(cpu_verdict / cpu_corroboration / cpu_regressed), never in place "
    "of the wall verdict."
)


def derive_cpu_stats(runs: list[dict]) -> dict | None:
    """{median, spread, tail} of the cpu-axis rate across runs carrying
    it, or None when any run lacks the field (a partial pin would gate
    live runs against a band derived from a different run population
    than the wall stats — all-or-nothing keeps the two axes honest)."""
    if not runs or any(not r.get(CPU_METRIC) for r in runs):
        return None
    return {CPU_METRIC: pin_stats([r[CPU_METRIC] for r in runs])}


def derive(runs: list[dict]) -> dict:
    """Every pinned statistic from the recorded runs — one code path for
    fresh pins and --recompute, so the pin is always the derivation of
    its own recorded measurement."""
    probes = [r["host_probe_sec"] for r in runs]
    # Refuse to pin from a memory-floored host (r10): rates measured
    # below bench.MEM_FAULT_FLOOR_GB_S encode the hypervisor's lazy page
    # backend as the baseline — every later healthy run would read as an
    # improbable improvement and a real regression would hide inside the
    # inflated band. Runs without the field (pre-r10 records) pass: their
    # rates were sanity-checked by the rounds that pinned them.
    import bench as _bench

    floored = [
        r["first_touch_gb_s"]
        for r in runs
        if r.get("first_touch_gb_s") is not None
        and r["first_touch_gb_s"] < _bench.MEM_FAULT_FLOOR_GB_S
    ]
    if floored:
        raise SystemExit(
            f"refusing to pin: run(s) measured first-touch {floored} GB/s, "
            f"below the {_bench.MEM_FAULT_FLOOR_GB_S} GB/s memory-fault "
            "floor — this host's rates are backend-throttled, not a "
            "baseline (see BENCH_IMAGING_SKEW_r10.json forensics)"
        )
    stats = {
        m: pin_stats([r[m] for r in runs]) for m in DRIFT_GATE_METRICS
    }
    # r12: a full pin whose runs all carry the cpu axis pins it too, so
    # healthy-host re-pins never need a separate --cpu-augment pass.
    cpu_extra = {}
    cpu_stats = derive_cpu_stats(runs)
    if cpu_stats is not None:
        cpu_extra = {"cpu_stats": cpu_stats, "cpu_pin_note": CPU_PIN_NOTE}
    med = lambda k: round(median(r[k] for r in runs), 2)
    return {
        **cpu_extra,
        "patches_per_sec": med("patches_per_sec"),
        "payload_mb_per_sec": med("payload_mb_per_sec"),
        "wall_sec_median": med("wall_sec"),
        "host_probe_pin": round(median(probes), 5),
        "host_probe_pin_method": (
            "median over pin runs of each run's host_probe_sec "
            "(bench_imaging.host_probe: fixed pure-numpy degrade_slice "
            "workload, median of 5, 1 warmup). DIAGNOSTIC ONLY - the r9 "
            "skew pin measured the single-thread probe ANTI-correlated "
            "with 32-thread pipeline throughput on this host (ratio 1.33 "
            "on the 2nd-fastest run, 0.60 on the slowest), so "
            "probe-normalizing rates amplified the same-tree spread "
            "1.41x -> 2.94x; verdicts run on RAW rates and the probe is "
            "reported as evidence for adjudicating non-ok verdicts"
        ),
        "stats": stats,
        "stats_method": (
            "per rate metric: median + outlier-trimmed spread (single "
            "best and worst run dropped, n>=4) + downward tail (all-runs "
            "median minus worst run) of the RAW rates across the pin "
            "runs - feeds bench_imaging.throughput_verdict (ok / "
            "noise-band / host-tail / regressed); the r8 skew triplet "
            "(194/222/312 p/s, same tree) motivated tail: a slow run "
            "inside the pin's own recorded excursions must read "
            "host-tail mechanically, not via narrative adjudication"
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("uniform", "skew", "skewsmall"), default="skew"
    )
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--note", default="")
    ap.add_argument(
        "--recompute", action="store_true",
        help="re-derive the pinned statistics from the runs already "
             "recorded in the pin file (no new measurement)",
    )
    ap.add_argument(
        "--out", default=None,
        help="override the pin file path (tests; default: the mode's "
             "real pin at the repo root)",
    )
    ap.add_argument(
        "--from-runs-dir", default=None,
        help="with --cpu-augment: derive the cpu stats from the full "
             "bench JSONs already saved in this directory (cpu_run_*.json "
             "from an earlier --save-runs-dir session) instead of running "
             "the bench again — the cpu twin of --recompute.",
    )
    ap.add_argument(
        "--bootstrap-cpu-only", action="store_true",
        help="with --cpu-augment: when no pin exists for the mode, "
             "create a CPU-ONLY pin (no wall statistics — the drift "
             "gate reads wall indeterminate until a healthy-host full "
             "pin lands). For modes introduced on a floored host, where "
             "the full pin path's floor refusal would otherwise leave "
             "the mode unpinnable on every axis.",
    )
    ap.add_argument(
        "--allow-fewer-runs", action="store_true",
        help="with --cpu-augment: accept fewer than 5 runs, recording the "
             "pin as PROVISIONAL (cpu_pin_provisional) with the run count "
             "and the --note as rationale. Exists for hosts whose wall "
             "cost makes the 5-run protocol unaffordable (r12: a floored "
             "skew run cost >1h); the first session that can afford it "
             "must re-augment at full protocol.",
    )
    ap.add_argument(
        "--save-runs-dir", default=None,
        help="with --cpu-augment: also save each run's FULL bench JSON "
             "to this directory (cpu_run_1.json ...) so a round record "
             "can be derived from the final run (re-adjudicated against "
             "the augmented pin) without paying another full run.",
    )
    ap.add_argument(
        "--cpu-augment", action="store_true",
        help="run the bench --runs times and merge ONLY the cpu-axis "
             "statistics (cpu_stats over patches_per_cpu_user_sec) into "
             "the existing pin, leaving every wall statistic untouched. "
             "Allowed on a memory-floored host — the cpu rate is the "
             "floor-insensitive statistic (see CPU_PIN_NOTE) — which is "
             "exactly why this path exists: the wall re-pin refusal "
             "would otherwise leave the cpu axis unpinnable forever on "
             "a host that never clears the floor.",
    )
    args = ap.parse_args()

    out_path = args.out or os.path.join(HERE, PIN_FILES[args.mode])
    prev = None
    try:
        with open(out_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        pass

    if args.cpu_augment:
        if not prev:
            if not args.bootstrap_cpu_only:
                print("--cpu-augment needs an existing pin to merge into; "
                      "take a full pin on a healthy host first (or pass "
                      "--bootstrap-cpu-only for a mode that has never "
                      "been wall-pinnable on this host)", file=sys.stderr)
                return 1
            # CPU-only bootstrap (r13): a NEW mode on a permanently
            # floored host can never take the wall pin first (the full
            # pin path refuses floored hosts by design), yet its cpu
            # axis is exactly the statistic that IS pinnable there.
            # The resulting pin has no wall rate fields, so the drift
            # gate reads wall ok=None (indeterminate, deferred to the
            # first healthy-host full pin) while cpu_verdict adjudicates
            # normally.
            prev = {
                "mode": args.mode,
                "cpu_only_pin": True,
                "note": (
                    "cpu-only pin: wall statistics deferred to the "
                    "first healthy-host full pin (pin tools refuse "
                    "floored wall pins; FINDINGS_HOST_MEMORY.md)"
                ),
            }
        cpu_runs = []
        if args.from_runs_dir:
            import glob as _glob

            for fn in sorted(_glob.glob(
                os.path.join(args.from_runs_dir, "cpu_run_*.json")
            )):
                with open(fn) as f:
                    run = json.load(f)
                if run.get("mode") != args.mode:
                    print(f"{fn} is a {run.get('mode')!r} run, not "
                          f"{args.mode!r}", file=sys.stderr)
                    return 1
                cpu_runs.append(run)
            if not cpu_runs:
                print(f"no cpu_run_*.json in {args.from_runs_dir}",
                      file=sys.stderr)
                return 1
            print(f"deriving cpu stats from {len(cpu_runs)} recorded runs",
                  file=sys.stderr)
        if len(cpu_runs or range(args.runs)) < 5 and not args.allow_fewer_runs:
            print("r9 protocol requires >= 5 runs (spread/tail need the "
                  "trim to mean anything); pass --allow-fewer-runs to "
                  "record a PROVISIONAL pin with rationale", file=sys.stderr)
            return 1
        if args.allow_fewer_runs and not args.note:
            print("--allow-fewer-runs demands a --note rationale",
                  file=sys.stderr)
            return 1
        env = {**os.environ, "SPARK_GRAFT_IMG_MODE": args.mode}
        for i in range(0 if args.from_runs_dir else args.runs):
            print(f"{args.mode} cpu-augment run {i + 1}/{args.runs} ...",
                  file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench_imaging.py")],
                capture_output=True, text=True, check=True, cwd=HERE, env=env,
            )
            run = json.loads(proc.stdout.strip().splitlines()[-1])
            if not run.get("key_parity_ok"):
                print(f"run {i + 1} failed key parity — not pinning",
                      file=sys.stderr)
                return 1
            if not run.get(CPU_METRIC):
                print(f"run {i + 1} carries no {CPU_METRIC} (unreadable "
                      "/proc?) — cannot pin the cpu axis", file=sys.stderr)
                return 1
            cpu_runs.append(run)
            if args.save_runs_dir:
                os.makedirs(args.save_runs_dir, exist_ok=True)
                with open(os.path.join(
                    args.save_runs_dir, f"cpu_run_{i + 1}.json"
                ), "w") as f:
                    json.dump(run, f)
            print(
                f"  wall={run['wall_sec']}s patches/s={run['patches_per_sec']} "
                f"cpu_user={run.get('cpu_user_sec')}s "
                f"patches/cpu_user_s={run[CPU_METRIC]} "
                f"first_touch={run.get('first_touch_gb_s')}GB/s",
                file=sys.stderr, flush=True,
            )
        for i, run in enumerate(cpu_runs):
            if not run.get("key_parity_ok"):
                print(f"recorded run {i + 1} failed key parity — not "
                      "pinning", file=sys.stderr)
                return 1
            if not run.get(CPU_METRIC):
                print(f"recorded run {i + 1} carries no {CPU_METRIC}",
                      file=sys.stderr)
                return 1
        cpu_stats = derive_cpu_stats(cpu_runs)
        assert cpu_stats is not None  # every run checked above
        if prev.get("cpu_only_pin"):
            # Record the geometry the cpu band was measured at — a
            # cpu-only pin has no wall stats to carry it, and the band
            # is only comparable against runs of the same shape.
            for k in ("n_volumes", "shape", "big_shape", "n_slices",
                      "n_patches"):
                if cpu_runs[-1].get(k) is not None:
                    prev[k] = cpu_runs[-1][k]
        prev["cpu_stats"] = cpu_stats
        prev["cpu_pin_note"] = CPU_PIN_NOTE + (
            f" Augmented from {len(cpu_runs)} dedicated runs"
            + (f" ({args.note})" if args.note else "")
            + "; wall statistics untouched."
        )
        if len(cpu_runs) < 5:
            prev["cpu_pin_provisional"] = {
                "n_runs": len(cpu_runs),
                "rationale": args.note,
                "obligation": (
                    "below the 5-run protocol: spread/tail are "
                    "untrimmed (n<4 uses all samples; n=1 pins zero "
                    "spread/tail, leaving only the 15% noise slack as "
                    "the band). The first session that can afford it "
                    "must re-augment at full protocol; until then "
                    "treat cpu_verdicts from this pin as provisional."
                ),
            }
        else:
            prev.pop("cpu_pin_provisional", None)
        prev["cpu_runs"] = [
            {k: r.get(k) for k in (
                "wall_sec", "patches_per_sec", "cpu_user_sec", CPU_METRIC,
                "first_touch_gb_s", "first_touch_start_end",
                "host_probe_sec", "key_parity_ok",
            )}
            for r in cpu_runs
        ]
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(prev, f, indent=1)
        os.replace(tmp, out_path)
        print(json.dumps({"mode": args.mode, "cpu_stats": cpu_stats}))
        return 0

    if args.recompute:
        if not prev or not prev.get("runs"):
            print("no recorded runs to recompute from", file=sys.stderr)
            return 1
        missing = [i for i, r in enumerate(prev["runs"])
                   if "host_probe_sec" not in r]
        if missing:
            print(f"recorded runs {missing} lack host_probe_sec (pre-r9 "
                  "pin); re-run the pin instead", file=sys.stderr)
            return 1
        runs = prev["runs"]
        print(f"recomputing statistics from {len(runs)} recorded runs",
              file=sys.stderr)
    else:
        if args.runs < 5:
            print("r9 protocol requires >= 5 runs (spread/tail need the "
                  "trim to mean anything)", file=sys.stderr)
            return 1
        runs = []
        env = {**os.environ, "SPARK_GRAFT_IMG_MODE": args.mode}
        for i in range(args.runs):
            print(f"{args.mode} pin run {i + 1}/{args.runs} ...",
                  file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench_imaging.py")],
                capture_output=True, text=True, check=True, cwd=HERE, env=env,
            )
            run = json.loads(proc.stdout.strip().splitlines()[-1])
            if not run.get("key_parity_ok"):
                print(f"run {i + 1} failed key parity — not pinning",
                      file=sys.stderr)
                return 1
            runs.append(run)
            print(
                f"  wall={run['wall_sec']}s patches/s={run['patches_per_sec']} "
                f"MB/s={run['payload_mb_per_sec']} probe={run['host_probe_sec']}s",
                file=sys.stderr, flush=True,
            )

    prev_history = {}
    if prev:
        prev_history = {
            "previous_patches_per_sec": prev.get("patches_per_sec"),
            "previous_payload_mb_per_sec": prev.get("payload_mb_per_sec"),
            "previous_host_probe_pin": prev.get("host_probe_pin"),
            "previous_pin_method": prev.get("pin_method"),
        }

    # Geometry/provenance fields: a fresh run's full bench output carries
    # them, but the runs RECORDED in a pin are trimmed to RUN_KEYS — on
    # --recompute they must come from the previous pin's own top level.
    geom = prev if args.recompute else runs[0]
    out = {
        "metric": "imaging_pipeline_throughput",
        "mode": args.mode,
        **derive(runs),
        "slices_per_sec_not_pinned_because": (
            "not shape-neutral: a skew run's 960x840 slices are ~22x the "
            "pixels of the uniform 192x192 fleet — compare patches/s or MB/s"
        ),
        "n_volumes": geom["n_volumes"],
        "shape": geom["shape"],
        "n_slices": geom["n_slices"],
        "n_patches": geom["n_patches"],
        "payload_mb": geom["payload_mb"],
        "geometry": "crop 128 / step 64, scales (2,4), preset 3tFlash "
                    "(reference v2 nii_to_lmdb.py:343-344)",
        "pin_method": (
            f"median of {len(runs)} runs (per-metric median; all runs "
            "recorded), idle host, local[32], pinned by pin_imaging_baseline.py "
            "(r9 protocol: raw-rate stats with trim + tail; probe "
            "recorded as diagnostic only)"
            + ("; statistics recomputed from the recorded runs via "
               "--recompute (no new measurement)" if args.recompute else "")
        ),
        "runs": [{k: r[k] for k in RUN_KEYS if k in r} for r in runs],
        "history": {**prev_history, "note": args.note},
    }
    if "big_shape" in geom:
        out["big_shape"] = geom["big_shape"]
    # Atomic replace: out_path may be the --recompute INPUT (the only copy
    # of the raw measurement) — a truncating open('w') interrupted
    # mid-dump would destroy it.
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, out_path)
    print(json.dumps({k: out[k] for k in (
        "mode", "patches_per_sec", "payload_mb_per_sec", "wall_sec_median",
        "host_probe_pin", "stats")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
