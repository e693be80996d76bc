#!/usr/bin/env python
"""Dedicated quiet-host CPU re-measurement of named headline queries.

Exists for r12 verdict demand #6: `text_decontaminate_overlap`'s r12
cpu corroboration read `host-tail` (its single sweep sample landed
outside the pinned band in the direction system-noise tails can push),
leaving it the only floored headline query without a kernel signal that
round. The sweep can't cheaply re-sample one query; this tool can: it
runs ONLY the named queries, N samples each (median + min reported),
with the same measurement primitive as the sweep
(bench.read_user_cpu_sec system-wide user+nice delta per sample), and
adjudicates the median against query_cpu_pins under the cpu-specific
slack (bench.cpu_noise_slack).

The verdict semantics match the sweep's cpu corroboration:
ok / noise-band = the kernel is measured and healthy; host-tail =
still indeterminate (re-run on a quieter host); regressed = a real
finding (user-cpu is floor-insensitive).

Usage:
    python solo_cpu_measure.py --names text_decontaminate_overlap \
        [--samples 7] [--out BENCH_SOLO_x_r13.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from statistics import median

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--samples", type=int, default=7)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]

    sys.path.insert(0, HERE)
    import bench
    from etl_mri_scripts_spark.operators.pipeline import arrow_batch_restore
    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpu_pins = bench.load_query_cpu_pins(
        os.path.join(HERE, "BENCH_SELF_BASELINE.json")
    ) or {}

    spark = get_spark("solo-cpu-measure")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        with arrow_batch_restore(spark):
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    # session/JIT warmup + one unrecorded pass of each target so every
    # recorded sample sees a compiled plan (the pins' medians-of-5 also
    # absorb their compile in the discarded-by-median first run)
    for warm in ["flagship_revenue_by_region_priority", *names]:
        try:
            run(warm)
        except Exception:
            pass

    mem_probe = bench.host_memory_probe()
    results = {}
    for name in names:
        if name not in QUERIES:
            results[name] = {"error": "not registered"}
            continue
        samples = []
        for _ in range(args.samples):
            c0 = bench.read_user_cpu_sec()
            run(name)
            c1 = bench.read_user_cpu_sec()
            if c0 is not None and c1 is not None:
                samples.append(round(c1 - c0, 4))
        med = round(median(samples), 4)
        rec = {
            "cpu_user_samples": samples,
            "cpu_user_median": med,
            "cpu_user_min": min(samples),
        }
        pin = cpu_pins.get(name)
        if pin:
            rec["cpu_pin"] = pin
            rec["cpu_verdict_median"] = bench.query_verdicts(
                {name: med}, cpu_pins, slack_fn=bench.cpu_noise_slack
            )[name]
            # the min sample is the least noise-contaminated single
            # measurement — a min inside the band bounds the kernel
            # even when the median carries tail noise
            rec["cpu_verdict_min"] = bench.query_verdicts(
                {name: min(samples)}, cpu_pins, slack_fn=bench.cpu_noise_slack
            )[name]
        else:
            rec["cpu_verdict_median"] = "no-pin"
        results[name] = rec

    out = {
        "metric": "solo_cpu_measurement",
        "samples_per_query": args.samples,
        "sf_dir": sf_dir,
        "first_touch_gb_s": mem_probe,
        "queries": results,
        "note": (
            "dedicated re-measurement outside the sweep: median-of-"
            f"{args.samples} RAW system-wide cpu_user seconds per query, "
            "adjudicated against query_cpu_pins under cpu_noise_slack; "
            "cpu_verdict_min additionally bounds the kernel from below "
            "(a single clean sample inside the band proves the kernel "
            "can still do the work at pinned cost)"
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
