#!/usr/bin/env python
"""A/B dedup_semantic_keep: r7-end kernel (0392d3d) vs current tree,
interleaved ABAB on the same host back-to-back (r8 verdict demand #3:
record whether the r8 1.30x raw drift was host or kernel). Each arm is a
fresh process: one Spark session, 1 warmup + 5 timed noop-sink runs,
median reported; 3 rounds per arm, interleaved so slow host phases hit
both arms equally."""

import json
import os
import subprocess
import sys
from statistics import median

RUNNER = r'''
import sys, time, json
sys.path.insert(0, sys.argv[1])
from statistics import median
from etl_mri_scripts_spark.session import get_spark
from etl_mri_scripts_spark.queries import QUERIES
spark = get_spark("ab-semdedup")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
def run():
    t0 = time.perf_counter()
    QUERIES["dedup_semantic_keep"](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
run()  # warmup
samples = [run() for _ in range(5)]
print(json.dumps({"samples": [round(s, 4) for s in samples],
                  "median": round(median(samples), 4)}))
spark.stop()
'''


def arm(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, tree],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    cur = "/root/repo"
    old = sys.argv[1]  # worktree checkout of 0392d3d
    rounds = {"r8_current": [], "r7_kernel": []}
    for i in range(3):
        for name, tree in (("r8_current", cur), ("r7_kernel", old)):
            r = arm(tree)
            rounds[name].append(r)
            print(f"round {i+1} {name}: {r}", file=sys.stderr, flush=True)
    summary = {
        name: {
            "run_medians": [r["median"] for r in rs],
            "median_of_medians": round(median(r["median"] for r in rs), 4),
        }
        for name, rs in rounds.items()
    }
    summary["ratio_r8_over_r7"] = round(
        summary["r8_current"]["median_of_medians"]
        / summary["r7_kernel"]["median_of_medians"], 4,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
