#!/usr/bin/env python
"""Interleaved A/B of one registered query across two trees (r10,
generalizing ab_semdedup.py — the r9 recipe the drift gate's escalation
policy points at).

Each arm is a fresh process: one Spark session, 1 warmup + N timed
noop-sink runs, median reported; R rounds per arm, interleaved ABAB so
slow host phases hit both arms equally (the r9 lesson: cross-session
comparisons of single runs adjudicate host weather, not kernels).

Usage:
  git worktree add .ab_old <ref>          # the B arm
  python ab_query.py <query> .ab_old [--runs 5] [--rounds 3] \
      [--sf /root/testdata/sf0.1] [--out BENCH_AB_<query>_rN.json]
  git worktree remove .ab_old             # ALWAYS remove (stray full
                                          # checkouts inflate LoC scans)
"""

from __future__ import annotations

import argparse
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
query, sf, runs = sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = get_spark("ab-query")
spark.sparkContext.setLogLevel("ERROR")
def run():
    t0 = time.perf_counter()
    QUERIES[query](spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
run()  # warmup
samples = [run() for _ in range(runs)]
print(json.dumps({"samples": [round(s, 4) for s in samples],
                  "median": round(median(samples), 4)}))
spark.stop()
'''


def arm(tree: str, query: str, sf: str, runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, query, sf, str(runs)],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("old_tree", help="worktree checkout of the B-arm ref")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cur = os.path.dirname(os.path.abspath(__file__))
    old = os.path.abspath(args.old_tree)
    rounds: dict[str, list] = {"current": [], "old": []}
    for i in range(args.rounds):
        for name, tree in (("current", cur), ("old", old)):
            r = arm(tree, args.query, args.sf, args.runs)
            rounds[name].append(r)
            print(f"round {i + 1} {name}: {r}", file=sys.stderr, flush=True)
    summary: dict = {
        "query": args.query,
        "sf": args.sf,
        "protocol": (
            f"interleaved ABAB x{args.rounds}, fresh process per arm, "
            f"1 warmup + {args.runs} timed runs, median per arm-round, "
            "median-of-medians compared"
        ),
    }
    for name, rs in rounds.items():
        summary[name] = {
            "run_medians": [r["median"] for r in rs],
            "median_of_medians": round(median(r["median"] for r in rs), 4),
        }
    summary["ratio_current_over_old"] = round(
        summary["current"]["median_of_medians"]
        / summary["old"]["median_of_medians"], 4,
    )
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
