#!/usr/bin/env python
"""Capture .explain('formatted') plans + empirical Spark job counts for the
queries touched in optimization round r14.

Usage: python capture_plans_r14.py <tree_path> <suffix> [query ...]
  tree_path  repo tree to import the engine from (/root/repo or the
             worktree of the pre-round commit)
  suffix     'before' or 'after' — plans land in
             /root/repo/plans/r14/<query>_<suffix>.txt
  query ...  optional subset; default = QUERIES_TO_CAPTURE below

Runs at sf0.001 (plan SHAPE is scale-invariant; the iterative dedup
queries execute actions during construction, so the small SF keeps the
capture cheap). Job counts are measured with a job group: everything the
query's construction + one noop materialization submits.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

TREE = sys.argv[1]
SUFFIX = sys.argv[2]
OUT_DIR = "/root/repo/plans/r14"
SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, TREE)

from etl_mri_scripts_spark.session import get_spark  # noqa: E402

QUERIES_TO_CAPTURE = [
    "dedup_lsh_verified_pairs",
    "dedup_connected_components",
    "dedup_keep_best_quality",
    "dedup_cluster_representatives",
    "dedup_pagerank_representatives",
    "dedup_lsh_quality_eval",
    "dedup_incremental_delta",
    "curation_funnel",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("r14-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from etl_mri_scripts_spark.queries import QUERIES

    names = sys.argv[3:] or QUERIES_TO_CAPTURE
    for name in names:
        spark.catalog.clearCache()
        group = f"{name}-{SUFFIX}"
        sc.setJobGroup(group, group)
        df = QUERIES[name](spark, SF_DIR)
        plan = formatted_plan(df)
        df.write.format("noop").mode("overwrite").save()
        sc.setJobGroup("idle", "idle")
        jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup(group)
        n_jobs = len(list(jobs))
        with open(f"{OUT_DIR}/{name}_{SUFFIX}.txt", "w") as f:
            f.write(
                f"# {name} @ {SF_DIR} — tree={TREE} ({SUFFIX})\n"
                f"# Spark jobs submitted by construction + one noop"
                f" materialization (job group '{group}'): {n_jobs}\n"
                f"# (iterative queries run their loop during construction;"
                f" the final plan below is lineage-truncated at the loop's"
                f" localCheckpoint by design)\n\n"
            )
            f.write(plan)
        print(f"{name} [{SUFFIX}]: {n_jobs} jobs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
