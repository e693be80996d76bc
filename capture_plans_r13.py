#!/usr/bin/env python
"""Capture .explain('formatted') plans + empirical Spark job counts for the
queries touched in optimization round r13.

Usage: python capture_plans_r13.py <tree_path> <suffix>
  tree_path  repo tree to import the engine from (/root/repo or the
             worktree of the pre-round commit)
  suffix     'before' or 'after' — plans land in
             /root/repo/plans/r13/<query>_<suffix>.txt

Runs at sf0.001 (plan SHAPE is scale-invariant; the iterative dedup
queries execute actions during construction, so the small SF keeps the
capture cheap). Job counts are measured with a job group: everything the
query's construction + one noop materialization submits.

Additionally captures the pagerank power-iteration PASS BODY plan
(pagerank_pass_<suffix>.txt): the final query plan is truncated at the
loop's localCheckpoint either way, so the per-pass join-count claim needs
the pre-checkpoint plan — localCheckpoint is identity-patched for that
one capture so the pass lineage stays visible.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

TREE = sys.argv[1]
SUFFIX = sys.argv[2]
OUT_DIR = "/root/repo/plans/r13"
SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, TREE)

from etl_mri_scripts_spark.session import get_spark  # noqa: E402

QUERIES_TO_CAPTURE = [
    "dedup_connected_components",
    "dedup_pagerank_representatives",
    "dedup_keep_best_quality",
    "dedup_cluster_representatives",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("r13-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from etl_mri_scripts_spark.queries import QUERIES

    for name in [] if "--pass-only" in sys.argv else QUERIES_TO_CAPTURE:
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

    # pagerank pass body: disable checkpointing so the loop lineage stays
    # in the plan, run 2 iterations over the real verified-pairs edges.
    spark.catalog.clearCache()
    from pyspark.sql import functions as F
    import etl_mri_scripts_spark.queries.dedup as dd

    # Spark 4: the runnable class is pyspark.sql.classic.dataframe.DataFrame
    # (pyspark.sql.DataFrame is the abstract API parent) — patch the class
    # whose method instances actually resolve.
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    orig_ckpt = ClassicDF.localCheckpoint
    ClassicDF.localCheckpoint = lambda self, eager=True: self  # type: ignore
    try:
        # mirror the query path: consumers use the unsorted interior (r13)
        pairs_fn = getattr(dd, "_verified_pairs_df", dd.dedup_lsh_verified_pairs)
        pairs = pairs_fn(spark, SF_DIR).select("doc_a", "doc_b")
        edges = pairs.select(
            F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
        ).unionAll(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        ranks = dd.pagerank_ranks(spark, edges, iters=2)
        plan = formatted_plan(ranks)
    finally:
        ClassicDF.localCheckpoint = orig_ckpt
    with open(f"{OUT_DIR}/pagerank_pass_{SUFFIX}.txt", "w") as f:
        f.write(
            f"# pagerank_ranks pass body (2 iterations, localCheckpoint"
            f" identity-patched so the loop lineage is visible) —"
            f" tree={TREE} ({SUFFIX})\n"
            f"# one power-iteration pass = the plan fragment repeated per"
            f" iteration\n\n"
        )
        f.write(plan)
    print(f"pagerank_pass [{SUFFIX}] captured", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
