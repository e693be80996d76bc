"""Query registry: every operator from SURVEY.md §2 declared as a named
query (Spark callable) with, where SQL-expressible, a DuckDB oracle.

Import side effects register queries; keep module list here exhaustive.

Registration order matters: the round driver oracle-checks queries in
registry order with a per-round cap (~50). _DRIVER_ORDER below pins the
front of the registry explicitly instead of relying on module import
order, with three goals (in priority order):

1. SENTINELS — a small stable subset of previously driver-verified
   queries stays inside every round's window, so a regression in
   already-verified code cannot hide outside the cap (rounds 1 and 2 had
   zero overlap; that was a coverage hole).
2. RE-CHECKS — queries that failed or were fixed since their last driver
   row run again immediately.
3. ROTATION — queries that have never received a driver CORRECTNESS row
   fill the rest of the window; the tail of the list queues the
   remaining never-checked names first so the next round's rotation is a
   simple cut/paste of the next block.

Driver history (which names are verified when) lives in
CORRECTNESS_r{N}.json at the repo root.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects; order here no longer matters
# (_DRIVER_ORDER overrides it), keep alphabetical-ish for readability.
from . import bucketing  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import imaging  # noqa: E402,F401
from . import bpe  # noqa: E402,F401
from . import formats  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import pipeline_analytics  # noqa: E402,F401
from . import relational  # noqa: E402,F401

# Round-13 window layout (r12 verdict demand #4): the pre-listed r13 cut
# from the r12 round, regenerated this round by rotate_window.py on the
# r1-r12 CORRECTNESS history and verified identical to the pre-list — 5
# sentinels + 45 freshness rows (the 15 stalest r8 rows headed by
# sample_hash_bernoulli, then the r9 block through join_asof_last_view).
# ZERO re-checks: no registered query's implementation changed in r13 as
# of this rotation (the round's code changes are bench/gate/census
# tooling plus the streaming module's _abs_local scheme fix — none
# behind a queries() entry). After this window lands, no query's latest
# driver row is older than r9; the stalest names beyond the window are
# pre-listed below (uncomment = next round's mechanical cut). Any r13
# code change to a registered query must add its name to the head before
# the round closes.
_DRIVER_ORDER = [
    "window_tumbling_hourly",  # sentinel
    "dedup_exact_hash",  # sentinel
    "text_token_counts",  # sentinel
    "ann_bruteforce_topk",  # sentinel
    "pricing_summary",  # sentinel
    "dedup_pagerank_representatives",  # re-check: implementation changed
    "dedup_cluster_representatives",  # re-check: implementation changed
    "dedup_lsh_verified_pairs",  # re-check: implementation changed
    "dedup_incremental_delta",  # re-check: implementation changed
    "dedup_minhash_lsh_candidates",  # re-check: implementation changed
    "dedup_minhash_signatures",  # re-check: implementation changed
    "curation_funnel",  # re-check: implementation changed
    "dedup_connected_components",  # re-check: implementation changed
    "dedup_keep_best_quality",  # re-check: implementation changed
    "dedup_lsh_quality_eval",  # re-check: implementation changed
    "dedup_rate_by_source",  # re-check: implementation changed
    "dedup_split_leakage_matrix",  # re-check: implementation changed
    "dedup_triangle_count",  # re-check: implementation changed
    "join_bucketed_colocated",  # freshness: last driver row CORRECTNESS_r09.json
    "join_key_skew_diagnostic",  # freshness: last driver row CORRECTNESS_r09.json
    "label_entropy_by_source",  # freshness: last driver row CORRECTNESS_r09.json
    "lineitem_numeric_correlations",  # freshness: last driver row CORRECTNESS_r09.json
    "nation_market_share_in_region",  # freshness: last driver row CORRECTNESS_r09.json
    "nation_pair_shipping_volume",  # freshness: last driver row CORRECTNESS_r09.json
    "orders_crosstab_chi2",  # freshness: last driver row CORRECTNESS_r09.json
    "partitioned_write_pruned_read",  # freshness: last driver row CORRECTNESS_r09.json
    "profit_by_supp_nation_year",  # freshness: last driver row CORRECTNESS_r09.json
    "returned_item_revenue_customers",  # freshness: last driver row CORRECTNESS_r09.json
    "source_orc_roundtrip",  # freshness: last driver row CORRECTNESS_r09.json
    "supplier_count_by_part_attrs",  # freshness: last driver row CORRECTNESS_r09.json
    "text_adaptive_quality_threshold",  # freshness: last driver row CORRECTNESS_r09.json
    "text_blocklist_scrub",  # freshness: last driver row CORRECTNESS_r09.json
    "text_decontaminate_overlap",  # freshness: last driver row CORRECTNESS_r09.json
    "agg_argmax_max_by",  # freshness: last driver row CORRECTNESS_r10.json
    "agg_count_distinct_rollup",  # freshness: last driver row CORRECTNESS_r10.json
    "agg_grouping_sets",  # freshness: last driver row CORRECTNESS_r10.json
    "agg_histogram_width_bucket",  # freshness: last driver row CORRECTNESS_r10.json
    "agg_minmax_per_group",  # freshness: last driver row CORRECTNESS_r10.json
    "agg_percentiles_exact",  # freshness: last driver row CORRECTNESS_r10.json
    "agg_skew_salted_two_stage",  # freshness: last driver row CORRECTNESS_r10.json
    "agg_stats_moments",  # freshness: last driver row CORRECTNESS_r10.json
    "ann_ivf_kmeans_topk",  # freshness: last driver row CORRECTNESS_r10.json
    "ann_ivf_pq_topk",  # freshness: last driver row CORRECTNESS_r10.json
    "ann_pq_adc_topk",  # freshness: last driver row CORRECTNESS_r10.json
    "cdc_upsert_latest_wins",  # freshness: last driver row CORRECTNESS_r10.json
    "conditional_agg_counters",  # freshness: last driver row CORRECTNESS_r10.json
    "cube_status_priority",  # freshness: last driver row CORRECTNESS_r10.json
    "data_profile_summary",  # freshness: last driver row CORRECTNESS_r10.json
    "date_format_monthly_rollup",  # freshness: last driver row CORRECTNESS_r10.json
    "distinct_sorted_dimension",  # freshness: last driver row CORRECTNESS_r10.json
    # ===== next-round freshness queue (stalest beyond this
    # window; uncomment = next round's mechanical cut) =====
    # "dq_uniqueness_report",  # last driver row CORRECTNESS_r10.json
    # "field_target_parse",  # last driver row CORRECTNESS_r10.json
    # "filter_project_arith",  # last driver row CORRECTNESS_r10.json
    # "flagship_revenue_by_region_priority",  # last driver row CORRECTNESS_r10.json
    # "imaging_pipeline_manifest",  # last driver row CORRECTNESS_r10.json
    # "imaging_pipeline_patches",  # last driver row CORRECTNESS_r10.json
    # "join_anti_customers_without_orders",  # last driver row CORRECTNESS_r10.json
    # "join_broadcast_supplier_geo",  # last driver row CORRECTNESS_r10.json
    # "join_inner_orders_customer",  # last driver row CORRECTNESS_r10.json
    # "late_lines_priority_by_status",  # last driver row CORRECTNESS_r10.json
    # "middle_n_selection",  # last driver row CORRECTNESS_r10.json
    # "pack_sequences_concat",  # last driver row CORRECTNESS_r10.json
    # "partitioned_dynamic_pruning",  # last driver row CORRECTNESS_r10.json
    # "sample_stratified_exact",  # last driver row CORRECTNESS_r10.json
    # "scan_aggregate_pushdown",  # last driver row CORRECTNESS_r10.json
    # "sketch_countmin_heavy_hitters",  # last driver row CORRECTNESS_r10.json
    # "sketch_kmv_distinct_by_nation",  # last driver row CORRECTNESS_r10.json
    # "source_cap_downsample",  # last driver row CORRECTNESS_r10.json
    # "split_group_consistent",  # last driver row CORRECTNESS_r10.json
    # "split_hash_bucket",  # last driver row CORRECTNESS_r10.json
    # "text_bigram_pmi",  # last driver row CORRECTNESS_r10.json
    # "text_langid_confusion",  # last driver row CORRECTNESS_r10.json
    # "text_perplexity_proxy",  # last driver row CORRECTNESS_r10.json
    # "text_vocabulary_ranked",  # last driver row CORRECTNESS_r10.json
    # "training_shard_assignment",  # last driver row CORRECTNESS_r10.json
    # "window_session_10m_gap",  # last driver row CORRECTNESS_r10.json
    # "window_sliding_hourly_30m",  # last driver row CORRECTNESS_r10.json
    # "agg_trimmed_winsorized_stats",  # last driver row CORRECTNESS_r11.json
    # "ann_bucketed_signbit_topk",  # last driver row CORRECTNESS_r11.json
    # "ann_ivf_by_label_topk",  # last driver row CORRECTNESS_r11.json
    # "cohort_retention_weekly",  # last driver row CORRECTNESS_r11.json
    # "corpus_drift_psi",  # last driver row CORRECTNESS_r11.json
]


def _apply_driver_order() -> None:
    missing = [n for n in _DRIVER_ORDER if n not in QUERIES]
    assert not missing, f"_DRIVER_ORDER names not registered: {missing}"
    listed = set(_DRIVER_ORDER)
    tail = [n for n in QUERIES if n not in listed]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        for n in _DRIVER_ORDER + tail:
            if n in snapshot:
                d[n] = snapshot[n]


_apply_driver_order()
