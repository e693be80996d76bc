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

# Round-4 window layout. Names not listed keep their registration order
# after the listed block. The 45 rotation slots hold the first 45 of the
# 50 names that have never received a driver CORRECTNESS row (r1-r3
# union); the remaining 5 queue immediately after position 50 so round 5
# is a simple cut/paste. Queries whose implementation changed this round
# (split_exact_count_rank, middle_n_selection, histogram_equi_depth,
# training_shard_assignment, agg_trimmed_winsorized_stats,
# dedup_connected_components, events_sessionize_custom,
# image_dhash_near_dup) are locally re-verified via check_window.py; the
# already-driver-verified ones among them are round-5 re-check
# candidates.
_DRIVER_ORDER = [
    # --- sentinels: driver-green in r1/r2, one per module family -------
    "window_tumbling_hourly",  # r2 green
    "dedup_exact_hash",  # r2 green
    "text_token_counts",  # r2 green
    "ann_bruteforce_topk",  # r2 green
    "pricing_summary",  # r1 green
    # --- never driver-checked: rotation block (45) ---------------------
    "corpus_temperature_mix",
    "forecast_revenue_discount_band",
    "nation_pair_shipping_volume",
    "nation_market_share_in_region",
    "profit_by_supp_nation_year",
    "returned_item_revenue_customers",
    "late_lines_priority_by_status",
    "supplier_count_by_part_attrs",
    "disjunctive_bracket_revenue",
    "excess_volume_suppliers",
    "crossmodal_quality_topk",
    "text_decontaminate_overlap",
    "pack_sequences_concat",
    "training_shard_assignment",  # r4: two-phase offset rank plan
    "corpus_drift_psi",
    "docs_compaction_plan",
    "pack_sequences_bestfit",
    "curation_funnel",
    "events_time_weighted_avg",
    "agg_trimmed_winsorized_stats",  # r4: agg+broadcast-join plan
    "events_last_touch_attribution",
    "embedding_dimension_variance",
    "text_blocklist_scrub",
    "join_key_skew_diagnostic",
    "feature_zscore_standardize",
    "orders_crosstab_chi2",
    "lineitem_numeric_correlations",
    "agg_median_abs_deviation",
    "customer_revenue_gini",
    "label_entropy_by_source",
    "dedup_semantic_keep",
    "source_cap_downsample",
    "ann_recall_eval",
    "corpus_importance_weights",
    "dedup_triangle_count",
    "join_bucketed_colocated",
    "image_dhash_near_dup",  # rows-only (pixels), golden-pinned
    "source_orc_roundtrip",
    "partitioned_write_pruned_read",
    "ann_ivf_pq_topk",
    "ann_signbit_multiprobe_topk",
    "dedup_url_canonical",
    "text_adaptive_quality_threshold",
    "dedup_containment_pairs",
    "ann_truncated_recall_eval",
    # ============ position 50: round-5 rotation queue ================
    # last 5 never-driver-checked names, then round-5 re-check
    # candidates (implementations changed in r4 after their driver row).
    "scan_aggregate_pushdown",
    "partitioned_dynamic_pruning",
    "events_sessionize_custom",
    "dedup_lsh_quality_eval",
    "dedup_keep_best_quality",
    "split_exact_count_rank",  # r4 re-check: two-phase offset rank
    "middle_n_selection",  # r4 re-check: TakeOrderedAndProject form
    "histogram_equi_depth",  # r4 re-check: two-phase offset rank
    "dedup_connected_components",  # r4 re-check: pointer-jumping CC
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
