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

# Round-11 window layout (r10 verdict demands #3 + #5): the pre-listed r11
# cut from the r10 round, regenerated this round by rotate_window.py on the
# r1-r10 CORRECTNESS history and verified identical to the pre-list — 5
# sentinels + 45 freshness rows (the 18 r6-latest queries headed by
# join_left_customer_order_counts, padded with the 27 stalest r7 rows).
# ZERO re-checks: no registered query's implementation changed in r11 (the
# round's code changes are gate/bench tooling, streaming index probing and
# tests — none behind a queries() entry). After this window lands, no
# query's latest driver row is older than r7; precisely 16 queries remain
# at r7 (pack_sequences_bestfit .. two_phase_robust_normalize), all
# pre-listed at the head of the r12 queue below (uncomment = next round's
# mechanical cut). Any r11 code change to a registered query must add its
# name to the head before the round closes.
_DRIVER_ORDER = [
    "window_tumbling_hourly",  # sentinel
    "dedup_exact_hash",  # sentinel
    "text_token_counts",  # sentinel
    "ann_bruteforce_topk",  # sentinel
    "pricing_summary",  # sentinel
    "join_left_customer_order_counts",  # freshness: last driver row CORRECTNESS_r06.json
    "join_semi_customers_with_urgent_orders",  # freshness: last driver row CORRECTNESS_r06.json
    "join_skew_salted_replicated",  # freshness: last driver row CORRECTNESS_r06.json
    "join_symmetric_difference_validation",  # freshness: last driver row CORRECTNESS_r06.json
    "key_build_and_normalize",  # freshness: last driver row CORRECTNESS_r06.json
    "math_scalar_functions",  # freshness: last driver row CORRECTNESS_r06.json
    "nation_revenue_share",  # freshness: last driver row CORRECTNESS_r06.json
    "orders_monthly_growth",  # freshness: last driver row CORRECTNESS_r06.json
    "path_basename_extract",  # freshness: last driver row CORRECTNESS_r06.json
    "pivot_event_type_counts",  # freshness: last driver row CORRECTNESS_r06.json
    "report_unpivot_long",  # freshness: last driver row CORRECTNESS_r06.json
    "revenue_pareto_share",  # freshness: last driver row CORRECTNESS_r06.json
    "semi_structured_json_extract",  # freshness: last driver row CORRECTNESS_r06.json
    "set_except_keys",  # freshness: last driver row CORRECTNESS_r06.json
    "set_intersect_keys",  # freshness: last driver row CORRECTNESS_r06.json
    "set_union_distinct_keys",  # freshness: last driver row CORRECTNESS_r06.json
    "source_jsonl_corrupt_quarantine",  # freshness: last driver row CORRECTNESS_r06.json
    "split_exact_count_rank",  # freshness: last driver row CORRECTNESS_r06.json
    "agg_trimmed_winsorized_stats",  # freshness: last driver row CORRECTNESS_r07.json
    "ann_bucketed_signbit_topk",  # freshness: last driver row CORRECTNESS_r07.json
    "ann_ivf_by_label_topk",  # freshness: last driver row CORRECTNESS_r07.json
    "cohort_retention_weekly",  # freshness: last driver row CORRECTNESS_r07.json
    "corpus_drift_psi",  # freshness: last driver row CORRECTNESS_r07.json
    "corpus_temperature_mix",  # freshness: last driver row CORRECTNESS_r07.json
    "crossmodal_quality_topk",  # freshness: last driver row CORRECTNESS_r07.json
    "curation_funnel",  # freshness: last driver row CORRECTNESS_r07.json
    "customer_revenue_gini",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_cluster_representatives",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_edit_distance_verified",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_embedding_cosine_pairs",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_incremental_delta",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_interdoc_segments",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_jaccard_dfcap",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_keep_canonical",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_lsh_verified_pairs",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_minhash_lsh_candidates",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_ngram_jaccard_pairs_diagnostic",  # freshness: last driver row CORRECTNESS_r07.json
    "dedup_simhash_16bit",  # freshness: last driver row CORRECTNESS_r07.json
    "embedding_norm_stats_by_label",  # freshness: last driver row CORRECTNESS_r07.json
    "events_debounce_collapse",  # freshness: last driver row CORRECTNESS_r07.json
    "events_funnel_depth",  # freshness: last driver row CORRECTNESS_r07.json
    "events_gap_fill_forward",  # freshness: last driver row CORRECTNESS_r07.json
    "events_sessionize_custom",  # freshness: last driver row CORRECTNESS_r07.json
    "events_step_funnel",  # freshness: last driver row CORRECTNESS_r07.json
    "events_transition_matrix",  # freshness: last driver row CORRECTNESS_r07.json
    # ===== next-round freshness queue (stalest beyond this
    # window; uncomment = next round's mechanical cut) =====
    # "pack_sequences_bestfit",  # last driver row CORRECTNESS_r07.json
    # "scd2_user_state_intervals",  # last driver row CORRECTNESS_r07.json
    # "shipping_delay_distribution",  # last driver row CORRECTNESS_r07.json
    # "sql_scalar_subquery_decorrelated",  # last driver row CORRECTNESS_r07.json
    # "text_chunk_overlapping",  # last driver row CORRECTNESS_r07.json
    # "text_corpus_stats_by_lang",  # last driver row CORRECTNESS_r07.json
    # "text_fingerprint_minshingle",  # last driver row CORRECTNESS_r07.json
    # "text_language_id",  # last driver row CORRECTNESS_r07.json
    # "text_pii_scrub",  # last driver row CORRECTNESS_r07.json
    # "text_quality_filter",  # last driver row CORRECTNESS_r07.json
    # "text_quality_scores",  # last driver row CORRECTNESS_r07.json
    # "text_repetition_signals",  # last driver row CORRECTNESS_r07.json
    # "topk_customers_by_revenue",  # last driver row CORRECTNESS_r07.json
    # "topk_per_group_window",  # last driver row CORRECTNESS_r07.json
    # "topk_unshipped_orders",  # last driver row CORRECTNESS_r07.json
    # "two_phase_robust_normalize",  # last driver row CORRECTNESS_r07.json
    # "bpe_tokenize_counts",  # last driver row CORRECTNESS_r08.json
    # "bpe_train_merges",  # last driver row CORRECTNESS_r08.json
    # "cdc_apply_with_deletes",  # last driver row CORRECTNESS_r08.json
    # "corpus_mix_plan",  # last driver row CORRECTNESS_r08.json
    # "customer_order_count_distribution",  # last driver row CORRECTNESS_r08.json
    # "dedup_minhash_signatures",  # last driver row CORRECTNESS_r08.json
    # "dedup_semantic_keep",  # last driver row CORRECTNESS_r08.json
    # "dq_lineitem_constraints",  # last driver row CORRECTNESS_r08.json
    # "dq_referential_integrity",  # last driver row CORRECTNESS_r08.json
    # "embedding_centroid_similarity",  # last driver row CORRECTNESS_r08.json
    # "embedding_l2_normalize_hof",  # last driver row CORRECTNESS_r08.json
    # "embedding_label_centroids",  # last driver row CORRECTNESS_r08.json
    # "embedding_outlier_distance",  # last driver row CORRECTNESS_r08.json
    # "embedding_quantize_int8",  # last driver row CORRECTNESS_r08.json
    # "fk_integrity_audit",  # last driver row CORRECTNESS_r08.json
    # "hll_sketch_rollup_nation_region",  # last driver row CORRECTNESS_r08.json
    # "idle_rich_customers_by_nation",  # last driver row CORRECTNESS_r08.json
    # "imaging_patch_grid",  # last driver row CORRECTNESS_r08.json
    # "imaging_slice_plan",  # last driver row CORRECTNESS_r08.json
    # "imaging_triptych_render",  # last driver row CORRECTNESS_r08.json
    # "ingest_union_schema_drift",  # last driver row CORRECTNESS_r08.json
    # "join_min_cost_supplier_per_part",  # last driver row CORRECTNESS_r08.json
    # "join_range_time_bucketed",  # last driver row CORRECTNESS_r08.json
    # "large_order_customers",  # last driver row CORRECTNESS_r08.json
    # "late_sole_supplier_orders",  # last driver row CORRECTNESS_r08.json
    # "multimodal_feature_extract",  # last driver row CORRECTNESS_r08.json
    # "multimodal_frame_sample",  # last driver row CORRECTNESS_r08.json
    # "orders_priority_late_exists",  # last driver row CORRECTNESS_r08.json
    # "promo_revenue_percent",  # last driver row CORRECTNESS_r08.json
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
