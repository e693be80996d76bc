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

# Round-3 window layout. Names not listed keep their registration order
# after the listed block.
_DRIVER_ORDER = [
    # --- sentinels: driver-green in r1/r2, one per module family -------
    "window_tumbling_hourly",  # r2 green
    "dedup_exact_hash",  # r2 green
    "text_token_counts",  # r2 green
    "ann_bruteforce_topk",  # r2 green
    "pricing_summary",  # r1 green
    # --- re-checks: fixed since their last driver row ------------------
    "dedup_minhash_signatures",  # r2 err: array output; now string-encoded
    "dedup_pagerank_representatives",  # r2 no_oracle; oracle added
    "ann_ivf_kmeans_topk",  # r2 no_oracle; oracle added
    "join_range_time_bucketed",  # r1 err (NTZ); fixed r2, never re-checked
    # --- never driver-checked: imaging block (the reference's product) -
    "imaging_patch_grid",
    "imaging_slice_plan",
    "imaging_key_parity_gate",
    "imaging_pipeline_manifest",  # added mid-r3: full-lineage manifest, oracled
    "imaging_pipeline_patches",
    "imaging_snr_metrics",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "imaging_triptych_render",
    # --- never checked: BPE -------------------------------------------
    "bpe_train_merges",
    "bpe_tokenize_counts",
    # --- never checked: embeddings / ANN ------------------------------
    "embedding_quantize_int8",
    "embedding_label_centroids",
    "embedding_centroid_similarity",
    "embedding_outlier_distance",
    "embedding_l2_normalize_hof",
    "ann_pq_adc_topk",
    # --- never checked: interchange formats ---------------------------
    "source_jsonl_roundtrip",
    "source_csv_roundtrip",
    "source_jsonl_corrupt_quarantine",
    # --- never checked: data quality ----------------------------------
    "dq_lineitem_constraints",
    "dq_referential_integrity",
    "dq_uniqueness_report",
    "hll_sketch_rollup_nation_region",
    # --- never checked: sampling --------------------------------------
    "sample_stratified_exact",
    "sample_hash_bernoulli",
    "sample_weighted_exact",
    # --- never checked: relational stragglers -------------------------
    "ingest_union_schema_drift",
    "fk_integrity_audit",
    "cdc_apply_with_deletes",
    # --- never checked: TPC-H shapes (first 10) -----------------------
    "join_min_cost_supplier_per_part",
    "orders_priority_late_exists",
    "supplier_value_share_threshold",
    "customer_order_count_distribution",
    "promo_revenue_percent",
    "top_supplier_revenue_tiesafe",
    "small_quantity_revenue_below_avg",
    "large_order_customers",
    "late_sole_supplier_orders",
    "idle_rich_customers_by_nation",
    # --- never checked: curation (first 2) ----------------------------
    "corpus_mix_plan",
    "corpus_temperature_mix",
    # ============ position 50: round-4 rotation queue ================
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
    "training_shard_assignment",
    "corpus_drift_psi",
    "docs_compaction_plan",
    "pack_sequences_bestfit",
    "curation_funnel",
    "events_time_weighted_avg",
    "agg_trimmed_winsorized_stats",
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
    "dedup_semantic_keep",  # added r3 (SemDeDup-style), oracled
    "source_cap_downsample",  # added r3 (per-domain cap), oracled
    # --- added mid-round-3, oracled unless noted ----------------------
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
    "scan_aggregate_pushdown",
    "partitioned_dynamic_pruning",
    "events_sessionize_custom",
    "dedup_lsh_quality_eval",
    "dedup_keep_best_quality",
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
