"""The approximate / scale-path variants of exact operators (SURVEY.md §7
hard parts): these cannot hash-match a DuckDB oracle (different sketch
implementations), so they are asserted against their exact twins with
documented tolerances instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mri_scripts_spark.tables import table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    # HyperLogLog++ path for 100 TB count-distinct; rsd=0.05 default.
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(0.1 * row["exact"], 16)


def test_percentile_approx_tracks_exact(spark, sf_dir):
    # percentile_approx is the scale substitute for the exact percentile
    # used in parity queries (A2/P5); accuracy 10000 keeps it within ~1%.
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.99)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02


def test_minhash_lsh_candidates_superset_of_high_jaccard(spark, sf_dir):
    # LSH recall property: every pair the exact Jaccard query reports at
    # >= 0.5 similarity should be surfaced by at least the inverted-index
    # candidate generator; the LSH bands are the probabilistic filter on
    # top. Here we check candidates ⊇ exact-jaccard-pairs at sf0.001.
    from etl_mri_scripts_spark.queries import QUERIES

    exact_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard_pairs_diagnostic"](spark, sf_dir).collect()
    }
    cand_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh_candidates"](spark, sf_dir).collect()
    }
    # with 4 bands x 2 rows at jaccard >= 0.5, P(miss) = (1-s^2)^4 <= 0.32;
    # the generated near-dups are ~exact copies (s ~= 1), so expect full
    # recall on this corpus — flag if LSH misses any high-similarity pair.
    assert exact_pairs <= cand_pairs, f"LSH missed {exact_pairs - cand_pairs}"


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _plans_of_all_queries(spark, sf_dir, render) -> dict[str, str]:
    """name -> rendered plan for every registered query, built
    THREAD-PARALLEL (r14, same §2.6 overlap as the parity sweep: plan
    construction is py4j/JVM work that releases the GIL, and the
    iterative queries run their certificate jobs during construction —
    at sf0.001 both are latency, not compute). Each worker plans on an
    isolated ``spark.newSession()`` (the imaging queries shrink the
    Arrow batch conf at plan time) sharing the SparkContext."""
    import traceback
    from concurrent.futures import ThreadPoolExecutor

    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.session import tune

    plans: dict[str, str] = {}
    errors: dict[str, str] = {}

    def one(item):
        name, fn = item
        try:
            s = tune(spark.newSession())
            plans[name] = render(fn(s, sf_dir))
        except Exception:  # noqa: BLE001 — a failed plan must be named
            errors[name] = traceback.format_exc(limit=3)

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(one, sorted(QUERIES.items())))
    assert not errors, f"query construction failed: {errors}"
    return plans


def test_bernoulli_sample_plan_has_no_shuffle(spark, sf_dir):
    # The zero-shuffle claim: sampling is a pure scan->filter->project
    # (the final orderBy is the presentation sort the driver needs; at
    # scale it would be dropped, so assert no exchange BELOW the sort).
    from etl_mri_scripts_spark.queries.sampling import sample_hash_bernoulli

    df = sample_hash_bernoulli(spark, sf_dir)
    plan = _formatted_plan(df)
    # the only exchange is the range-partitioning one feeding the sort —
    # no hash shuffle (no join/agg) anywhere
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" in plan
    assert "PushedFilters" in plan


def test_range_join_plan_is_equi_not_nested_loop(spark, sf_dir):
    # The band join must hit the bucketed equi path, never a cartesian /
    # broadcast nested loop.
    from etl_mri_scripts_spark.queries.relational import join_range_time_bucketed

    plan = _formatted_plan(join_range_time_bucketed(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_incremental_delta_never_self_joins_base(spark, sf_dir):
    # Delta dedup's candidate join must be new-vs-base: both join children
    # carry the partition filter (one side id%5=0, other id%5<>0) — a
    # base-vs-base pair can never form.
    from etl_mri_scripts_spark.queries.dedup import DELTA_MOD, dedup_incremental_delta
    from etl_mri_scripts_spark.queries.registry import QUERIES

    rows = dedup_incremental_delta(spark, sf_dir).collect()
    assert all(r["doc_id"] % DELTA_MOD == 0 for r in rows)
    assert all(r["match_doc_id"] % DELTA_MOD != 0 for r in rows)


def test_no_query_plans_a_cartesian_or_nested_loop(spark, sf_dir):
    # Fleet-wide plan hygiene: no registered query may compile to a
    # cartesian product or nested-loop join — the two shapes that die at
    # cluster scale. The brute-force ANN baseline is the one documented
    # exception (it exists as the recall yardstick for the bucketed/IVF
    # scale paths).
    from etl_mri_scripts_spark.queries import QUERIES

    # Allowed: joins whose broadcast side is CONSTANT-size by construction
    # (not data-dependent) — a nested loop over a bounded side is a map.
    #   ann_bruteforce_topk     documented brute-force recall baseline
    #   ann_ivf_kmeans_topk     crossJoin with broadcast(K centroids), K fixed
    #   imaging_key_parity_gate four 1-row count aggregates cross-joined
    allowed_nested = {
        "ann_bruteforce_topk",
        "ann_recall_eval",  # composes ann_bruteforce_topk (same broadcast query set)
        "ann_truncated_recall_eval",  # same: broadcast query set, != predicate
        "ann_ivf_kmeans_topk",
    "dedup_semantic_keep",  # same crossJoin with broadcast(K centroids)
        "imaging_key_parity_gate",
        "events_step_funnel",  # three 1-row step-count aggregates cross-joined
        "dedup_lsh_quality_eval",  # five 1-row aggregates cross-joined
        "corpus_mix_plan",  # crossJoin with broadcast 1-row binding-constraint agg
        "supplier_value_share_threshold",  # broadcast 1-row global-total agg (Q11 HAVING scalar)
        "idle_rich_customers_by_nation",  # broadcast 1-row avg-balance agg (Q22 scalar subquery)
        "text_tfidf_top_terms",  # crossJoin with broadcast 1-row n_docs agg
        "text_bigram_pmi",  # crossJoin with broadcast 1-row n_words/n_bigrams aggs
        "middle_n_selection",  # broadcast 1-row count agg (top-k center)
        "join_key_skew_diagnostic",  # broadcast 1-row max/avg agg
        "top_supplier_revenue_tiesafe",  # broadcast 1-row max agg (Q15 scalar)
    }
    offenders = {}
    for name, plan in _plans_of_all_queries(spark, sf_dir, _formatted_plan).items():
        bad = [
            op
            for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if op in plan
        ]
        if bad and name not in allowed_nested:
            offenders[name] = bad
    assert not offenders, f"scale-hostile join shapes: {offenders}"


def _count_single_partition_windows(plan_tree: str) -> int:
    # A Window operator whose child subtree (printed within the next few
    # lines) contains an Exchange SinglePartition — the unpartitioned
    # window that moves every row to one task.
    lines = plan_tree.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Window" in line and "WindowGroupLimit" not in line:
            for j in range(i + 1, min(i + 4, len(lines))):
                if "SinglePartition" in lines[j]:
                    hits += 1
                    break
    return hits


# Single-partition-window whitelist (r8, verdict demand #3): now lives
# engine-side in etl_mri_scripts_spark/policies.py (r8 ADVICE — the
# repo-root plan audit must not import from the test tree). The policy
# test below still asserts every entry's declared row bound.
from etl_mri_scripts_spark.policies import ALLOWED_SP_WINDOW_BOUNDS  # noqa: E402


def test_no_query_plans_a_single_partition_window(spark, sf_dir):
    # Fleet-wide plan hygiene, the window counterpart of the nested-loop
    # policy: no registered query may plan an unpartitioned WindowExec
    # over a data-volume-dependent relation. Global ranks/cumsums go
    # through the two-phase offset scheme (operators/rank.py); the
    # whitelist (ALLOWED_SP_WINDOW_BOUNDS) is windows over BOUNDED
    # post-aggregation frames, each entry carrying its own row-bound
    # measurement (asserted in the companion test below).
    from etl_mri_scripts_spark.queries import QUERIES

    offenders = {}
    trees = _plans_of_all_queries(
        spark,
        sf_dir,
        lambda df: df._jdf.queryExecution().executedPlan().toString(),
    )
    for name, tree in trees.items():
        n = _count_single_partition_windows(tree)
        if n and name not in ALLOWED_SP_WINDOW_BOUNDS:
            offenders[name] = n
    assert not offenders, f"single-partition windows: {offenders}"


def test_whitelisted_single_partition_windows_are_bounded(spark, sf_dir):
    # The whitelist's teeth: measure each whitelisted query's window-input
    # frame and assert it respects the declared bound. A whitelist entry
    # whose frame has become data-volume-dependent (a refactor moved the
    # window below the aggregate, the dimension grew unbounded) fails here
    # instead of silently riding the allowlist.
    for name, (bound, measure, grain) in ALLOWED_SP_WINDOW_BOUNDS.items():
        n = measure(spark, sf_dir)
        assert n <= bound, (
            f"{name}: window frame is {n} rows, declared bound {bound} "
            f"({grain}) — rewrite through operators/rank.py or re-adjudicate"
        )


def test_profile_summary_avoids_multi_distinct_expand(spark, sf_dir):
    # data_profile_summary must stay the per-column union form: a single
    # wide multi-DISTINCT aggregate plans through Expand (6x row
    # multiplication; measured 7.6x slower at sf0.1). Guard the shape.
    from etl_mri_scripts_spark.queries import QUERIES

    plan = (
        QUERIES["data_profile_summary"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_key_build_aggregates_components_not_strings(spark, sf_dir):
    # key_build_and_normalize must aggregate BEFORE building key strings:
    # format_string/regexp_replace belong above the aggregate (once per
    # distinct key), and the shuffle must not carry the built keys.
    from etl_mri_scripts_spark.queries import QUERIES

    plan = (
        QUERIES["key_build_and_normalize"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    agg_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert agg_exchanges, "expected a hash exchange for the aggregate"
    assert all("format_string" not in l for l in agg_exchanges)


def test_broadcast_topologies_hold(spark, sf_dir):
    # The dimension/centroid/stats sides of these queries must broadcast —
    # a sort-merge join on the fact/vector stream would mean the optimizer
    # lost the size information (or a regression dropped the hint).
    from etl_mri_scripts_spark.queries import QUERIES

    for name in ["nation_revenue_share", "embedding_outlier_distance"]:
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_predicate_pushdown_reaches_both_scans(spark, sf_dir):
    # topk_unshipped_orders: the date predicates must land in the parquet
    # scans (DataFilters) BELOW the join — a post-join filter means the
    # join processes the full tables at 100 TB.
    from etl_mri_scripts_spark.queries import QUERIES

    plan = (
        QUERIES["topk_unshipped_orders"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    li_scan = next(l for l in scans if "l_shipdate" in l)
    o_scan = next(l for l in scans if "o_orderdate" in l)
    assert "l_shipdate" in li_scan.split("DataFilters:")[1]
    assert "o_orderdate" in o_scan.split("DataFilters:")[1]


def test_profile_scans_prune_to_single_columns(spark, sf_dir):
    # each data_profile_summary union branch must read exactly ONE parquet
    # column — a scan materializing the full row width defeats the point
    # of columnar profiling.
    from etl_mri_scripts_spark.queries import QUERIES

    plan = (
        QUERIES["data_profile_summary"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 5
    for s in scans:
        cols = s.split("FileScan parquet [")[1].split("]")[0].split(",")
        assert len(cols) == 1, s[:120]


def _executed_plan(spark, name, sf_dir):
    from etl_mri_scripts_spark.queries import QUERIES

    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_decorrelated_shapes_reuse_one_fact_exchange(spark, sf_dir):
    # Q17 shape: the window decorrelation partitions on the SAME key the
    # correlated filter uses, so the whole query must pay exactly one hash
    # exchange keyed l_partkey — a second one means Catalyst lost the
    # co-partitioning (and the semi-join gate must stay broadcast).
    plan = _executed_plan(spark, "small_quantity_revenue_below_avg", sf_dir)
    fact_ex = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "l_partkey" in l
    ]
    assert len(fact_ex) == 1, fact_ex

    # Q2 shape: exactly two hash exchanges by design — the raw-fact one is
    # keyed (part_key, l_suppkey) so map-side partial aggregation combines
    # BEFORE the shuffle; the window one re-keys only the aggregated offer
    # table. A part_key exchange below the aggregate would mean raw rows
    # are being shuffled to subsidize the window — strictly more bytes.
    plan = _executed_plan(spark, "join_min_cost_supplier_per_part", sf_dir)
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 2, ex
    pair_keyed = [l for l in ex if "part_key" in l and "l_suppkey" in l]
    assert len(pair_keyed) == 1, ex


def test_late_sole_supplier_has_no_fact_self_join(spark, sf_dir):
    # Q21 shape: the textbook EXISTS/NOT-EXISTS form self-joins lineitem
    # twice; the engine's groupBy collapse must scan lineitem exactly once.
    plan = _executed_plan(spark, "late_sole_supplier_orders", sf_dir)
    li_scans = [
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "l_orderkey" in l
    ]
    assert len(li_scans) == 1, li_scans


def test_large_order_survivors_broadcast_not_dims(spark, sf_dir):
    # Q18 shape: the HAVING survivors (tiny) must be the broadcast side so
    # the orders/customer tables never shuffle for this join.
    plan = _executed_plan(spark, "large_order_customers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # orders and customer scans feed joins directly — no hash exchange may
    # sit between their scans and the first join.
    assert not [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and ("o_orderkey" in l or "c_custkey" in l)
    ]


def test_attribution_and_twa_share_window_and_agg_exchange(spark, sf_dir):
    # events_time_weighted_avg: window partitionBy(user_id) and the final
    # groupBy(user_id) must plan ONE user_id exchange, not two.
    plan = _executed_plan(spark, "events_time_weighted_avg", sf_dir)
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len([l for l in ex if "user_id" in l]) == 1, ex


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    # 100 TB scale path: when a selective dim filter feeds a SHUFFLE join,
    # Spark injects a runtime bloom filter on the fact side so the big scan
    # drops non-joining rows before the exchange. Local thresholds are
    # sized for clusters (10 GB application side), so pin them down here
    # and assert the rewrite actually engages — this documents the exact
    # knobs the engine relies on in production.
    from etl_mri_scripts_spark.tables import table
    from pyspark.sql import functions as F

    tweaks = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in tweaks}
    try:
        for k, v in tweaks.items():
            spark.conf.set(k, v)
        orders = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = table(spark, sf_dir, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pq_adc_recall_floor_vs_bruteforce(spark, sf_dir):
    # PQ+ADC is the compressed-corpus scale path; its contract is recall
    # against the exact brute-force baseline. 32x compression with a
    # 10*K exact-reranked shortlist must hold recall@10 >= 0.8 on the
    # synthetic corpus (measured 0.92); a drop means the codebook trainer
    # or the ADC join regressed.
    from collections import defaultdict

    from etl_mri_scripts_spark.queries import QUERIES

    pq_rows = QUERIES["ann_pq_adc_topk"](spark, sf_dir).collect()
    bf_rows = QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    pq_n, bf_n = defaultdict(set), defaultdict(set)
    for r in pq_rows:
        pq_n[r["query_id"]].add(r["neighbor_id"])
    for r in bf_rows:
        bf_n[r["query_id"]].add(r["neighbor_id"])
    recalls = [len(pq_n[q] & bf_n[q]) / len(bf_n[q]) for q in bf_n]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_pq_adc_deterministic(spark, sf_dir):
    from etl_mri_scripts_spark.queries import QUERIES

    a = QUERIES["ann_pq_adc_topk"](spark, sf_dir).collect()
    b = QUERIES["ann_pq_adc_topk"](spark, sf_dir).collect()
    assert a == b


def test_hll_sketch_rollup_tracks_exact(spark, sf_dir):
    # sketch-union rollup must track the exact region-level distinct count
    # within HLL tolerance (~2% at default lgConfigK=12; allow 5%).
    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.tables import table

    approx = {
        r["n_regionkey"]: r["approx_customers"]
        for r in QUERIES["hll_sketch_rollup_nation_region"](spark, sf_dir).collect()
    }
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    exact = {
        r["n_regionkey"]: r["exact"]
        for r in cust.join(
            F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
        )
        .groupBy("n_regionkey")
        .agg(F.count_distinct("c_custkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.05 * exact[k], 3), (k, approx[k], exact[k])


def test_no_unlisted_unpartitioned_window_in_source():
    """Static guard for the eager-write blind spot: the runtime plan
    audits (above, and audit_plans.py) only see plans of RETURNED
    DataFrames — a query that executes a write at build time (the
    formats exports) runs its plan before anyone can inspect it, which
    is exactly how an unpartitioned Window.orderBy row_number hid in
    source_jsonl_corrupt_quarantine until round 6. This test bans the
    construct at the SOURCE level: every unpartitioned ``Window.orderBy``
    in the query/operator modules must be on the explicit allowlist
    below (each entry individually adjudicated as bounded), or be
    rewritten through operators/rank.py."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "etl_mri_scripts_spark"
    # file -> adjudication for the allowed occurrence count
    allowed = {
        "queries/relational.py": 1,  # month-grain lag AFTER aggregation (~80 rows)
        "queries/sampling.py": 1,  # rank<=K filter -> WindowGroupLimit/TakeOrdered
        "queries/text.py": 1,  # zipf top-100 rank; TakeOrderedAndProject-bounded
    }
    pat = re.compile(r"Window\s*(\(\s*\))?\.orderBy\(")
    offenders: dict[str, int] = {}
    for sub in ("queries", "operators", "streaming", "sources"):
        for f in sorted((pkg / sub).glob("*.py")):
            src = f.read_text()
            # strip comments and docstrings so prose mentions don't count
            src = re.sub(r'"""(?:.|\n)*?"""', "", src)
            src = "\n".join(line.split("#")[0] for line in src.splitlines())
            n = len(pat.findall(src))
            if n:
                offenders[f"{sub}/{f.name}"] = n
    assert offenders == allowed, (
        f"unpartitioned Window.orderBy drift: found {offenders}, allowed "
        f"{allowed}. New global windows must use operators/rank.py (or be "
        "adjudicated + allowlisted here AND in audit_plans.py)"
    )
