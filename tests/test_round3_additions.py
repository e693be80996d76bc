"""Round-3 additions: ANN recall harness, DSIR importance weights,
triangle count, bucketed co-located join, perceptual-hash image dedup.
Oracle parity for the oracled four is auto-covered by test_oracle_parity;
these tests pin the semantics parity can't see (plan shapes, invariants).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mri_scripts_spark.queries import QUERIES


def test_recall_eval_bounds_and_bruteforce_self_recall(spark, sf_dir):
    rows = QUERIES["ann_recall_eval"](spark, sf_dir).collect()
    assert rows, "recall eval returned no queries"
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hit <= r.n_truth


def test_importance_weights_direction(spark, sf_dir):
    """Target-language docs must average a higher importance weight than
    the rest — that's the whole point of the LLR."""
    w = QUERIES["corpus_importance_weights"](spark, sf_dir)
    from etl_mri_scripts_spark.tables import table

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = w.join(d, "doc_id").groupBy(F.col("lang") == "en").agg(
        F.avg(F.col("log_weight") / F.col("n_words")).alias("avg_per_word")
    )
    got = {bool(r[0]): r.avg_per_word for r in j.collect()}
    assert got[True] > got[False]


def test_triangle_count_edges_exist_and_ordered(spark, sf_dir):
    tri = QUERIES["dedup_triangle_count"](spark, sf_dir).collect()
    for t in tri:
        assert t.doc_a < t.doc_b < t.doc_c


def test_bucketed_join_plan_has_no_join_exchange(spark, sf_dir):
    """The point of bucketing: the orders x lineitem join and the first
    aggregation run without any shuffle exchange. Only the final 5-row
    priority rollup (and its sort) may move data."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["join_bucketed_colocated"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    smj = plan.count("SortMergeJoin")
    assert smj == 1, f"expected one sort-merge join, plan:\n{plan[:2000]}"
    # The join input subtrees must be exchange-free: every Exchange in the
    # plan has to sit ABOVE the join (rollup/sort), i.e. appear before the
    # SMJ line in the top-down printed plan.
    join_pos = plan.index("SortMergeJoin")
    below = plan[join_pos:]
    assert "Exchange" not in below, f"shuffle below the bucketed join:\n{below[:2000]}"


def test_dhash_pairs_every_resized_twin(spark, sf_dir):
    """Each structured image must match its 2x-downscaled twin within the
    Hamming budget; distinct wave patterns must not pair at all."""
    pairs = QUERIES["image_dhash_near_dup"](spark, sf_dir).collect()
    got = {(p.media_a, p.media_b) for p in pairs}
    for mid in range(8):
        assert (mid, mid + 1000) in got, f"twin of {mid} not detected: {sorted(got)}"
    cross = [p for p in pairs if p.media_b - p.media_a != 1000]
    assert not cross, f"spurious pairs: {cross}"


def test_dhash_invariant_to_uniform_rescale(spark):
    """dHash compares neighboring pixels, so multiplying an image by a
    constant must not change the hash."""
    import numpy as np

    from etl_mri_scripts_spark.sources.multimodal import (
        perceptual_dhash,
        synthetic_media,
    )
    from etl_mri_scripts_spark.sources.volumes import np_to_npy_bytes, npy_bytes_to_np

    media = synthetic_media(spark, n=6, seed=7).filter(F.col("kind") == "image")

    @F.pandas_udf("binary")
    def scale_payload(p):
        return p.map(lambda b: np_to_npy_bytes(npy_bytes_to_np(bytes(b)) * np.float32(1.7)))

    scaled = media.withColumn("payload", scale_payload("payload")).withColumn(
        "media_id", F.col("media_id") + 500
    )
    h = perceptual_dhash(media.unionByName(scaled)).collect()
    hashes = {r.media_id: r.dhash for r in h}
    for mid in [k for k in hashes if k < 500]:
        assert hashes[mid] == hashes[mid + 500]


def test_partitioned_read_actually_prunes(spark, sf_dir):
    """The lang filter must become partitionFilters on the scan (directory
    pruning), not a post-scan data filter."""
    df = QUERIES["partitioned_write_pruned_read"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        (l for l in plan.splitlines() if "FileScan parquet" in l and "part_lang" in l),
        "",
    )
    assert scan, f"no partitioned scan found:\n{plan[:1500]}"
    assert "PartitionFilters: [" in scan and "lang" in scan.split("PartitionFilters:")[1][:120], scan


def test_orc_roundtrip_parity_local(spark, duck, sf_dir):
    from .parity import run_parity

    run_parity(spark, duck, sf_dir, "source_orc_roundtrip")
    run_parity(spark, duck, sf_dir, "partitioned_write_pruned_read")


def test_multiprobe_recall_dominates_single_bucket(spark, sf_dir):
    """Multi-probe candidates are a superset of the single-bucket probe's,
    so its hit count against exact truth can only be >= per query."""
    truth = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_bucketed_signbit_topk"](spark, sf_dir).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_signbit_multiprobe_topk"](spark, sf_dir).collect()
    }
    assert len(multi & truth) >= len(single & truth)


def test_observed_pipeline_counters_match_groupby(spark):
    """Observation metrics (single-pass, executor-side) must agree with an
    explicit recount — the A9 counter-reconciliation contract."""
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, observed_pipeline
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    vols = synthetic_volumes(spark, 2, (24, 24, 6), seed=11)
    df, obs = observed_pipeline(spark, vols, PipelineConfig(crop_hr=16, step_hr=8, scales=(2,)))
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    recount = df.groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("resolution") == "HR", 1)).alias("n_hr"),
        F.count(F.when(F.col("resolution") != "HR", 1)).alias("n_lr"),
    ).collect()[0]
    assert got["n_rows"] == recount["n_rows"] > 0
    assert got["n_hr"] == recount["n_hr"]
    assert got["n_lr"] == recount["n_lr"]
    assert got["n_train"] + got["n_val"] + got["n_test"] == got["n_rows"]


def test_pipeline_checksums_invariant_to_partitioning(spark):
    """Key-derived seeds mean the SAME patch bytes regardless of task
    placement: re-partitioning the volume input (different task boundaries,
    like a retry or speculative re-execution would produce) must not change
    a single checksum."""
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, run_pipeline
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))
    vols = synthetic_volumes(spark, 2, (24, 24, 6), seed=11)

    def checks(v):
        return {
            (r.key, r.resolution): r.c
            for r in run_pipeline(spark, v, cfg)
            .select("key", "resolution", F.md5("value").alias("c"))
            .collect()
        }

    a = checks(vols)
    b = checks(vols.repartition(7))
    c = checks(vols.coalesce(1))
    assert a == b == c and len(a) > 0


def test_aggregate_pushdown_reaches_scan(spark, sf_dir):
    """The unfiltered MIN/MAX/COUNT must be served by the parquet scan
    (PushedAggregation), not by reading data pages."""
    df = QUERIES["scan_aggregate_pushdown"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation: [" in plan and "COUNT(*)" in plan, plan[:2000]


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """The fact scan's partition filter must be a runtime dynamicpruning
    subquery, not a static IN-list the author propagated by hand."""
    df = QUERIES["partitioned_dynamic_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "part_lang_dpp" in l
    )
    assert "dynamicpruning" in scan, scan
