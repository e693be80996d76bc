"""Round-14 optimization invariants: shingle-shared minhash signatures,
in-query cache release for the CC/pagerank family, and the parity-sweep
thread harness."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def test_minhash_signature_from_shared_shingles_identical(spark):
    # r14: _verified_pairs_df / dedup_incremental_delta derive the
    # signature from their cached shingle table (one explode pass per
    # cold execution instead of two). The salted-md5 family over the
    # same distinct shingle set must produce bit-identical signatures.
    from etl_mri_scripts_spark.queries.dedup import (
        _exploded_shingles,
        _minhash_signature_df,
    )

    spark.catalog.clearCache()
    base = _minhash_signature_df(spark, SF).orderBy("doc_id").collect()
    sh = _exploded_shingles(spark, SF)
    shared = (
        _minhash_signature_df(spark, SF, shingles=sh).orderBy("doc_id").collect()
    )
    assert base == shared
    spark.catalog.clearCache()


def test_cc_family_releases_lsh_caches_at_materialization(spark):
    # r14 (r13 verdict finding #3): the CC-label helper materializes its
    # labels via the certificate actions DURING construction, then
    # releases every persisted LSH intermediate (shingles, signatures)
    # plus the edge cache — executor storage must not retain dedup
    # caches after the query function returns, and the returned frame
    # must still be fully usable (checkpoint-backed).
    from etl_mri_scripts_spark.queries.dedup import _cc_component_labels

    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    labels = _cc_component_labels(spark, SF)
    assert _cache_manager_empty(spark), (
        "LSH lineage caches must be unpersisted once the CC labels are "
        "checkpoint-materialized"
    )
    rows = labels.collect()
    assert rows
    assert all(r["component_id"] <= r["doc_id"] for r in rows)


def test_pagerank_representatives_releases_lsh_caches(spark):
    from etl_mri_scripts_spark.queries import QUERIES

    spark.catalog.clearCache()
    df = QUERIES["dedup_pagerank_representatives"](spark, SF)
    assert _cache_manager_empty(spark), (
        "pagerank representatives must release the LSH lineage caches "
        "after ranks/labels are checkpoint-materialized"
    )
    assert df.count() > 0


def test_parity_sweep_batches_cover_every_oracle_exactly_once():
    # The threaded sweep partitions sorted(ORACLES) by stride; the
    # batches must be a disjoint cover (a dropped or double-counted
    # query would silently weaken the driver-gate replica).
    from etl_mri_scripts_spark.queries import ORACLES, QUERIES

    from .test_oracle_parity import N_BATCHES

    names = sorted(ORACLES)
    batches = [names[b::N_BATCHES] for b in range(N_BATCHES)]
    flat = [n for b in batches for n in b]
    assert sorted(flat) == names
    assert len(flat) == len(set(flat))
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    ro = [rows_only[b::4] for b in range(4)]
    assert sorted(n for b in ro for n in b) == rows_only


def test_threaded_parity_session_isolates_conf(spark):
    # Worker threads run queries on spark.newSession() + tune(): a conf
    # the query shrinks at plan time (the imaging Arrow batch guard)
    # must not leak into the parent session, and the child must carry
    # the UTC timezone parity depends on.
    from etl_mri_scripts_spark.session import tune

    child = tune(spark.newSession())
    assert child.conf.get("spark.sql.session.timeZone") == "UTC"
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    parent_prev = spark.conf.get(key, None)
    child.conf.set(key, "16")
    assert spark.conf.get(key, None) == parent_prev
