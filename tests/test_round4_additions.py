"""Round-4 additions: count-min sketch invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mri_scripts_spark.queries import QUERIES
from etl_mri_scripts_spark.queries.quality import CMS_D, CMS_TOPK, CMS_W
from etl_mri_scripts_spark.tables import table


def test_countmin_never_underestimates_and_ranks_exactly(spark, sf_dir):
    rows = QUERIES["sketch_countmin_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == CMS_TOPK
    # CMS guarantee: estimate >= exact, always
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_estimate"] == r["exact_cnt"] + r["overestimate"] for r in rows)
    # report is the exact top-k (truth ordering, not estimate ordering)
    exacts = [r["exact_cnt"] for r in rows]
    assert exacts == sorted(exacts, reverse=True)
    li = table(spark, sf_dir, "lineitem")
    true_top = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "l_suppkey")
        .limit(CMS_TOPK)
        .collect()
    )
    assert [r["key"] for r in rows] == [r["l_suppkey"] for r in true_top]


def test_countmin_state_is_fixed_size(spark, sf_dir):
    # The sketch the query builds is a d x w grid no matter the key
    # cardinality — the whole point of the structure. Rebuild the cells
    # relation the same way and check its bound.
    li = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("key"))
    counts = li.groupBy("key").agg(F.count(F.lit(1)).alias("exact_cnt"))

    def bucket(i):
        digest = F.md5(
            F.concat(F.lit(f"{i}:"), F.col("key").cast("string")).cast("binary")
        )
        return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % CMS_W

    cells = (
        counts.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("h"), bucket(i).alias("bucket"))
                        for i in range(CMS_D)
                    ]
                )
            ).alias("s"),
            "exact_cnt",
        )
        .groupBy("s.h", "s.bucket")
        .agg(F.sum("exact_cnt").alias("cell"))
    )
    assert cells.count() <= CMS_D * CMS_W


def test_kmv_estimate_within_tolerance_and_plan_bounded(spark, sf_dir):
    from etl_mri_scripts_spark.queries.quality import KMV_K

    df = QUERIES["sketch_kmv_distinct_by_nation"](spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        if r["is_exact"]:
            assert r["kmv_estimate"] == r["exact_distinct"]
        else:
            # KMV relative error ~ 1/sqrt(k-1) ≈ 18% at k=32; allow 2.5x
            assert (
                abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
                < 2.5 / (KMV_K - 1) ** 0.5
            ), r
    # the k-smallest selection must run as WindowGroupLimit (map-side
    # partial top-k), not a full per-group window sort
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in tree
