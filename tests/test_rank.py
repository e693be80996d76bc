"""operators/rank.py: the two-phase offset rank must be bit-identical to
the single-partition window forms it replaces, for every partition-count
regime (1 partition, more partitions than rows, ties-free total orders,
descending keys, and the running-sum / NTILE compositions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_mri_scripts_spark.operators.rank import (
    global_order_prefix,
    global_row_number,
    ntile_from_rank,
)


def _rows(n, seed=7):
    # deterministic pseudo-random values with duplicates in v (the order
    # includes k as tie-break, so the total order is unique)
    vals = []
    x = seed
    for k in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        vals.append((k, x % 97))
    return vals


@pytest.mark.parametrize("n,parts", [(1, 4), (7, 32), (500, 3), (500, 1), (500, 700)])
def test_global_row_number_matches_window(spark, n, parts):
    df = spark.createDataFrame(_rows(n), "k long, v long")
    ranked, total = global_row_number(df, ["v", "k"], num_partitions=parts)
    assert total == n
    expect = {
        (r["k"]): r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "k"))
        ).collect()
    }
    got = {r["k"]: r["rn"] for r in ranked.collect()}
    assert got == expect


def test_global_row_number_desc_order(spark):
    df = spark.createDataFrame(_rows(300), "k long, v long")
    ranked, _ = global_row_number(df, [F.desc("v"), F.asc("k")], num_partitions=8)
    expect = {
        r["k"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("k")))
        ).collect()
    }
    assert {r["k"]: r["rn"] for r in ranked.collect()} == expect


@pytest.mark.parametrize("parts", [1, 5, 64])
def test_global_order_prefix_running_sum(spark, parts):
    df = spark.createDataFrame(_rows(400), "k long, v long")
    out, n, tot = global_order_prefix(
        df, ["v", "k"], sum_col="v", rank_col="rn", cum_col="cum", num_partitions=parts
    )
    w = Window.orderBy("v", "k")
    expect = {
        r["k"]: (r["rn"], r["cum"])
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum"),
        ).collect()
    }
    got = {r["k"]: (r["rn"], r["cum"]) for r in out.collect()}
    assert got == expect
    assert n == 400
    assert tot == sum(v for _, v in _rows(400))


@pytest.mark.parametrize("total,k", [(1, 4), (9, 4), (10, 10), (103, 10), (400, 7)])
def test_ntile_from_rank_matches_window_ntile(spark, total, k):
    df = spark.createDataFrame([(i,) for i in range(total)], "k long")
    expect = {
        r["k"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy("k"))
        ).collect()
    }
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", ntile_from_rank(F.col("k") + 1, total, k).alias("b")
        ).collect()
    }
    assert got == expect


def test_rank_plan_has_no_single_partition_window(spark):
    df = spark.createDataFrame(_rows(100), "k long, v long")
    ranked, _ = global_row_number(df, ["v", "k"], num_partitions=8)
    tree = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in tree


@pytest.mark.parametrize("parts", [1, 6, 64])
def test_group_row_number_matches_partitioned_window(spark, parts):
    from etl_mri_scripts_spark.operators.rank import group_row_number

    rows = [(k, k % 5, v) for k, v in _rows(300)]
    df = spark.createDataFrame(rows, "k long, g long, v long")
    got_df = group_row_number(
        df, ["g"], ["v", "k"], rank_col="rn", count_col="cnt", num_partitions=parts
    )
    w = Window.partitionBy("g").orderBy("v", "k")
    expect = {
        r["k"]: (r["rn"], r["cnt"])
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("cnt"),
        ).collect()
    }
    got = {r["k"]: (r["rn"], r["cnt"]) for r in got_df.collect()}
    assert got == expect


def test_group_row_number_desc_order(spark):
    from etl_mri_scripts_spark.operators.rank import group_row_number

    rows = [(k, k % 3, v) for k, v in _rows(200)]
    df = spark.createDataFrame(rows, "k long, g long, v long")
    got_df = group_row_number(
        df, ["g"], [F.desc("v"), F.asc("k")], rank_col="rn", num_partitions=8
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("k"))
    expect = {
        r["k"]: r["rn"]
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert {r["k"]: r["rn"] for r in got_df.collect()} == expect


@pytest.mark.parametrize("parts", [1, 6, 64])
def test_group_running_sum_matches_partitioned_window(spark, parts):
    from etl_mri_scripts_spark.operators.rank import group_running_sum

    rows = [(k, k % 4, v) for k, v in _rows(300)]
    df = spark.createDataFrame(rows, "k long, g long, v long")
    got_df = group_running_sum(
        df, ["g"], ["k"], "v", cum_col="cum", num_partitions=parts
    )
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = {
        r["k"]: r["cum"]
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert {r["k"]: r["cum"] for r in got_df.collect()} == expect


def test_group_rank_spreads_mega_group_across_partitions(spark):
    # The scale claim vs Window.partitionBy(group): a group holding 90% of
    # all rows must NOT concentrate on one task. Range partitioning on
    # (group, order) spreads it across buckets; assert no partition holds
    # more than ~2x the ideal share.
    from etl_mri_scripts_spark.operators.rank import group_row_number

    n, parts = 4000, 16
    rows = [(k, 0 if k < n * 9 // 10 else 1 + k % 3, k) for k in range(n)]
    df = spark.createDataFrame(rows, "k long, g long, v long")
    ranked = group_row_number(df, ["g"], ["v", "k"], rank_col="rn", num_partitions=parts)
    # correctness under skew
    mega = [r for r in ranked.collect() if r["g"] == 0]
    assert sorted(r["rn"] for r in mega) == list(range(1, len(mega) + 1))
    # spread: inspect the physical partition sizes of the ranked sort
    sizes = (
        df.repartitionByRange(parts, "g", "v", "k")
        .rdd.glom()
        .map(len)
        .collect()
    )
    assert max(sizes) <= 2 * (n // parts) + 1, sizes


def test_group_running_sum_handles_negative_values(spark):
    # The per-group base is extracted with min_by(cum - x, rank), which is
    # exact for any sign of x (a plain min(cum - x) would not be).
    from etl_mri_scripts_spark.operators.rank import group_running_sum

    rows = [(k, k % 3, (v % 21) - 10) for k, v in _rows(200)]
    df = spark.createDataFrame(rows, "k long, g long, v long")
    got_df = group_running_sum(df, ["g"], ["k"], "v", cum_col="cum", num_partitions=7)
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = {
        r["k"]: r["cum"]
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert {r["k"]: r["cum"] for r in got_df.collect()} == expect


def test_rank_broadcast_offset_fallback_path(spark, monkeypatch):
    # Force the >_MAP_EXPR_MAX_PARTITIONS branch (broadcast join instead
    # of a literal offset map) and check it produces identical ranks and
    # running sums.
    import etl_mri_scripts_spark.operators.rank as rank_mod

    monkeypatch.setattr(rank_mod, "_MAP_EXPR_MAX_PARTITIONS", 2)
    df = spark.createDataFrame(_rows(200), "k long, v long")
    ranked, total = rank_mod.global_row_number(df, ["v", "k"], num_partitions=8)
    assert total == 200
    expect = {
        r["k"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert {r["k"]: r["rn"] for r in ranked.collect()} == expect

    out, n, tot = rank_mod.global_order_prefix(
        df, ["v", "k"], sum_col="v", rank_col="rn", cum_col="cum", num_partitions=8
    )
    w = Window.orderBy("v", "k")
    expect2 = {
        r["k"]: (r["rn"], r["cum"])
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum"),
        ).collect()
    }
    assert {r["k"]: (r["rn"], r["cum"]) for r in out.collect()} == expect2


def test_group_helpers_degenerate_shapes(spark):
    # one group holding everything, and all-singleton groups
    from etl_mri_scripts_spark.operators.rank import group_row_number, group_running_sum

    one = spark.createDataFrame([(k, 0, k * 3) for k in range(50)], "k long, g long, v long")
    r1 = group_row_number(one, ["g"], ["k"], rank_col="rn", count_col="cnt", num_partitions=4)
    rows = {r["k"]: (r["rn"], r["cnt"]) for r in r1.collect()}
    assert rows == {k: (k + 1, 50) for k in range(50)}

    singletons = spark.createDataFrame(
        [(k, k, k + 7) for k in range(40)], "k long, g long, v long"
    )
    r2 = group_running_sum(singletons, ["g"], ["k"], "v", cum_col="cum", num_partitions=4)
    assert all(r["cum"] == r["v"] for r in r2.collect())


def test_reliable_checkpoint_mode_identical_ranks(spark, tmp_path):
    """The opt-in reliable-checkpoint mode (lossy-cluster escape hatch)
    must produce ranks and running sums identical to the default
    localCheckpoint mode, and must fail loudly when no checkpoint dir
    is configured."""
    from etl_mri_scripts_spark.operators.rank import (
        _CHECKPOINT_MODE_KEY,
        global_order_prefix,
    )

    df = spark.createDataFrame(_rows(300), "k long, v long")
    base, n0, s0 = global_order_prefix(df, ["v", "k"], sum_col="v", num_partitions=8)
    expect = {r["k"]: (r["rn"], r["cum"]) for r in base.collect()}

    spark.conf.set(_CHECKPOINT_MODE_KEY, "reliable")
    try:
        # no checkpoint dir -> loud failure, not silent fallback
        had_dir = spark.sparkContext.getCheckpointDir()
        if had_dir is None:
            with pytest.raises(ValueError, match="setCheckpointDir"):
                global_order_prefix(df, ["v", "k"], num_partitions=8)
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        out, n1, s1 = global_order_prefix(df, ["v", "k"], sum_col="v", num_partitions=8)
        assert (n1, s1) == (n0, s0)
        assert {r["k"]: (r["rn"], r["cum"]) for r in out.collect()} == expect
    finally:
        spark.conf.set(_CHECKPOINT_MODE_KEY, "local")

    # unknown mode is rejected
    spark.conf.set(_CHECKPOINT_MODE_KEY, "bogus")
    try:
        with pytest.raises(ValueError, match="local.*reliable|reliable.*local"):
            global_order_prefix(df, ["v", "k"], num_partitions=8)
    finally:
        spark.conf.set(_CHECKPOINT_MODE_KEY, "local")


def test_group_helpers_keep_null_group_rows(spark):
    """Window.partitionBy treats NULL as a real partition; the two-phase
    helpers must too (r5 review: the plain equi-join attach silently
    dropped every NULL-group row)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_mri_scripts_spark.operators.rank import group_row_number, group_running_sum

    rows = [("a", 1, 10), ("a", 2, 20), (None, 3, 30), (None, 4, 40), ("b", 5, 50)]
    df = spark.createDataFrame(rows, "g string, ord int, x long")

    got = group_row_number(df, ["g"], ["ord"], rank_col="rn", count_col="n").collect()
    assert len(got) == 5, "NULL-group rows were dropped"
    w = Window.partitionBy("g").orderBy("ord")
    want = {
        (r["g"], r["ord"]): (r["rn"], r["n"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect()
    }
    for r in got:
        assert (r["rn"], r["n"]) == want[(r["g"], r["ord"])], r

    got2 = group_running_sum(df, ["g"], ["ord"], "x", cum_col="cum").collect()
    assert len(got2) == 5, "NULL-group rows were dropped"
    w2 = w.rowsBetween(Window.unboundedPreceding, 0)
    want2 = {
        (r["g"], r["ord"]): r["cum"]
        for r in df.withColumn("cum", F.sum("x").over(w2)).collect()
    }
    for r in got2:
        assert r["cum"] == want2[(r["g"], r["ord"])], r
