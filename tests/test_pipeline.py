"""End-to-end imaging pipeline on synthetic volumes: the invariants the
reference enforces at runtime (SURVEY.md §5) — key parity, patch counts
from grid arithmetic, split group-consistency, determinism, sink layout."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_mri_scripts_spark.operators.patches import make_crop_spaces
from etl_mri_scripts_spark.operators.pipeline import (
    PipelineConfig,
    degrade_and_patch,
    explode_slices,
    gate_approved,
    key_parity_violations,
    run_pipeline,
    write_dataset,
)
from etl_mri_scripts_spark.sources.volumes import npy_bytes_to_np, synthetic_volumes

CFG = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,), preset="3tFlash")
SHAPE = (32, 32, 6)


@pytest.fixture(scope="module")
def volumes(spark):
    return synthetic_volumes(spark, n_volumes=2, shape=SHAPE, seed=11).cache()


@pytest.fixture(scope="module")
def gated(spark, volumes):
    return run_pipeline(spark, volumes, CFG).cache()


def test_volume_source_deterministic(spark):
    a = synthetic_volumes(spark, 2, SHAPE, seed=11).select("base", F.md5("voxels").alias("h")).collect()
    b = synthetic_volumes(spark, 2, SHAPE, seed=11).select("base", F.md5("voxels").alias("h")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_slice_explode_counts_and_quirk(spark, volumes):
    slices = explode_slices(volumes, CFG)
    counts = {
        (r["orient"]): r["n"]
        for r in slices.groupBy("orient").agg(F.count("*").alias("n")).collect()
    }
    sx, sy, sz = SHAPE
    n_vol = 2
    assert counts["axial"] == n_vol * sz
    assert counts["coronal"] == n_vol * sz  # the reference's coronal quirk
    assert counts["sagittal"] == n_vol * sy


def test_slice_normalization_bounds(spark, volumes):
    slices = explode_slices(volumes, CFG)
    row = slices.first()
    arr = npy_bytes_to_np(row["pixels"])
    assert arr.dtype == np.float32
    assert 0.0 <= float(arr.min()) and float(arr.max()) <= 1.0
    assert row["vmax"] > row["vmin"]


def test_patch_counts_match_grid_arithmetic(spark, volumes):
    slices = explode_slices(volumes, CFG).limit(4).cache()
    patches = degrade_and_patch(slices, CFG)
    per_slice = (
        patches.filter(F.col("resolution") == "HR")
        .groupBy("base", "orient", "slice_i")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    h, w = SHAPE[0], SHAPE[1]  # axial slices are (sx, sy)
    hs, ws = make_crop_spaces(h, w, CFG.crop_hr, CFG.step_hr, CFG.thresh_size)
    expected = len(hs) * len(ws)
    for r in per_slice:
        assert r["n"] == expected, (r, expected)
    # LR patch shape arithmetic: crop_lr = crop_hr // scale
    lr = patches.filter(F.col("resolution") == "LRx2").first()
    assert lr["h"] == CFG.crop_hr // 2 and lr["w"] == CFG.crop_hr // 2
    tile = npy_bytes_to_np(lr["value"])
    assert tile.shape == (CFG.crop_hr // 2, CFG.crop_hr // 2)


def test_key_parity_holds(gated):
    violations = key_parity_violations(gated)
    assert violations.count() == 0


def test_key_parity_detects_breakage(spark, gated):
    # drop one LR row -> exactly one missing_in_lr violation
    victim = gated.filter(F.col("resolution") == "LRx2").select("key").first()["key"]
    broken = gated.filter(~((F.col("resolution") == "LRx2") & (F.col("key") == victim)))
    v = key_parity_violations(broken).collect()
    assert len(v) == 1 and v[0]["kind"] == "missing_in_lr" and v[0]["key"] == victim


def test_split_group_consistency(gated):
    # every base maps to exactly one split (M2 invariant)
    multi = (
        gated.groupBy("base").agg(F.countDistinct("split").alias("k")).filter(F.col("k") > 1)
    )
    assert multi.count() == 0


def test_gate_removes_dark_only(spark, volumes):
    patches = degrade_and_patch(explode_slices(volumes, CFG), CFG).cache()
    gated = gate_approved(patches)
    n_dark = patches.filter((F.col("resolution") == "HR") & F.col("is_dark")).count()
    n_hr_all = patches.filter(F.col("resolution") == "HR").count()
    n_hr_kept = gated.filter(F.col("resolution") == "HR").count()
    assert n_hr_kept == n_hr_all - n_dark
    assert n_dark > 0  # synthetic corners are dark; the gate must really fire
    patches.unpersist()


def test_pipeline_determinism(spark, volumes):
    df1 = run_pipeline(spark, volumes, CFG).select("key", "resolution", F.md5("value").alias("h"))
    df2 = run_pipeline(spark, volumes, CFG).select("key", "resolution", F.md5("value").alias("h"))
    assert df1.exceptAll(df2).count() == 0 and df2.exceptAll(df1).count() == 0


def test_write_dataset_layout(spark, gated, tmp_path):
    out = str(tmp_path / "patches")
    write_dataset(gated, out)
    back = spark.read.parquet(out)
    assert back.count() == gated.count()
    # partition columns survive round-trip
    assert {"resolution", "split"} <= set(back.columns)
    # meta sidecar line format (v2/lmdb_npy.py:48)
    m = back.select("meta_line").first()["meta_line"]
    assert m.endswith(("float32", "float16")) and ".npy (" in m


def test_skewed_volume_mix_spreads_patch_work(spark):
    # fan-out skew guard (SURVEY §4): one big volume among tiny ones must
    # NOT keep its slices on one partition — the repartition(slice_id)
    # before patch work spreads the explosion
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, run_pipeline
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    big = synthetic_volumes(spark, 1, (64, 64, 24), seed=31)
    small = synthetic_volumes(spark, 3, (12, 12, 4), seed=32).withColumn(
        "base", F.concat(F.lit("tiny-"), F.col("base"))
    )
    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))
    out = run_pipeline(spark, big.unionByName(small), cfg).cache()

    # key parity across the mix
    by_res = {r["resolution"]: r["n"] for r in out.groupBy("resolution").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_res["HR"] == by_res["LRx2"] > 0

    # the big volume's patches land on many partitions, not one
    pids = (
        out.filter(~F.col("base").startswith("tiny-"))
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert pids >= 8, f"big volume's work on only {pids} partitions"


# --------- action-time Arrow batch restore (r7 verdict demand #5) ---------


def test_arrow_batch_restored_after_imaging_action(spark, tmp_path):
    """A relational/pandas-UDF query run AFTER an imaging job in the same
    session must see the session-default Arrow batch size: run_pipeline
    shrinks at plan time (load-bearing for big volume rows), and
    write_dataset — the terminal action — must restore the TRUE pre-shrink
    value, not the already-shrunk one it observes when it starts."""
    from etl_mri_scripts_spark.operators.pipeline import (
        ARROW_VOLUME_BATCH,
        PipelineConfig,
        run_pipeline,
        volume_batch_scope,
        write_dataset,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    # Earlier tests in this module call run_pipeline without a shipped
    # terminal action, leaving the session pre-shrunk. An empty scope
    # cycle repairs exactly that (restores the FIRST recorded pre-shrink
    # value) — run one so this test starts from the true session default.
    with volume_batch_scope(spark):
        pass
    default = spark.conf.get(key, None)
    assert default != str(ARROW_VOLUME_BATCH), "test precondition"

    vols = synthetic_volumes(spark, 1, (12, 12, 4), seed=7)
    patches = run_pipeline(spark, vols, PipelineConfig(crop_hr=8, step_hr=8))
    # plan time: the shrink is live (it must be — the action reads it)
    assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
    write_dataset(patches, str(tmp_path / "ds"))
    # action done: the session is back at its default
    assert spark.conf.get(key, None) == default

    # the bench_imaging form: explicit scope around plan + collect
    with volume_batch_scope(spark):
        out = run_pipeline(spark, vols, PipelineConfig(crop_hr=8, step_hr=8))
        assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
        assert out.count() > 0
    assert spark.conf.get(key, None) == default


def test_volume_batch_scope_nesting_keeps_outer_guard(spark):
    """An inner action completing must not strip the shrink from an
    enclosing scope (depth ref-count), and the outermost exit restores."""
    from etl_mri_scripts_spark.operators.pipeline import (
        ARROW_VOLUME_BATCH,
        volume_batch_scope,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    with volume_batch_scope(spark):  # normalize a possibly pre-shrunk session
        pass
    default = spark.conf.get(key, None)
    with volume_batch_scope(spark):
        with volume_batch_scope(spark):
            assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
        # inner exit: guard still live for the outer scope's action
        assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
    assert spark.conf.get(key, None) == default


def test_hold_keeps_shrink_past_scope_exit(spark):
    """The streaming-lifetime hold (r8 review): a batch scope entered and
    exited WHILE a hold is live must not restore the default under the
    holder — only the final release does. release() is idempotent (the
    termination listener and the isActive re-check may both fire)."""
    from etl_mri_scripts_spark.operators.pipeline import (
        ARROW_VOLUME_BATCH,
        hold_volume_batch,
        volume_batch_scope,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    with volume_batch_scope(spark):  # normalize a possibly pre-shrunk session
        pass
    default = spark.conf.get(key, None)

    release = hold_volume_batch(spark)  # a stream starts
    assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
    with volume_batch_scope(spark):  # a concurrent batch imaging job
        pass
    # batch job done, but the stream still depends on the shrink
    assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
    release()  # stream terminated
    assert spark.conf.get(key, None) == default
    release()  # listener double-fire: no second restore, no error
    assert spark.conf.get(key, None) == default


def test_shrink_state_is_per_session(spark):
    """Runtime conf is per-SparkSession, so the restore bookkeeping must
    be too: a sibling session's scope exit must restore the SIBLING's
    prior value into the sibling's conf, never leak the parent's state
    (r8 review: the old process-global dict shared depth/prev across
    sessions)."""
    from etl_mri_scripts_spark.operators.pipeline import (
        ARROW_VOLUME_BATCH,
        volume_batch_scope,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    with volume_batch_scope(spark):
        pass
    default = spark.conf.get(key, None)

    sibling = spark.newSession()
    try:
        sibling.conf.set(key, "777")  # sibling's own prior state
        with volume_batch_scope(spark):  # parent shrinks
            with volume_batch_scope(sibling):  # sibling shrinks + exits
                assert sibling.conf.get(key) == str(ARROW_VOLUME_BATCH)
            # sibling restored to ITS prior value, not the parent's
            assert sibling.conf.get(key) == "777"
            # parent's guard untouched by the sibling's exit
            assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
        assert spark.conf.get(key, None) == default
    finally:
        sibling.conf.unset(key)
