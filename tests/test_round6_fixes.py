"""Round-6 review-fix pins: NULL handling in SQL-registered functions,
floor semantics of the NANOS timestamp coercion, streaming counter
timeout wiring, and incremental-sink idempotent replay layout."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from etl_mri_scripts_spark.functions.registry import register_all

    register_all(spark)


def test_normalize_key_udf_propagates_null(spark):
    rows = spark.sql(
        "SELECT normalize_key(k) AS nk FROM VALUES ('a_hr_x'), (NULL) AS t(k) ORDER BY nk"
    ).collect()
    vals = [r["nk"] for r in rows]
    assert None in vals and len(vals) == 2


def test_p98_skips_nulls_and_all_null_group_is_null(spark):
    rows = spark.sql(
        """
        SELECT g, p98(x) AS p FROM VALUES
          ('a', CAST(1.0 AS DOUBLE)), ('a', 2.0), ('a', NULL),
          ('b', NULL)
        AS t(g, x) GROUP BY g ORDER BY g
        """
    ).collect()
    by_g = {r["g"]: r["p"] for r in rows}
    assert by_g["a"] == pytest.approx(1.98)  # percentile of [1, 2], not NaN
    assert by_g["b"] is None


def test_nanos_floor_division_expression(spark):
    # the exact expression tables.table applies to NANOS longs: floor,
    # not truncate-toward-zero, for pre-epoch residues
    rows = spark.sql(
        """
        SELECT ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END) AS us
        FROM VALUES (CAST(-1500 AS BIGINT)), (-1000), (-1), (0), (1), (1500)
        AS t(ts) ORDER BY ts
        """
    ).collect()
    assert [r["us"] for r in rows] == [-2, -1, -1, 0, 0, 1]


def test_running_counters_gap_timeout_armed(spark, tmp_path):
    # the timeout path must still produce correct totals when it never
    # fires (wall-clock eviction itself is not unit-testable quickly)
    import os

    from etl_mri_scripts_spark.streaming.pipeline import running_counters_stream

    in_dir = str(tmp_path / "ev")
    os.makedirs(in_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    from datetime import datetime

    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0), 1, "click", 2.0, None),
         (2, datetime(2024, 1, 1, 0, 1, 0), 1, "click", 3.0, None)],
        schema,
    ).write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        running_counters_stream(stream, gap_timeout="1 hour")
        .writeStream.format("memory")
        .queryName("counters_timeout")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from counters_timeout").collect()
    assert len(rows) == 1
    assert rows[0]["n_total"] == 2 and rows[0]["value_total"] == pytest.approx(5.0)


def test_incremental_sink_replay_is_idempotent(spark, tmp_path):
    # re-running a batch_id overwrites its own partition instead of
    # duplicating rows — the foreachBatch idempotency recipe
    from etl_mri_scripts_spark.operators.pipeline import (
        PipelineConfig,
        assign_split,
        degrade_and_patch,
        explode_slices,
    )
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    out_dir = str(tmp_path / "out")
    # small-crop geometry: the tiny fixture volume's patches survive the
    # dark gate (the production default gates them all out as dark)
    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))
    vols = synthetic_volumes(spark, 1, (24, 24, 4), seed=3)
    patches = assign_split(
        degrade_and_patch(explode_slices(vols, cfg), cfg, gated=True), cfg
    )

    def write_batch(batch_id: int) -> None:
        (
            patches.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "resolution", "split")
            .parquet(out_dir)
        )

    write_batch(0)
    n1 = spark.read.parquet(out_dir).count()
    write_batch(0)  # replay of the same micro-batch
    assert spark.read.parquet(out_dir).count() == n1
    write_batch(1)  # a genuinely new batch appends its own partition
    assert spark.read.parquet(out_dir).count() == 2 * n1
