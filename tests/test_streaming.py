"""Streaming surface: windowed agg parity with batch, incremental pipeline
exactly-once semantics across restarts."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from etl_mri_scripts_spark.streaming.pipeline import (
    hourly_counts_stream,
    run_incremental_pipeline,
    stream_events,
)


def _wait(q, timeout=60):
    q.awaitTermination(timeout * 1000)


def test_streaming_hourly_matches_batch(spark, tmp_path, sf_dir):
    # feed the events table through the file stream in two chunks; the
    # streaming result must equal the batch query on the union.
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=1)
    a.write.mode("overwrite").json(in_dir + "/chunk=a")
    b.write.mode("overwrite").json(in_dir + "/chunk=b")

    stream = stream_events(spark, in_dir + "/*", fmt="json")
    agg = hourly_counts_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from hourly").collect()
    }
    expected = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .collect()
    }
    assert got == expected


def test_stateful_counters_accumulate_across_batches(spark, tmp_path, sf_dir):
    # applyInPandasWithState: totals must ACCUMULATE across micro-batches
    # (two file drops -> two batches), ending at the batch-query totals.
    from etl_mri_scripts_spark.streaming.pipeline import running_counters_stream
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events")
    in_dir = str(tmp_path / "sin")
    os.makedirs(in_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=2)
    a.write.mode("overwrite").json(in_dir + "/chunk=a")

    stream = stream_events(spark, in_dir + "/*", fmt="json")
    counters = running_counters_stream(stream)
    q = (
        counters.writeStream.format("memory")
        .queryName("counters")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        b.write.mode("overwrite").json(in_dir + "/chunk=b")
        q.processAllAvailable()
    finally:
        q.stop()
    # latest state per type (highest n_batches) must equal the batch totals
    rows = spark.sql("select * from counters").collect()
    latest = {}
    for r in sorted(rows, key=lambda r: r["n_batches"]):
        latest[r["event_type"]] = (r["n_total"], round(r["value_total"], 4))
    expected = {
        r["event_type"]: (r["n"], round(r["v"], 4))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert latest == expected


def test_incremental_pipeline_exactly_once(spark, tmp_path):
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    vols_dir = str(tmp_path / "vols")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # the production default geometry (batch-aligned crop 32/16) gates
    # out every patch of these tiny fixture volumes as dark -> pass an
    # explicit small-crop config, as a real small-volume deployment would
    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))

    v1 = synthetic_volumes(spark, 1, (24, 24, 4), seed=3)
    v1.write.mode("overwrite").parquet(vols_dir)

    q = run_incremental_pipeline(spark, vols_dir, out_dir, ckpt, config=cfg)
    _wait(q)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # restart with NO new data: checkpoint must prevent reprocessing
    q2 = run_incremental_pipeline(spark, vols_dir, out_dir, ckpt, config=cfg)
    _wait(q2)
    assert spark.read.parquet(out_dir).count() == n1

    # drop one new volume file -> only its patches are appended
    v2 = synthetic_volumes(spark, 2, (24, 24, 4), seed=9).filter(F.col("base") == "sub-001_T1w")
    v2.write.mode("append").parquet(vols_dir)
    q3 = run_incremental_pipeline(spark, vols_dir, out_dir, ckpt, config=cfg)
    _wait(q3)
    n3 = spark.read.parquet(out_dir).count()
    assert n3 > n1
    bases = {r["base"] for r in spark.read.parquet(out_dir).select("base").distinct().collect()}
    assert bases == {"sub-000_T1w", "sub-001_T1w"}


def test_incremental_pipeline_releases_arrow_hold_on_termination(spark, tmp_path):
    """The Arrow-shrink hold a stream takes for its lifetime must be
    released once the query terminates (listener-driven), restoring the
    session default for later batch/pandas-UDF work — and must stay LIVE
    while the stream runs even if a concurrent batch imaging scope exits
    in between (r8 review: the old plain shrink was restorable from under
    the stream by any scope exit)."""
    import time

    from etl_mri_scripts_spark.operators.pipeline import (
        ARROW_VOLUME_BATCH,
        PipelineConfig,
        volume_batch_scope,
    )
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    with volume_batch_scope(spark):  # normalize a possibly pre-shrunk session
        pass
    default = spark.conf.get(key, None)
    assert default != str(ARROW_VOLUME_BATCH), "test precondition"

    vols_dir = str(tmp_path / "vols")
    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))
    synthetic_volumes(spark, 1, (24, 24, 4), seed=3).write.parquet(vols_dir)

    q = run_incremental_pipeline(
        spark, vols_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"), config=cfg
    )
    # while the stream is live, a batch scope entering AND exiting must
    # not strip the stream's shrink (ref-counted hold)
    if q.isActive:
        with volume_batch_scope(spark):
            pass
        if q.isActive:  # may have drained during the scope; re-check
            assert spark.conf.get(key) == str(ARROW_VOLUME_BATCH)
    _wait(q)
    # termination listener fires on the listener-bus thread: poll briefly
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        if spark.conf.get(key, None) == default:
            break
        time.sleep(0.2)
    assert spark.conf.get(key, None) == default


def test_incremental_pipeline_refuses_pre_r6_sink_layout(spark, tmp_path):
    """Resuming against an out_dir written by the pre-r6 append layout
    (partitionBy(resolution, split) — no batch_id level) must refuse
    loudly instead of mixing two partition schemes (r6 ADVICE)."""
    out_dir = tmp_path / "out"
    (out_dir / "resolution=hr" / "split=train").mkdir(parents=True)
    with pytest.raises(ValueError, match="pre-r6 sink layout"):
        run_incremental_pipeline(
            spark, str(tmp_path / "vols"), str(out_dir), str(tmp_path / "ckpt")
        )
    # the MIXED state (old resolution= beside new batch_id=) is just as
    # broken for partition discovery and must refuse too
    (out_dir / "batch_id=0" / "resolution=hr" / "split=train").mkdir(parents=True)
    with pytest.raises(ValueError, match="mixed with batch_id"):
        run_incremental_pipeline(
            spark, str(tmp_path / "vols"), str(out_dir), str(tmp_path / "ckpt")
        )


def test_streaming_dedup_across_batches(spark, tmp_path):
    # cross-batch exact dedup: a duplicate text arriving in a LATER
    # micro-batch must be dropped by retained state
    from etl_mri_scripts_spark.streaming.pipeline import dedup_stream

    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")], schema
    ).write.mode("overwrite").json(in_dir + "/chunk=a")

    stream = spark.readStream.schema(schema).json(in_dir + "/*")
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(4, "gamma delta"), (5, "epsilon zeta")], schema
        ).write.mode("overwrite").json(in_dir + "/chunk=b")
        q.processAllAvailable()
    finally:
        q.stop()
    texts = sorted(r["text"] for r in spark.sql("select * from dedup_docs").collect())
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path, sf_dir):
    # The streamed purchase->error interval pairs must equal the batch
    # range join over the same rows.
    from etl_mri_scripts_spark.streaming.pipeline import interval_join_stream
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=7)
    a.write.mode("overwrite").json(in_dir + "/chunk=a")
    b.write.mode("overwrite").json(in_dir + "/chunk=b")

    stream = stream_events(spark, in_dir + "/*", fmt="json")
    joined = interval_join_stream(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "error"),
        window_sec=300,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = {
        (r["purchase_id"], r["error_id"])
        for r in spark.sql("select * from ivjoin").collect()
    }
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    r = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("ets")
    )
    expected = {
        (row["purchase_id"], row["error_id"])
        for row in p.join(
            r,
            (F.col("ets") >= F.col("pts"))
            & (F.col("ets") < F.col("pts") + F.expr("INTERVAL 300 SECONDS")),
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_stream_static_enrichment_matches_batch(spark, tmp_path, sf_dir):
    # decorate the event stream with a static user-tier dimension; the
    # streamed result must equal the batch broadcast join.
    from etl_mri_scripts_spark.streaming.pipeline import enrich_stream
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().select(
        "user_id", (F.col("user_id") % 3).alias("tier")
    )
    in_dir = str(tmp_path / "in_enrich")
    os.makedirs(in_dir)
    ev.write.mode("overwrite").json(in_dir + "/chunk=a")

    stream = stream_events(spark, in_dir + "/*", fmt="json")
    q = (
        enrich_stream(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = {
        (r["event_id"], r["tier"])
        for r in spark.sql("select event_id, tier from enriched").collect()
    }
    expected = {
        (r["event_id"], r["tier"])
        for r in ev.join(F.broadcast(dim), "user_id", "left").select(
            "event_id", "tier"
        ).collect()
    }
    assert got == expected and len(got) == ev.count()


def test_dedup_within_watermark_drops_duplicates(spark, tmp_path, sf_dir):
    # feed the same events twice (at-least-once upstream); within the
    # watermark horizon every event_id must come out exactly once.
    from etl_mri_scripts_spark.streaming.pipeline import dedup_within_watermark_stream
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events").limit(500)
    in_dir = str(tmp_path / "in_dupes")
    os.makedirs(in_dir)
    ev.write.mode("overwrite").json(in_dir + "/chunk=a")
    ev.write.mode("overwrite").json(in_dir + "/chunk=b")  # exact redelivery

    stream = stream_events(spark, in_dir + "/*", fmt="json")
    q = (
        dedup_within_watermark_stream(stream, watermark="10 days")
        .writeStream.format("memory")
        .queryName("dd_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    rows = spark.sql("select event_id from dd_wm").collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)) == ev.count()


def test_streaming_attribution_matches_batch(spark, tmp_path, sf_dir):
    # Streaming last-touch attribution must reproduce the batch query when
    # fed the same events time-split into two micro-batches (early half
    # first, so cross-batch event-time order holds per user).
    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.streaming.pipeline import attribution_stream
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events")
    split_ts = ev.agg(F.percentile_approx("ts", F.lit(0.5), F.lit(100))).first()[0]
    in_dir = str(tmp_path / "ain")
    os.makedirs(in_dir)
    ev.filter(F.col("ts") <= F.lit(split_ts)).write.mode("overwrite").parquet(
        in_dir + "/chunk=a"
    )

    # parquet feed: json serializes timestamps at millisecond precision,
    # which perturbs the micro-exact gaps; parquet preserves micros.
    stream = stream_events(spark, in_dir + "/*", fmt="parquet")
    attributed = attribution_stream(stream)
    q = (
        attributed.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ackpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.col("ts") > F.lit(split_ts)).write.mode("overwrite").parquet(
            in_dir + "/chunk=b"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["purchase_event_id"], r["touch_event_id"], round(r["gap_seconds"], 3))
        for r in spark.sql("select * from attrib").collect()
    }
    expected = {
        (r["purchase_event_id"], r["touch_event_id"], round(r["gap_seconds"], 3))
        for r in QUERIES["events_last_touch_attribution"](spark, sf_dir).collect()
    }
    assert got == expected and len(expected) > 0


def test_streaming_twa_matches_batch_exactly(spark, tmp_path, sf_dir):
    # Incremental TWA must equal the batch query bit-exactly after the
    # final micro-batch (exact integer weights -> identical double).
    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.streaming.pipeline import time_weighted_avg_stream
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events")
    split_ts = ev.agg(F.percentile_approx("ts", F.lit(0.5), F.lit(100))).first()[0]
    in_dir = str(tmp_path / "twain")
    os.makedirs(in_dir)
    ev.filter(F.col("ts") <= F.lit(split_ts)).write.mode("overwrite").parquet(
        in_dir + "/chunk=a"
    )

    stream = stream_events(spark, in_dir + "/*", fmt="parquet")
    twa = time_weighted_avg_stream(stream)
    q = (
        twa.writeStream.format("memory")
        .queryName("twa")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "twackpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.col("ts") > F.lit(split_ts)).write.mode("overwrite").parquet(
            in_dir + "/chunk=b"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    # keep the LAST emitted row per user (max span: state only grows)
    rows = spark.sql("select * from twa").collect()
    latest = {}
    for r in rows:
        if r["user_id"] not in latest or r["span_us"] > latest[r["user_id"]]["span_us"]:
            latest[r["user_id"]] = r
    got = {
        u: (r["weighted_fixed"], r["span_us"], r["time_weighted_avg"])
        for u, r in latest.items()
    }
    expected = {
        r["user_id"]: (r["weighted_fixed"], r["span_us"], r["time_weighted_avg"])
        for r in QUERIES["events_time_weighted_avg"](spark, sf_dir).collect()
    }
    assert got == expected and len(expected) > 0


def test_transform_with_state_matches_applyinpandas_twin(spark, tmp_path, sf_dir):
    """transformWithStateInPandas (Spark 4 typed-state API) must produce
    the same running totals as the applyInPandasWithState form and the
    batch aggregate. Needs google.protobuf (the TWS state-server wire
    format) importable IN-PROCESS; when it isn't (no wheel in this
    container), the SAME parity assertion executes via the subprocess
    harness (tests/tws_harness.py) that injects a host-provided
    protobuf runtime into worker PYTHONPATH — so this test passes by
    real execution either way instead of skipping."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        from tests.tws_harness import run_tws_parity_subprocess

        run_tws_parity_subprocess(tmp_path)
        return
    from etl_mri_scripts_spark.streaming.pipeline import running_counters_tws_stream
    from etl_mri_scripts_spark.tables import table

    ev = table(spark, sf_dir, "events")
    in_dir = str(tmp_path / "twsin")
    os.makedirs(in_dir)
    a, b = ev.randomSplit([0.5, 0.5], seed=2)
    a.write.mode("overwrite").json(in_dir + "/chunk=a")

    stream = stream_events(spark, in_dir + "/*", fmt="json")
    counters = running_counters_tws_stream(stream)
    q = (
        counters.writeStream.format("memory")
        .queryName("tws_counters")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "twsckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        b.write.mode("overwrite").json(in_dir + "/chunk=b")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from tws_counters").collect()
    latest = {}
    for r in sorted(rows, key=lambda r: r["n_batches"]):
        latest[r["event_type"]] = (r["n_total"], round(r["value_total"], 4))
    expected = {
        r["event_type"]: (r["n"], round(r["v"], 4))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert latest == expected


def test_session_finalizer_emits_on_event_time_timeout(spark, tmp_path):
    """A user's session must be emitted exactly once — AFTER the watermark
    (driven by a later batch) passes last_event + gap — with the custom
    payload (count, span, first/last ids) intact."""
    from etl_mri_scripts_spark.streaming.pipeline import session_finalizer_stream

    in_dir = str(tmp_path / "fin")
    os.makedirs(in_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    from datetime import datetime

    def t_at(h, m):
        return datetime(2024, 1, 1, h, m, 0)

    rows_a = [
        (1, t_at(10, 0), 7, "view", 1.0, ""),
        (2, t_at(10, 3), 7, "click", 1.0, ""),
        (3, t_at(10, 5), 7, "purchase", 1.0, ""),
    ]
    spark.createDataFrame(rows_a, schema).write.mode("overwrite").json(in_dir + "/chunk=a")

    stream = stream_events(spark, in_dir + "/*", fmt="json")
    q = (
        session_finalizer_stream(stream, gap_sec=600, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("finalized")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "finck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # no session may close while the watermark sits at batch A
        assert spark.sql("select * from finalized").count() == 0
        # a much later event from ANOTHER user advances the watermark past
        # user 7's last_event + gap -> the timeout fires in batch B
        rows_b = [(9, t_at(12, 0), 8, "view", 1.0, "")]
        spark.createDataFrame(rows_b, schema).write.mode("overwrite").json(in_dir + "/chunk=b")
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from finalized").collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["user_id"] == 7 and r["n_events"] == 3
    assert r["first_event_id"] == 1 and r["last_event_id"] == 3
    assert str(r["session_start"]).startswith("2024-01-01 10:00")
    assert str(r["session_end"]).startswith("2024-01-01 10:05")


def test_session_finalizer_splits_same_batch_gap(spark, tmp_path):
    """Two events for one user separated by > gap INSIDE one microbatch
    must become two sessions (the single-session-state bug emitted one
    merged session); both seal once the watermark passes."""
    from etl_mri_scripts_spark.streaming.pipeline import session_finalizer_stream
    from datetime import datetime

    in_dir = str(tmp_path / "split")
    os.makedirs(in_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def t_at(h, m):
        return datetime(2024, 1, 1, h, m, 0)

    # one batch: 10:00 and 11:00 for user 7 — a 60-min gap >> 10-min gap_sec
    rows_a = [
        (1, t_at(10, 0), 7, "view", 1.0, ""),
        (2, t_at(11, 0), 7, "view", 1.0, ""),
    ]
    spark.createDataFrame(rows_a, schema).write.mode("overwrite").json(in_dir + "/chunk=a")
    stream = stream_events(spark, in_dir + "/*", fmt="json")
    q = (
        session_finalizer_stream(stream, gap_sec=600, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("split_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "splitck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows_b = [(9, t_at(13, 0), 8, "view", 1.0, "")]
        spark.createDataFrame(rows_b, schema).write.mode("overwrite").json(in_dir + "/chunk=b")
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        spark.sql("select * from split_sessions where user_id = 7").collect(),
        key=lambda r: r["first_event_id"],
    )
    assert len(rows) == 2, rows
    assert rows[0]["first_event_id"] == 1 and rows[0]["last_event_id"] == 1
    assert rows[1]["first_event_id"] == 2 and rows[1]["last_event_id"] == 2
    assert str(rows[0]["session_end"]).startswith("2024-01-01 10:00")
    assert str(rows[1]["session_start"]).startswith("2024-01-01 11:00")


def test_session_finalizer_out_of_order_extends_backwards(spark, tmp_path):
    """A late-but-in-watermark event OLDER than the buffered session start
    must extend session_start/first_event_id backwards and must NOT
    regress session_end/last_event_id (the unconditional-overwrite bug)."""
    from etl_mri_scripts_spark.streaming.pipeline import session_finalizer_stream
    from datetime import datetime

    in_dir = str(tmp_path / "ooo")
    os.makedirs(in_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def t_at(h, m, s=0):
        return datetime(2024, 1, 1, h, m, s)

    # batch A: 10:05 then batch B delivers 10:02 (older, within the
    # generous watermark) plus 10:08 — one session 10:02..10:08
    rows_a = [(5, t_at(10, 5), 7, "view", 1.0, "")]
    spark.createDataFrame(rows_a, schema).write.mode("overwrite").json(in_dir + "/chunk=a")
    stream = stream_events(spark, in_dir + "/*", fmt="json")
    q = (
        session_finalizer_stream(stream, gap_sec=600, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("ooo_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "oook"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows_b = [
            (2, t_at(10, 2), 7, "view", 1.0, ""),
            (8, t_at(10, 8), 7, "view", 1.0, ""),
        ]
        spark.createDataFrame(rows_b, schema).write.mode("overwrite").json(in_dir + "/chunk=b")
        q.processAllAvailable()
        # watermark driver: far-future event from another user
        rows_c = [(99, t_at(12, 0), 8, "view", 1.0, "")]
        spark.createDataFrame(rows_c, schema).write.mode("overwrite").json(in_dir + "/chunk=c")
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from ooo_sessions where user_id = 7").collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["n_events"] == 3
    assert r["first_event_id"] == 2 and r["last_event_id"] == 8
    assert str(r["session_start"]).startswith("2024-01-01 10:02")
    assert str(r["session_end"]).startswith("2024-01-01 10:08")


def test_session_finalizer_matches_batch_islands_on_shuffled_arrival(spark, tmp_path):
    """Randomized equivalence: events for several users, shuffled across
    three microbatches (arrival order != event order, within a generous
    watermark), must produce exactly the sessions the batch
    gaps-and-islands rule computes on the union."""
    from etl_mri_scripts_spark.streaming.pipeline import session_finalizer_stream
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1, 8, 0, 0)
    gap_sec = 600

    # deterministic pseudo-random event set: 3 users x 12 events with
    # gaps straddling the session threshold
    x = 424242
    events = []
    eid = 0
    for user in (1, 2, 3):
        t = 0
        for _ in range(12):
            x = (x * 1103515245 + 12345) % (2**31)
            t += 60 + (x % 1200)  # 1..21 min steps, some >= 10 min gap
            events.append((eid, base + timedelta(seconds=t), user))
            eid += 1

    # expected sessions via the batch rule
    expected = set()
    for user in (1, 2, 3):
        evs = sorted((ts, i) for i, ts, u in events if u == user)
        cur = [evs[0]]
        for ts, i in evs[1:]:
            if (ts - cur[-1][0]).total_seconds() >= gap_sec:
                expected.add((user, cur[0][0], cur[-1][0], len(cur), cur[0][1], cur[-1][1]))
                cur = [(ts, i)]
            else:
                cur.append((ts, i))
        expected.add((user, cur[0][0], cur[-1][0], len(cur), cur[0][1], cur[-1][1]))

    # shuffle arrival: deal events round-robin into 3 chunks (so each
    # chunk holds an arbitrary, non-contiguous slice of every user)
    chunks = [events[i::3] for i in range(3)]
    in_dir = str(tmp_path / "rand")
    os.makedirs(in_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = None
    q = None
    try:
        for ci, chunk in enumerate(chunks):
            rows = [(i, ts, u, "view", 1.0, "") for i, ts, u in chunk]
            spark.createDataFrame(rows, schema).write.mode("overwrite").json(
                in_dir + f"/chunk={ci}"
            )
            if q is None:
                stream = stream_events(spark, in_dir + "/*", fmt="json")
                q = (
                    session_finalizer_stream(
                        stream, gap_sec=gap_sec, watermark="12 hours"
                    )
                    .writeStream.format("memory")
                    .queryName("rand_sessions")
                    .outputMode("append")
                    .option("checkpointLocation", str(tmp_path / "randck"))
                    .start()
                )
            q.processAllAvailable()
        # seal everything: far-future watermark driver
        rows = [(9999, base + timedelta(days=2), 99, "view", 1.0, "")]
        spark.createDataFrame(rows, schema).write.mode("overwrite").json(
            in_dir + "/chunk=z"
        )
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    got = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["first_event_id"],
            r["last_event_id"],
        )
        for r in spark.sql(
            "select * from rand_sessions where user_id in (1,2,3)"
        ).collect()
    }
    assert got == expected, f"missing={expected - got} extra={got - expected}"


def test_session_finalizer_matches_registered_batch_twin_at_sf001(spark, tmp_path):
    """VERDICT r4 item 8: pit the streaming finalizer against the
    REGISTERED batch twin (queries.events_sessionize_custom, the oracled
    driver query) on the real sf0.01 events table (10k events, 150
    users), delivered out of order: rows are dealt into three
    micro-batches by event_id % 3, so each batch holds an arbitrary
    non-contiguous slice of every user's timeline and late-but-in-
    watermark events must extend or bridge buffered sessions. The sealed
    append-mode output must equal the batch result exactly."""
    from etl_mri_scripts_spark.queries.windows import events_sessionize_custom
    from etl_mri_scripts_spark.streaming.pipeline import session_finalizer_stream
    from etl_mri_scripts_spark.tables import table
    from datetime import datetime

    sf = "/root/testdata/sf0.01"
    ev = table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    expected = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["first_event_id"],
            r["last_event_id"],
        )
        for r in events_sessionize_custom(spark, sf).collect()
    }

    in_dir = str(tmp_path / "sf001stream")
    os.makedirs(in_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    q = None
    try:
        for ci in range(3):
            chunk = ev.filter(F.col("event_id") % 3 == ci).withColumn(
                "props", F.lit("")
            )
            # parquet, not json: the json writer truncates timestamps to
            # milliseconds and the equivalence is exact to the microsecond
            chunk.coalesce(1).write.mode("overwrite").parquet(in_dir + f"/chunk={ci}")
            if q is None:
                stream = stream_events(spark, in_dir + "/*", fmt="parquet")
                # watermark > the table's 30-day span: nothing is late
                q = (
                    session_finalizer_stream(stream, gap_sec=600, watermark="40 days")
                    .writeStream.format("memory")
                    .queryName("sf001_sessions")
                    .outputMode("append")
                    .option("checkpointLocation", str(tmp_path / "sf001ck"))
                    .start()
                )
            q.processAllAvailable()
        # seal: sentinel event far past every session's last+gap
        rows = [(10**9, datetime(2024, 12, 1), 10**6, "view", 1.0, "")]
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            in_dir + "/chunk=z"
        )
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    got = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["first_event_id"],
            r["last_event_id"],
        )
        for r in spark.sql(
            "select * from sf001_sessions where user_id < 1000000"
        ).collect()
    }
    assert got == expected, (
        f"streaming vs batch twin diverged: missing={len(expected - got)} "
        f"extra={len(got - expected)}; sample missing={list(expected - got)[:3]} "
        f"sample extra={list(got - expected)[:3]}"
    )
