"""Structured Streaming surface (SURVEY.md §2.12, §7 step 7).

The reference is batch-only; its incremental behaviors (skip-if-exists
re-runs, append-only audit log, write-as-completed loop) map onto Spark's
file-source streaming + checkpointing, which is what a 100 TB ingest
actually wants: new volumes land in a directory, each micro-batch runs the
SAME pipeline lineage via foreachBatch, checkpoints make re-runs exactly
this-once per file (F4 idempotency without the per-file exists checks).

The windowed aggregations reuse the identical expressions as the batch
queries (queries/windows.py) — one definition, two execution modes.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def _cents_half_up(v: float) -> int:
    """Python twin of queries/exact.py ``cents`` (Spark ``F.round``,
    i.e. BigDecimal HALF_UP on ``Double.toString``). Python's builtin
    ``round`` is banker's rounding (half-even): for value 0.125,
    ``int(round(12.5))`` = 12 but the batch/oracle side says 13 — a
    stream/batch parity break on every .5-cent input. ``repr(float)``
    matches ``Double.toString``'s value exactly, so quantizing its
    Decimal HALF_UP reproduces the JVM result bit-for-bit (including
    negatives: HALF_UP rounds away from zero on both sides)."""
    return int(Decimal(repr(v * 100)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _duration_ms(d: str | int) -> int:
    """'10 minutes' / '1 hour' / raw ms int -> milliseconds."""
    if isinstance(d, int):
        return d
    n, unit = d.split()
    mult = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(float(n) * mult)


def stream_events(spark: SparkSession, in_dir: str, fmt: str = "json") -> DataFrame:
    """File-source stream of event rows (new files -> new micro-batches)."""
    reader = spark.readStream.schema(EVENT_SCHEMA).format(fmt)
    return reader.load(in_dir)


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling hourly counts with late-data handling: identical window
    expression as the batch `window_tumbling_hourly` query, plus the
    watermark that bounds state at scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_stream(events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Stateful session windows per user (the session_window expression is
    streaming-native; state eviction rides the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming-native exact dedup: cross-micro-batch duplicate drop by
    content hash (the incremental form of dedup_exact_hash). State is one
    tiny row per distinct digest — the stream-scale analog of the digest
    groupBy; add an event-time watermark + `dropDuplicatesWithinWatermark`
    when the dup horizon is bounded, to bound state too."""
    return docs.withColumn(
        "content_hash", F.md5(F.col("text").cast("binary"))
    ).dropDuplicates(["content_hash"])


def running_counters_stream(events: DataFrame, gap_timeout: str | None = None) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: cumulative
    per-event-type counters across micro-batches — the streaming-native form
    of the reference's write-as-completed counter loop
    (v2/nii_to_lmdb_paralel.py:338-369, A9), where the driver keeps running
    totals as slice jobs finish. State per key is one (count, sum) pair, so
    state size is O(|event types|), independent of stream length.

    ``gap_timeout`` (e.g. "1 hour") arms a PROCESSING-time timeout per
    key: a key idle that long has its counters evicted (and a final
    zero-delta row is NOT emitted — eviction is silent). Use on
    high-cardinality or churning key sets where retaining dead keys
    forever would grow state without bound; omit for the reference's
    fixed small key set.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_type string, n_total long, value_total double, n_batches long"
    state_schema = "n long, v double, b long"
    out_cols = ["event_type", "n_total", "value_total", "n_batches"]
    # pyspark's GroupState.setTimeoutDuration accepts int ms only (the
    # Scala duration-string form is not exposed) — parse up front
    timeout_ms = _duration_ms(gap_timeout) if gap_timeout else None

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=out_cols)
            return
        n, v = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        tot_n, tot_v, tot_b = state.get if state.exists else (0, 0.0, 0)
        state.update((tot_n + n, tot_v + v, tot_b + 1))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "n_total": tot_n + n,
                    "value_total": tot_v + v,
                    "n_batches": tot_b + 1,
                }
            ]
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if gap_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_incremental_pipeline(
    spark: SparkSession,
    volumes_in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    config=None,
):
    """Incremental imaging ingest: watch a directory of volume parquet
    drops; each micro-batch runs the full batch pipeline (explode ->
    degrade -> patch -> gate -> split) into the partitioned sink —
    the streaming-native form of the reference's --force/skip-if-exists
    logic.

    Effectively-exactly-once per input file: the checkpoint prevents
    re-reading processed files, and the sink write is IDEMPOTENT under
    micro-batch replay — foreachBatch alone is only at-least-once (a
    crash between the batch's file commit and the checkpoint offset
    commit replays the batch), so each batch dynamically OVERWRITES its
    own ``batch_id=N`` partition instead of blind-appending: the replay
    rewrites the same rows rather than duplicating them (Spark's
    documented foreachBatch idempotency recipe). Readers use
    read_dataset(out_dir) as usual; batch_id is just an extra partition
    column.

    ``config`` defaults to the SAME PipelineConfig() as the batch
    run_pipeline — a pipeline that silently produced different patch
    geometry depending on which ingest path ran would corrupt a mixed
    dataset.

    MIGRATION (r6 layout change, per r6 ADVICE): before r6 the sink was
    append-mode ``partitionBy(resolution, split)``; it is now
    dynamic-overwrite ``partitionBy(batch_id, resolution, split)``.
    Resuming against an out_dir written by the OLD layout would mix two
    partition schemes and break parquet partition discovery, so this
    function REFUSES an out_dir whose top level contains ``resolution=``
    directories without ``batch_id=`` — rebuild the sink (and its
    checkpoint) to migrate. The r6 default-config change (crop 16/8 ->
    PipelineConfig()) likewise altered patch geometry for callers that
    relied on the old default; pass an explicit config to reproduce
    pre-r6 output.
    """
    import os

    if os.path.isdir(out_dir):
        top = {e.split("=", 1)[0] for e in os.listdir(out_dir) if "=" in e}
        # The current layout never writes top-level resolution= dirs, so
        # ANY such entry means pre-r6 data — whether pure-old or already
        # mixed with batch_id= dirs (the worst case: partition discovery
        # is broken either way, so refuse both).
        if "resolution" in top:
            raise ValueError(
                f"out_dir {out_dir!r} contains top-level resolution= "
                "partitions from the pre-r6 sink layout"
                + (" (mixed with batch_id= partitions)" if "batch_id" in top else "")
                + "; idempotent replay would mix partition schemes. Rebuild "
                "the sink directory and checkpoint before resuming."
            )
    from ..operators.pipeline import (
        hold_volume_batch,
        PipelineConfig,
        assign_split,
        degrade_and_patch,
        explode_slices,
    )
    from ..sources.volumes import VOLUME_SCHEMA

    cfg = config or PipelineConfig()
    # Same row-size guard as run_pipeline: volume rows are huge, and
    # without this the Arrow default (10k records/batch) would
    # materialize a whole micro-batch of volumes in one pandas batch.
    # The stream depends on the shrink for its LIFETIME (micro-batches
    # read the conf at execution), and start() returns immediately, so
    # the guard is a ref-counted HOLD, not a with-block: a concurrent
    # batch imaging job's volume_batch_scope exit cannot restore the
    # default while this hold is live (r8 review). The hold is released
    # by a StreamingQueryListener when THIS query terminates.
    release = hold_volume_batch(spark)
    # The try opens IMMEDIATELY after taking the hold (r8 ADVICE): the
    # readStream/writeStream builder chain below can itself raise (bad
    # input path, invalid checkpoint), and an exception anywhere between
    # the hold and a successful start() must release — otherwise the
    # Arrow shrink leaks for the session lifetime with no query listener
    # ever registered to undo it.
    try:
        stream = spark.readStream.schema(VOLUME_SCHEMA).parquet(volumes_in_dir)

        def process_batch(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            # Fused in-UDF gate: one degradation pass per micro-batch (see
            # degrade_and_patch(gated=True)).
            patches = assign_split(
                degrade_and_patch(explode_slices(batch_df, cfg), cfg, gated=True), cfg
            )
            (
                patches.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", "resolution", "split")
                .parquet(out_dir)
            )

        query = (
            stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    except Exception:
        release()
        raise
    _release_hold_on_termination(spark, query, release)
    return query


def _release_hold_on_termination(spark: SparkSession, query, release) -> None:
    """Release an Arrow-shrink hold when ``query`` terminates. release()
    is idempotent, so the isActive re-check after registration (the query
    may finish BEFORE the listener lands — availableNow drains fast) can
    double-fire with the listener without double-restoring."""
    from pyspark.sql.streaming import StreamingQueryListener

    qid = str(query.id)

    class _ReleaseListener(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: D102
            pass

        def onQueryProgress(self, event):  # noqa: D102
            pass

        def onQueryIdle(self, event):  # noqa: D102
            pass

        def onQueryTerminated(self, event):  # noqa: D102
            if str(event.id) != qid:
                return
            release()
            try:  # stale listeners are harmless no-ops; removal is tidy-up
                spark.streams.removeListener(self)
            except Exception:  # noqa: BLE001 — never break the listener bus
                pass

    spark.streams.addListener(_ReleaseListener())
    if not query.isActive:  # terminated before the listener registered
        release()


def interval_join_stream(
    purchases: DataFrame,
    errors: DataFrame,
    window_sec: int = 300,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the error
    events of the following ``window_sec`` seconds — the streaming twin of
    the batch ``join_range_time_bucketed`` query, via the SAME time-bucket
    rewrite (Spark requires an equality predicate in stream-stream joins,
    exactly because an equi key is what bounds state matching at scale):
    quantize time into window-width buckets, replicate each purchase into
    the <=2 buckets its window touches, equi-join on bucket with the exact
    range condition as residual. Watermarks on both sides let the state
    store evict rows once no future match is possible, so state is
    O(rows per watermark horizon), not O(stream).
    """
    width = window_sec * 1_000_000
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("pts"),
            (F.unix_micros(F.col("ts")) / width).cast("long").alias("b0"),
        )
        .select(
            "purchase_id",
            "pts",
            F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
        )
    )
    r = errors.withWatermark("ts", watermark).select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("ets"),
        (F.unix_micros(F.col("ts")) / width).cast("long").alias("bucket"),
    )
    cond = (
        (F.col("p.bucket") == F.col("r.bucket"))
        & (F.col("ets") >= F.col("pts"))
        & (F.col("ets") < F.col("pts") + F.expr(f"INTERVAL {window_sec} SECONDS"))
    )
    return (
        p.alias("p")
        .join(r.alias("r"), cond, "inner")
        .select("purchase_id", "pts", "error_id", "ets")
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch hash-joins against
    the static dimension with the small side broadcast, so the unbounded
    stream side never shuffles (the standard "decorate events with account
    metadata" topology). The static side is re-resolved per micro-batch —
    a swapped-in dimension snapshot is picked up without restarting the
    query."""
    return events.join(F.broadcast(dim), on, "left")


def dedup_within_watermark_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Exact dedup with BOUNDED state: duplicates are only tracked within
    the event-time watermark horizon, after which their state is evicted —
    the production form of dedup_stream for infinite streams where the
    dup horizon is known (e.g. at-least-once upstream delivery). State is
    O(events per horizon), not O(stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def attribution_stream(events: DataFrame, lookback_days: int = 7) -> DataFrame:
    """Streaming last-touch attribution (the incremental form of the batch
    q:events_last_touch_attribution): per-user state holds only the most
    recent qualifying touch (click/view), and every purchase within the
    lookback emits an attribution row in the same micro-batch. State is one
    (event_id, ts) pair per user — O(|users|), independent of stream length
    — where the batch form needs the full ordered history per user.

    Rows are processed in event-time order WITHIN each micro-batch (sorted
    in the UDF) and batches arrive in file order; for out-of-order sources
    put a watermark + sorted repartition in front, or the touch state may
    briefly lag.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "purchase_event_id long, user_id long, touch_event_id long, gap_seconds double"
    )
    state_schema = "touch_id long, touch_us long"
    lookback_us = lookback_days * 86_400_000_000

    def update(key, pdfs, state: GroupState):
        touch_id, touch_us = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev_id, ev_type, ts in zip(
                pdf["event_id"], pdf["event_type"], pdf["ts"]
            ):
                ts_us = int(pd.Timestamp(ts).value) // 1000
                if ev_type in ("click", "view"):
                    touch_id, touch_us = int(ev_id), ts_us
                elif ev_type == "purchase" and touch_us is not None:
                    gap = ts_us - touch_us
                    if 0 <= gap <= lookback_us:
                        out.append(
                            {
                                "purchase_event_id": int(ev_id),
                                "user_id": int(key[0]),
                                "touch_event_id": touch_id,
                                "gap_seconds": gap / 1_000_000.0,
                            }
                        )
        if touch_us is not None:
            state.update((touch_id, touch_us))
        yield pd.DataFrame(
            out,
            columns=[
                "purchase_event_id",
                "user_id",
                "touch_event_id",
                "gap_seconds",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def time_weighted_avg_stream(events: DataFrame) -> DataFrame:
    """Streaming time-weighted average (incremental form of the batch
    q:events_time_weighted_avg): per-user state carries (last_ts, last_value,
    accumulated weighted mass, accumulated span) — four longs — and each
    micro-batch folds its events in. The step-interpolation weights are the
    same exact integer microseconds as the batch form, so after any batch
    the emitted row equals the batch query over the prefix seen so far:
    stream-batch parity is exact, not approximate.

    Same in-order contract as attribution_stream: rows sort by event time
    within a batch; batches must arrive in time order per user.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, weighted_fixed long, span_us long, time_weighted_avg double"
    )
    state_schema = "last_us long, last_v long, acc_w long, acc_s long"

    def update(key, pdfs, state: GroupState):
        last_us, last_v, acc_w, acc_s = (
            state.get if state.exists else (None, None, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev_ts, ev_val in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ev_ts).value) // 1000
                v_cents = _cents_half_up(float(ev_val))
                if last_us is not None:
                    dt = ts_us - last_us
                    acc_w += last_v * dt
                    acc_s += dt
                last_us, last_v = ts_us, v_cents
        state.update((last_us, last_v, acc_w, acc_s))
        if acc_s > 0:
            yield pd.DataFrame(
                [
                    {
                        "user_id": int(key[0]),
                        "weighted_fixed": acc_w,
                        "span_us": acc_s,
                        "time_weighted_avg": acc_w / (100.0 * acc_s),
                    }
                ]
            )
        else:
            yield pd.DataFrame(
                [],
                columns=["user_id", "weighted_fixed", "span_us", "time_weighted_avg"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counters_tws_stream(events: DataFrame) -> DataFrame:
    """Spark-4-native form of running_counters_stream: the
    ``transformWithStateInPandas`` StatefulProcessor API replaces the
    single implicit state tuple of applyInPandasWithState with NAMED,
    typed state variables (value/list/map) plus per-key timers and
    optional per-state TTL — the API a production 100 TB stream job
    wants, because each state variable evolves and expires
    independently. Semantics here are identical to the
    applyInPandasWithState twin, which the parity test exploits.

    Runtime dependency: the transformWithState protocol speaks protobuf
    between the JVM and the Python state server; environments without
    ``google.protobuf`` (like this container) can build the plan but the
    query fails at start — the parity test importorskips accordingly
    (same gating pattern as the real-lmdb sink test)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "event_type string, n_total long, value_total double, n_batches long"

    class CounterProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, v double, b long")

        def handleInputRows(self, key, rows, timerValues):
            n, v = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            prev = self._totals.get() if self._totals.exists() else (0, 0.0, 0)
            tot = (prev[0] + n, prev[1] + v, prev[2] + 1)
            self._totals.update(tot)
            yield pd.DataFrame(
                [
                    {
                        "event_type": key[0],
                        "n_total": tot[0],
                        "value_total": tot[1],
                        "n_batches": tot[2],
                    }
                ]
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        CounterProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def merge_session_intervals(sessions, items, gap_us):
    """Gaps-and-islands sweep over compressed session intervals + new
    events (the pure-Python kernel of session_finalizer_stream, exposed
    for property testing). Items: (start_us, end_us, n, first_id,
    last_id); a single event is (ts, ts, 1, id, id). Sorted by start
    (tuple order; equal-start items always merge since their gap <= 0),
    adjacent items merge when the boundary gap is < gap_us; first/last
    ids resolve by explicit (ts, id) comparison — the batch twin's
    tie-break. Correct over compressed sessions because every internal
    gap is < gap_us by construction."""
    merged = []
    for it in sorted(sessions + items):
        if merged and it[0] - merged[-1][1] < gap_us:
            cur = merged[-1]
            merged[-1] = (
                cur[0],
                max(cur[1], it[1]),
                cur[2] + it[2],
                # first = event at min (ts, id); cur starts first
                # (sorted), ties broken by smaller id
                cur[3] if (cur[0], cur[3]) <= (it[0], it[3]) else it[3],
                # last = event at max (ts, id)
                cur[4] if (cur[1], cur[4]) >= (it[1], it[4]) else it[4],
            )
        else:
            merged.append(it)
    return merged


def session_finalizer_stream(
    events: DataFrame, gap_sec: int = 600, watermark: str = "10 minutes"
) -> DataFrame:
    """Append-mode sessionization with EVENT-TIME TIMEOUT state eviction,
    matching the batch twin (queries/windows.events_sessionize_custom)
    gaps-and-islands semantics exactly: sessions split where the
    event-time gap >= gap_sec, regardless of microbatch boundaries or
    arrival order.

    State per user is the list of sessions not yet sealed by the
    watermark (parallel arrays of 5 longs per session — compressed
    intervals, never raw events). Each update merges incoming events
    into that interval set in EVENT-TIME order (a late-but-in-watermark
    event can extend a session backwards, sit inside it, or bridge two
    buffered sessions); a session is emitted exactly once, when the
    watermark passes its last event + gap — the point after which no
    admissible event can change it. Two same-batch events gap_sec apart
    therefore yield two sessions, and an out-of-order event never
    regresses session_end / first-last ids.

    Requires ``spark.sql.session.timeZone = UTC``: Arrow hands the
    stateful UDF tz-NAIVE timestamps rendered in the session zone,
    while ``getCurrentWatermarkMs``/``setTimeoutTimestamp`` are UTC
    epoch ms. Any other zone would shift the sealing comparison by the
    zone offset (sealing hours early or late, or registering a timeout
    <= watermark, which Spark rejects). ``session.get_spark`` pins UTC;
    this guard turns a silently-wrong deployment into a loud error.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            f"session_finalizer_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): event times reach the UDF zone-naive but the "
            f"watermark/timeout API is UTC epoch ms"
        )

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, first_event_id long, last_event_id long"
    )
    state_schema = (
        "start_us array<long>, last_us array<long>, n array<long>, "
        "first_id array<long>, last_id array<long>"
    )
    gap_us = gap_sec * 1_000_000
    gap_ms = gap_sec * 1000

    def _merge(sessions, items):
        return merge_session_intervals(sessions, items, gap_us)

    def _emit_and_keep(key, sessions, state, watermark_ms):
        # Seal when watermark >= CEIL(last_us/1000) + gap: flooring the
        # sub-ms residue would seal up to 1 ms early, and an event at
        # ts in [floor_ms + gap, last_us + gap_us) is still admissible
        # (>= watermark) yet belongs to the already-emitted session —
        # a spurious split the batch gaps-and-islands twin never makes.
        sealed = [s for s in sessions if (s[1] + 999) // 1000 + gap_ms <= watermark_ms]
        open_ = [s for s in sessions if (s[1] + 999) // 1000 + gap_ms > watermark_ms]
        if open_:
            state.update(
                (
                    [s[0] for s in open_],
                    [s[1] for s in open_],
                    [s[2] for s in open_],
                    [s[3] for s in open_],
                    [s[4] for s in open_],
                )
            )
            # fire when the watermark passes the EARLIEST open session's
            # last event + gap (must be > current watermark, guaranteed
            # by the open_ predicate; same CEIL as the seal check so the
            # timer can never fire before its session is sealable)
            state.setTimeoutTimestamp(min((s[1] + 999) // 1000 for s in open_) + gap_ms)
        elif state.exists:
            state.remove()
        cols = [
            "user_id", "session_start", "session_end",
            "n_events", "first_event_id", "last_event_id",
        ]
        if not sealed:
            yield pd.DataFrame([], columns=cols)
            return
        yield pd.DataFrame(
            [
                {
                    "user_id": int(key[0]),
                    "session_start": pd.Timestamp(s[0], unit="us"),
                    "session_end": pd.Timestamp(s[1], unit="us"),
                    "n_events": int(s[2]),
                    "first_event_id": int(s[3]),
                    "last_event_id": int(s[4]),
                }
                for s in sealed
            ],
            columns=cols,
        )

    def update(key, pdfs, state: GroupState):
        watermark_ms = state.getCurrentWatermarkMs()
        sessions = []
        if state.exists:
            starts, lasts, ns, firsts, lastids = state.get
            sessions = [
                (int(a), int(b), int(c), int(d), int(e))
                for a, b, c, d, e in zip(starts, lasts, ns, firsts, lastids)
            ]
        if state.hasTimedOut:
            yield from _emit_and_keep(key, sessions, state, watermark_ms)
            return
        items = []
        for pdf in pdfs:
            for ev_id, ts in zip(pdf["event_id"], pdf["ts"]):
                ts_us = int(pd.Timestamp(ts).value) // 1000
                items.append((ts_us, ts_us, 1, int(ev_id), int(ev_id)))
        sessions = _merge(sessions, items)
        yield from _emit_and_keep(key, sessions, state, watermark_ms)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming near-duplicate dedup: the streaming twin of the batch
# q:dedup_incremental_delta (queries/dedup.py). Each micro-batch of newly
# arrived documents is probed against an ACCUMULATING on-disk index of the
# surviving corpus — exact digests first, then MinHash-LSH band candidates
# verified by signature-estimated Jaccard — and only the survivors extend
# the index. Reference analog: the approved-keys / already-processed skip
# sets (extract_subimages.py:22-27, SURVEY.md §2 F4/F5) generalized to
# content-identity over an unbounded stream.
# ---------------------------------------------------------------------------

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _abs_local(path: str) -> str:
    """Absolutize a scheme-less relative path against the Python CWD
    (r12, r11 ADVICE): the Hadoop existence probe resolves relative
    paths against the FileSystem working directory while
    spark.read/write.parquet resolve them via Spark's own
    defaultFS/user.dir rules — a Python-side os.chdir moves one anchor
    but not the other, so a relative index_dir could pass the probe yet
    read (or write) a different location. Absolutizing at entry pins
    probe, reads and writes to the same directory — the behavior the
    old os.path.isdir probe had. URI-qualified and absolute paths pass
    through untouched.

    Scheme detection matches the URI grammar (r13, r12 ADVICE), not a
    '://' substring: Hadoop Path accepts authority-less scheme forms
    like 'file:relative/dir', which the substring test misclassified as
    local-relative and rewrote to '/cwd/file:relative' — silently
    changing what the probe and Spark resolve. Any RFC-3986 scheme
    prefix (ALPHA *(ALPHA / DIGIT / '+' / '-' / '.') ':') now passes
    through untouched."""
    import os
    import re

    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", path) is None and not os.path.isabs(
        path
    ):
        return os.path.abspath(path)
    return path


def _read_index_part(spark: SparkSession, index_dir: str, name: str, before_batch: int):
    """One index table (digests/signatures/bands), restricted to
    partitions written by batches STRICTLY BEFORE the probing batch.

    The strict filter is the replay-idempotency half the dynamic-overwrite
    sink can't provide alone: foreachBatch is at-least-once, so a crash
    between the index write for batch N and the checkpoint offset commit
    replays batch N — which must NOT see its own earlier partial write
    (every doc would match itself and the replay would emit zero
    survivors). batch_id is a partition column, so the filter is pruning,
    not a scan.

    Existence is probed through Hadoop's FileSystem (resolved for the
    path's OWN scheme), not ``os.path.isdir``: a driver-local check on an
    s3://, hdfs:// or other remote index_dir always reads absent, which
    would silently skip the dedup probe and admit every duplicate (r10
    ADVICE). A local path resolves to the same answer via
    LocalFileSystem, so the behavior change is remote-only.

    A scheme-less RELATIVE index_dir is absolutized against the Python
    CWD before either resolution path sees it (_abs_local, r12 —
    neardedup_process_batch normalizes its write side with the same
    helper, so probe, read and write always name one directory)."""
    path = _abs_local(index_dir).rstrip("/") + "/" + name
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    df = spark.read.parquet(path)
    return df.filter(F.col("batch_id") < before_batch)


def neardedup_process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    index_dir: str,
    jaccard_tau: float = 0.5,
) -> None:
    """Dedup one micro-batch against the accumulated index (exposed at
    module level so tests can replay a batch and assert idempotency).

    Policy, in precedence order (mirroring q:dedup_incremental_delta —
    exact hits take precedence, min-id canonicals, no transitive chains):

    1. exact-in-batch: min doc_id per content digest survives this stage;
       the rest drop with reason 'exact' against that min id.
    2. exact-vs-index: digest hit in the index drops with reason 'exact'
       against the smallest matching indexed doc.
    3. near-vs-index: LSH band-bucket candidates against the index,
       verified by SIGNATURE-estimated Jaccard (>= ceil(tau*N_MINHASH) of
       the N_MINHASH components agreeing). The index stores signatures,
       not shingles — at corpus scale an exact-Jaccard verify would
       require indexing every document's shingle set (≈ the corpus
       itself); the signature estimate is what MinHash exists for, and
       the batch family's exact verify (q:dedup_lsh_verified_pairs)
       remains the offline audit of the same hash family.
    4. near-in-batch: the same estimate between this batch's survivors,
       smaller doc_id wins (a doc's recorded match is its smallest
       near-neighbor, which may itself have been dropped — same
       non-transitive dup_of policy as the batch keep-family).

    Survivors append to the index; dropped docs never enter it (the index
    IS the canonical corpus). All sinks partition by batch_id and write
    with dynamic partitionOverwriteMode, so a replayed batch rewrites its
    own partitions instead of duplicating them.

    Scale shape: the index side is never self-joined — each probe is
    (|batch| x bucket occupancy), the batch side is the small side of
    every join (broadcast-hinted), and the index scans prune on the
    batch_id partition column plus the band/bucket equi-join keys.

    Determinism assumption on the empty-batch early return: an empty
    batch writes nothing, so a replay that re-delivers batch N as EMPTY
    would leave any partial batch_id=N partitions from a crashed earlier
    attempt in place instead of overwriting them. That is safe here
    because the checkpointed file source replays each batch_id with the
    same file set (deterministic batches), so a batch is empty on replay
    iff it was empty on the first attempt — i.e. iff nothing was ever
    written for it. A caller feeding NONDETERMINISTIC batches (e.g. a
    rate-limited or dedup-upstream source) must not reuse this function
    as-is; the early return would have to write empty partitions for the
    batch instead (r10 ADVICE).
    """
    import math
    import os

    from pyspark import StorageLevel

    from ..queries.dedup import N_MINHASH, band_buckets_of, minhash_signature_of

    if batch_df.isEmpty():
        return
    # One anchor for probe/read/write: a relative dir left raw here would
    # have the Spark writes resolve via the JVM's user.dir while the
    # Hadoop probe follows the FileSystem working directory (see
    # _abs_local) — normalize both dirs once at entry.
    out_dir, index_dir = _abs_local(out_dir), _abs_local(index_dir)
    min_agree = int(math.ceil(jaccard_tau * N_MINHASH))
    sig_cols = [f"m{s}" for s in range(N_MINHASH)]

    batch = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
    digests = batch.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash")
    )

    # -- 1. exact within batch: min-id canonical per digest
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash").orderBy("doc_id")
    ranked = digests.select(
        "doc_id",
        "content_hash",
        F.row_number().over(w).alias("rn"),
        F.min("doc_id").over(Window.partitionBy("content_hash")).alias("canon_id"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    drop_exact_batch = ranked.filter(F.col("rn") > 1).select(
        "doc_id",
        F.lit("exact").alias("reason"),
        F.col("canon_id").alias("match_doc_id"),
    )
    rest = ranked.filter(F.col("rn") == 1).select("doc_id", "content_hash")

    # -- 2. exact vs index
    idx_digests = _read_index_part(spark, index_dir, "digests", batch_id)
    if idx_digests is not None:
        hits = (
            idx_digests.join(F.broadcast(rest), "content_hash")
            .groupBy(F.col("doc_id"))
            .agg(F.min("indexed_doc_id").alias("match_doc_id"))
        )
        drop_exact_index = hits.select(
            "doc_id", F.lit("exact").alias("reason"), "match_doc_id"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        rest = rest.join(drop_exact_index.select("doc_id"), "doc_id", "left_anti")
    else:
        drop_exact_index = None

    rest = rest.persist(StorageLevel.MEMORY_AND_DISK)

    # -- signatures + bands for the exact-surviving batch docs
    sigs = (
        minhash_signature_of(batch.join(rest.select("doc_id"), "doc_id", "left_semi"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands = band_buckets_of(sigs).persist(StorageLevel.MEMORY_AND_DISK)

    # -- 3. near vs index
    idx_bands = _read_index_part(spark, index_dir, "bands", batch_id)
    idx_sigs = _read_index_part(spark, index_dir, "signatures", batch_id)
    if idx_bands is not None and idx_sigs is not None:
        cand = (
            idx_bands.join(F.broadcast(bands.withColumnRenamed("doc_id", "new_id")),
                           ["band", "bucket"])
            .select("new_id", F.col("indexed_doc_id").alias("base_id"))
            .distinct()
        )
        verified = (
            cand.join(
                idx_sigs.select(
                    F.col("indexed_doc_id").alias("base_id"),
                    *[F.col(c).alias(f"b_{c}") for c in sig_cols],
                ),
                "base_id",
            )
            .join(
                F.broadcast(
                    sigs.select(
                        F.col("doc_id").alias("new_id"),
                        *[F.col(c).alias(f"n_{c}") for c in sig_cols],
                    )
                ),
                "new_id",
            )
            .filter(
                sum(
                    (F.col(f"n_{c}") == F.col(f"b_{c}")).cast("int") for c in sig_cols
                )
                >= min_agree
            )
            .groupBy(F.col("new_id").alias("doc_id"))
            .agg(F.min("base_id").alias("match_doc_id"))
        )
        drop_near_index = verified.select(
            "doc_id", F.lit("near").alias("reason"), "match_doc_id"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        rest2 = rest.join(drop_near_index.select("doc_id"), "doc_id", "left_anti")
    else:
        drop_near_index = None
        rest2 = rest

    rest2 = rest2.persist(StorageLevel.MEMORY_AND_DISK)

    # -- 4. near within batch (among docs that survived 1-3)
    live_bands = bands.join(rest2.select("doc_id"), "doc_id", "left_semi")
    pair_cand = (
        live_bands.alias("x")
        .join(
            live_bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )
    near_batch = (
        pair_cand.join(
            sigs.select(F.col("doc_id").alias("a_id"),
                        *[F.col(c).alias(f"a_{c}") for c in sig_cols]),
            "a_id",
        )
        .join(
            sigs.select(F.col("doc_id").alias("b_id"),
                        *[F.col(c).alias(f"b_{c}") for c in sig_cols]),
            "b_id",
        )
        .filter(
            sum((F.col(f"a_{c}") == F.col(f"b_{c}")).cast("int") for c in sig_cols)
            >= min_agree
        )
        .groupBy(F.col("b_id").alias("doc_id"))
        .agg(F.min("a_id").alias("match_doc_id"))
    )
    drop_near_batch = near_batch.select(
        "doc_id", F.lit("near").alias("reason"), "match_doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    survivors_ids = rest2.join(
        drop_near_batch.select("doc_id"), "doc_id", "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    decisions = drop_exact_batch
    for d in (drop_exact_index, drop_near_index):
        if d is not None:
            decisions = decisions.unionAll(d)
    decisions = decisions.unionAll(drop_near_batch)

    def _sink(df: DataFrame, path: str) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    # survivors (full rows) and the decision log
    _sink(
        batch.join(survivors_ids.select("doc_id"), "doc_id", "left_semi"),
        os.path.join(out_dir, "docs"),
    )
    _sink(decisions, os.path.join(out_dir, "decisions"))

    # index extension: survivors only; indexed_doc_id is the key the
    # probe joins report as match ids
    _sink(
        survivors_ids.select(
            F.col("doc_id").alias("indexed_doc_id"), "content_hash"
        ),
        os.path.join(index_dir, "digests"),
    )
    surv_sigs = sigs.join(
        survivors_ids.select("doc_id"), "doc_id", "left_semi"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _sink(
        surv_sigs.select(F.col("doc_id").alias("indexed_doc_id"), *sig_cols),
        os.path.join(index_dir, "signatures"),
    )
    _sink(
        band_buckets_of(surv_sigs).select(
            F.col("doc_id").alias("indexed_doc_id"), "band", "bucket"
        ),
        os.path.join(index_dir, "bands"),
    )

    for df in (
        batch, ranked, rest, rest2, sigs, bands, survivors_ids, surv_sigs,
        drop_near_batch, drop_exact_index, drop_near_index,
    ):
        if df is not None:
            df.unpersist()


def run_incremental_neardedup(
    spark: SparkSession,
    docs_in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    jaccard_tau: float = 0.5,
):
    """Watch a directory of document parquet drops; each micro-batch runs
    :func:`neardedup_process_batch` — exactly-once per input file via the
    checkpoint plus the batch_id dynamic-overwrite sinks (idempotent
    replay; see _read_index_part for why probes exclude the probing
    batch's own partitions). The stream shares the batch family's exact
    shingle/signature/band expressions (queries/dedup.py shingles_of /
    minhash_signature_of / band_buckets_of), so the index it accumulates
    is the same hash family the offline queries audit."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(docs_in_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        neardedup_process_batch(
            spark, batch_df, batch_id, out_dir, index_dir, jaccard_tau
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
