"""Event-time windowing over the `events` table (SURVEY.md §7 Phase 1.7).

The reference has no streaming (§2.12), but the engine offers the Spark-
native incremental surface: the same `window`/`session_window` expressions
used here run unchanged under Structured Streaming with watermarks
(streaming/pipeline.py). Batch-mode versions are oracle-verifiable.

All window arithmetic happens on micro-truncated timestamps (tables._events)
so both engines bucket identical instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import table
from .registry import query


@query(
    "window_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tumbling event-time window; partial-aggregable, shuffle carries only
    # (window x type) groups. Identical expression works under readStream +
    # withWatermark for the incremental mode.
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


@query(
    "window_sliding_hourly_30m",
    oracle="""
    -- 1h windows sliding every 30m: each event falls in exactly 2 windows,
    -- starting at the 30m-grid floor and 30m before it.
    SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
             value
      FROM events, (SELECT unnest([0, 1]) AS k)
    ) GROUP BY 1 ORDER BY window_start
    """,
)
def window_sliding_hourly_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@query(
    "window_session_10m_gap",
    oracle="""
    -- Session windows, 10-minute inactivity gap, per user: classic
    -- gaps-and-islands. Session end = last event + gap (Spark semantics).
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, value)
                       >= 600000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '10 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM numbered GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def window_session_10m_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window merges events with gaps < 10 min; an event exactly at
    # last+10min starts a NEW session (end-exclusive), mirrored in the
    # oracle's >= comparison on integer microseconds.
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "window_running_cumulative",
    oracle="""
    SELECT user_id, ts, value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 6) AS running_total,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS event_seq
    FROM events
    ORDER BY user_id, event_seq
    """,
)
def window_running_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Running-total analytic window (ordered frame) — the sequential-scan
    # shape; one shuffle on user_id then in-partition ordered evaluation.
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "ts",
            "value",
            F.round(F.sum("value").over(w), 6).alias("running_total"),
            F.row_number().over(seq).cast("long").alias("event_seq"),
        )
        .orderBy("user_id", "event_seq")
    )


@query(
    "join_asof_last_view",
    oracle="""
    -- As-of join: each click matched to the user's most recent view at or
    -- before it. DuckDB has a native ASOF JOIN, but its tie-breaking when
    -- two views share a timestamp is unspecified — the LATERAL top-1 form
    -- pins the same deterministic choice as the Spark side (latest ts,
    -- then HIGHEST view_id; Spark's window orders by (ts, side, view_id)
    -- and last() takes the final one).
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
      SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT c.click_id, c.user_id, c.ts,
           v.view_id AS matched_view_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS view_age_us
    FROM clicks c LEFT JOIN LATERAL (
      SELECT view_id, ts FROM views v
      WHERE v.user_id = c.user_id AND v.ts <= c.ts
      ORDER BY v.ts DESC, v.view_id DESC LIMIT 1
    ) v ON TRUE
    ORDER BY c.user_id, c.ts, c.click_id
    """,
)
def join_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of join the scale-correct way: union both sides tagged, one shuffle
    # on user_id, one in-partition sort, then last(ignorenulls) carries the
    # most recent view forward. No range join, no per-row probe — at 100 TB
    # this is a single exchange where a naive inequality join would explode
    # into a partial cross product. Views sort before clicks at equal ts
    # (side 0 < 1), making the match inclusive like DuckDB's v.ts <= c.ts.
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("view_id"),
        F.lit(None).cast("timestamp_ntz").alias("view_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "view_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = views.unionByName(clicks).select(
        "user_id",
        "ts",
        "side",
        "click_id",
        F.last("view_id", ignorenulls=True).over(w).alias("matched_view_id"),
        F.last("view_ts", ignorenulls=True).over(w).alias("matched_view_ts"),
    )
    return (
        tagged.filter(F.col("side") == 1)
        .select(
            "click_id",
            "user_id",
            "ts",
            "matched_view_id",
            (F.unix_micros("ts") - F.unix_micros("matched_view_ts")).alias("view_age_us"),
        )
        .orderBy("user_id", "ts", "click_id")
    )


@query(
    "window_lag_lead_delta",
    oracle="""
    SELECT user_id, ts,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    ORDER BY user_id, ts, gap_us
    """,
)
def window_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    return (
        ev.select(
            "user_id",
            "ts",
            (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "ts", "gap_us")
    )


@query(
    "window_rank_variants",
    oracle="""
    -- The full ranking-function family in one pass: all five share ONE
    -- window partitioning/sort, so Spark plans a single exchange + sort.
    -- Value-based ranks (rank/dense_rank/percent_rank/cume_dist) order by
    -- price alone (tie-stable); ntile is row-position-based, so its sort
    -- adds the key tiebreak to stay deterministic across engines.
    SELECT o_orderkey, o_orderpriority,
           CAST(rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS drnk,
           round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC), 6) AS prnk,
           round(cume_dist()    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC), 6) AS cdist,
           CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
    FROM orders
    ORDER BY o_orderkey
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w_val = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    w_pos = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w_val).cast("long").alias("rnk"),
        F.dense_rank().over(w_val).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w_val), 6).alias("prnk"),
        F.round(F.cume_dist().over(w_val), 6).alias("cdist"),
        F.ntile(4).over(w_pos).cast("long").alias("quartile"),
    ).orderBy("o_orderkey")


@query(
    "window_moving_avg_frame",
    oracle="""
    -- Bounded-frame window aggregation (ROWS BETWEEN 3 PRECEDING AND
    -- CURRENT ROW): per-user trailing moving average over the event
    -- stream. The frame sum runs on exact integer cents (value is
    -- 2-decimal fixed point), divided back down only at the end, so the
    -- average is bit-identical across engines.
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_frame,
           round(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                 / 100.0 / count(*) OVER w, 6) AS moving_avg,
           round(min(value) OVER w, 6) AS frame_min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Completes the frame-specification family (running_cumulative =
    # unbounded-preceding, lag/lead = point offsets; this is the bounded
    # sliding frame). One exchange on user_id serves every frame aggregate;
    # the three window functions share the same WindowSpec so Catalyst
    # evaluates them in a single Window operator pass.
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    from .exact import cents

    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_frame"),
        F.round(
            F.sum(cents(F.col("value"))).over(w) / 100.0 / F.count(F.lit(1)).over(w),
            6,
        ).alias("moving_avg"),
        F.round(F.min("value").over(w), 6).alias("frame_min"),
    ).orderBy("user_id", "event_id")


@query(
    "events_funnel_depth",
    oracle="""
    -- Ordered conversion funnel: per user, how deep the view -> click ->
    -- purchase sequence holds on FIRST occurrences (a later-stage event
    -- only counts if it happened after the previous stage's first event).
    WITH f AS (
      SELECT user_id,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_views,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
             min(ts) FILTER (WHERE event_type = 'view') AS fv,
             min(ts) FILTER (WHERE event_type = 'click') AS fc,
             min(ts) FILTER (WHERE event_type = 'purchase') AS fp
      FROM events GROUP BY 1
    )
    SELECT user_id, n_views, n_clicks, n_purchases,
           CASE WHEN fv IS NOT NULL AND fc IS NOT NULL AND fc > fv
                     AND fp IS NOT NULL AND fp > fc THEN 3
                WHEN fv IS NOT NULL AND fc IS NOT NULL AND fc > fv THEN 2
                WHEN fv IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth
    FROM f ORDER BY user_id
    """,
)
def events_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle: every stage is a conditional aggregate over the same
    # user_id grouping (map-side partial aggregation collapses the event
    # stream before it moves). The depth decision is post-aggregation
    # scalar CASE logic on the six tiny per-user columns — the classic
    # "funnel without self-joins" formulation; a per-stage self-join would
    # be three shuffles of the full stream instead.
    ev = table(spark, sf_dir, "events")
    first_ts = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    n_of = lambda t: F.count(F.when(F.col("event_type") == t, 1))
    f = ev.groupBy("user_id").agg(
        n_of("view").alias("n_views"),
        n_of("click").alias("n_clicks"),
        n_of("purchase").alias("n_purchases"),
        first_ts("view").alias("fv"),
        first_ts("click").alias("fc"),
        first_ts("purchase").alias("fp"),
    )
    depth = (
        F.when(
            F.col("fv").isNotNull()
            & F.col("fc").isNotNull()
            & (F.col("fc") > F.col("fv"))
            & F.col("fp").isNotNull()
            & (F.col("fp") > F.col("fc")),
            3,
        )
        .when(
            F.col("fv").isNotNull()
            & F.col("fc").isNotNull()
            & (F.col("fc") > F.col("fv")),
            2,
        )
        .when(F.col("fv").isNotNull(), 1)
        .otherwise(0)
    )
    return f.select(
        "user_id",
        "n_views",
        "n_clicks",
        "n_purchases",
        depth.alias("funnel_depth"),
    ).orderBy("user_id")


@query(
    "window_first_last_nth",
    oracle="""
    -- Positional window picks over the full partition frame: each event
    -- sees its user's first, last, and second event value (deterministic
    -- tie-break on (ts, event_id)). Pure value picks — no arithmetic, so
    -- doubles pass through bit-identical.
    SELECT user_id, event_id,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS last_v,
           nth_value(value, 2) OVER w AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id, event_id
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Completes the positional family (lag/lead are relative offsets; these
    # are absolute positions over an explicit unbounded frame — note
    # last_value is only meaningful once the frame says UNBOUNDED
    # FOLLOWING, the classic frame-default trap). All three share one
    # WindowSpec -> one exchange + one sort.
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
    ).orderBy("user_id", "event_id")


@query(
    "cohort_retention_weekly",
    oracle="""
    -- Cohort retention: users grouped by the week of their first event;
    -- for each (cohort, week-offset) cell, how many distinct cohort
    -- members were active. Offsets divide exactly (both endpoints are
    -- week-truncated), so the matrix is integer-exact; only the final
    -- retention ratio is a rounded double.
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort FROM f GROUP BY 1)
    SELECT f.cohort_week AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS INT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active,
           cs.n_cohort,
           round(count(DISTINCT a.user_id) * 1.0 / cs.n_cohort, 6) AS retention
    FROM a JOIN f ON a.user_id = f.user_id
    JOIN cs ON cs.cohort_week = f.cohort_week
    GROUP BY f.cohort_week, CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS INT),
             cs.n_cohort
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Three aggregations, two shuffle keys: the first-event and activity
    # frames both shuffle on user_id (one exchange each over pre-combined
    # partials — the DISTINCT collapses map-side), join on user_id reuses
    # that partitioning, and the final matrix groupBy lands on the tiny
    # (cohort, offset) key space. Cohort sizes are a post-aggregation
    # broadcast. No event row is read twice from parquet thanks to the
    # shared scan under AQE.
    ev = table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    a = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    cs = f.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    offset = (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int")
    return (
        a.join(f, "user_id")
        .join(F.broadcast(cs), "cohort_week")
        .groupBy("cohort_week", offset.alias("week_offset"), "n_cohort")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_transition_matrix",
    oracle="""
    -- Markov transition matrix over per-user event sequences: next event
    -- via LEAD over (user, time), then count and row-normalize per source
    -- state. Deterministic tie-break on event_id for equal timestamps.
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, next_type, n_transitions,
           round(n_transitions * 1.0 /
                 sum(n_transitions) OVER (PARTITION BY event_type), 6) AS p_transition
    FROM c ORDER BY event_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle on user_id for the sequence window (users are numerous,
    # so it parallelizes; no global sort), then a tiny 5x5-state aggregate.
    # The normalizing sum is a window over the already-aggregated 25-row
    # frame — free. This is the sessionized-behavior shape (next-action
    # prediction features) that at 100 TB must never self-join events.
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = s.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(tot), 6).alias(
            "p_transition"
        ),
    ).orderBy("event_type", "next_type")


@query(
    "events_gap_fill_forward",
    oracle="""
    -- Daily per-user series with gaps densified and forward-filled: the
    -- grid spans each user's own active range (bounded fan-out), missing
    -- days join to NULL, and last_value IGNORE NULLS carries the previous
    -- observation forward. gap_days measures staleness of the carried
    -- value. Day sums use exact cents so both engines fill identical
    -- numbers.
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS day_cents
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.day, d.day_cents
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    )
    SELECT user_id, day, day_cents IS NOT NULL AS observed,
           round(last_value(day_cents IGNORE NULLS) OVER w / 100.0, 6) AS value_filled,
           CAST(day - last_value(CASE WHEN day_cents IS NOT NULL THEN day END IGNORE NULLS)
                OVER w AS BIGINT) AS gap_days
    FROM j
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, day
    """,
)
def events_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-series densify + forward-fill, the feature-store staple. The
    # heavy input collapses to (user x active-day) in ONE conditional
    # aggregation; the grid is sequence()-generated from each user's span
    # (metadata-predictable fan-out, max ~span-days rows per user — never
    # a calendar cross-join against the full user dimension). The fill is
    # last(ignorenulls) over a user-partitioned window: one shuffle on
    # user_id shared by grid build and fill. At 100 TB the events scan
    # dominates; everything after runs on the tiny daily frame.
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("day_cents"))
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_day = F.when(F.col("day_cents").isNotNull(), F.col("day"))
    return j.select(
        "user_id",
        "day",
        F.col("day_cents").isNotNull().alias("observed"),
        F.round(F.last("day_cents", ignorenulls=True).over(w) / 100.0, 6).alias(
            "value_filled"
        ),
        F.datediff(F.col("day"), F.last(obs_day, ignorenulls=True).over(w))
        .cast("long")
        .alias("gap_days"),
    ).orderBy("user_id", "day")


@query(
    "scd2_user_state_intervals",
    oracle="""
    -- SCD2 interval build from an event log: each event opens a state
    -- interval [valid_from, valid_to) closed by the user's next event;
    -- the latest interval stays open (valid_to NULL, is_current). The
    -- standard dimension-table history builder, done with one LEAD —
    -- never an ordered self-join. Durations are exact integer micros.
    SELECT user_id, ts AS valid_from, event_type AS state,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current,
           CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT) AS duration_us,
           CAST(row_number() OVER w AS BIGINT) AS version
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, version
    """,
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle on user_id serves LEAD + row_number together (same
    # window spec -> single Sort + Window in the plan). Event-id tie-break
    # keeps interval order deterministic under equal timestamps, which is
    # what makes re-runs produce byte-identical history at any scale.
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.col("event_type").alias("state"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        (F.unix_micros(nxt) - F.unix_micros("ts")).alias("duration_us"),
        F.row_number().over(w).cast("long").alias("version"),
    ).orderBy("user_id", "valid_from", "version")


DEBOUNCE_GAP_S = 600  # a new burst starts after 10 minutes of silence


@query(
    "events_debounce_collapse",
    oracle=f"""
    -- Event debouncing: collapse rapid-fire repeats of the same
    -- (user, event_type) into one burst row. A burst starts when the gap
    -- from the previous same-key event exceeds {DEBOUNCE_GAP_S}s; burst_id is
    -- the running count of starts, and each burst reports its span and
    -- how many raw events it absorbed — the dedup that tracking/retry
    -- noise needs before counting anything.
    WITH g AS (
      SELECT user_id, event_type, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {DEBOUNCE_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    b AS (
      SELECT user_id, event_type, ts, value,
             sum(is_start) OVER (PARTITION BY user_id, event_type
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_id
      FROM g
    )
    SELECT user_id, event_type, CAST(burst_id AS BIGINT) AS burst_id,
           min(ts) AS burst_start, max(ts) AS burst_end,
           CAST(count(*) AS BIGINT) AS n_collapsed,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM b GROUP BY 1, 2, 3 ORDER BY user_id, event_type, burst_id
    """,
)
def events_debounce_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lag -> gap flag -> running sum -> group: the gaps-and-islands
    # pattern. Both windows and the final groupBy share ONE shuffle on
    # (user_id, event_type) — Catalyst reuses the sort; the collapse
    # aggregate is partial-aggregable. This is the batch twin of the
    # session_window stream (same burst boundaries, same gap rule).
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    g = ev.select(
        "user_id", "event_type", "ts", "event_id", "value",
        F.when(prev.isNull() | (gap_us > DEBOUNCE_GAP_S * 1_000_000), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    b = g.select(
        "user_id", "event_type", "ts", "value",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("burst_id"),
    )
    return (
        b.groupBy("user_id", "event_type", "burst_id")
        .agg(
            F.min("ts").alias("burst_start"),
            F.max("ts").alias("burst_end"),
            F.count(F.lit(1)).alias("n_collapsed"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("user_id", "event_type", "burst_id")
    )


@query(
    "window_time_range_frame",
    oracle="""
    -- time-based RANGE frame: per-user rolling 1-hour value sum/count over
    -- irregular events — the frame is defined by event-time distance, not
    -- row count, so bursts widen the frame's row span automatically
    SELECT event_id, user_id, ts,
           round(sum(value) OVER w, 6) AS rolling_1h_sum,
           CAST(count(*) OVER w AS BIGINT) AS rolling_1h_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark expresses time-RANGE frames over a numeric ordering column:
    # order by epoch seconds, rangeBetween(-3600, 0) — identical inclusive
    # bounds to DuckDB's INTERVAL frame on the micro-truncated timestamps.
    # One shuffle (user_id); the frame evaluation is streaming within each
    # sorted partition, state bounded by the 1-hour horizon.
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)  # 1 hour in microseconds
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.sum("value").over(w), 6).alias("rolling_1h_sum"),
            F.count(F.lit(1)).over(w).cast("long").alias("rolling_1h_events"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "events_sessionize_custom",
    oracle="""
    -- Custom-payload sessionization: the batch twin of the streaming
    -- session finalizer (streaming/pipeline.session_finalizer_stream) —
    -- per closed session, the payload session_window cannot carry:
    -- first/last event ids alongside span and count. Gaps-and-islands
    -- with event_id tie-break so equal timestamps order identically in
    -- both engines.
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 600000000
                       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    bounds AS (
      SELECT *,
             first_value(event_id) OVER w AS first_event_id,
             last_value(event_id) OVER w AS last_event_id
      FROM numbered
      WINDOW w AS (PARTITION BY user_id, session_no ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(any_value(first_event_id) AS BIGINT) AS first_event_id,
           CAST(any_value(last_event_id) AS BIGINT) AS last_event_id
    FROM bounds GROUP BY user_id, session_no
    ORDER BY user_id, session_start, first_event_id
    """,
)
def events_sessionize_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions carrying first/last event ids (the audit columns
    the streaming finalizer emits). One shuffle on user_id serves the lag,
    the island numbering, and the final per-session aggregate — the window
    and groupBy share the partitioning, so sessionizing a 100 TB event log
    costs one exchange."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) >= 600_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # first/last event ids straight in the aggregate: min_by/max_by over
    # (ts, event_id) equals the former second Window pass (orderBy ts,
    # event_id; first/last over the full frame) without the extra
    # per-session sort + Window operator over every event row (r6 review)
    order_key = F.struct("ts", "event_id")
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("event_id", order_key).cast("long").alias("first_event_id"),
            F.max_by("event_id", order_key).cast("long").alias("last_event_id"),
        )
        .drop("session_no")
        .orderBy("user_id", "session_start", "first_event_id")
    )


@query(
    "events_step_funnel",
    oracle="""
    -- Ordered step funnel: users who viewed, then clicked strictly after
    -- their first view, then purchased strictly after that click — the
    -- conversion report with ORDER enforced (a purchase before the first
    -- view does not count). One row: per-step user counts + conversion
    -- rates off the previous step.
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked_after,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased_after,
           round((SELECT count(*) FROM c) * 1.0 / (SELECT count(*) FROM v), 6)
               AS click_rate,
           round((SELECT count(*) FROM p) * 1.0 / (SELECT count(*) FROM c), 6)
               AS purchase_rate
    """,
)
def events_step_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, strictly
    increasing event time per user).

    Scale shape: each step is a type-filtered aggregate keyed on user_id
    joined to the previous step's (user_id, min_ts) table — three
    hash-partitioned shuffles on the SAME key, so at cluster scale the
    exchanges reuse one partitioning; the step tables shrink
    monotonically (funnel property), and the final report is three 1-row
    counts unioned into one row. No window, no per-user event-list
    collection."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked_after"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased_after"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_viewed",
            "n_clicked_after",
            "n_purchased_after",
            # try_divide: an empty funnel stage must yield a NULL rate
            # like the oracle's 0/0, not an ANSI DIVIDE_BY_ZERO crash
            # (Spark 4 throws even for double division; r6 review)
            F.round(
                F.try_divide(F.col("n_clicked_after") * 1.0, F.col("n_viewed")), 6
            ).alias("click_rate"),
            F.round(
                F.try_divide(F.col("n_purchased_after") * 1.0, F.col("n_clicked_after")),
                6,
            ).alias("purchase_rate"),
        )
    )


@query(
    "events_daily_anomaly",
    oracle="""
    -- Volume-anomaly detection on the DAILY grain: per event type, each
    -- day's count is z-scored against the trailing 7-day window
    -- (EXCLUDING the current day, so a spike cannot mask itself).
    -- Aggregate-first discipline: the rolling window runs over the
    -- (type, day) series — bounded rows — never over raw events.
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, day, n_events,
             avg(n_events) OVER w AS base_mean,
             stddev_samp(n_events) OVER w AS base_std,
             count(*) OVER w AS base_days
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n_events,
           round(base_mean, 6) AS base_mean,
           round((n_events - base_mean) / nullif(base_std, 0.0), 6) AS zscore,
           -- never NULL: a zero/undefined-variance baseline flags nothing
           base_days >= 3 AND coalesce(base_std, 0.0) > 0.0
             AND abs(n_events - base_mean) > 3 * base_std AS is_anomaly
    FROM scored
    ORDER BY event_type, day
    """,
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomalies per event type: trailing-7-day z-score with
    the current day excluded from its own baseline, flagged at 3 sigma
    once >= 3 baseline days exist.

    Scale shape: the heavy pass is ONE map-side-combined groupBy to the
    (event_type, day) grain; the rolling window then runs over that
    bounded series (days x types rows — a few thousand per year no
    matter the event volume), partitioned on event_type. This is the
    aggregate-then-window ordering that keeps monitoring queries viable
    at any event rate."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "event_type",
        "day",
        "n_events",
        F.avg("n_events").over(w).alias("base_mean"),
        F.stddev_samp("n_events").over(w).alias("base_std"),
        F.count(F.lit(1)).over(w).alias("base_days"),
    )
    return scored.select(
        "event_type",
        "day",
        "n_events",
        F.round("base_mean", 6).alias("base_mean"),
        F.round(
            (F.col("n_events") - F.col("base_mean"))
            / F.nullif(F.col("base_std"), F.lit(0.0)),
            6,
        ).alias("zscore"),
        (
            (F.col("base_days") >= 3)
            & (F.coalesce(F.col("base_std"), F.lit(0.0)) > 0.0)
            & (
                F.abs(F.col("n_events") - F.col("base_mean"))
                > 3 * F.col("base_std")
            )
        ).alias("is_anomaly"),
    ).orderBy("event_type", "day")


@query(
    "events_conversion_latency",
    oracle="""
    -- Companion to events_step_funnel: the DISTRIBUTION of time from a
    -- user's first view to their first purchase strictly after it —
    -- count/mean/median/p90/max over converted users. Latencies are
    -- integer seconds (microsecond timestamps floor-divided), so every
    -- statistic except the mean is integer-exact.
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      -- whole elapsed seconds = truncated microsecond delta (NOT
      -- date_diff, which counts second-boundary crossings)
      SELECT e.user_id,
             (epoch_us(min(e.ts)) - epoch_us(v.t1)) // 1000000 AS latency_sec
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t1
      GROUP BY e.user_id, v.t1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(avg(latency_sec), 6) AS mean_latency_sec,
           CAST(median(latency_sec) AS DOUBLE) AS median_latency_sec,
           CAST(quantile_cont(latency_sec, 0.9) AS DOUBLE) AS p90_latency_sec,
           CAST(max(latency_sec) AS BIGINT) AS max_latency_sec
    FROM p
    """,
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution (first view -> first purchase after).

    Scale shape: two type-filtered aggregates keyed on user_id (the same
    reusable partitioning as the step funnel; min(ts) folds into the
    join-side aggregate so no per-user event lists exist), then one
    global 1-row summary. Exact percentiles are the correctness
    contract; percentile_approx is the documented swap at cluster scale
    (same policy as shipping_delay_distribution)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("tp"))
        .select(
            ((F.unix_micros("tp") - F.unix_micros("t1")) / 1_000_000)
            .cast("long")
            .alias("latency_sec")
        )
    )
    return p.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.avg("latency_sec"), 6).alias("mean_latency_sec"),
        F.median("latency_sec").alias("median_latency_sec"),
        F.percentile("latency_sec", F.lit(0.9)).alias("p90_latency_sec"),
        F.max("latency_sec").cast("long").alias("max_latency_sec"),
    )
