"""Distributed exact global ranking.

``row_number().over(Window.orderBy(...))`` is correct but Spark plans it
as a SINGLE-partition WindowExec — every row moves to one task, which is
the canonical 100-TB scale-killer. This module provides the two-phase
offset form of the same computation (the scheme behind
``RDD.zipWithIndex``): every stage is parallel and the only global
structure is one long per partition on the driver.

Phases:

1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions`` — a
   parallel range-partitioned sort (what a global ``orderBy`` would plan
   anyway, minus the final single-partition window).
2. ``monotonically_increasing_id()`` over the sorted stream — yields
   ``pid << 33 | local_seq`` where ``local_seq`` counts rows in sorted
   order within each range bucket. The expression is non-deterministic,
   so Catalyst will not reorder it below the sort.
3. One bounded job collects per-partition row counts (driver state:
   ``num_partitions`` longs), prefix-sums them into offsets, and maps
   them back — a literal-map projection for small partition counts, a
   broadcast hash join beyond that.

``rank = offset[pid] + local_seq + 1`` then equals the global
``row_number`` over the same total order, with no single-partition stage
anywhere in the plan.

The ranked relation is local-checkpointed (lazily): the counts job and
the consumer job must observe identical range boundaries, and Spark's
RangePartitioner re-samples boundaries per action, so recomputing the
exchange between the two jobs would be a correctness bug, not just a
cost. ``localCheckpoint`` is strictly safer than ``persist`` here —
it pins ONE concrete RDD (a ``LogicalRDD`` plan), so a lost block can
never silently recompute through a re-sampled exchange; lineage is
truncated, so executor loss fails loudly instead. It also bounds
storage across long sessions: once a query's frames are dropped, the
ContextCleaner reclaims the checkpoint blocks (persist'd frames were
pinned until an explicit unpersist that no consumer could safely call).
``eager=False`` keeps the job count identical to the persist scheme:
the counts job is the materializing action.

``order_cols`` MUST be a total order (include a unique tie-break key);
with ties, rank assignment at range-bucket edges would depend on
partition placement.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as WindowSpec

# monotonically_increasing_id packs the partition index into the upper
# 31 bits and a per-partition counter into the lower 33.
_MID_PARTITION_BITS = 33

# Above this partition count a literal create_map projection gets
# unwieldy in the plan; switch to a broadcast hash join on pid.
_MAP_EXPR_MAX_PARTITIONS = 4096

# How the sorted+id'd relation is pinned between the counts job and the
# consumer job. "local" (default): localCheckpoint — blocks live on
# executors, an executor loss fails the query loudly (retry from
# scratch); right for local mode and stable clusters. "reliable":
# RDD checkpoint to the SparkContext checkpoint dir (HDFS/S3) — survives
# executor loss at the cost of a write to durable storage; the escape
# hatch for long-running queries on lossy clusters. Set via
#   spark.conf.set("spark.etl_mri.rank.checkpointMode", "reliable")
# plus spark.sparkContext.setCheckpointDir(...).
_CHECKPOINT_MODE_KEY = "spark.etl_mri.rank.checkpointMode"


def _pin_boundaries(ordered: DataFrame) -> DataFrame:
    """Freeze the range-partitioned sort (and its `_mid` ids) so the
    counts job and the consumer job observe identical partition
    boundaries. ``eager=False`` in both modes: the counts job is the
    materializing action either way."""
    spark = ordered.sparkSession
    mode = spark.conf.get(_CHECKPOINT_MODE_KEY, "local")
    if mode == "local":
        return ordered.localCheckpoint(eager=False)
    if mode == "reliable":
        if spark.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                f"{_CHECKPOINT_MODE_KEY}=reliable requires "
                "spark.sparkContext.setCheckpointDir(<fault-tolerant path>)"
            )
        # RDD checkpointing writes its files in a SECOND job after the
        # first action, re-executing the whole lineage unless the data is
        # cached (classic RDD.checkpoint semantics). Persist first so the
        # checkpoint write replays cached partitions — the counts job and
        # the durable copy then observe the SAME computation (the
        # boundary-consistency guarantee this function exists for, which
        # an uncached recompute would break under nondeterministic
        # upstream lineage) — and the expensive range-sort never runs
        # twice. Blocks are GC-reclaimed by the ContextCleaner once
        # callers drop the frame.
        from pyspark import StorageLevel

        return ordered.persist(StorageLevel.MEMORY_AND_DISK).checkpoint(eager=False)
    raise ValueError(f"{_CHECKPOINT_MODE_KEY} must be 'local' or 'reliable', got {mode!r}")


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ``row_number`` over ``order_cols`` without a
    single-partition WindowExec.

    Returns ``(ranked_df, total_rows)`` — the total falls out of the
    per-partition counts for free, so callers that need ``count(*) OVER
    ()`` (exact-count splits, NTILE) avoid a second pass/window.
    """
    ranked, total_rows, _ = global_order_prefix(
        df, order_cols, sum_col=None, rank_col=rank_col, num_partitions=num_partitions
    )
    return ranked, total_rows


def global_order_prefix(
    df: DataFrame,
    order_cols: Sequence[str],
    sum_col: str | None = None,
    rank_col: str = "rn",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Exact global ``row_number`` — and optionally the running sum of
    ``sum_col`` over the same total order — via the two-phase offset
    scheme. Returns ``(df, total_rows, total_sum)``; ``total_sum`` is 0
    when ``sum_col`` is None.

    The running sum generalizes the rank machinery: the per-partition
    counts job also collects per-partition sums, the driver prefix-sums
    both, and the partition-local cumulative sum comes from a window
    PARTITIONED on the range-bucket id — each window partition is one
    balanced range bucket, so no single-partition stage appears even for
    the cumulative case (``sum(...) OVER (ORDER BY ...)``, the Pareto /
    cumulative-share shape). ``sum_col`` must be integral (exact prefix
    sums; float prefix sums are order-dependent and not cross-engine
    stable anyway).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ordered = _pin_boundaries(
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftrightunsigned(F.col("_mid"), _MID_PARTITION_BITS)
    local = F.col("_mid") - F.shiftleft(pid, _MID_PARTITION_BITS)
    # Bounded driver state: one (pid, count[, sum]) row per partition.
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_sum"))
    counts = ordered.groupBy(pid.alias("_pid")).agg(*aggs).orderBy("_pid").collect()
    row_offsets: list[tuple[int, int]] = []
    sum_offsets: list[tuple[int, int]] = []
    running_rows, running_sum = 0, 0
    for row in counts:
        row_offsets.append((row["_pid"], running_rows))
        running_rows += row["_cnt"]
        if sum_col is not None:
            sum_offsets.append((row["_pid"], running_sum))
            running_sum += row["_sum"]

    out = ordered
    if sum_col is not None:
        # Partition-local running sum: window keyed by the range-bucket
        # id, ordered by the sort-stream sequence — every partition is
        # one balanced bucket, never the whole relation.
        w_local = (
            WindowSpec.partitionBy(pid)
            .orderBy("_mid")
            .rowsBetween(WindowSpec.unboundedPreceding, WindowSpec.currentRow)
        )
        out = out.withColumn("_localcum", F.sum(sum_col).over(w_local))

    def _attach(frame: DataFrame, offsets: list[tuple[int, int]], col: str, base: F.Column) -> DataFrame:
        if len(offsets) <= _MAP_EXPR_MAX_PARTITIONS:
            offmap = F.create_map(*[F.lit(v) for kv in offsets for v in kv])
            return frame.withColumn(col, (offmap[pid] + base).cast("long"))
        off_df = frame.sparkSession.createDataFrame(offsets, "_pid long, _offset long")
        return (
            frame.withColumn("_pid", pid)
            .join(F.broadcast(off_df), "_pid")
            .withColumn(col, (F.col("_offset") + base).cast("long"))
            .drop("_pid", "_offset")
        )

    out = _attach(out, row_offsets, rank_col, local + 1)
    if sum_col is not None:
        out = _attach(out, sum_offsets, cum_col, F.col("_localcum")).drop("_localcum")
    return out.drop("_mid"), running_rows, running_sum


def group_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    rank_col: str = "rn",
    count_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group ``row_number`` (and optionally the group size) for
    LOW-CARDINALITY groups with data-volume-sized partitions — the case
    ``Window.partitionBy(group).orderBy(...)`` handles by dragging every
    row of a group through one task (per-lang ranks, per-source caps).

    Groups are contiguous under the total order ``group_cols +
    order_cols``, so one two-phase GLOBAL rank (parallel range-
    partitioned sort) plus a per-group min-rank base joined back yields
    the in-group rank: ``rank = global_rn - min(global_rn) + 1``. The
    base table has one row per group; the join is a NULL-SAFE equi-join
    (``<=>``) so a NULL group value forms its own group exactly like a
    ``Window.partitionBy`` NULL partition — a plain equi-join would
    silently DROP every NULL-group row. AQE broadcasts the base when
    small and shuffles it when the group count itself is web-scale
    (millions of domains). The group size falls out of the same
    aggregate (``max - min + 1``) — no second count window.
    """
    group_cols = list(group_cols)
    ranked, _ = global_row_number(
        df, group_cols + list(order_cols), rank_col="_grn", num_partitions=num_partitions
    )
    aggs = [F.min("_grn").alias("_base")]
    if count_col is not None:
        aggs.append((F.max("_grn") - F.min("_grn") + 1).alias(count_col))
    base = ranked.groupBy(*group_cols).agg(*aggs)
    return (
        _join_null_safe(ranked, base, group_cols)
        .withColumn(rank_col, (F.col("_grn") - F.col("_base") + 1).cast("long"))
        .drop("_grn", "_base")
    )


def _join_null_safe(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """Equi-join on ``keys`` with ``<=>`` semantics (NULL == NULL), used
    to attach per-group aggregates back without losing NULL-group rows
    (``Window.partitionBy`` treats NULL as a real partition; a plain
    join condition never matches it). Still hash-joinable — Spark plans
    null-safe equality as a normal equi-join key."""
    renamed = right.select(
        *[F.col(c).alias(f"_nsj_{c}") for c in keys],
        *[c for c in right.columns if c not in keys],
    )
    cond = None
    for c in keys:
        clause = left[c].eqNullSafe(renamed[f"_nsj_{c}"])
        cond = clause if cond is None else cond & clause
    return left.join(renamed, cond).drop(*[f"_nsj_{c}" for c in keys])


def group_running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    sum_col: str,
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running sum of ``sum_col`` (inclusive frame) for
    low-cardinality groups — replaces ``sum(x) OVER (PARTITION BY g
    ORDER BY ... ROWS UNBOUNDED PRECEDING)`` without giant per-group
    window partitions.

    Same contiguity trick as :func:`group_row_number`: a global
    two-phase running sum over ``group_cols + order_cols``, then
    ``cum_in_group = cum_global - base`` where ``base`` is the global
    cum JUST BEFORE the group's first row (``min_by(cum - x, rank)``,
    exact for any sign of x). ``sum_col`` must be integral — exact,
    associative prefix sums.
    """
    group_cols = list(group_cols)
    out, _, _ = global_order_prefix(
        df,
        group_cols + list(order_cols),
        sum_col=sum_col,
        rank_col="_grn",
        cum_col="_gcum",
        num_partitions=num_partitions,
    )
    base = out.groupBy(*group_cols).agg(
        F.min_by(F.col("_gcum") - F.col(sum_col), F.col("_grn")).alias("_base")
    )
    return (
        _join_null_safe(out, base, group_cols)
        .withColumn(cum_col, (F.col("_gcum") - F.col("_base")).cast("long"))
        .drop("_grn", "_gcum", "_base")
    )


def ntile_from_rank(rank: F.Column, total: int, n_buckets: int) -> F.Column:
    """SQL ``NTILE(n)`` bucket computed from a precomputed global rank.

    Standard semantics: with ``q, r = divmod(total, n_buckets)``, the
    first ``r`` buckets hold ``q + 1`` rows, the rest ``q``. Pure
    projection — composes with :func:`global_row_number` to replace the
    single-partition ``ntile().over(Window.orderBy(...))``.
    """
    q, r = divmod(total, n_buckets)
    pivot = r * (q + 1)  # rank boundary between the big and small buckets
    big = F.ceil(rank / (q + 1)) if q + 1 > 0 else F.lit(1)
    small = F.lit(r) + F.ceil((rank - pivot) / q) if q > 0 else F.lit(n_buckets)
    return F.when(rank <= pivot, big).otherwise(small).cast("int")
