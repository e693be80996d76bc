"""Data-layout optimization: Z-order (Morton) clustering for writes.

At 100 TB, scan cost is dominated by how much of the file footprint a
query's predicates can skip. Parquet keeps per-row-group min/max stats per
column; a file sorted by ONE column prunes range predicates on that column
only. Interleaving the bits of several columns into a Morton key and
sorting by it clusters data so that range predicates on ANY of the
interleaved dimensions map to a contiguous-ish subset of row groups — the
technique behind Delta/Iceberg Z-ORDER (public design).

The bit interleave is pure Catalyst bit arithmetic (shiftleft / bitwise or
over long columns), so the sort key costs one codegen'd projection; the
physical clustering is a sortWithinPartitions — no extra shuffle beyond
whatever partitioning the write already uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 21  # bits per dimension for 2-3 dims packed into one signed long


def _normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-free normalization: map [lo, hi] linearly onto [0, 2^bits).
    Monotonic per dimension, which is all Morton clustering needs.

    The span guard protects ONLY the degenerate hi == lo case (constant
    dimension -> div by zero). It must not floor sub-unit spans to 1: a
    double dimension spanning [0, 0.001] would then scale to ~2k of the
    2^21 codes (~11 of 21 bits) and a tighter span to a handful — no
    clustering at all on the dimension (r6 review finding)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    scaled = ((col - lo).cast("double") / span.cast("double")) * float((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton key: bit i of dim d lands at position i * ndims + d."""
    ndims = len(cols)
    out = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * ndims + d))
    return out


def zorder_sorted(df: DataFrame, dims: list[str], bits: int = ZBITS) -> DataFrame:
    """Return ``df`` clustered by the Morton key of ``dims`` (the write-side
    op: call right before .write so row groups inherit the clustering).

    ``bits`` is capped so the interleaved key fits the 63 value bits of a
    signed long: at the default 21 bits, a 4th dimension would place bits
    at positions up to 83 — shiftleft silently drops them and position 63
    flips the key's sign, destroying the clustering the function exists
    for. Capping (vs raising) keeps any dims count usable: resolution per
    dimension drops but monotonicity — all Morton needs — survives."""
    if not dims:
        raise ValueError("zorder_sorted needs at least one dimension")
    bits = min(bits, 63 // len(dims))
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"__lo_{d}"), F.max(d).alias(f"__hi_{d}")]
    bounds = F.broadcast(df.agg(*aggs))
    with_bounds = df.crossJoin(bounds)
    norm = [
        _normalize_to_bits(
            F.col(d), F.col(f"__lo_{d}"), F.col(f"__hi_{d}"), bits
        )
        for d in dims
    ]
    keyed = with_bounds.withColumn("__zkey", _interleave(norm, bits))
    return keyed.sortWithinPartitions("__zkey").drop(
        "__zkey", *[f"__lo_{d}" for d in dims], *[f"__hi_{d}" for d in dims]
    )


def row_groups_matching(parquet_dir: str, predicates: dict[str, tuple]) -> tuple[int, int]:
    """Pruning auditor: (matching_row_groups, total_row_groups) for
    conjunctive range predicates {col: (lo, hi)} using parquet footer
    min/max stats only — exactly the skipping decision a scan makes."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = matching = 0
    for path in _glob.glob(f"{parquet_dir}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(path).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            group = md.row_group(rg)
            hit = True
            for col, (lo, hi) in predicates.items():
                idx = names.get(col)
                if idx is None:
                    continue  # column absent in this file (schema drift)
                    # -> no stats -> cannot skip, same as below
                stats = group.column(idx).statistics
                if stats is None or not stats.has_min_max:
                    continue  # no stats -> cannot skip
                if stats.max < lo or stats.min > hi:
                    hit = False
                    break
            if hit:
                matching += 1
    return matching, total
