"""Local replica of the driver's Spark-vs-DuckDB comparison.

Stricter than the driver: cells must match exactly (floats to 1e-9 relative,
with the max diff reported) after sorting columns by name and rows by value,
which is what an order-insensitive value-hash requires.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _norm_cell(v):
    if v is None:
        return ("none",)
    # ORDER MATTERS in the next three branches (r6 review findings):
    # bool is a subclass of int — an int check first would normalize
    # Python True to ('i', 1) while np.bool_ goes to ('b', True), so a
    # nullable (object-dtype) bool column would falsely mismatch its
    # non-null twin. NaT is a datetime subclass — the datetime branch
    # would stringify it to ('t', 'NaT') instead of the null shape the
    # driver's pandas factorization uses.
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return ("b", bool(v))
    if v is pd.NaT:
        return ("none",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ("t", ts.isoformat())
    if isinstance(v, date):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
        # Driver-strict: the external comparator factorizes cells with
        # pandas, which dies on unhashable (non-scalar) values. A query
        # that emits arrays/structs would pass a lenient local canon and
        # then fail the real gate — reject here so local green implies
        # driver green. String-encode (ints / hex) or emit long form
        # (floats) instead.
        raise AssertionError(
            f"non-scalar cell {type(v).__name__} in oracled query output; "
            "encode arrays as strings or explode to long form"
        )
    if isinstance(v, (int,)) or type(v).__name__ in (
        "int64", "int32", "int16", "int8", "uint64", "uint32", "uint16", "uint8"
    ):
        return ("i", int(v))
    if type(v).__name__ in ("float64", "float32", "float16"):
        f = float(v)
        return ("nan",) if math.isnan(f) else ("f", f)
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v))


def _sort_key_cell(c):
    # Sort floats by their 6-dp rounding so two sides whose values differ
    # only inside the 1e-9 compare tolerance still align to the same row
    # order (exact-repr sorting could order them differently and misalign
    # rows BEFORE the tolerant per-cell compare ever ran — r6 review
    # finding). 6 dp is the repo's engineered output granularity, so
    # tolerance-equal values round identically except vanishingly near a
    # half-ulp-of-1e-6 boundary.
    if c[0] == "f":
        return ("f", round(c[1], 6))
    return c


def _rows(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: repr(tuple(_sort_key_cell(c) for c in r))), list(df.columns)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "?"):
    srows, scols = _rows(spark_pdf)
    orows, ocols = _rows(oracle_pdf)
    assert scols == ocols, f"{name}: column names differ: spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), f"{name}: row counts differ: spark={len(srows)} oracle={len(orows)}"
    max_float_diff = 0.0
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        for c, (sv, ov) in enumerate(zip(sr, orow)):
            if sv == ov:
                continue
            if sv[0] == "f" and ov[0] == "f":
                diff = abs(sv[1] - ov[1])
                rel = diff / max(1.0, abs(ov[1]))
                max_float_diff = max(max_float_diff, rel)
                if rel <= 1e-9:
                    continue
            raise AssertionError(
                f"{name}: row {i} col {scols[c]} differs: spark={sv!r} oracle={ov!r}"
            )
    if max_float_diff > 0:
        print(f"  [{name}] WARN nonzero float drift, max rel diff {max_float_diff:.2e}")
    return max_float_diff


def run_parity(spark, duck, sf_dir: str, name: str):
    from etl_mri_scripts_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[name]).df()
    return assert_frames_match(sdf, odf, name)
