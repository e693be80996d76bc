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
    if isinstance(v, (int,)) or type(v).__name__ in ("int64", "int32", "uint64"):
        return ("i", int(v))
    if type(v).__name__ in ("float64", "float32"):
        f = float(v)
        return ("nan",) if math.isnan(f) else ("f", f)
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return ("b", bool(v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if isinstance(v, type(pd.NaT)):
        return ("none",)
    return ("s", str(v))


def _rows(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr), list(df.columns)


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
