"""SQL-registered function surface (SURVEY.md §2.13).

The reference has no SQL-registered functions; the engine exposes its
public scalar helpers to SQL-text users via ``spark.udf.register`` so that
``spark.sql("SELECT normalize_key(k) ...")`` works anywhere the DataFrame
API does. Three performance tiers, deliberately explicit:

- **Catalyst expression builders** (operators/patches.py ``*_col``):
  the fast path — JVM codegen, no Python. DataFrame callers should use
  these; the registered UDFs below exist for SQL-text ergonomics and
  parity with engines whose only entry is SQL.
- **Arrow-vectorized pandas UDFs**: numpy batch math (the scalar physics
  helpers) — one Python hop per batch, not per row.
- **pandas UDAF (grouped agg)**: aggregate with merge-by-Arrow-batch
  semantics, usable inside ``GROUP BY`` SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from ..operators.degradation import SNR_7T_EMPIRICAL, parse_field_target
from ..operators.patches import normalize_key


def register_all(spark: SparkSession) -> list[str]:
    """Register the engine's SQL-callable functions on this session.
    Returns the registered names (idempotent — re-registering replaces)."""

    @pandas_udf("double")
    def snr_target_from_field_udf(b0: pd.Series, voxel_factor: pd.Series) -> pd.Series:
        # D7 (v2/degradation_function_v2.py:186-198): vectorized over the
        # Arrow batch; quadratic voxel scaling (v2 semantics).
        return SNR_7T_EMPIRICAL * (b0 / 7.0) * voxel_factor**2

    @pandas_udf("double")
    def parse_field_target_udf(field: pd.Series) -> pd.Series:
        # na_action='ignore' propagates NULL like every built-in function;
        # without it str(None) fails float() and the parser's 3.0 default
        # fires, silently fabricating a field strength for NULL input
        return field.map(parse_field_target, na_action="ignore").astype("Float64")

    @pandas_udf("string")
    def normalize_key_udf(key: pd.Series) -> pd.Series:
        # SQL-text twin of the Catalyst regexp_replace builder
        # (operators/patches.py normalize_key_col) — prefer the builder in
        # DataFrame code; this exists for SELECT-string callers.
        # na_action='ignore' propagates NULL like the Catalyst twin;
        # without it NaN reaches re.sub and the whole task dies.
        return key.map(normalize_key, na_action="ignore")

    @pandas_udf("double")
    def p98_udaf(v: pd.Series) -> float:
        # pandas UDAF (GROUPED_AGG): the robust-rescale highlight percentile
        # (D11, v2/degradation_function_v2.py:266-283) as a SQL aggregate —
        # usable as p98(x) ... GROUP BY g. NULLs are skipped like every
        # built-in SQL aggregate (a NaN-poisoned percentile would return
        # NaN for the whole group); an all-NULL group returns NULL.
        arr = v.dropna().to_numpy(dtype=np.float64)
        return float(np.percentile(arr, 98)) if arr.size else None

    spark.udf.register("snr_target_from_field", snr_target_from_field_udf)
    spark.udf.register("parse_field_target", parse_field_target_udf)
    spark.udf.register("normalize_key", normalize_key_udf)
    spark.udf.register("p98", p98_udaf)
    spark.udtf.register("chunk_text", chunk_text_udtf())
    _register_sql_macros(spark)
    return [
        "snr_target_from_field",
        "parse_field_target",
        "normalize_key",
        "p98",
        "chunk_text",
        "pii_scrub",
        "jaccard",
        "morton2",
    ]


def _register_sql_macros(spark: SparkSession) -> None:
    """SQL scalar UDFs (CREATE FUNCTION ... RETURN <expr>): the zero-Python
    tier — the body inlines into the caller's plan as a Catalyst expression,
    so these run inside whole-stage codegen like any built-in. Preferred
    over pandas UDFs whenever the logic is expressible."""
    from ..queries.text import _EMAIL_RE, _IP_RE, _PHONE_RE

    def q(pattern: str) -> str:
        # Spark SQL single-quoted literals process escapes: double each
        # backslash so the regex engine sees the original pattern
        return pattern.replace("\\", "\\\\")

    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION pii_scrub(s STRING) RETURNS STRING
        RETURN regexp_replace(regexp_replace(regexp_replace(s,
          '{q(_EMAIL_RE)}', '[EMAIL]'),
          '{q(_IP_RE)}', '[IP]'),
          '{q(_PHONE_RE)}', '[PHONE]')
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION jaccard(a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS DOUBLE
        RETURN size(array_intersect(a, b)) / CAST(size(array_union(a, b)) AS DOUBLE)
        """
    )
    # Morton/Z-order key for two pre-normalized [0, 2^21) dims — the SQL
    # twin of operators/layout._interleave, generated from the same loop.
    terms = []
    for b in range(21):
        terms.append(f"shiftleft(shiftright(x, {b}) & 1, {2 * b})")
        terms.append(f"shiftleft(shiftright(y, {b}) & 1, {2 * b + 1})")
    zexpr = " | ".join(terms)
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION morton2(x BIGINT, y BIGINT)
        RETURNS BIGINT RETURN {zexpr}
        """
    )


def chunk_text_udtf():
    """Python UDTF (table function): overlapping chunk extraction as a SQL
    lateral — ``SELECT d.doc_id, c.* FROM documents d, LATERAL
    chunk_text(d.text) c``. Same grid semantics as the Catalyst
    q:text_chunk_overlapping (sequence + trailing-edge rule, SURVEY §2.3
    P8 on text); that zero-Python form is the scale path — this UDTF
    exists so SQL-text callers get the operator without DataFrame access.
    Declared lazily so merely importing this module needs no Spark."""
    import hashlib

    from pyspark.sql.functions import udtf

    from ..queries.text import CHUNK_LEN, CHUNK_STRIDE

    @udtf(returnType="chunk_start int, chunk_len int, chunk_md5 string")
    class ChunkText:
        def eval(self, text: str):
            if text is None:
                return
            n = len(text)
            starts = list(range(1, max(1, n - CHUNK_LEN + 1) + 1, CHUNK_STRIDE)) or [1]
            if n > CHUNK_LEN and (n - CHUNK_LEN) % CHUNK_STRIDE > 0:
                starts.append(n - CHUNK_LEN + 1)
            for s in starts:
                chunk = text[s - 1 : s - 1 + CHUNK_LEN]
                yield s, len(chunk), hashlib.md5(chunk.encode()).hexdigest()

    return ChunkText
