"""Table catalog over the driver's parquet test data.

Mirrors the reference's source scans (SURVEY.md §2.1 S1-S10): recursive
path-filtered parquet scans with Catalyst predicate pushdown + column
pruning replacing the reference's os.walk + regex loops
(slice_generator.py:208-213, utils_scripts.py:5-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: region is
# 5 rows, nation 25 by construction (TPC-H fixed dims). customer/supplier/
# part grow with sf, so they are broadcast only via explicit hints where the
# query knows the filtered side is small.
ALWAYS_BROADCAST = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; timezone tuned so timestamps match the DuckDB oracle."""
    tune(spark)
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to TimestampType regardless of parquet encoding.

    Three encodings appear in the wild:
      * TIMESTAMP(NANOS) — Spark's vectorized reader rejects it, so read as
        raw long nanos (legacy conf) and truncate to micros with integer
        division, bit-identical to DuckDB's TIMESTAMP_NS -> TIMESTAMP coerce.
      * TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark 4.x with default
        ``inferTimestampNTZ=true`` reads this as TIMESTAMP_NTZ; cast to
        TIMESTAMP. Session tz is pinned UTC (session.py), so the cast is a
        pure re-tag and values match the DuckDB oracle exactly.
      * TIMESTAMP(MICROS, adjusted) — already TimestampType, no rewrite.

    The ``nanosAsLong`` conf is set/restored around the read so the catalog
    does not mutate how the caller's session reads other parquet files.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(conf_key)
    except Exception:
        prev = None
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType
    except BaseException:
        # a failed read (missing file, missing ts column) must not leak
        # the conf into the caller's session — every later parquet read
        # would silently interpret NANOS timestamps as raw longs
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
        raise
    if isinstance(ts_type, LongType):
        # NANOS file: the conf must STAY set — the scan re-checks it when the
        # lazy plan executes. This is the only case with a session-wide
        # side effect, and it is required for the read to work at all.
        # FLOOR division, not `div`: `div` truncates toward zero, so a
        # pre-epoch timestamp with sub-microsecond residue (-1500 ns)
        # would land on -1 us where a NS->US coercion floors to -2 us —
        # a 1-us disagreement with the oracle on every such row. Spark's
        # % follows the dividend's sign, so adjust when it is negative.
        return df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")
            ),
        )
    # Non-NANOS file: restore the caller's conf so the catalog does not
    # change how other parquet reads in this session interpret NANOS.
    if prev is None:
        spark.conf.unset(conf_key)
    else:
        spark.conf.set(conf_key, prev)
    if isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
