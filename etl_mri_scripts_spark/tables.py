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
    """events.ts may be parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. When it is, read it as raw long nanos (legacy conf) and
    truncate to microseconds with integer division — bit-identical to how
    DuckDB coerces TIMESTAMP_NS to its microsecond TIMESTAMP, so oracle
    comparisons hold. When the file already carries TIMESTAMP(MICROS), the
    scan needs no rewrite.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
