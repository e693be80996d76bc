"""SparkSession factory + per-session tuning.

The driver owns the SparkSession in verify runs; every query callable
therefore applies only *runtime-settable* confs (session timezone, AQE,
shuffle partitions) via :func:`tune`, never builder-time ones.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session we touch.  Rationale:
# - UTC timezone: parquet timestamps compare bit-identical against DuckDB
#   (which is timezone-naive) only when Spark renders them in UTC.
# - AQE on: runtime re-planning (skew joins, coalesced shuffle partitions)
#   is the single biggest win at 100 TB where static stats lie.
# - shuffle.partitions: sized for local[32] test runs; on a real cluster AQE
#   coalesces from a higher initial number, so this is a floor not a ceiling.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally-owned session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf may be marked static on some builds
            pass
    try:
        # Local mode only: externally-owned sessions default to 200 shuffle
        # partitions — pure task overhead at test scale (AQE coalesces down,
        # never up, so we must NOT cap a real cluster this way).
        if spark.sparkContext.master.startswith("local"):
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "etl-mri-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local session for tests / bench.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Designed for
    local[N] testing; on a cluster the same code runs unmodified because
    every operator declares partitioning via the DataFrame API instead of
    assuming executor count.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    return tune(builder.getOrCreate())
