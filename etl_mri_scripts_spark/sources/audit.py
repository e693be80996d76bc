"""Append-mode CSV audit log (SURVEY.md §2.1 S10 / §2.2 K7; ref
slice_generator.py:33-40) and small text reports (K8) as DataFrame writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException
from pyspark.sql import functions as F

LOG_SCHEMA = "ts timestamp, file string, force boolean"


def log_processed(spark: SparkSession, log_dir: str, files: list[str], force: bool = False) -> None:
    """Timestamped append rows, one per processed file."""
    df = spark.createDataFrame([(f, force) for f in files], "file string, force boolean")
    (
        df.select(F.current_timestamp().alias("ts"), "file", "force")
        .write.mode("append")
        .option("header", "true")
        .csv(log_dir)
    )


def read_log(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.schema(LOG_SCHEMA).option("header", "true").csv(log_dir)


def already_processed(spark: SparkSession, log_dir: str) -> DataFrame:
    """F4 idempotency support: the processed-file set, for an anti-join
    against the incoming scan (replaces the reference's per-file
    os.path.exists check with one plan-level anti-join)."""
    try:
        return read_log(spark, log_dir).select("file").distinct()
    except AnalysisException as exc:
        # Only "no log yet" may degrade to the empty set. A real read
        # failure (permissions, corrupt files) must surface — swallowing
        # it would silently disable the idempotency gate and reprocess
        # the whole corpus.
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame([], "file string")
        raise


def split_report(patches: DataFrame) -> DataFrame:
    """split_info/dataset_meta style rollup (ref v2/nii_to_lmdb.py:165-182):
    counts per (split, resolution) plus totals via rollup."""
    return (
        patches.rollup("split", "resolution")
        .agg(F.count(F.lit(1)).alias("n_patches"))
        .select(
            F.coalesce("split", F.lit("ALL")).alias("split"),
            F.coalesce("resolution", F.lit("ALL")).alias("resolution"),
            "n_patches",
        )
        .orderBy("split", "resolution")
    )
