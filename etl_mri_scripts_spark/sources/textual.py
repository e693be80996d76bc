"""Text-corpus interchange formats: JSONL and CSV document ingestion.

Web-scale corpora arrive as JSONL shards (Common Crawl derivatives, HF
datasets exports) or CSV. Scale rules baked in here:

* ALWAYS pass an explicit schema. Schema inference is a full extra pass
  over the data (spark.read.json samples every record by default) — at
  100 TB that is a wasted scan, and inferred types drift between shards.
* PERMISSIVE mode with a _corrupt_record column: one malformed line in a
  billion must neither kill the job (FAILFAST) nor silently vanish
  (DROPMALFORMED). Corrupt rows are quarantined and counted; the count is
  a data-quality metric the pipeline reports.
* CSV needs multiLine + quote/escape discipline for free-text columns —
  document text contains every delimiter there is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

DOCUMENT_SCHEMA_PERMISSIVE = StructType(
    DOCUMENT_SCHEMA.fields + [StructField("_corrupt_record", StringType())]
)


def write_documents_jsonl(docs: DataFrame, out_dir: str) -> None:
    """Export documents as JSONL shards (one JSON object per line, one file
    per task — the interchange layout every corpus tool consumes)."""
    docs.write.mode("overwrite").json(out_dir)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL scan with explicit schema + corrupt-record quarantine."""
    return (
        spark.read.schema(DOCUMENT_SCHEMA_PERMISSIVE)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_documents_csv(docs: DataFrame, out_dir: str) -> None:
    """CSV export with full quoting discipline: free text embeds commas,
    quotes and newlines, so every text field is quoted and quotes escaped
    by doubling (RFC 4180 — what DuckDB and pandas expect back)."""
    (
        docs.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(out_dir)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan: explicit schema, header, RFC-4180 quotes, multiLine for
    embedded newlines (multiLine disables naive line-splitting, so use it
    only when the data demands it — it constrains parallelism to file
    granularity; shard accordingly)."""
    return (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )
