"""Regression net for tables._events timestamp-encoding handling.

Round-1 blocker: events.parquet encoded as TIMESTAMP(MICROS,
isAdjustedToUTC=false) is read by Spark 4.x (inferTimestampNTZ default) as
TIMESTAMP_NTZ, and every downstream `unix_micros(ts)` call failed analysis.
This file writes tiny events parquet in all three encodings the catalog
claims to handle and asserts `table()` always yields TimestampType with
identical UTC instants.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from etl_mri_scripts_spark.tables import table

TS_UTC = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 6, 15, 12, 30, 45, 654321),
    dt.datetime(2025, 12, 31, 23, 59, 59, 999999),
]
EXPECTED_MICROS = [
    int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in TS_UTC
]


def _write_events(dirpath, ts_arrow_type):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS_UTC, pa.timestamp("us")).cast(ts_arrow_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "error"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, str(dirpath / "events.parquet"))


@pytest.mark.parametrize(
    "arrow_type",
    [
        pytest.param(pa.timestamp("ns"), id="nanos"),
        pytest.param(pa.timestamp("us"), id="micros-ntz"),
        pytest.param(pa.timestamp("us", tz="UTC"), id="micros-utc"),
    ],
)
def test_events_ts_normalized_to_timestamp(spark, tmp_path, arrow_type):
    _write_events(tmp_path, arrow_type)
    df = table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [
        r.micros
        for r in df.select(F.unix_micros("ts").alias("micros"))
        .orderBy("event_id")
        .collect()
    ]
    assert got == EXPECTED_MICROS


def test_events_read_does_not_leak_nanos_conf(spark, tmp_path):
    """Non-NANOS reads must restore the caller's nanosAsLong conf."""
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(conf_key, "false")
    _write_events(tmp_path, pa.timestamp("us"))
    table(spark, str(tmp_path), "events")
    assert spark.conf.get(conf_key, "false") == before


def test_events_nanos_file_remains_readable_after_catalog_read(spark, tmp_path):
    """The NANOS path keeps the conf set so lazy execution still works."""
    _write_events(tmp_path, pa.timestamp("ns"))
    df = table(spark, str(tmp_path), "events")
    # Force execution well after the catalog call returned.
    assert df.count() == 3
    micros = [
        r.micros
        for r in df.select(F.unix_micros("ts").alias("micros"))
        .orderBy("event_id")
        .collect()
    ]
    assert micros == EXPECTED_MICROS
