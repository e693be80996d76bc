"""Every registered query with an oracle must match DuckDB at sf0.001 —
the local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from etl_mri_scripts_spark.queries import ORACLES, QUERIES

from .parity import run_parity


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, sf_dir, name):
    run_parity(spark, duck, sf_dir, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
