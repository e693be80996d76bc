"""Registry mapping query name -> (spark callable, optional DuckDB oracle).

The driver contract (__spark_entry__.py) wants two dicts; keeping the Spark
implementation and its oracle SQL side by side in one decorator keeps the
column-name contract (alias parity) reviewable in one place.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query. ``oracle`` is ANSI SQL DuckDB runs on the same
    parquet views; omit for non-SQL-expressible ops (rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        assert name not in QUERIES, f"duplicate query {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
