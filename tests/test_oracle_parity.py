"""Every registered query with an oracle must match DuckDB at sf0.001 —
the local replica of the driver's t2 gate.

r14 (r13 verdict demand #2): the sweep is batched and THREAD-PARALLEL.
The serial one-test-per-query sweep dominated the suite (~8 s/query x
190 — the driver's test budget truncated the run at ~85%, recording
``tests_ok: false`` for a suite that was all passing dots). Spark's
scheduler happily runs concurrent jobs from driver threads (optimization
guide §2.6) and the per-query wall time at sf0.001 is scheduling/compile
latency, not compute, so overlapping queries recovers most of it.

Mechanics:
- each worker thread gets ``spark.newSession()`` + ``tune()``: isolated
  SQLConf (the imaging queries shrink the Arrow batch size at plan time;
  a shared session would leak that mid-flight into concurrent queries)
  over the SAME SparkContext and cache manager, UTC timezone re-applied
  (timestamp parity depends on it).
- DuckDB connections are not thread-safe: oracle side runs under a lock
  (it is milliseconds per query — Spark is the expensive side).
- failures are collected per batch and reported with every failing query
  name + error, so one bad query still names itself; re-run a single
  query with ``python check_window.py --names <query>``.
- SPARK_GRAFT_SERIAL_PARITY=1 forces the old serial behavior (threads=1)
  for debugging.
"""

from __future__ import annotations

import os
import threading
import traceback
from concurrent.futures import ThreadPoolExecutor

import pytest

from etl_mri_scripts_spark.queries import ORACLES, QUERIES

from .parity import assert_frames_match

N_BATCHES = 16
PARITY_THREADS = 1 if os.environ.get("SPARK_GRAFT_SERIAL_PARITY") else 4

_duck_lock = threading.Lock()


def _run_parity_threaded(spark, duck, sf_dir: str, name: str) -> None:
    from etl_mri_scripts_spark.operators.pipeline import arrow_batch_restore
    from etl_mri_scripts_spark.session import tune

    s = tune(spark.newSession())
    with arrow_batch_restore(s):
        sdf = QUERIES[name](s, sf_dir).toPandas()
    with _duck_lock:
        odf = duck.execute(ORACLES[name]).df()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("batch", range(N_BATCHES))
def test_oracle_parity_batch(spark, duck, sf_dir, batch):
    names = sorted(ORACLES)[batch::N_BATCHES]
    failures: dict[str, str] = {}

    def one(name: str) -> None:
        try:
            _run_parity_threaded(spark, duck, sf_dir, name)
        except Exception:  # noqa: BLE001 — every failure must be named
            failures[name] = traceback.format_exc(limit=3)

    with ThreadPoolExecutor(max_workers=PARITY_THREADS) as ex:
        list(ex.map(one, names))
    assert not failures, (
        f"oracle parity failures ({sorted(failures)}):\n"
        + "\n".join(f"--- {n} ---\n{tb}" for n, tb in sorted(failures.items()))
    )


@pytest.mark.parametrize("batch", range(4))
def test_rows_only_queries_run(spark, sf_dir, batch):
    names = sorted(set(QUERIES) - set(ORACLES))[batch::4]
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.schema.fields) > 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
