"""Shared subprocess harness for transformWithStateInPandas parity.

The TWS state-server wire protocol needs ``google.protobuf`` importable
inside Spark's Python workers. When the wheel is absent in-process, the
path can still EXECUTE by launching a subprocess whose PYTHONPATH
carries a host-provided pure-Python protobuf runtime (e.g. the
cloud-sdk bundles protobuf 6.x) plus a sitecustomize shim that no-ops
the gencode/runtime version validator (runtime 6.32 vs pyspark gencode
6.33 — wire-compatible; only the strict policy check differs). Workers
inherit the environment, so the shim applies to them too.

Used by both tests/test_round5_additions.py (the canonical harness
test) and tests/test_streaming.py (the in-process twin falls back to
this harness instead of skipping when protobuf is not importable).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


def find_protobuf_runtime() -> str | None:
    """A google.protobuf runtime the TWS state protocol can use: the
    normally-importable one (returns None — no path injection needed),
    or a modern pure-Python copy shipped by host tooling."""
    try:
        import google.protobuf  # noqa: F401

        return None
    except ImportError:
        pass
    candidates = [
        "/usr/lib/google-cloud-sdk/platform/google_appengine",
    ]
    for c in candidates:
        probe = os.path.join(c, "google", "protobuf", "runtime_version.py")
        if os.path.exists(probe):
            return c
    return None


def protobuf_runtime_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return find_protobuf_runtime() is not None


TWS_SCRIPT = r"""
import os, sys
sys.path.insert(0, os.environ["REPO_DIR"])
from etl_mri_scripts_spark.session import get_spark
from etl_mri_scripts_spark.streaming.pipeline import running_counters_tws_stream, stream_events
from etl_mri_scripts_spark.tables import table
from pyspark.sql import functions as F

tmp = os.environ["TWS_TMP"]
spark = get_spark("tws-subprocess", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
# transformWithState needs column families -> RocksDB state store
spark.conf.set(
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)
ev = table(spark, os.environ["TWS_SF"], "events").limit(2000)
in_dir = os.path.join(tmp, "twsin"); os.makedirs(in_dir)
a, b = ev.randomSplit([0.5, 0.5], seed=2)
a.write.mode("overwrite").json(in_dir + "/chunk=a")
stream = stream_events(spark, in_dir + "/*", fmt="json")
q = (running_counters_tws_stream(stream)
     .writeStream.format("memory").queryName("tws_counters")
     .outputMode("update").option("checkpointLocation", os.path.join(tmp, "ck"))
     .start())
try:
    q.processAllAvailable()
    b.write.mode("overwrite").json(in_dir + "/chunk=b")
    q.processAllAvailable()
finally:
    q.stop()
rows = spark.sql("select * from tws_counters").collect()
latest = {}
for r in sorted(rows, key=lambda r: r["n_batches"]):
    latest[r["event_type"]] = (r["n_total"], round(r["value_total"], 4))
expected = {
    r["event_type"]: (r["n"], round(r["v"], 4))
    for r in ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")).collect()
}
assert latest == expected, f"{latest} != {expected}"
print("TWS_PARITY_OK")
spark.stop()
"""


def run_tws_parity_subprocess(tmp_path) -> None:
    """Execute the TWS parity script in a protobuf-equipped subprocess;
    assert it reports parity. Skips only when NO protobuf runtime exists
    anywhere on the host."""
    pb_dir = find_protobuf_runtime()
    if pb_dir is None:
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            pytest.skip("no google.protobuf runtime anywhere on this host")
    shim = tmp_path / "shim"
    shim.mkdir(exist_ok=True)
    (shim / "sitecustomize.py").write_text(
        "try:\n"
        "    from google.protobuf import runtime_version as _rv\n"
        "    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None\n"
        "except Exception:\n"
        "    pass\n"
    )
    script = tmp_path / "tws_parity.py"
    script.write_text(TWS_SCRIPT)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    extra = [str(shim)] + ([pb_dir] if pb_dir else [])
    env["PYTHONPATH"] = os.pathsep.join(
        extra + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    env["REPO_DIR"] = repo
    env["TWS_TMP"] = str(tmp_path / "work")
    env["TWS_SF"] = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, str(script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0 and "TWS_PARITY_OK" in proc.stdout, (
        f"rc={proc.returncode}\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-3000:]}"
    )
