"""Round-8 additions (r7 verdict demands + ADVICE):

- per-query bench drift gate (demand #2): pin each query's normalized
  median AND spread; bench.query_verdicts machine-adjudicates
  ok / noise-band / regressed instead of eyeballing sub-second drift.
- partial-run annotation (ADVICE): normalized totals from a run with
  errored queries are marked partial so they can't be hand-compared
  against full-coverage pins.
- imaging drift gate asymmetry (ADVICE): a metric the PIN carries but the
  observed run reports as 0/missing is a broken measurement -> ok=False;
  only a missing PIN side stays indeterminate.
- pylmdb readonly WAL visibility (ADVICE): a readonly open after a crash
  serves committed-but-unmerged WAL entries (replayed into the in-memory
  index only — the file is never truncated or deleted by a reader).
- semantic-dedup zero-norm semantics (ADVICE + r8 review): a zero-norm
  embedding's cosine is 0/0 = NULL in Spark AND DuckDB (not NaN — the
  division short-circuits before any NaN ordering applies), the
  comparison is NULL, and the pair is dropped by WHERE: the vector is
  KEPT. numpy's IEEE NaN comparisons reproduce that natively; a DuckDB
  pin test guards the engine claim.

No Spark session needed — pure-Python kernel/stat/format work.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

import bench
from bench_imaging import _drift_gate
from etl_mri_scripts_spark.sources import pylmdb


# ------------------------- per-query drift gate -------------------------


def test_query_verdict_bands():
    pins = {
        "small": {"median": 0.25, "spread": 0.05},
        "heavy": {"median": 3.0, "spread": 0.3},
    }
    # within pin median+spread -> ok
    assert bench.query_verdicts({"small": 0.30, "heavy": 3.3}, pins) == {
        "small": "ok",
        "heavy": "ok",
    }
    # sub-second 2x excursion sits inside the ABSOLUTE noise floor
    # (0.30 + max(0.125, 0.35) = 0.65) — the r7 eyeball case, now machine
    v = bench.query_verdicts({"small": 0.55}, pins)
    assert v == {"small": "noise-band"}
    # a heavy query 2x out is far past 1.25x+0.35s -> regressed
    assert bench.query_verdicts({"heavy": 6.2}, pins) == {"heavy": "regressed"}
    # heavy noise-band edge (r9 graduated band: pins >= 1 s get the 25%
    # slack, so a 1.3x drift on a 3 s pin no longer rides through as the
    # r8 50% band allowed): bound 3.3 + max(0.75, 0.35) = 4.05
    assert bench.query_verdicts({"heavy": 4.05}, pins) == {"heavy": "noise-band"}
    assert bench.query_verdicts({"heavy": 4.06}, pins) == {"heavy": "regressed"}


def test_query_verdict_host_tail_band():
    """A pin that RECORDS a no-change excursion (tail) must not call a
    live sample inside that excursion a regression — the r8 pin measured
    ann_ivf_pq_topk at 0.77-5.51 around a 2.13 median with zero code
    change, and without the tail band the gate flagged the pin's own
    run 4 as regressed (r8 review). Beyond the recorded tail + slack is
    still regressed; a pin without a tail field collapses to the strict
    three-band gate."""
    pins = {"heavy": {"median": 2.0, "spread": 0.4, "tail": 3.5}}
    # r9 graduated slack for a 2 s pin: max(0.25 * 2.0, 0.35) = 0.5
    # ok: <= 2.4; noise-band: <= 2.4 + 0.5 = 2.9
    assert bench.query_verdicts({"heavy": 2.9}, pins) == {"heavy": "noise-band"}
    # host-tail: <= 2.0 + 3.5 + 0.5 = 6.0 — where the pin's own runs landed
    assert bench.query_verdicts({"heavy": 5.5}, pins) == {"heavy": "host-tail"}
    assert bench.query_verdicts({"heavy": 6.0}, pins) == {"heavy": "host-tail"}
    # beyond anything the pin ever saw -> regressed
    assert bench.query_verdicts({"heavy": 6.01}, pins) == {"heavy": "regressed"}
    # no tail recorded -> band collapses (strictest): 5.5 is regressed
    no_tail = {"heavy": {"median": 2.0, "spread": 0.4}}
    assert bench.query_verdicts({"heavy": 5.5}, no_tail) == {"heavy": "regressed"}


def test_query_verdict_no_pin_is_loud_not_ok():
    """A query added to HEADLINE after the pin must surface as no-pin,
    never silently pass."""
    assert bench.query_verdicts({"newq": 1.0}, {}) == {"newq": "no-pin"}
    assert bench.query_verdicts({"newq": 1.0}, {"newq": {}}) == {"newq": "no-pin"}


def test_validate_query_pins_guards_layout():
    """Per-query pins are positional: a pin recorded under a different
    HEADLINE order (or a pre-r8 pin with none at all) must degrade to
    no-pin verdicts with a reason, never adjudicate against shifted noise
    factors (r8 review)."""
    headline = ["a", "b", "c"]
    pins = {"a": {"median": 1.0, "spread": 0.1}}
    # matching layout -> pins accepted
    ok, why = bench.validate_query_pins(
        {"query_pins": pins, "headline": ["a", "b", "c"]}, headline
    )
    assert ok == pins and why is None
    # reordered / different headline -> refused with reason
    for bad in (["b", "a", "c"], ["a", "b"], None):
        ok, why = bench.validate_query_pins(
            {"query_pins": pins, "headline": bad}, headline
        )
        assert ok is None and "headline" in why
    # pre-r8 pin (no query_pins) -> refused with the other reason
    ok, why = bench.validate_query_pins({"headline": headline}, headline)
    assert ok is None and "no query_pins" in why


def test_pin_recompute_trims_spread_outliers(tmp_path):
    """pin_bench_baseline --recompute re-derives every statistic from the
    raw runs already recorded in the pin (the runs are the measurement,
    the script is the derivation), and the per-query spread drops the
    single best and worst run: raw max-min is dominated by one noisy run
    and makes the gate toothless for heavy queries (r8: ann_ivf_pq_topk
    samples spanned 0.77-5.51 around a 2.13 median)."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    headline = list(bench.HEADLINE)
    # five recorded runs: q0 stable, with one low and one high outlier run
    per_run_q0 = [1.0, 1.1, 1.2, 0.2, 9.0]
    runs_q = []
    for v in per_run_q0:
        q = {n: 0.5 for n in headline}
        q[headline[0]] = v
        runs_q.append(q)
    probes = [0.6, 0.6, 0.6]  # flat host -> normalization is identity
    pin = {
        "sf": 0.1,
        "headline": headline,
        "run_queries": runs_q,
        "noise_at_pin": [{"probes_start_mid_end": probes}] * 5,
        "run_totals": [round(sum(q.values()), 4) for q in runs_q],
    }
    out = tmp_path / "pin.json"
    with open(out, "w") as f:
        json.dump(pin, f)
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "pin_bench_baseline.py"),
         "--recompute", "--out", str(out), "--note", "test"],
        capture_output=True, text=True, cwd=here,
    )
    assert proc.returncode == 0, proc.stderr
    new = json.load(open(out))
    q0 = new["query_pins"][headline[0]]
    # median of the middle three (1.0, 1.1, 1.2); spread excludes 0.2/9.0
    assert q0["median"] == pytest.approx(1.1, abs=1e-3)
    assert q0["spread"] == pytest.approx(0.2, abs=1e-3)
    # tail = untrimmed worst excursion above the all-runs median (9.0-1.1)
    assert q0["tail"] == pytest.approx(7.9, abs=1e-3)
    assert "--recompute" in new["pin_method"] and "5 runs" in new["pin_method"]
    assert new["headline"] == headline
    # a recorded headline that differs from the live one must refuse
    pin["headline"] = headline[1:] + headline[:1]
    with open(out, "w") as f:
        json.dump(pin, f)
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "pin_bench_baseline.py"),
         "--recompute", "--out", str(out)],
        capture_output=True, text=True, cwd=here,
    )
    assert proc.returncode == 1 and "headline" in proc.stderr


def test_positional_normalize_queries_sums_to_total():
    """The per-query normalization and the total are the same statistic:
    sum(per-query) == positional_normalize for any probe shape."""
    order = [f"q{i}" for i in range(7)]
    times = {n: 0.4 + 0.1 * i for i, n in enumerate(order)}
    probes = [0.9, 0.55, 0.6]  # non-monotone, like real runs
    pin = 0.58
    per_q = bench.positional_normalize_queries(times, order, probes, pin)
    total = bench.positional_normalize(times, order, probes, pin)
    assert per_q is not None and total is not None
    assert total == pytest.approx(sum(per_q.values()), abs=1e-3)
    # missing probe -> both indeterminate, never a partial answer
    assert bench.positional_normalize_queries(times, order, [0.9, None, 0.6], pin) is None


# --------------------- imaging drift gate asymmetry ---------------------


def _write_pin(tmp_path, mode_file, body):
    with open(tmp_path / mode_file, "w") as f:
        json.dump(body, f)


def test_drift_gate_zero_observed_rate_fails(tmp_path):
    """Pin carries the metric, observed run reports 0/missing -> that IS
    evidence (broken measurement), ok must be False, not None."""
    _write_pin(tmp_path, "BENCH_IMAGING_SELF_BASELINE.json",
               {"patches_per_sec": 400.0, "payload_mb_per_sec": 11.0})
    for broken in ({"patches_per_sec": 0, "payload_mb_per_sec": 10.0},
                   {"payload_mb_per_sec": 10.0}):
        gate = _drift_gate("uniform", broken, pin_dir=str(tmp_path))
        assert gate["ok"] is False
        assert "patches_per_sec" in gate["note"]
    # healthy run still passes
    gate = _drift_gate("uniform",
                       {"patches_per_sec": 380.0, "payload_mb_per_sec": 10.5},
                       pin_dir=str(tmp_path))
    assert gate["ok"] is True


def test_drift_gate_missing_pin_side_stays_indeterminate(tmp_path):
    """The 'absent number is not evidence' rule still holds for the PIN
    side: no pin file, or a pin without the rate fields, is ok=None."""
    gate = _drift_gate("uniform", {"patches_per_sec": 400.0}, pin_dir=str(tmp_path))
    assert gate["ok"] is None
    _write_pin(tmp_path, "BENCH_IMAGING_SELF_BASELINE.json", {"wall_sec": 30.0})
    gate = _drift_gate("uniform", {"patches_per_sec": 400.0}, pin_dir=str(tmp_path))
    assert gate["ok"] is None
    assert "no comparable" in gate["note"]


def test_drift_gate_zero_pin_side_fails_loudly(tmp_path):
    """A pin that CARRIES a rate as 0/0.0 came from a broken measurement —
    the same evidence class as a zero observed rate — so it must fail the
    gate (and name the metric), not skip into indeterminate and let
    ok=True ride on the remaining metric forever (r8 review)."""
    _write_pin(tmp_path, "BENCH_IMAGING_SELF_BASELINE.json",
               {"patches_per_sec": 0.0, "payload_mb_per_sec": 11.0})
    gate = _drift_gate("uniform",
                       {"patches_per_sec": 380.0, "payload_mb_per_sec": 10.5},
                       pin_dir=str(tmp_path))
    assert gate["ok"] is False
    assert "broken pin" in gate["note"] and "patches_per_sec" in gate["note"]
    # a pin side that's simply ABSENT (None/missing key) stays indeterminate
    _write_pin(tmp_path, "BENCH_IMAGING_SELF_BASELINE.json",
               {"payload_mb_per_sec": 11.0})
    gate = _drift_gate("uniform",
                       {"patches_per_sec": 380.0, "payload_mb_per_sec": 10.5},
                       pin_dir=str(tmp_path))
    assert gate["ok"] is True  # gated on the one comparable metric only
    assert gate["ratio_pin_over_observed"].keys() == {"payload_mb_per_sec"}


# --------------------- pylmdb readonly WAL visibility --------------------


def test_readonly_open_serves_unmerged_wal(tmp_path):
    """Crash after commit, then a READONLY open: committed entries must be
    visible (the durability promise applies to readers too), and the
    reader must not write — the WAL stays byte-identical on disk."""
    path = str(tmp_path / "s")
    env = pylmdb.open(path, map_size=8 * 1024 * 1024)
    with env.begin(write=True) as txn:
        txn.put(b"base", b"v0")
    env.close()
    env = pylmdb.open(path, map_size=8 * 1024 * 1024)
    with env.begin(write=True) as txn:
        txn.put(b"committed-after", b"v1")
    wal = env.walfile
    wal_bytes = open(wal, "rb").read()
    del env  # crash: no close()

    ro = pylmdb.open(path, map_size=8 * 1024 * 1024, readonly=True)
    with ro.begin() as txn:
        assert txn.get(b"base") == b"v0"  # merged store still served
        assert txn.get(b"committed-after") == b"v1"  # WAL entry served
    ro.close()
    # the reader performed no repair: WAL untouched, still present
    assert open(wal, "rb").read() == wal_bytes


def test_readonly_open_does_not_truncate_torn_tail(tmp_path):
    """A torn tail frame is indexed-around by a readonly open but the
    repair (truncate) is left to the next WRITE open."""
    path = str(tmp_path / "s")
    env = pylmdb.open(path, map_size=8 * 1024 * 1024)
    with env.begin(write=True) as txn:
        txn.put(b"good", b"val")
    del env  # crash
    wal = os.path.join(path, "data.mdb-wal")
    with open(wal, "ab") as f:
        f.write(b"\x03\x00\x00\x00")  # half a header: torn mid-write
    size_before = os.path.getsize(wal)

    ro = pylmdb.open(path, map_size=8 * 1024 * 1024, readonly=True)
    with ro.begin() as txn:
        assert txn.get(b"good") == b"val"
    ro.close()
    assert os.path.getsize(wal) == size_before  # no write from a reader

    env2 = pylmdb.open(path, map_size=8 * 1024 * 1024)  # write open repairs
    assert os.path.getsize(wal) < size_before
    with env2.begin() as txn:
        assert txn.get(b"good") == b"val"
    env2.close()


def test_readonly_open_survives_concurrent_wal_merge(tmp_path):
    """A readonly open must hold its WAL read fd from the moment it
    indexes the frames: a concurrent WRITE open may replay, merge and
    UNLINK the WAL at any time, and a lazily-opened handle would
    FileNotFoundError on the first get() instead of serving the committed
    entries the reader already indexed (POSIX keeps a held fd readable
    past the unlink — r8 review)."""
    path = str(tmp_path / "s")
    env = pylmdb.open(path, map_size=8 * 1024 * 1024)
    with env.begin(write=True) as txn:
        txn.put(b"k", b"committed")
    del env  # crash: WAL left behind

    ro = pylmdb.open(path, map_size=8 * 1024 * 1024, readonly=True)
    # concurrent writer recovers and cleanly closes: WAL merged + deleted
    writer = pylmdb.open(path, map_size=8 * 1024 * 1024)
    writer.close()
    assert not os.path.exists(os.path.join(path, "data.mdb-wal"))
    # the reader still serves the entry it indexed, from its held fd
    with ro.begin() as txn:
        assert txn.get(b"k") == b"committed"
    ro.close()


# --------------------- semantic-dedup NaN ordering -----------------------


def test_sem_dedup_kernel_zero_norm_vectors_are_kept():
    """Zero-norm embedding -> cos = 0/0. That is NULL — not NaN — in both
    engines the kernel must match (Spark's non-ANSI Divide and DuckDB's
    `/` return NULL on a zero divisor), NULL >= tau is NULL, and the
    oracle's WHERE drops the pair: a zero-norm vector is never a
    duplicate and never claims one. numpy's IEEE NaN comparisons (False
    everywhere) reproduce exactly that, so the kernel keeps them with no
    special-casing. (An earlier r8 edit folded NaN in as a duplicate,
    citing NaN-HIGH engine ordering — wrong: the division yields NULL,
    never NaN, so ordering semantics never enter. r8 review, verified on
    the installed DuckDB below.)"""
    from etl_mri_scripts_spark.queries.similarity import _sem_dedup_cluster_np

    e_zero = [0.0, 0.0, 0.0]
    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "cid": [0, 0, 0],
            "e": [e_zero, e_zero, [1.0, 0.0, 0.0]],
            "nrm": [0.0, 0.0, 1.0],
        }
    )
    out = _sem_dedup_cluster_np(pdf).set_index("vec_id")
    # every pair involving a zero-norm vector has a NULL/NaN cosine ->
    # not a duplicate; all three vectors are kept
    for vid in (1, 2, 3):
        assert bool(out.loc[vid, "kept"]) is True
        assert pd.isna(out.loc[vid, "dup_of"])


def test_duckdb_zero_divide_is_null_not_nan():
    """Pin the engine-semantics claim the kernel's docstring relies on:
    DuckDB's division yields NULL (not NaN) for 0/0, and the thresholded
    comparison is NULL — dropped by WHERE — so the oracle KEEPS zero-norm
    vectors. If a DuckDB upgrade ever changes this, the kernel's NaN
    handling must be revisited alongside it."""
    import duckdb

    row = duckdb.sql(
        "SELECT 0.0/0.0 AS c, (0.0/0.0) >= 0.4 AS cmp, "
        "round(0.0/0.0, 6) >= 0.4 AS cmp6"
    ).fetchone()
    assert row == (None, None, None)


def test_sem_dedup_kernel_finite_path_unchanged():
    """The NaN fold must not disturb finite arithmetic: orthogonal vectors
    stay kept, near-identical ones still dedup."""
    from etl_mri_scripts_spark.queries.similarity import _sem_dedup_cluster_np

    pdf = pd.DataFrame(
        {
            "vec_id": [10, 11, 12],
            "cid": [0, 0, 0],
            "e": [[1.0, 0.0], [1.0, 1e-9], [0.0, 1.0]],
            "nrm": [1.0, float(np.hypot(1.0, 1e-9)), 1.0],
        }
    )
    out = _sem_dedup_cluster_np(pdf).set_index("vec_id")
    assert bool(out.loc[10, "kept"]) is True
    assert bool(out.loc[11, "kept"]) is False and out.loc[11, "dup_of"] == 10
    assert bool(out.loc[12, "kept"]) is True


# ------------------- pylmdb WAL soak + size accounting -------------------


def test_wal_soak_close_merge_streams_50k_entries(tmp_path):
    """Scale-shaped WAL lifecycle test (r7 verdict demand #4): a store big
    enough that close-time merge must STREAM (50k entries, ~100 MB of
    values) — peak Python allocation during the whole write+close cycle
    stays O(commit batch + key index), nowhere near O(store); and the WAL
    is deleted after a clean close.

    tracemalloc, not RSS: the regression this guards against is close()
    (or commit()) buffering VALUE bytes in Python lists/dicts — exactly
    what tracemalloc counts — while mmap pages and file-system cache
    (which RSS would conflate) are irrelevant to the O(batch + index)
    contract."""
    import tracemalloc

    N, VAL, BATCH = 50_000, 2000, 500  # ~100 MB of values, 1 MB per batch
    path = str(tmp_path / "soak")
    env = pylmdb.open(path, map_size=512 * 1024 * 1024)

    tracemalloc.start()
    txn = env.begin(write=True)
    for i in range(N):
        txn.put(b"k%07d" % i, (b"%07d" % i) * (VAL // 7))
        if (i + 1) % BATCH == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    _cur, peak_commit = tracemalloc.get_traced_memory()
    tracemalloc.reset_peak()
    env.close()
    _cur, peak_close = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    store_bytes = N * VAL  # ~100 MB
    # O(batch + index) ceiling: 50k keys x (bytes key + (off,len) tuple)
    # is ~8-10 MB of Python objects; a single 1 MB staged batch on top.
    # O(store) buffering would trace >= 100 MB — 25 MB splits the two
    # regimes with >4x margin on either side.
    ceiling = 25 * 1024 * 1024
    assert peak_commit < ceiling, (
        f"commit path traced {peak_commit / 1e6:.0f} MB peak for a "
        f"{store_bytes / 1e6:.0f} MB store — values are being buffered"
    )
    assert peak_close < ceiling, (
        f"close-time merge traced {peak_close / 1e6:.0f} MB peak for a "
        f"{store_bytes / 1e6:.0f} MB store — the merge is not streaming"
    )

    # disk lifecycle: WAL gone after a clean close, store complete
    assert not os.path.exists(os.path.join(path, "data.mdb-wal"))
    assert os.path.getsize(os.path.join(path, "data.mdb")) > store_bytes

    ro = pylmdb.open(path, map_size=512 * 1024 * 1024, readonly=True)
    with ro.begin() as txn:
        assert txn.get(b"k0000000") == b"0000000" * (VAL // 7)
        assert txn.get(b"k0049999") == b"0049999" * (VAL // 7)
        assert txn.get(b"k0050000") is None
    ro.close()
