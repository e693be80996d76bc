"""Round-9 additions (r8 verdict demands + ADVICE):

- graduated per-query drift slack (demand #3): pins >= 1 s get a 25%
  noise band instead of 50% — a 1.6 s query can no longer drift 800 ms
  unflagged — validated by replaying the r8 pin's own recorded runs
  through the tightened gate (zero false `regressed`).
- bench gate key on every path (ADVICE): an unreadable pin or an
  sf-mismatched pin yields an explicit inactive reason from
  load_pin_calibration, never silently-absent gate keys.
- pylmdb readonly single-fd WAL open (ADVICE): the replay and the held
  get() handle are the SAME fd, so a concurrent merge+unlink at any
  point after the exists() check can no longer strand the reader.
- skew imaging bench statistics (demand #2): pin_imaging_baseline pins
  median + outlier-trimmed spread + tail from >= 5 runs; bench_imaging
  emits a machine verdict (ok / noise-band / host-tail / regressed) on
  RAW-rate throughput — the host probe is recorded as diagnostic
  evidence only, never multiplied into the statistic — so a host-tail
  run self-identifies without narrative adjudication.

No Spark session needed — pure-Python stat/format work.
"""

from __future__ import annotations

import json
import os

import pytest

import bench
from etl_mri_scripts_spark.sources import pylmdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# -------------------- graduated drift-gate slack -------------------------


def test_noise_slack_is_graduated():
    # sub-second pins: absolute floor dominates (scheduler jitter)
    assert bench.noise_slack(0.25) == pytest.approx(0.35)
    # r10 (r9 ADVICE): the rel band now interpolates 50% -> 25% across
    # (0.7 s, 1.0 s), so rel*median never exceeds the 0.35 s floor below
    # 1.4 s — the old step gave a 0.99 s pin 0.495 s slack and a 1.0 s
    # pin 0.35 s (non-monotone across a re-pin drifting past 1 s)
    assert bench.noise_slack(0.7) == pytest.approx(0.35)
    assert bench.noise_slack(0.9) == pytest.approx(0.35)
    assert bench.noise_slack(0.99) == pytest.approx(0.35)
    # >= 1 s: the r9 tightened 25% band (r8: dedup_semantic_keep rode a
    # 1.30x raw drift through the 50% band as `ok`)
    assert bench.noise_slack(1.0) == pytest.approx(0.35)  # 0.25 < floor
    assert bench.noise_slack(1.4) == pytest.approx(0.35)  # floor crossover
    assert bench.noise_slack(1.6) == pytest.approx(0.40)
    assert bench.noise_slack(3.0) == pytest.approx(0.75)
    # the old discontinuity, gone: slack never shrinks as the pin grows
    assert bench.noise_slack(0.99) <= bench.noise_slack(1.0)


def test_tightened_gate_zero_false_regressions_on_pin_runs():
    """Replaying the live pin's own recorded runs through the tightened
    gate must produce zero `regressed` — the pin runs are by definition
    no-change code, so any `regressed` there is a false alarm (the same
    self-validation that activated the r8 gate, re-run for the r9 band)."""
    with open(os.path.join(HERE, "BENCH_SELF_BASELINE.json")) as f:
        pin = json.load(f)
    sp = pin["sentinel_probe_pin"]
    for rq, noise in zip(pin["run_queries"], pin["noise_at_pin"]):
        norm = bench.positional_normalize_queries(
            rq, pin["headline"], noise["probes_start_mid_end"], sp
        )
        assert norm is not None
        verdicts = bench.query_verdicts(norm, pin["query_pins"])
        regressed = [n for n, v in verdicts.items() if v == "regressed"]
        assert not regressed, f"pin's own run reads as regressed: {regressed}"


# ------------------- gate key present on every path ----------------------


def test_load_pin_calibration_reports_sf_mismatch(tmp_path):
    p = tmp_path / "pin.json"
    p.write_text(json.dumps({"sf": 0.1, "sentinel_probe_pin": 0.6}))
    *pins, reason = bench.load_pin_calibration(0.01, ["a"], str(p))
    assert all(x is None for x in pins)
    assert "sf" in reason and "0.1" in reason and "0.01" in reason


def test_load_pin_calibration_reports_missing_pin(tmp_path):
    *pins, reason = bench.load_pin_calibration(
        0.1, ["a"], str(tmp_path / "absent.json")
    )
    assert all(x is None for x in pins)
    assert "no readable" in reason


def test_load_pin_calibration_accepts_matching_pin(tmp_path):
    p = tmp_path / "pin.json"
    p.write_text(json.dumps({
        "sf": 0.1,
        "sentinel_probe_pin": 0.6,
        "value_median_of_runs": 40.0,
        "value_median_of_runs_normalized": 39.0,
        "headline": ["a"],
        "query_pins": {"a": {"median": 1.0, "spread": 0.1, "tail": 0.2}},
    }))
    sp, med_run, med_norm, qp, reason = bench.load_pin_calibration(
        0.1, ["a"], str(p)
    )
    assert reason is None
    assert (sp, med_run, med_norm) == (0.6, 40.0, 39.0)
    assert qp == {"a": {"median": 1.0, "spread": 0.1, "tail": 0.2}}


# ---------------- pylmdb readonly single-fd WAL open ---------------------


def test_readonly_replay_and_get_share_one_fd(tmp_path):
    """The fd that replayed the WAL must BE the get() handle: two opens
    leave a window (between replay-close and guard-open) where a
    concurrent merge+unlink strands the reader (r8 ADVICE)."""
    path = str(tmp_path / "s")
    env = pylmdb.open(path, map_size=8 * 1024 * 1024)
    with env.begin(write=True) as txn:
        txn.put(b"k", b"committed")
    del env  # crash: WAL left behind

    ro = pylmdb.open(path, map_size=8 * 1024 * 1024, readonly=True)
    assert ro._wal_read is not None and not ro._wal_read.closed
    # unlink the WAL immediately — before any get() — as a concurrent
    # writer's close() would; the held replay fd must keep serving
    os.unlink(os.path.join(path, "data.mdb-wal"))
    with ro.begin() as txn:
        assert txn.get(b"k") == b"committed"
    ro.close()


def test_readonly_open_tolerates_wal_vanishing_before_open(tmp_path, monkeypatch):
    """A writer may merge+unlink the WAL between the reader's exists()
    check and its open: that must read as 'already merged' (the entries
    are in the store file the reader serves), never FileNotFoundError."""
    path = str(tmp_path / "s")
    env = pylmdb.open(path, map_size=8 * 1024 * 1024)
    with env.begin(write=True) as txn:
        txn.put(b"k", b"merged")
    env.close()  # clean close: WAL merged into the store and unlinked
    assert not os.path.exists(os.path.join(path, "data.mdb-wal"))

    # Simulate the exists()/open race: exists() claims the WAL is there
    # although the writer already unlinked it.
    real_exists = os.path.exists
    monkeypatch.setattr(
        pylmdb.os.path,
        "exists",
        lambda p: True if p.endswith("data.mdb-wal") else real_exists(p),
    )
    ro = pylmdb.open(path, map_size=8 * 1024 * 1024, readonly=True)
    monkeypatch.undo()
    with ro.begin() as txn:
        assert txn.get(b"k") == b"merged"
    ro.close()


# ----------------- imaging bench machine verdicts ------------------------


def _throughput_verdict(*args, **kw):
    from bench_imaging import throughput_verdict

    return throughput_verdict(*args, **kw)


def test_imaging_throughput_verdict_bands():
    """Throughput gates invert the time-gate geometry: regression =
    LOWER rate, so the bands extend DOWNWARD from the pinned median and
    `tail` is the pin runs' own worst downward excursion."""
    pin = {"median": 300.0, "spread": 30.0, "tail": 110.0}
    # within median - spread -> ok
    assert _throughput_verdict(275.0, pin) == "ok"
    # slack = IMG_NOISE_REL_BAND * pinned median -> noise band below
    from bench_imaging import IMG_NOISE_REL_BAND

    slack = IMG_NOISE_REL_BAND * 300.0
    assert _throughput_verdict(270.0 - slack + 0.1, pin) == "noise-band"
    # inside the pin's own recorded worst excursion -> host-tail
    assert _throughput_verdict(195.0, pin) == "host-tail"
    assert _throughput_verdict(190.0 - slack + 0.1, pin) == "host-tail"
    # below anything the pin ever saw -> regressed
    assert _throughput_verdict(190.0 - slack - 0.1, pin) == "regressed"
    # no tail recorded -> collapses to the strict three-band gate
    assert _throughput_verdict(195.0, {"median": 300.0, "spread": 30.0}) == "regressed"


def test_imaging_pin_recompute_round_trips(tmp_path):
    """--recompute re-derives stats from the runs recorded in the pin —
    including the geometry fields, which the trimmed per-run records do
    NOT carry (they must come from the previous pin's top level, found
    by review in r9 before it could strike)."""
    import subprocess
    import sys

    run = {
        "value": 100.0, "wall_sec": 600.0, "patches_per_sec": 300.0,
        "payload_mb_per_sec": 9.0, "n_patches": 190050,
        "key_parity_ok": True, "host_probe_sec": 0.016,
        "host_probe_start_end": [0.016, 0.016],
    }
    runs = []
    for i, (rate, probe) in enumerate(
        [(290.0, 0.016), (296.0, 0.015), (302.0, 0.017),
         (194.0, 0.016), (330.0, 0.016)]
    ):
        r = dict(run)
        r["patches_per_sec"], r["host_probe_sec"] = rate, probe
        runs.append(r)
    pin = {
        "mode": "skew", "runs": runs,
        "n_volumes": 9, "shape": [192, 192, 48], "n_slices": 3144,
        "n_patches": 190050, "payload_mb": 5470.0,
        "big_shape": [960, 840, 640],
    }
    out = tmp_path / "pin.json"
    out.write_text(json.dumps(pin))
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "pin_imaging_baseline.py"),
         "--mode", "skew", "--recompute", "--out", str(out)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    new = json.loads(out.read_text())
    # geometry survived the recompute
    assert new["big_shape"] == [960, 840, 640]
    assert new["n_volumes"] == 9 and new["payload_mb"] == 5470.0
    # stats derived: host_probe_pin = median probe; spread trimmed
    assert new["host_probe_pin"] == 0.016
    st = new["stats"]["patches_per_sec"]
    assert st["median"] > 0 and st["spread"] < 100  # 194-outlier trimmed
    assert "recomputed" in new["pin_method"]
    # the raw runs are preserved verbatim for the next recompute
    assert len(new["runs"]) == 5


def test_imaging_gate_flags_probe_disagreement(tmp_path):
    """Start/end probes disagreeing >2x mean the load shifted DURING the
    run — the median probe under-corrects and any non-ok verdict needs a
    re-run; the gate must say so instead of silently adjudicating."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "host_probe_pin": 0.016,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 80.0},
            "payload_mb_per_sec": {"median": 9.0, "spread": 0.6, "tail": 2.4},
        },
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    result = {
        "patches_per_sec": 290.0, "payload_mb_per_sec": 8.7,
        "host_probe_sec": 0.02, "host_probe_start_end": [0.01, 0.03],
    }
    g = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g["verdict_gate"] == "active"
    assert "disagree" in g.get("note", "")
    # steady probes -> no note
    result["host_probe_start_end"] = [0.019, 0.021]
    g2 = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert "disagree" not in g2.get("note", "")


def test_imaging_gate_broken_measurement_never_reads_ok(tmp_path):
    """A pinned metric observed as 0/missing is a broken measurement:
    ok=False AND verdict=None — the surviving metric must not let the
    top-level verdict read `ok` while the gate says failed."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 80.0},
            "payload_mb_per_sec": {"median": 9.0, "spread": 0.6, "tail": 2.4},
        },
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    result = {"patches_per_sec": 310.0, "payload_mb_per_sec": 0}
    g = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g["ok"] is False
    assert g["verdict"] is None
    assert "broken" in g["verdict_gate"]


def test_imaging_gate_zero_false_regressions_on_pin_runs():
    """The imaging mirror of the bench-gate self-validation: replaying
    each mode's pin runs (no-change code by definition) through
    throughput_verdict must produce zero `regressed` — by construction a
    recorded run is never below the all-runs minimum, and the tail band
    reaches exactly that far."""
    from bench_imaging import DRIFT_GATE_METRICS, PIN_FILES, throughput_verdict

    for mode, fn in PIN_FILES.items():
        path = os.path.join(HERE, fn)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            pin = json.load(f)
        if not pin.get("stats"):
            if pin.get("cpu_only_pin"):
                # r13 skewsmall: wall statistics deferred to the first
                # healthy-host full pin (pin tools refuse floored wall
                # pins) — the pin carries only the cpu axis, so replay
                # THAT axis: same zero-false-regressions property on the
                # statistics the drift gate actually adjudicates against.
                assert pin.get("cpu_runs") and pin.get("cpu_stats"), (
                    f"{fn}: cpu_only_pin without cpu_runs/cpu_stats"
                )
                for run in pin["cpu_runs"]:
                    for m, st in pin["cpu_stats"].items():
                        v = throughput_verdict(run[m], st)
                        assert v != "regressed", (
                            f"{mode}/{m} (cpu axis): pin's own run "
                            f"{run[m]} reads regressed"
                        )
                continue
            pytest.fail(f"{fn}: pre-r9 pin without stats — re-pin")
        for run in pin["runs"]:
            for m in DRIFT_GATE_METRICS:
                v = throughput_verdict(run[m], pin["stats"][m])
                assert v != "regressed", (
                    f"{mode}/{m}: pin's own run {run[m]} reads regressed"
                )


def test_imaging_pin_stats_trim_and_tail():
    from bench_imaging import pin_stats

    # five runs: one low outlier (the r8 skew 194 p/s run), one high
    rates = [194.0, 290.0, 296.0, 302.0, 330.0]
    st = pin_stats(rates)
    assert st["median"] == 296.0
    # trimmed spread: middle three (290..302) -> 12
    assert st["spread"] == pytest.approx(12.0)
    # tail = worst DOWNWARD excursion from the all-runs median
    assert st["tail"] == pytest.approx(102.0)
    # n < 4: no trim
    st3 = pin_stats([280.0, 296.0, 310.0])
    assert st3["spread"] == pytest.approx(30.0)
