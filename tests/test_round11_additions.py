"""Round-11 additions (r10 verdict demand #1 + ADVICE):

- inactive-streak memory: the imaging drift gate counts consecutive
  UNMEASURED rounds (verdict None — memory-floored host, broken
  measurement, stats-less pin) and escalates at 2, closing the r10 blind
  spot where N consecutive floored rounds never demanded a healthy-host
  measurement.
- history loader records inactive rounds explicitly (verdict None) so
  they BREAK the non-ok streak instead of silently splicing the non-ok
  rounds on either side (pre-r11 they were dropped from the list).
- exculpatory-only ok (ADVICE): the memory gate nulls the 2x-backstop
  `ok` only when it was False; a passing backstop under slower-only bias
  (e.g. noise-band verdict at ratio < 2) is valid evidence and stands.

No Spark session needed — pure-Python stat/format work.
"""

from __future__ import annotations

import json
import os

import bench
from bench_imaging import (
    ESCALATE_INACTIVE_AT,
    INACTIVE_ESCALATION_POLICY,
    PIN_FILES,
    _drift_gate,
    load_imaging_verdict_history,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PIN = {
    "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
    "stats": {
        "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 30.0},
        "payload_mb_per_sec": {"median": 9.0, "spread": 0.6, "tail": 0.9},
    },
}


def _write_round(tmp_path, rnd: int, verdict) -> None:
    (tmp_path / f"BENCH_IMAGING_SKEW_r{rnd:02d}.json").write_text(
        json.dumps({"drift_gate": {"verdict": verdict}})
    )


def test_escalates_at_two_consecutive_inactive_rounds(tmp_path):
    """The r10->r11 repo scenario: r9 active ok, r10 inactive (floored
    host), current run floored again -> inactive streak 2 -> escalation.
    A measured r10 would have reset it; the escalation names the demand
    (healthy-host run or documented environment fix)."""
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(PIN))
    _write_round(tmp_path, 9, "ok")
    _write_round(tmp_path, 10, None)
    floored_slow = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
    }
    g = _drift_gate("skew", floored_slow, pin_dir=str(tmp_path))
    assert g["verdict"] is None
    assert g["consecutive_inactive"] == ESCALATE_INACTIVE_AT
    assert g["escalation"] == INACTIVE_ESCALATION_POLICY
    # with a measured (active) r10 between, the streak resets to 1
    _write_round(tmp_path, 10, "noise-band")
    g2 = _drift_gate("skew", floored_slow, pin_dir=str(tmp_path))
    assert g2["consecutive_inactive"] == 1
    assert "escalation" not in g2
    # an ACTIVE current verdict zeroes the inactive streak
    healthy_ok = {
        "patches_per_sec": 310.0, "payload_mb_per_sec": 9.1,
        "first_touch_gb_s": 1.5,
    }
    _write_round(tmp_path, 10, None)
    g3 = _drift_gate("skew", healthy_ok, pin_dir=str(tmp_path))
    assert g3["verdict"] == "ok"
    assert g3["consecutive_inactive"] == 0


def test_inactive_round_breaks_non_ok_streak_in_gate(tmp_path):
    """An unmeasured round between two non-ok rounds must break the
    non-ok streak (unknown history never escalates) — pre-r11 the loader
    dropped None rounds, splicing r8+r10 into one streak."""
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(PIN))
    _write_round(tmp_path, 8, "noise-band")
    _write_round(tmp_path, 9, None)
    _write_round(tmp_path, 10, "noise-band")
    slow = {
        "patches_per_sec": 262.0, "payload_mb_per_sec": 8.9,
        "first_touch_gb_s": 1.5,
    }
    g = _drift_gate("skew", slow, pin_dir=str(tmp_path))
    assert g["verdict"] == "noise-band"
    assert g["consecutive_non_ok"] == 2  # current + r10; r9 None breaks
    assert g["consecutive_inactive"] == 0


def test_exculpatory_ok_true_stands_on_floored_host(tmp_path):
    """ADVICE (bench_imaging.py:419): a noise-band verdict at ratio < 2
    on a floored host goes indeterminate (verdict None) but its PASSING
    2x backstop (ok=True) stands — degraded memory only biases slower,
    so the pass is conservative evidence. Only a FAILING backstop
    (ratio > 2) is nulled alongside the verdict."""
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(PIN))
    # noise-band: below median - spread but within the 15% slack;
    # ratio 300/262 = 1.145 < 2 -> backstop passes
    nb = {
        "patches_per_sec": 262.0, "payload_mb_per_sec": 8.9,
        "first_touch_gb_s": 0.02,
    }
    g = _drift_gate("skew", nb, pin_dir=str(tmp_path))
    assert g["verdict"] is None  # non-ok on a floored host: indeterminate
    assert g["ok"] is True  # ...but the passing 2x backstop stands
    assert g["verdict_gate"].startswith("inactive: host memory-fault")
    # ratio > 2: the backstop saw the same invalid run -> nulled
    slow = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
    }
    g2 = _drift_gate("skew", slow, pin_dir=str(tmp_path))
    assert g2["verdict"] is None
    assert g2["ok"] is None


def test_history_loader_records_inactive_rounds(tmp_path):
    """Rounds whose drift_gate carries an explicit verdict key are
    recorded (str = active, None = inactive); rounds without the key
    (pre-r9) contribute nothing."""
    _write_round(tmp_path, 8, "ok")
    _write_round(tmp_path, 9, None)
    (tmp_path / "BENCH_IMAGING_SKEW_r07.json").write_text(
        json.dumps({"drift_gate": {"ok": True}})  # pre-r9 shape: no key
    )
    hist = load_imaging_verdict_history("skew", str(tmp_path))
    assert hist == [(8, "ok"), (9, None)]


def test_real_repo_skew_history_includes_the_r10_inactive_round():
    """The repo's own records: skew r9 active ok, r10 inactive (floored
    host) — the loader must surface BOTH so the r11 inactive streak can
    see the r10 round."""
    hist = dict(load_imaging_verdict_history("skew", HERE))
    assert hist.get(9) == "ok"
    assert 10 in hist and hist[10] is None


def test_inactive_escalation_threshold_is_two():
    """2 is load-bearing: the gate must escalate on the SECOND
    consecutive unmeasured round, not accumulate a third."""
    assert ESCALATE_INACTIVE_AT == 2
    assert str(ESCALATE_INACTIVE_AT) in INACTIVE_ESCALATION_POLICY


def test_non_ok_and_inactive_escalations_are_distinct_policies():
    assert INACTIVE_ESCALATION_POLICY != bench.ESCALATION_POLICY


# -------------------- census host-inflation adjudication -------------------


def test_recorded_r11_census_is_fully_adjudicated():
    """The r11 census ran on a memory-floored host (945 s wall vs 229.7
    r10): every flag is adjudicated — manually (inherent shapes carried
    forward) or by the host-inflation rule (clean in the r10 census, no
    code change in r11) — and the artifact says loudly that the host was
    floored."""
    with open(os.path.join(HERE, "BENCH_CENSUS_r11.json")) as f:
        census = json.load(f)
    assert census["n_queries"] >= 200
    assert census["unadjudicated"] == []
    assert set(census["adjudications"]) == set(census["flagged"])
    assert census["host_floored"] is True
    assert not census.get("errors")


def test_host_inflation_adjudication_rules(tmp_path):
    """Auto-adjudication attributes a flag to the host ONLY when the
    previous census shows the query clean — a query flagged before (or
    absent) must stay unadjudicated even on a floored host."""
    from bench_census import host_inflation_adjudications

    prev = {
        "threshold_sec": 2.0,
        "queries": {"clean_before": 1.2, "flagged_before": 5.0},
    }
    p = tmp_path / "prev.json"
    p.write_text(json.dumps(prev))
    auto, refused = host_inflation_adjudications(
        ["clean_before", "flagged_before", "brand_new"], str(p)
    )
    assert set(auto) == {"clean_before"}
    assert "host" in auto["clean_before"]
    assert refused == {}
    # missing/invalid previous census -> no auto-adjudication at all
    assert host_inflation_adjudications(
        ["x"], str(tmp_path / "nope.json")
    ) == ({}, {})


# --------- relational bench memory-floor gate + inactive streaks -----------


def test_memory_floor_verdicts_exculpatory_transform():
    """On a floored host every non-ok verdict goes inactive; ok/no-pin
    stand. Healthy or unknown probes change nothing."""
    v = {
        "a": "ok", "b": "noise-band", "c": "host-tail",
        "d": "regressed", "e": "no-pin",
    }
    out, floored = bench.memory_floor_verdicts(v, 0.01)
    assert floored == ["b", "c", "d"]
    assert out == {
        "a": "ok", "b": "inactive", "c": "inactive",
        "d": "inactive", "e": "no-pin",
    }
    assert bench.memory_floor_verdicts(v, 1.5) == (v, [])
    assert bench.memory_floor_verdicts(v, None) == (v, [])
    # all-ok on a floored host: nothing to transform, no floored record
    ok_only = {"a": "ok"}
    assert bench.memory_floor_verdicts(ok_only, 0.01) == (ok_only, [])


def test_consecutive_inactive_queries_fold():
    """Streak == maximal all-inactive prefix of [current, newest, ...];
    any other verdict (ok, non-ok, no-pin, absent) breaks."""
    hist = [
        (8, {"q": "inactive", "r": "inactive"}),
        (9, {"q": "inactive", "r": "regressed"}),
        (10, {"q": "inactive"}),  # r absent this round
    ]
    cur = {"q": "inactive", "r": "inactive", "s": "inactive", "t": "ok"}
    streaks = bench.consecutive_inactive_queries(cur, hist)
    assert streaks == {"q": 4, "r": 1, "s": 1}  # t omitted (not inactive)
    assert "t" not in streaks


def test_inactive_verdicts_break_and_never_extend_non_ok_streaks():
    """`inactive` is not in NON_OK_VERDICTS: it can neither extend a
    non-ok streak nor survive as one — the transform composed with the
    streak fold keeps escalation honest on floored rounds."""
    assert "inactive" not in bench.NON_OK_VERDICTS
    hist = [(9, {"q": "regressed"}), (10, {"q": "inactive"})]
    # current non-ok after an inactive round: streak restarts at 1
    assert bench.consecutive_non_ok({"q": "regressed"}, hist) == {"q": 1}
