"""Round-10 additions (r9 verdict demands + ADVICE):

- drift-gate memory (verdict #2): bench.py counts consecutive non-ok
  verdicts per query across prior driver rounds (BENCH_r{N}.json) plus
  the current run; a streak >= 3 escalates — requires an interleaved
  A/B (the r9 ab_semdedup.py recipe) or a re-pin with rationale, so a
  query that settles permanently ~1 band above its pin can no longer
  ride `noise-band` forever without adjudication.
- imaging gate no-stats verdict (ADVICE): an observed metric absent
  from pin['stats'] gets an explicit per-metric 'no-stats' verdict and
  a partial verdict_gate, never a silent exclusion.
- noise_slack monotone interpolation (ADVICE): the rel band ramps
  50% -> 25% across (0.7 s, 1.0 s) so re-pins near 1 s cannot flip the
  band width discontinuously (property in test_gate_properties.py;
  boundary values in test_round9_additions.py).

No Spark session needed — pure-Python stat/format work.
"""

from __future__ import annotations

import json
import os

import bench

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------- imaging gate: explicit no-stats verdict ------------------


def test_imaging_gate_no_stats_metric_is_explicit(tmp_path):
    """A hand-edited or partially-derived pin whose stats cover only one
    rate must not let the overall verdict read plain `ok` while the other
    observed rate rides the loose 2x backstop — the uncovered metric gets
    a per-metric 'no-stats' verdict and the gate reads partial."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 80.0},
            # payload_mb_per_sec stats MISSING (the ADVICE scenario)
        },
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    result = {"patches_per_sec": 310.0, "payload_mb_per_sec": 8.9}
    g = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g["metric_verdicts"]["payload_mb_per_sec"] == "no-stats"
    assert g["metric_verdicts"]["patches_per_sec"] == "ok"
    # overall verdict is the max severity of the ADJUDICATED metrics only,
    # but the gate itself must say it is partial
    assert g["verdict"] == "ok"
    assert g["verdict_gate"].startswith("active (partial)")
    assert "payload_mb_per_sec" in g["verdict_gate"]
    # a fully-covered pin keeps the plain active gate
    pin["stats"]["payload_mb_per_sec"] = {
        "median": 9.0, "spread": 0.6, "tail": 2.4,
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    g2 = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g2["verdict_gate"] == "active"
    assert "no-stats" not in g2["metric_verdicts"].values()


# ----------------- census adjudication hygiene (verdict #3) ---------------


def test_census_adjudications_name_registered_queries():
    """A typo'd ADJUDICATIONS key would silently leave its query
    unadjudicated in the next census run — keys must be registered."""
    from bench_census import ADJUDICATIONS
    from etl_mri_scripts_spark.queries import QUERIES

    unknown = sorted(set(ADJUDICATIONS) - set(QUERIES))
    assert not unknown, f"ADJUDICATIONS names unregistered queries: {unknown}"


def test_recorded_census_is_fully_adjudicated():
    """The recorded census artifact (the verdict's 'done' criterion: a
    verdict note per flagged query) must carry zero unadjudicated flags
    and an adjudication for every flagged query."""
    with open(os.path.join(HERE, "BENCH_CENSUS_r10.json")) as f:
        census = json.load(f)
    assert census["n_queries"] >= 200
    assert census["unadjudicated"] == []
    assert set(census["adjudications"]) == set(census["flagged"])
    assert not census.get("errors")


# -------------------- drift-gate memory (verdict #2) ----------------------


def test_consecutive_non_ok_counts_and_resets():
    history = [
        (7, {"q": "ok", "r": "noise-band"}),
        (8, {"q": "noise-band", "r": "ok"}),
        (9, {"q": "host-tail", "r": "noise-band"}),
    ]
    cur = {"q": "noise-band", "r": "noise-band", "s": "ok", "t": "regressed"}
    streaks = bench.consecutive_non_ok(cur, history)
    # q: current + r9 + r8 non-ok, r7 ok stops it -> 3
    assert streaks["q"] == 3
    # r: current + r9 non-ok, r8 ok stops it (r7's noise-band is older
    # than the reset and must not leak through) -> 2
    assert streaks["r"] == 2
    # s is currently ok -> omitted entirely (streak 0 by definition)
    assert "s" not in streaks
    # t has no history -> just the current run
    assert streaks["t"] == 1


def test_consecutive_non_ok_indeterminate_breaks_streak():
    """`no-pin` or a query absent from a round's record is unknown
    history — it must BREAK the streak, never be counted as non-ok
    (unknowns don't escalate) nor skipped over (that would splice
    non-adjacent rounds into a fake streak)."""
    cur = {"q": "noise-band", "r": "noise-band"}
    history = [(8, {"q": "noise-band"}), (9, {"q": "no-pin", "r": "no-pin"})]
    streaks = bench.consecutive_non_ok(cur, history)
    assert streaks == {"q": 1, "r": 1}


def test_consecutive_non_ok_orders_history_by_round_number():
    """History arrives as (round, verdicts) tuples in file-glob order;
    the streak must walk rounds newest-first numerically (r10 > r9 > r2),
    not lexicographically."""
    history = [
        (2, {"q": "ok"}),
        (10, {"q": "noise-band"}),
        (9, {"q": "noise-band"}),
    ]
    assert bench.consecutive_non_ok({"q": "noise-band"}, history) == {"q": 3}


def test_escalation_threshold_is_three():
    """The escalation rule: a streak below ESCALATE_AT stays advisory, at
    or above it the query lands in escalation_queries (locked so a future
    edit can't quietly raise the bar)."""
    assert bench.ESCALATE_AT == 3
    history = [(8, {"q": "noise-band"}), (9, {"q": "noise-band"})]
    streaks = bench.consecutive_non_ok({"q": "noise-band"}, history)
    assert [n for n, k in streaks.items() if k >= bench.ESCALATE_AT] == ["q"]
    streaks2 = bench.consecutive_non_ok({"q": "noise-band"}, history[1:])
    assert [n for n, k in streaks2.items() if k >= bench.ESCALATE_AT] == []


def test_load_driver_verdict_history_shapes(tmp_path):
    """The loader recovers verdicts from every shape a driver round file
    can take (direct dict, parsed block, tail fragment), ignores
    non-round files (self-checks, imaging, A/B), skips pre-gate rounds,
    and sorts ascending by round number."""
    (tmp_path / "BENCH_r2.json").write_text(json.dumps(
        {"n": 2, "tail": "no verdicts here"}))
    (tmp_path / "BENCH_r8.json").write_text(json.dumps(
        {"n": 8, "tail": 'prefix "query_verdicts": {"q": "noise-band"}, '
                         '"query_gate": "active"}'}))
    (tmp_path / "BENCH_r9.json").write_text(json.dumps(
        {"n": 9, "parsed": {"query_verdicts": {"q": "ok"}}}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(
        {"query_verdicts": {"q": "host-tail"}}))
    (tmp_path / "BENCH_r9_SELF_CHECK.json").write_text(json.dumps(
        {"query_verdicts": {"q": "regressed"}}))  # must be ignored
    (tmp_path / "BENCH_IMAGING_SKEW_r9.json").write_text(json.dumps(
        {"query_verdicts": {"q": "regressed"}}))  # must be ignored
    hist = bench.load_driver_verdict_history(str(tmp_path))
    assert [r for r, _ in hist] == [8, 9, 10]
    assert [v["q"] for _, v in hist] == ["noise-band", "ok", "host-tail"]


def test_gate_memory_on_real_repo_history():
    """Lock the r9 verdict's concrete scenario against the actual driver
    records: sample_stratified_exact and dedup_interdoc_segments read
    noise-band in BOTH the r8 and r9 driver benches, so one more non-ok
    in the next run must escalate them (streak 3) — while a query that
    was ok in r9 cannot reach 3 regardless of r8."""
    hist = bench.load_driver_verdict_history(HERE)
    rounds = [r for r, _ in hist]
    assert 8 in rounds and 9 in rounds  # tail-fragment recovery works
    # The scenario is the r9-era records specifically: freeze the history
    # at r9 so later driver rounds landing in the repo (r10+, whose
    # verdicts run under the r10 pin epoch anyway) can't drift this test.
    hist = [(r, v) for r, v in hist if r <= 9]
    by_round = dict(hist)
    for q in ("sample_stratified_exact", "dedup_interdoc_segments"):
        assert by_round[8][q] == "noise-band"
        assert by_round[9][q] == "noise-band"
        assert bench.consecutive_non_ok({q: "noise-band"}, hist)[q] >= 3
    # window_session_10m_gap was noise-band in r9 but ok in r8 -> 2
    assert by_round[9]["window_session_10m_gap"] == "noise-band"
    assert by_round[8]["window_session_10m_gap"] == "ok"
    streak = bench.consecutive_non_ok({"window_session_10m_gap": "noise-band"}, hist)
    assert streak["window_session_10m_gap"] == 2


# ------------------- pin-epoch streak reset (r10 re-pin) ------------------


def test_history_since_round_drops_pre_pin_rounds(tmp_path):
    """Rounds before the pin epoch are verdicts against a RETIRED pin;
    they must not extend a streak against the current one. The epoch
    round itself is kept (a pin created during round N is active for
    round N's driver bench, which runs at round end)."""
    for rnd, verdict in ((8, "noise-band"), (9, "noise-band"), (10, "noise-band")):
        (tmp_path / f"BENCH_r{rnd}.json").write_text(
            json.dumps({"query_verdicts": {"q": verdict}})
        )
    full = bench.load_driver_verdict_history(str(tmp_path))
    assert [r for r, _ in full] == [8, 9, 10]
    since10 = bench.load_driver_verdict_history(str(tmp_path), since_round=10)
    assert [r for r, _ in since10] == [10]
    # streak under the new epoch: current + r10 only -> 2, no escalation
    assert bench.consecutive_non_ok({"q": "noise-band"}, since10) == {"q": 2}
    # without the epoch the same records would have escalated (4 >= 3)
    assert bench.consecutive_non_ok({"q": "noise-band"}, full) == {"q": 4}


def test_load_pin_round(tmp_path):
    p = tmp_path / "pin.json"
    p.write_text(json.dumps({"pin_round": 10}))
    assert bench.load_pin_round(str(p)) == 10
    p.write_text(json.dumps({"sf": 0.1}))  # pre-r10 pin: no field
    assert bench.load_pin_round(str(p)) is None
    p.write_text(json.dumps({"pin_round": "x"}))  # malformed: not an epoch
    assert bench.load_pin_round(str(p)) is None
    assert bench.load_pin_round(str(tmp_path / "missing.json")) is None


def test_imaging_gate_memory_counts_and_escalates(tmp_path):
    """The imaging drift gate mirrors bench.py's streak memory: prior
    rounds' machine verdicts (BENCH_IMAGING_{MODE}_r{N}.json) count into
    consecutive_non_ok, and a streak >= bench.ESCALATE_AT emits the
    escalation policy. Pre-r9 rounds without a verdict contribute
    nothing (indeterminate -> streak break)."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 80.0},
            "payload_mb_per_sec": {"median": 9.0, "spread": 0.6, "tail": 2.4},
        },
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    for rnd, verdict in ((7, None), (8, "noise-band"), (9, "noise-band")):
        (tmp_path / f"BENCH_IMAGING_SKEW_r{rnd:02d}.json").write_text(
            json.dumps({"drift_gate": {"verdict": verdict}})
        )
    # current run lands in the noise band (just below median - spread)
    slow = {"patches_per_sec": 262.0, "payload_mb_per_sec": 8.9}
    g = _drift_gate("skew", slow, pin_dir=str(tmp_path))
    assert g["verdict"] == "noise-band"
    assert g["consecutive_non_ok"] == 3  # current + r9 + r8; r7 None breaks
    assert "escalation" in g
    # an ok current run resets to 0 and carries no escalation
    ok = {"patches_per_sec": 310.0, "payload_mb_per_sec": 9.1}
    g2 = _drift_gate("skew", ok, pin_dir=str(tmp_path))
    assert g2["consecutive_non_ok"] == 0
    assert "escalation" not in g2


def test_imaging_verdict_history_loader_real_records():
    """The real repo records: skew r6-r8 predate the machine verdict
    (None -> skipped), r9 is `ok` — so the current history is [(9, 'ok')]
    and any current non-ok reads streak 1."""
    from bench_imaging import load_imaging_verdict_history

    hist = load_imaging_verdict_history("skew", HERE)
    assert (9, "ok") in hist
    assert all(r >= 9 for r, _ in hist)  # r6-r8 have no machine verdict


def test_imaging_gate_all_metrics_no_stats_verdict_none(tmp_path):
    """When NO observed metric has pin stats the verdict must be None
    (indeterminate), never a severity computed over zero metrics."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "stats": {"some_other_metric": {"median": 1.0}},
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    result = {"patches_per_sec": 310.0, "payload_mb_per_sec": 8.9}
    g = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g["verdict"] is None
    assert set(g["metric_verdicts"].values()) == {"no-stats"}
    assert g["verdict_gate"].startswith("active (partial)")


# ------------- host memory-fault capability gate (r10 forensics) ----------


def test_imaging_gate_inactive_on_floored_memory_host(tmp_path):
    """A run on a lazily-backed VM (first-touch GB/s below the floor)
    measured the hypervisor's page backend, not the kernel: the gate must
    decline to adjudicate (verdict None, named reason) instead of
    recording a false `regressed` — and a None verdict must not extend
    the streak memory."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 30.0},
            "payload_mb_per_sec": {"median": 9.0, "spread": 0.6, "tail": 0.9},
        },
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    # 2.5x slow — would read `regressed` — but the memory probe is floored
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["verdict"] is None
    assert g["ok"] is None
    assert g["verdict_gate"].startswith("inactive: host memory-fault")
    assert g["host_memory"]["first_touch_gb_s"] == 0.02
    # ratios stay recorded for the forensic trail
    assert g["ratio_pin_over_observed"]["patches_per_sec"] == 2.5
    assert "consecutive_non_ok" not in g  # indeterminate -> no streak

    # same slow run on a HEALTHY host is real evidence: gate stays active
    res_healthy = dict(res, first_touch_gb_s=1.8)
    g2 = _drift_gate("skew", res_healthy, pin_dir=str(tmp_path))
    assert g2["verdict"] == "regressed"
    assert g2["verdict_gate"] == "active"

    # a run without the probe field (older record replayed) is unchanged
    res_old = {"patches_per_sec": 120.0, "payload_mb_per_sec": 3.6}
    g3 = _drift_gate("skew", res_old, pin_dir=str(tmp_path))
    assert g3["verdict"] == "regressed"

    # EXCULPATORY-ONLY: an ok on a floored host stands (degraded memory
    # can only bias the kernel slower, so the green is conservative) —
    # measured live: the r10 uniform run read 1.036x pin at 0.18 GB/s
    res_ok = {
        "patches_per_sec": 295.0, "payload_mb_per_sec": 8.9,
        "first_touch_gb_s": 0.02,
    }
    g4 = _drift_gate("skew", res_ok, pin_dir=str(tmp_path))
    assert g4["verdict"] == "ok"
    assert g4["verdict_gate"] == "active"
    assert g4["host_memory"]["first_touch_gb_s"] == 0.02  # still recorded
    assert g4["consecutive_non_ok"] == 0  # streak memory runs for ok


def test_host_memory_probe_returns_best_of_fresh_attempts():
    v = bench.host_memory_probe(size_mb=8, attempts=2)
    assert v > 0
    # the floor must sit well below any plausible healthy reading of this
    # tiny probe, and well above the measured pathological readings
    assert 0.05 < bench.MEM_FAULT_FLOOR_GB_S < 1.0


def test_pin_refuses_memory_floored_runs():
    """A pin derived from backend-throttled rates would make every later
    healthy run read as an improvement and hide real regressions in the
    inflated band — derive() refuses floored runs loudly. Pre-r10 runs
    without the field pass (their rates were sanity-checked by the
    rounds that pinned them)."""
    import pytest
    from pin_imaging_baseline import derive

    base = {
        "value": 1.0, "wall_sec": 100.0, "patches_per_sec": 300.0,
        "payload_mb_per_sec": 9.0, "n_patches": 1000,
        "key_parity_ok": True, "host_probe_sec": 0.024,
        "host_probe_start_end": [0.024, 0.024],
    }
    healthy = [dict(base, first_touch_gb_s=1.5) for _ in range(5)]
    assert derive(healthy)["patches_per_sec"] == 300.0
    legacy = [dict(base) for _ in range(5)]  # pre-r10: no field
    assert derive(legacy)["patches_per_sec"] == 300.0
    floored = healthy[:4] + [dict(base, first_touch_gb_s=0.02)]
    with pytest.raises(SystemExit, match="refusing to pin"):
        derive(floored)
