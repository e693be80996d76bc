"""Round-13 additions (r12 verdict demands #1/#2/#5 + ADVICE):

- cpu-specific noise slack (bench.cpu_noise_slack): the wall slack's
  0.35 s absolute floor over-forgave sub-second cpu pins (a ~2x
  user-CPU regression read noise-band); cpu verdicts now use a
  relative-only band with a 0.1 s tick floor. Replaying the recorded
  r12 corroborations flips ZERO verdicts — the change only tightens
  what a future regression can hide behind.
- provisional-pin visibility (imaging drift gate + bench escalation
  resolution): an in-band cpu reading against a below-protocol pin, or
  against a band this run's own sample helped define, reads
  "ok-provisional" / "provisionally resolved", never a full discharge.
- pin_bench_baseline --cpu-augment now mirrors its imaging twin's
  >=5-run protocol guard (--allow-fewer-runs + --note stamps
  cpu_pin_provisional).
- census cpu axis: bench_census records per-query user-cpu and the
  host-inflation absolutions are BOUNDED — cpu non-regression required
  once a prior census carries a record, a 10x wall ceiling on chains,
  and the chained message names the actual healthy anchor.
- the census-promoted aux set (bench.AUX_CPU_QUERIES) measured after
  the sweep, adjudicated against aux_query_cpu_pins.
- streaming _abs_local: scheme detection by URI grammar, not '://'.

No Spark session needed — pure-Python stat/format work.
"""

from __future__ import annotations

import json
import os

import bench
from bench_imaging import PIN_FILES, _drift_gate

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------- cpu-specific slack ------------------------------


def test_cpu_noise_slack_is_relative_only_with_tick_floor():
    assert bench.cpu_noise_slack(0.8) == 0.25 * 0.8
    assert bench.cpu_noise_slack(10.0) == 2.5
    # tick floor below 0.4 s medians (0.25 * 0.4 = 0.1)
    assert bench.cpu_noise_slack(0.32) == 0.1
    assert bench.cpu_noise_slack(0.2) == 0.1
    assert bench.cpu_noise_slack(0.0) == 0.1


def test_cpu_slack_closes_the_sub_second_corroboration_hole():
    """The r12 ADVICE scenario: a 0.35 s cpu pin (spread 0.09, tail
    0.12 — imaging_patch_grid's actual r12 pin) sees a 2x user-cpu
    regression. Under the wall slack it read noise-band (0.35 + 0.09 +
    0.35 = 0.79 >= 0.70) and counted as corroboration; under the cpu
    slack it must read beyond the noise band."""
    pin = {"q": {"median": 0.35, "spread": 0.09, "tail": 0.12}}
    wall = bench.query_verdicts({"q": 0.70}, pin)  # default wall slack
    cpu = bench.query_verdicts({"q": 0.70}, pin, slack_fn=bench.cpu_noise_slack)
    assert wall["q"] == "noise-band"
    assert cpu["q"] == "regressed"


def test_cpu_slack_replay_r12_corroborations_flip_zero_verdicts():
    """Retroactive safety: every cpu corroboration verdict recorded in
    the r12 driver bench and self-check re-adjudicates IDENTICALLY
    under the tightened cpu slack — the fix changes no settled
    adjudication, only future sensitivity.

    The replay must use the cpu pins IN FORCE at the r12 adjudication
    (frozen in tests/data/query_cpu_pins_r12.json), not the live
    baseline: the r13 optimization round re-based query_cpu_pins on
    the faster post-optimization kernel, and r12 readings are not
    comparable to post-r13 bands."""
    fixture = os.path.join(
        HERE, "tests", "data", "query_cpu_pins_r12.json")
    with open(fixture) as f:
        cpu_pins = json.load(f)["query_cpu_pins"]
    for fn in ("BENCH_r12.json", "BENCH_r12_SELF_CHECK.json"):
        with open(os.path.join(HERE, fn)) as f:
            rec = json.load(f)
        recorded = (rec.get("memory_floored") or {}).get("cpu_corroboration")
        cpu_times = rec.get("queries_cpu_user_sec", {})
        if not recorded:
            continue
        replay = bench.query_verdicts(
            {n: cpu_times[n] for n in recorded if n in cpu_times},
            cpu_pins,
            slack_fn=bench.cpu_noise_slack,
        )
        for n, v in replay.items():
            assert v == recorded[n], (fn, n, v, recorded[n])


def test_query_verdicts_default_slack_unchanged():
    """The slack_fn parameter defaults to the wall slack — existing wall
    adjudications are bit-identical to the pre-r13 behavior."""
    pin = {"q": {"median": 2.0, "spread": 0.2, "tail": 0.5}}
    for val in (1.9, 2.25, 2.6, 3.1, 9.0):
        assert bench.query_verdicts({"q": val}, pin) == bench.query_verdicts(
            {"q": val}, pin, slack_fn=bench.noise_slack
        )


# ------------------- provisional pins: imaging drift gate ------------------


def _skew_pin(tmp_path, provisional=None, cpu_runs=None):
    pin = {
        "patches_per_sec": 300.0,
        "payload_mb_per_sec": 9.0,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 30.0},
            "payload_mb_per_sec": {"median": 9.0, "spread": 0.6, "tail": 0.9},
        },
        "cpu_stats": {
            "patches_per_cpu_user_sec": {
                "median": 84.32, "spread": 0.0, "tail": 0.0,
            },
        },
    }
    if provisional:
        pin["cpu_pin_provisional"] = provisional
    if cpu_runs is not None:
        pin["cpu_runs"] = cpu_runs
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    return pin


def test_provisional_cpu_pin_is_surfaced_and_weakens_corroboration(tmp_path):
    """The r12 tautology: a floored run whose cpu rate equals the n=1
    provisional pin's own sample must NOT read as a clean corroboration
    — the gate surfaces cpu_pin_provisional + cpu_pin_self_sample and
    reports ok-provisional."""
    _skew_pin(
        tmp_path,
        provisional={"n_runs": 1, "rationale": "r12 floored host"},
        cpu_runs=[{"patches_per_cpu_user_sec": 84.32}],
    )
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 84.32,
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["verdict"] is None
    assert g["cpu_verdict"] == "ok"
    assert g["cpu_pin_provisional"]["n_runs"] == 1
    assert g["cpu_pin_self_sample"] is True
    assert g["cpu_corroboration"] == "ok-provisional"
    assert "PROVISIONAL" in g["verdict_gate"]


def test_self_sample_alone_weakens_corroboration(tmp_path):
    """Even a full-protocol pin cannot independently band a run that is
    one of its own samples (readjudicate path)."""
    _skew_pin(tmp_path, cpu_runs=[{"patches_per_cpu_user_sec": 84.32}])
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 84.32,
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["cpu_pin_self_sample"] is True
    assert g["cpu_corroboration"] == "ok-provisional"


def test_independent_run_against_full_pin_corroborates_cleanly(tmp_path):
    """A run the pin never saw, against a non-provisional pin, still
    reads the full 'ok' corroboration — the r13 qualification is
    surgical."""
    _skew_pin(tmp_path, cpu_runs=[{"patches_per_cpu_user_sec": 85.0}])
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 84.32,
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert "cpu_pin_self_sample" not in g
    assert "cpu_pin_provisional" not in g
    assert g["cpu_corroboration"] == "ok"


# ---------------- census: cpu axis + bounded absolution --------------------


def test_census_absolution_requires_cpu_nonregression(tmp_path):
    """Once a prior census carries a cpu record for a query, a host
    absolution must cite a non-regressed cpu: a clean-before flag whose
    user-cpu doubled is REFUSED absolution (a real finding the floor
    cannot explain)."""
    from bench_census import host_inflation_adjudications

    prev = {
        "threshold_sec": 2.0,
        "queries": {"clean_ok": 1.2, "clean_cpu_regressed": 1.3},
        "queries_cpu_user_sec": {"clean_ok": 4.0, "clean_cpu_regressed": 4.0},
    }
    p = tmp_path / "BENCH_CENSUS_r12.json"
    p.write_text(json.dumps(prev))
    auto, refused = host_inflation_adjudications(
        ["clean_ok", "clean_cpu_regressed"],
        str(p),
        times={"clean_ok": 5.0, "clean_cpu_regressed": 5.0},
        cpu_times={"clean_ok": 4.5, "clean_cpu_regressed": 12.0},
    )
    assert set(auto) == {"clean_ok"}
    assert "CPU corroborates" in auto["clean_ok"]
    assert set(refused) == {"clean_cpu_regressed"}
    assert "cpu REGRESSED" in refused["clean_cpu_regressed"]


def test_census_absolution_requires_cpu_record_when_one_exists(tmp_path):
    """A prior cpu record with NO current cpu measurement also refuses
    absolution — the floor-insensitive check may not be skipped once it
    is available."""
    from bench_census import host_inflation_adjudications

    prev = {
        "threshold_sec": 2.0,
        "queries": {"q": 1.2},
        "queries_cpu_user_sec": {"q": 4.0},
    }
    p = tmp_path / "BENCH_CENSUS_r12.json"
    p.write_text(json.dumps(prev))
    auto, refused = host_inflation_adjudications(
        ["q"], str(p), times={"q": 5.0}, cpu_times={}
    )
    assert auto == {}
    assert "recorded no cpu" in refused["q"]


def test_census_chain_bounded_by_wall_ceiling(tmp_path):
    """A chained absolution may not cover order-of-magnitude drift:
    beyond CENSUS_CHAIN_WALL_MAX_X of the prev floored time the chain
    breaks and the flag stays a real finding."""
    from bench_census import CENSUS_CHAIN_WALL_MAX_X, host_inflation_adjudications

    prev = {
        "threshold_sec": 2.0,
        "queries": {"chained": 5.0},
        "adjudications": {"chained": "host-inflated (memory-floored sweep): x"},
        "host_floored": True,
    }
    p = tmp_path / "BENCH_CENSUS_r12.json"
    p.write_text(json.dumps(prev))
    ok_auto, ok_ref = host_inflation_adjudications(
        ["chained"], str(p), times={"chained": 5.0 * CENSUS_CHAIN_WALL_MAX_X - 1}
    )
    assert "chained" in ok_auto and not ok_ref
    bad_auto, bad_ref = host_inflation_adjudications(
        ["chained"], str(p), times={"chained": 5.0 * CENSUS_CHAIN_WALL_MAX_X + 1}
    )
    assert not bad_auto
    assert "refused" in bad_ref["chained"]


def test_census_chain_names_the_healthy_anchor(tmp_path):
    """The chained message must name the ACTUAL last healthy census and
    the query's time there (r12 ADVICE: the old text claimed the anchor
    was 'named there' while only naming the immediate prev file)."""
    from bench_census import host_inflation_adjudications

    healthy = {
        "threshold_sec": 2.1,
        "queries": {"q": 1.0},
    }
    floored = {
        "threshold_sec": 2.0,
        "queries": {"q": 5.0},
        "adjudications": {"q": "host-inflated (memory-floored sweep): x"},
        "host_floored": True,
    }
    (tmp_path / "BENCH_CENSUS_r10.json").write_text(json.dumps(healthy))
    p = tmp_path / "BENCH_CENSUS_r11.json"
    p.write_text(json.dumps(floored))
    auto, refused = host_inflation_adjudications(
        ["q"], str(p), times={"q": 6.0}
    )
    assert not refused
    msg = auto["q"]
    assert msg.startswith("host-inflated (chained)")
    assert "BENCH_CENSUS_r10.json" in msg
    assert "1.0s" in msg


def test_census_source_records_cpu_axis():
    """The census sweep records per-query user-cpu (r12 verdict demand
    #2) — source-shape assertion so a regression is caught without a
    full census run."""
    src = open(os.path.join(HERE, "bench_census.py")).read()
    assert '"queries_cpu_user_sec": cpu_times' in src
    assert "host_absolution_refused" in src


# ------------------------- aux promotion set -------------------------------


def test_aux_cpu_queries_are_registered_and_disjoint_from_headline():
    from etl_mri_scripts_spark.queries import QUERIES

    assert bench.AUX_CPU_QUERIES == [
        "ann_pq_adc_topk",
        "events_step_funnel",
        "events_gap_fill_forward",
        "dedup_ngram_jaccard_pairs_diagnostic",
        "dedup_triangle_count",
    ]
    for n in bench.AUX_CPU_QUERIES:
        assert n in QUERIES
        assert n not in bench.HEADLINE


def test_aux_pins_derive_with_the_standard_recipe():
    from pin_bench_baseline import derive_query_cpu_pins

    recs = [
        {"ann_pq_adc_topk": 3.0 + 0.1 * i, "events_step_funnel": 5.0}
        for i in range(5)
    ]
    pins = derive_query_cpu_pins(recs)
    assert pins["ann_pq_adc_topk"]["median"] == 3.2
    assert pins["events_step_funnel"]["spread"] == 0.0


# --------------- pin_bench_baseline --cpu-augment protocol guard -----------


def test_cpu_augment_refuses_below_protocol_without_flag(tmp_path):
    """'--cpu-augment --runs 1' must refuse before running anything
    (the r12 silent zero-spread pin); --allow-fewer-runs without --note
    refuses too. Uses the real baseline (headline matches) — the guard
    fires before any bench subprocess launches, so this is instant."""
    import subprocess
    import sys

    real_pin = os.path.join(HERE, "BENCH_SELF_BASELINE.json")
    for extra, msg in (
        ([], b"--allow-fewer-runs"),
        (["--allow-fewer-runs"], b"--note"),
    ):
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "pin_bench_baseline.py"),
             "--cpu-augment", "--runs", "1", "--out", real_pin, *extra],
            capture_output=True, cwd=HERE,
        )
        assert proc.returncode == 1
        assert msg in proc.stderr


def test_aux_cpu_augment_refuses_below_protocol_without_flag():
    import subprocess
    import sys

    real_pin = os.path.join(HERE, "BENCH_SELF_BASELINE.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "pin_bench_baseline.py"),
         "--aux-cpu-augment", "--runs", "2", "--out", real_pin],
        capture_output=True, cwd=HERE,
    )
    assert proc.returncode == 1
    assert b"--allow-fewer-runs" in proc.stderr


# ------------------------- streaming _abs_local ----------------------------


def test_abs_local_scheme_grammar():
    """Scheme-qualified URIs pass through untouched — including
    authority-less forms like 'file:relative/dir' that Hadoop Path
    accepts (r12 ADVICE: the '://' substring test rewrote them to
    '/cwd/file:relative', changing what the probe and Spark resolve).
    Scheme-less relative paths still absolutize against the CWD."""
    from etl_mri_scripts_spark.streaming.pipeline import _abs_local

    for untouched in (
        "file:relative/dir",
        "file:///abs/dir",
        "s3a://bucket/key",
        "hdfs://nn:8020/x",
        "x+y.z-1:whatever",
        "/already/abs",
    ):
        assert _abs_local(untouched) == untouched
    rel = _abs_local("relative/dir")
    assert os.path.isabs(rel) and rel.endswith("/relative/dir")
    # a colon later in the path is NOT a scheme
    got = _abs_local("dir/with:colon")
    assert os.path.isabs(got) and got.endswith("/dir/with:colon")


# ------------------- skewsmall mode + cpu-only pins ------------------------


def test_skewsmall_mode_registered():
    """The reduced-geometry skew variant (r12 verdict demand #1 option
    b) is a first-class mode: its own pin file and driver-record
    naming, so the gate history machinery works unchanged."""
    assert PIN_FILES["skewsmall"] == "BENCH_IMAGING_SKEWSMALL_SELF_BASELINE.json"
    src = open(os.path.join(HERE, "bench_imaging.py")).read()
    assert '"360,315,240"' in src  # same 24:21:16 aspect as 960,840,640


def test_cpu_only_pin_reads_wall_indeterminate_cpu_active(tmp_path):
    """A --bootstrap-cpu-only pin carries no wall rate fields: the
    drift gate must read the wall side as indeterminate (ok=None, never
    False) while the cpu verdict adjudicates normally against
    cpu_stats."""
    pin = {
        "mode": "skewsmall",
        "cpu_only_pin": True,
        "cpu_stats": {
            "patches_per_cpu_user_sec": {
                "median": 50.0, "spread": 2.0, "tail": 3.0,
            },
        },
        "cpu_runs": [{"patches_per_cpu_user_sec": 49.0}],
    }
    (tmp_path / PIN_FILES["skewsmall"]).write_text(json.dumps(pin))
    res = {
        "patches_per_sec": 40.0, "payload_mb_per_sec": 1.2,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 50.5,
    }
    g = _drift_gate("skewsmall", res, pin_dir=str(tmp_path))
    assert g["ok"] is None  # no wall rates pinned -> indeterminate
    assert g["cpu_verdict"] == "ok"
    assert "cpu_pin_provisional" not in g
    assert "cpu_pin_self_sample" not in g


# ---------------- r13: user-cpu inflation episodes (cpu-weather) -----------
# FINDINGS_HOST_MEMORY.md second pathology: the host intermittently slows
# retired user-space work up to ~3.6x, deflating work/cpu-s rates with no
# kernel change. The run's own single-thread probe is the independent
# marker in the imaging gate; correlated regression across the floored
# set is the relational sweep's.


def _weather_pin(tmp_path, probe=0.017):
    pin = {
        "patches_per_sec": 300.0,
        "payload_mb_per_sec": 9.0,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 30.0},
            "payload_mb_per_sec": {"median": 9.0, "spread": 0.6, "tail": 0.9},
        },
        "cpu_stats": {
            "patches_per_cpu_user_sec": {
                "median": 90.0, "spread": 6.0, "tail": 8.0,
            },
        },
        "cpu_runs": [
            {"patches_per_cpu_user_sec": 88.0 + i, "host_probe_sec": probe}
            for i in range(5)
        ],
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    return pin


def test_cpu_weather_downgrades_non_ok_cpu_verdict(tmp_path):
    """A deep cpu 'regression' on a run whose own probe ran >1.75x the
    pin runs' probe median reads cpu-weather (indeterminate), never
    cpu_regressed — the r13 episode (runs 1-3: rate 23-26 vs quiet
    83-99, run 3 probe 0.046/0.158 vs 0.017) must not fake a kernel
    finding."""
    _weather_pin(tmp_path)
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 24.0,
        "host_probe_start_end": [0.046, 0.158],
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["cpu_verdict"] == "cpu-weather"
    assert g["cpu_verdict_raw"] == "regressed"
    assert g["cpu_weather"]["ratio"] > 1.75
    assert "cpu_regressed" not in g


def test_cpu_weather_never_touches_ok(tmp_path):
    """Inflation only LOWERS rates, so an in-band cpu verdict stands even
    under a probe excursion — exculpatory-only, like the memory floor."""
    _weather_pin(tmp_path)
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 89.5,
        "host_probe_start_end": [0.046, 0.158],
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["cpu_verdict"] == "ok"
    assert g["cpu_corroboration"] == "ok"
    assert "cpu_weather" not in g


def test_cpu_regression_with_normal_probes_stands(tmp_path):
    """Probes can miss an episode burst (run 1 carried normal probes), so
    a non-ok with normal probes is NOT auto-excused — it stands as
    cpu_regressed, with the findings doc demanding solo re-sampling."""
    _weather_pin(tmp_path)
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 24.0,
        "host_probe_start_end": [0.017, 0.018],
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["cpu_verdict"] == "regressed"
    assert g["cpu_regressed"] is True
    assert "cpu_weather" not in g


def test_cpu_weather_escalation_not_resolved(tmp_path):
    """Under an inactive escalation, a cpu-weather round carries as
    unmeasured on BOTH axes — the resolution text says so instead of
    resolving or claiming a kernel finding."""
    _weather_pin(tmp_path)
    for rnd in (11, 12):
        (tmp_path / f"BENCH_IMAGING_SKEW_r{rnd}.json").write_text(
            json.dumps({"drift_gate": {"verdict": None}})
        )
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 24.0,
        "host_probe_start_end": [0.046, 0.158],
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["consecutive_inactive"] >= 2
    assert "NOT resolved" in g["escalation_resolution"]
    assert "cpu-weather" in g["escalation_resolution"] or "weathered" in g[
        "escalation_resolution"
    ]


def test_cpu_weather_requires_probe_reference(tmp_path):
    """No probe record in the pin runs and no host_probe_pin -> the
    marker cannot fire; verdicts adjudicate exactly as before."""
    pin = _weather_pin(tmp_path)
    for r in pin["cpu_runs"]:
        del r["host_probe_sec"]
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    res = {
        "patches_per_sec": 120.0, "payload_mb_per_sec": 3.6,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 24.0,
        "host_probe_start_end": [0.046, 0.158],
    }
    g = _drift_gate("skew", res, pin_dir=str(tmp_path))
    assert g["cpu_verdict"] == "regressed"
    assert "cpu_weather" not in g


def test_relational_cpu_weather_flag_thresholds():
    """Correlated regression across the floored set flags the episode;
    isolated regressions never do."""
    import bench

    # 4 of 6 adjudicated regressed -> flagged
    v = {f"q{i}": "regressed" for i in range(4)}
    v.update({"q4": "ok", "q5": "noise-band"})
    flag = bench.cpu_weather_suspected(v)
    assert flag and flag["regressed"] == 4 and flag["adjudicated"] == 6
    # 2 regressed (below min count) -> not flagged
    v2 = {"a": "regressed", "b": "regressed", "c": "ok", "d": "ok"}
    assert bench.cpu_weather_suspected(v2) is None
    # 3 regressed but only 30% of adjudicated -> not flagged
    v3 = {f"q{i}": "regressed" for i in range(3)}
    v3.update({f"r{i}": "ok" for i in range(7)})
    assert bench.cpu_weather_suspected(v3) is None
    # no-pin rows don't count toward the adjudicated denominator
    v4 = {f"q{i}": "regressed" for i in range(3)}
    v4.update({f"r{i}": "no-pin" for i in range(7)})
    v4.update({f"s{i}": "ok" for i in range(2)})
    assert bench.cpu_weather_suspected(v4) is not None


def test_cpu_only_pin_gate_message_names_the_deferral(tmp_path):
    """A cpu-only pin's wall-side inactive message must say the wall pin
    is deferred — not claim a 'pre-r9 pin' that needs re-pinning."""
    pin = {
        "mode": "skewsmall",
        "cpu_only_pin": True,
        "cpu_stats": {
            "patches_per_cpu_user_sec": {
                "median": 50.0, "spread": 2.0, "tail": 3.0,
            },
        },
        "cpu_runs": [{"patches_per_cpu_user_sec": 49.0}],
    }
    (tmp_path / PIN_FILES["skewsmall"]).write_text(json.dumps(pin))
    res = {
        "patches_per_sec": 40.0, "payload_mb_per_sec": 1.2,
        "first_touch_gb_s": 0.02,
        "patches_per_cpu_user_sec": 50.5,
    }
    g = _drift_gate("skewsmall", res, pin_dir=str(tmp_path))
    assert "cpu-only pin" in g["verdict_gate"]
    assert "pre-r9" not in g["verdict_gate"]
