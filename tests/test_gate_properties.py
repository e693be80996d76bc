"""Property tests for the drift-gate algebra (r9).

The self-validation tests replay the CURRENT pins' recorded runs; these
lock the underlying claims for EVERY possible pin, so a future re-pin
cannot quietly break them:

1. A pin's own runs can never read `regressed`. Algebra: for sorted
   samples s, median(s[1:-1]) == median(s) (dropping one element from
   each end preserves the middle), so the regressed floor
   ``median - tail - slack = s[0] + (med_trim - med_all) - slack``
   collapses to ``s[0] - slack`` — strictly below the worst recorded
   run. Same argument mirrored for the time-form bench gate.
2. Verdict severity is monotone: a slower time (or lower rate) never
   yields a LESS severe verdict.
"""

from __future__ import annotations

from statistics import median

from hypothesis import given, strategies as st

import bench
from bench_imaging import pin_stats, throughput_verdict

SEVERITY = ["ok", "noise-band", "host-tail", "regressed"]

rates = st.lists(
    st.floats(min_value=1.0, max_value=1e4, allow_nan=False, width=32),
    min_size=3,
    max_size=12,
)


@given(rates)
def test_trimmed_median_equals_full_median(samples):
    s = sorted(samples)
    trimmed = s[1:-1] if len(s) >= 4 else s
    assert median(trimmed) == median(s)


@given(rates)
def test_imaging_pin_runs_never_regress_against_their_own_pin(samples):
    pin = pin_stats(samples)
    for r in samples:
        assert throughput_verdict(r, pin) != "regressed"


@given(rates, st.floats(min_value=0.0, max_value=2.0, allow_nan=False))
def test_imaging_verdict_monotone_in_rate(samples, drop):
    pin = pin_stats(samples)
    hi = max(samples)
    lo = hi * (1.0 - drop / 2.0)
    assert SEVERITY.index(throughput_verdict(lo, pin)) >= SEVERITY.index(
        throughput_verdict(hi, pin)
    )


times = st.lists(
    st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
    min_size=3,
    max_size=12,
)


def _time_pin(samples):
    # the pin_bench_baseline.py per-query recipe, inlined
    s = sorted(round(x, 4) for x in samples)
    med_all = median(s)
    trimmed = s[1:-1] if len(s) >= 4 else s
    return {
        "median": round(median(trimmed), 4),
        "spread": round(trimmed[-1] - trimmed[0], 4),
        "tail": round(max(s[-1] - med_all, 0.0), 4),
    }


@given(times)
def test_bench_pin_runs_never_regress_against_their_own_pin(samples):
    pin = {"q": _time_pin(samples)}
    for t in samples:
        v = bench.query_verdicts({"q": round(t, 4)}, pin)["q"]
        assert v != "regressed"


@given(
    st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
    st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
)
def test_noise_slack_monotone_in_pin_median(a, b):
    """r10 (r9 ADVICE): the interpolated rel band makes slack monotone
    non-decreasing in the pin median — a re-pin drifting across the 1 s
    threshold can no longer loosen its own gate by ~40%."""
    lo, hi = sorted((a, b))
    assert bench.noise_slack(lo) <= bench.noise_slack(hi) + 1e-12


@given(times, st.floats(min_value=1.0, max_value=5.0, allow_nan=False))
def test_bench_verdict_monotone_in_time(samples, factor):
    pin = {"q": _time_pin(samples)}
    base = min(samples)
    slow = base * factor
    v_fast = bench.query_verdicts({"q": round(base, 4)}, pin)["q"]
    v_slow = bench.query_verdicts({"q": round(slow, 4)}, pin)["q"]
    assert SEVERITY.index(v_slow) >= SEVERITY.index(v_fast)


# ------------------- gate-memory streak algebra (r10) ---------------------

verdict_st = st.sampled_from(
    ["ok", "noise-band", "host-tail", "regressed", "no-pin"]
)
history_st = st.lists(
    st.tuples(st.integers(min_value=1, max_value=30),
              st.fixed_dictionaries({"q": verdict_st})),
    max_size=8,
    unique_by=lambda t: t[0],
)


def _contiguous_prefix_verdicts(history):
    """Independent restatement of the r12 contiguity rule: history
    verdicts newest-first, stopping at the first gap in round numbers
    (the newest entry assumed adjacent to the current run)."""
    out, prev = [], None
    for rnd, v in sorted(history, reverse=True):
        if prev is not None and rnd != prev - 1:
            break
        out.append(v)
        prev = rnd
    return out


@given(verdict_st, history_st)
def test_streak_is_the_maximal_non_ok_prefix(cur, history):
    """consecutive_non_ok("q") == length of the maximal all-non-ok prefix
    of [current, newest round, next-newest, ...] that is CONTIGUOUS in
    round numbers (r12: an unrecorded round between two recorded ones is
    unknown history and breaks the walk, exactly as
    bench_imaging.consecutive_inactive does) — the independent spec
    restated: any reset/break/skip/gap bug diverges from this fold."""
    streaks = bench.consecutive_non_ok({"q": cur}, history)
    seq = [cur] + [v["q"] for v in _contiguous_prefix_verdicts(history)]
    expect = 0
    for v in seq:
        if v in bench.NON_OK_VERDICTS:
            expect += 1
        else:
            break
    if expect == 0:
        assert "q" not in streaks
    else:
        assert streaks["q"] == expect


@given(verdict_st, history_st)
def test_inactive_queries_streak_is_the_contiguous_inactive_prefix(
    cur, history
):
    """consecutive_inactive_queries("q") == length of the maximal
    all-`inactive` prefix of [current, newest, ...] contiguous in round
    numbers — same fold, same gap rule, inverted marker."""
    hist = [
        (r, {"q": "inactive" if v["q"] == "no-pin" else v["q"]})
        for r, v in history  # reuse no-pin slots as inactive markers
    ]
    cur_v = "inactive" if cur == "no-pin" else cur
    streaks = bench.consecutive_inactive_queries({"q": cur_v}, hist)
    if cur_v != "inactive":
        assert "q" not in streaks
        return
    expect = 1
    for v in _contiguous_prefix_verdicts(hist):
        if v["q"] == "inactive":
            expect += 1
        else:
            break
    assert streaks["q"] == expect


@given(history_st)
def test_round_gap_never_splices_streaks(history):
    """Deleting any single NON-NEWEST round from history (simulating an
    unparseable BENCH_rN.json) can only SHORTEN or preserve both streak
    folds, never lengthen them — the r11 verdict's splice hole, stated
    as the property that closes it. The newest round is exempt: both
    folds assume the newest recorded round is adjacent to the current
    run (bench.py cannot know its own round number), so deleting IT
    re-anchors the walk on the next-newest block — a different history,
    not a splice."""
    inactive_hist = [(r, {"q": "inactive"}) for r, _ in history]
    nonok_hist = [(r, {"q": "regressed"}) for r, _ in history]
    full_inact = bench.consecutive_inactive_queries(
        {"q": "inactive"}, inactive_hist
    )["q"]
    full_nonok = bench.consecutive_non_ok({"q": "regressed"}, nonok_hist)["q"]
    newest = max((r for r, _ in history), default=None)
    for i in range(len(history)):
        if history[i][0] == newest:
            continue
        gapped_i = inactive_hist[:i] + inactive_hist[i + 1:]
        gapped_n = nonok_hist[:i] + nonok_hist[i + 1:]
        assert (
            bench.consecutive_inactive_queries({"q": "inactive"}, gapped_i)[
                "q"
            ]
            <= full_inact
        )
        assert (
            bench.consecutive_non_ok({"q": "regressed"}, gapped_n)["q"]
            <= full_nonok
        )


@given(history_st)
def test_ok_newest_round_caps_streak_at_one(history):
    """One green driver round discharges any accumulated streak: with the
    newest history round reading ok, a current non-ok can never exceed 1
    — escalation is about CONSECUTIVE evidence, not lifetime totals."""
    newest = max((r for r, _ in history), default=0) + 1
    hist = history + [(newest, {"q": "ok"})]
    assert bench.consecutive_non_ok({"q": "noise-band"}, hist) == {"q": 1}


@given(history_st, st.integers(min_value=1, max_value=31))
def test_pin_epoch_filter_never_lengthens_a_streak(history, since):
    """The pin-epoch boundary (r10 re-pin): filtering history to rounds
    >= since_round is exactly what load_driver_verdict_history does with
    a pin_round — it can only SHORTEN or preserve a streak, never grow
    it, and rounds below the epoch have zero influence on the result."""
    full = bench.consecutive_non_ok({"q": "noise-band"}, history)["q"]
    kept = [(r, v) for r, v in history if r >= since]
    filtered = bench.consecutive_non_ok({"q": "noise-band"}, kept)["q"]
    assert filtered <= full
    # zero influence: mutating every pre-epoch verdict cannot change it
    mutated = [
        (r, v if r >= since else {"q": "regressed"}) for r, v in history
    ]
    mutated_kept = [(r, v) for r, v in mutated if r >= since]
    assert (
        bench.consecutive_non_ok({"q": "noise-band"}, mutated_kept)["q"]
        == filtered
    )


# ---------------- inactive-streak algebra (r11) ----------------------------

from bench_imaging import consecutive_inactive  # noqa: E402

imaging_verdict_st = st.one_of(
    st.none(), st.sampled_from(["ok", "noise-band", "host-tail", "regressed"])
)
imaging_history_st = st.lists(
    st.tuples(st.integers(min_value=1, max_value=30), imaging_verdict_st),
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(st.booleans(), imaging_history_st)
def test_inactive_streak_is_the_maximal_contiguous_none_prefix(
    cur_inactive, history
):
    """consecutive_inactive == length of the maximal prefix of
    [current, newest recorded round, ...] that is all-inactive AND
    contiguous in round numbers (the newest entry assumed adjacent to the
    current run) — the independent spec restated as a fold, so any
    reset/gap/order bug diverges."""
    got = consecutive_inactive(cur_inactive, history)
    if not cur_inactive:
        assert got == 0
        return
    expect, prev = 1, None
    for rnd, v in sorted(history, reverse=True):
        if prev is not None and rnd != prev - 1:
            break  # unrecorded round between: unknown history, never extends
        if v is None:
            expect += 1
            prev = rnd
        else:
            break
    assert got == expect


@given(imaging_history_st)
def test_active_newest_round_caps_inactive_streak_at_one(history):
    """One measured round (any active verdict, even `regressed`)
    discharges the unmeasured-rounds debt: with the newest recorded round
    active, a current inactive run counts exactly 1."""
    newest = max((r for r, _ in history), default=0) + 1
    hist = history + [(newest, "regressed")]
    assert consecutive_inactive(True, hist) == 1


@given(imaging_history_st)
def test_inactive_history_breaks_non_ok_streak(history):
    """The r11 feeding convention: history rounds with verdict None enter
    bench.consecutive_non_ok as the marker string 'inactive', which is
    not in NON_OK_VERDICTS — so an unmeasured round BREAKS a non-ok
    streak (pre-r11 those rounds were dropped from the list, splicing
    their non-ok neighbors into one streak). Spec: the streak never
    counts past the newest None round."""
    hist = [
        (rnd, {"rate": v if v is not None else "inactive"})
        for rnd, v in history
    ]
    streak = bench.consecutive_non_ok({"rate": "regressed"}, hist)["rate"]
    none_rounds = [r for r, v in history if v is None]
    if none_rounds:
        newest_none = max(none_rounds)
        n_after = sum(1 for r, _ in history if r > newest_none)
        assert streak <= 1 + n_after


verdict_with_nopin_st = st.sampled_from(
    ["ok", "noise-band", "host-tail", "regressed", "no-pin"]
)
verdict_map_st = st.dictionaries(
    st.text(min_size=1, max_size=8), verdict_with_nopin_st, max_size=8
)
mem_st = st.one_of(
    st.none(), st.floats(min_value=0.0, max_value=5.0, allow_nan=False)
)


@given(verdict_map_st, mem_st)
def test_memory_floor_transform_properties(verdicts, mem):
    """memory_floor_verdicts: on a floored probe the output carries NO
    non-ok verdict (each became `inactive`) and every ok/no-pin is
    untouched; on a healthy/unknown probe it is the identity; and it is
    idempotent (a second application changes nothing)."""
    out, floored = bench.memory_floor_verdicts(verdicts, mem)
    assert set(out) == set(verdicts)
    if mem is None or mem >= bench.MEM_FAULT_FLOOR_GB_S:
        assert out == verdicts and floored == []
    else:
        assert sorted(floored) == sorted(
            n for n, v in verdicts.items() if v in bench.NON_OK_VERDICTS
        )
        for n, v in verdicts.items():
            assert out[n] == ("inactive" if v in bench.NON_OK_VERDICTS else v)
        assert not set(out.values()) & bench.NON_OK_VERDICTS
    again, floored2 = bench.memory_floor_verdicts(out, mem)
    assert again == out and floored2 == []
