#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
contract JSON line LAST: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}.

Output layout (r13 measurement-contract fix): the driver stores only the
LAST ~2000 characters of stdout and parses the final JSON line out of
that window. Since r5 the single output line had grown (noise block,
per-query gate verdicts, cpu axis) past 2000 chars, so the driver
recorded ``parsed: null`` for every round r5-r12 — the kernel's own
numbers never reached the driver artifact. The full diagnostics object
(unchanged keys, 4-dp times) is now printed FIRST on its own line, and a
COMPACT contract line (metric/value/unit/queries/sf only, 3-dp query
times, no spaces) is printed LAST so it always fits the driver's parse
window. pin_bench_baseline.py reads the diagnostics line; the driver
reads the compact line. Both lines report the same run.

Each query is materialized through the noop sink so the full plan executes
(scan -> shuffle -> agg -> sort) without driver-side collection overhead.
A warmup query absorbs JVM/codegen startup so per-query times reflect
steady-state execution.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
from statistics import median

# Headline set: one per operator family; extended as phases land.
HEADLINE = [
    "flagship_revenue_by_region_priority",
    "pricing_summary",
    "filter_project_arith",
    "join_left_customer_order_counts",
    "join_semi_customers_with_urgent_orders",
    "join_symmetric_difference_validation",
    "agg_percentiles_exact",
    "agg_count_distinct_rollup",
    "topk_customers_by_revenue",
    "topk_per_group_window",
    "window_session_10m_gap",
    "join_asof_last_view",
    "split_hash_bucket",
    "text_quality_scores",
    "dedup_minhash_lsh_candidates",
    "dedup_jaccard_dfcap",
    "dedup_lsh_verified_pairs",
    "dedup_connected_components",
    "dedup_incremental_delta",
    "curation_funnel",
    "dedup_exact_hash",
    "sample_stratified_exact",
    "join_range_time_bucketed",
    "text_tfidf_top_terms",
    "ann_bruteforce_topk",
    "embedding_quantize_int8",
    "imaging_patch_grid",
    "imaging_pipeline_patches",
    "text_perplexity_proxy",
    "text_decontaminate_overlap",
    "text_repetition_signals",
    "dedup_interdoc_segments",
    "training_shard_assignment",
    "pack_sequences_concat",
    "data_profile_summary",
    "cohort_retention_weekly",
    "text_chunk_overlapping",
    "events_transition_matrix",
    "late_sole_supplier_orders",
    "customer_order_count_distribution",
    "events_time_weighted_avg",
    "agg_trimmed_winsorized_stats",
    "sample_weighted_exact",
    "nation_pair_shipping_volume",
    "profit_by_supp_nation_year",
    "disjunctive_bracket_revenue",
    # round-3 additions
    "corpus_importance_weights",
    "ann_recall_eval",
    # round-4 additions: the three slowest registry queries (unrolled
    # per-subspace Lloyd chains / k-means clustering) — previously
    # invisible to the regression gate because they were not benched
    "ann_ivf_pq_topk",
    "ann_ivf_kmeans_topk",
    "dedup_semantic_keep",
    # round-10 additions: the census's headline-promotion candidates
    # (BENCH_CENSUS_r10.json) — the most expensive registry queries that
    # had never been timed by the gated bench. Each carries a census
    # adjudication of its inherent shape; promoting them puts the
    # iterative-CC compositions, the LSH eval harness, and the bucketed-
    # CTAS demonstration under the per-query drift gate.
    "dedup_pagerank_representatives",
    "join_bucketed_colocated",
    "dedup_lsh_quality_eval",
    "dedup_keep_best_quality",
    "dedup_cluster_representatives",
]

# r13 census promotions (BENCH_CENSUS_r12 headline_promotion_candidates):
# the five registry queries that inherently outrun the headline p95.
# They are NOT appended to HEADLINE yet — inserting into HEADLINE shifts
# every later query's sweep slot, which invalidates the positionally-
# normalized wall pins, and a full wall re-pin is refused on a floored
# host (pin_bench_baseline). Until a healthy host permits that re-pin,
# they are measured AFTER the headline sweep (outside the positional
# probes, so they perturb nothing) on the floor-insensitive cpu axis
# only, adjudicated against aux_query_cpu_pins (pin_bench_baseline
# --aux-cpu-augment) — advisory, like all cpu verdicts.
AUX_CPU_QUERIES = [
    "ann_pq_adc_topk",
    "events_step_funnel",
    "events_gap_fill_forward",
    "dedup_ngram_jaccard_pairs_diagnostic",
    "dedup_triangle_count",
]

RUNS_PER_QUERY = 5  # report median (robust to run-to-run noise on sub-second
# queries; the first run pays Catalyst compile and lands above the median, so
# no separate warmup discard is needed per query)
AUX_RUNS_PER_QUERY = 3  # aux queries are 2-11 s each: median-of-3 keeps the
# post-sweep aux stage under ~2 min while still shedding the compile outlier

# Host-noise calibration: r3->r4 drifted +46% on unchanged queries purely
# from host conditions (shared host, nonzero steal time), which makes the
# absolute 2x gate noisy. The sweep therefore probes a fixed sentinel
# query at start / middle / end and reports observed-vs-pinned ratio plus
# the /proc/stat steal fraction, so a judge can normalize totals instead
# of guessing whether drift is code or host.
NOISE_SENTINEL = "pricing_summary"
# 7, not 3 (r7, verdict demand #5): measured on an idle host
# (steal_frac 0.002), single sentinel runs have cv ~15% (24 samples,
# mean 0.809 s, stdev 0.119 s) — median-of-3 probes therefore spread up
# to ~50% across one run while estimating the SAME median, which is what
# kept failing the ±15% start/mid/end acceptance; non-overlapping
# median-of-7 windows over the same samples agreed within 8%. The
# statistic is unchanged (median single-run sentinel time, matching
# sentinel_probe_pin); only the estimator gained samples. Interpolation
# was rejected: the mid probe is routinely the FASTEST of the three
# (non-monotone noise), so a start->end linear model would miscorrect.
NOISE_PROBE_RUNS = 7

# Soft wall-clock budget: if the sweep is running long (slow disk, cold
# JVM, bigger SF), remaining queries drop to 2 runs (min reported) so the
# harness always finishes inside the driver's window instead of timing out.
BUDGET_SECS = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "420"))


# Host memory-fault capability (r10 forensics): on a lazily-backed VM
# (snapshot-restored Firecracker with an on-demand memory backend), the
# FIRST touch of a fresh anonymous page goes through the hypervisor's
# fault path. Measured live on the r10 host: first-touch 0.01-0.05 GB/s
# vs 1.3-1.9 GB/s re-touch of the same resident pages — two orders of
# magnitude, while /proc/stat steal was ~0, iowait 0, and the
# single-thread CPU probe matched its pin exactly (tiny buffers ride the
# allocator's resident pool). Workloads that stream tens of GB of fresh
# allocations (the imaging pipeline's volume/slab buffers) crater ~2.5x;
# pooled-memory workloads (the relational JVM bench) don't notice. The
# probe is the missing evidence axis: CPU probe flat + memory probe
# floored = lazily-backed memory, not a kernel regression.
MEM_FAULT_FLOOR_GB_S = 0.25  # healthy hosts measure 1-3 GB/s first-touch;
# the pathological r10 host measured 0.01-0.05 — an order of magnitude of
# separation on each side of the floor, no grey zone.


def host_memory_probe(size_mb: int = 128, attempts: int = 2) -> float:
    """First-touch throughput (GB/s) of a FRESH anonymous buffer — the
    best of ``attempts`` fresh buffers (the most favorable reading, so a
    gate keyed on it can only fire when even the best attempt is floored;
    a healthy host can never be excused by one slow sample). Each attempt
    allocates new address space: allocator-reused pages would measure the
    resident pool, which is exactly the path this probe must NOT take.
    Costs ~0.2 s healthy, a few seconds per attempt on a floored host."""
    import numpy as np

    n = int(size_mb * 1e6 // 8)
    best = 0.0
    bufs = []  # hold refs so attempts can't reuse each other's extents
    for _ in range(attempts):
        a = np.empty(n)
        t0 = time.perf_counter()
        a[:] = 1.0
        dt = time.perf_counter() - t0
        bufs.append(a)
        best = max(best, (size_mb / 1e3) / dt)
    del bufs
    return round(best, 4)


def read_user_cpu_sec() -> float | None:
    """System-wide user+nice CPU seconds consumed since boot
    (/proc/stat line 1), the numerator-side clock of the r12
    floor-insensitive auxiliary metric. Why USER time and not wall or
    user+system: on this sandbox's lazily-backed VM the first-touch
    page-fault path is accounted almost entirely to SYSTEM time
    (measured r12: a cold 256 MB fresh-buffer fill cost 10.17 s wall /
    10.12 s stime / 0.048 s utime; the resident re-fill did the same
    user work in 0.075 s — FINDINGS_HOST_MEMORY.md), so work ÷ Δuser is
    a throughput statistic the memory floor cannot inflate while a real
    kernel regression (more computation per row/patch) still moves it.
    System-wide, not per-process: it must include the JVM and every
    python worker, including workers that exit before sampling. The
    assumption it shares with wall-clock: the bench is the host's
    dominant workload while it runs. Best-effort None on unreadable
    /proc."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        hz = os.sysconf("SC_CLK_TCK")
        return (float(parts[0]) + float(parts[1])) / hz
    except (OSError, IndexError, ValueError):
        return None


def positional_factors(
    probes: list[float | None], n_queries: int
) -> list[float] | None:
    """Per-query-position sentinel estimates by piecewise-linear
    interpolation over the start (position 0), mid (position n//2) and
    end (position n) probes (r7, verdict demand #5).

    Why positional and not scalar: with 7-sample probes (sampling noise
    ~8%) an idle-host run still shows start 0.88 s vs mid/end 0.58 s —
    genuine within-run drift (whole-session JIT/page-cache warmup decaying
    over the first half of the sweep), which a single scalar factor
    misattributes: it deflates late queries and inflates early ones.
    Interpolating between the three probes credits each query with the
    host speed measured NEAREST ITS POSITION. Returns None when any probe
    is missing (callers fall back to the scalar factor).
    """
    if len(probes) != 3 or any(p is None for p in probes):
        return None
    p0, p1, p2 = probes  # type: ignore[misc]
    mid = n_queries // 2
    out: list[float] = []
    for i in range(n_queries):
        if i <= mid:
            frac = i / mid if mid else 0.0
            out.append(p0 + (p1 - p0) * frac)
        else:
            frac = (i - mid) / (n_queries - mid)
            out.append(p1 + (p2 - p1) * frac)
    return out


def positional_normalize_queries(
    times: dict[str, float],
    order: list[str],
    probes: list[float | None],
    sentinel_pin: float,
) -> dict[str, float] | None:
    """Per-query positionally-normalized times: each query divided by its
    position-local noise factor (interpolated sentinel estimate / pin).
    The same function normalizes both a live bench run and the pin runs
    themselves (pin_bench_baseline.py), so per-query comparisons are
    statistic-matched on both sides — the r5/r6 rule, extended to the
    per-query drift gate (r8)."""
    est = positional_factors(probes, len(order))
    if est is None or not sentinel_pin:
        return None
    return {
        name: round(times[name] / (est[i] / sentinel_pin), 4)
        for i, name in enumerate(order)
        if name in times
    }


def positional_normalize(
    times: dict[str, float],
    order: list[str],
    probes: list[float | None],
    sentinel_pin: float,
) -> float | None:
    """Sum of per-query positionally-normalized times (see
    :func:`positional_normalize_queries`)."""
    per_q = positional_normalize_queries(times, order, probes, sentinel_pin)
    return None if per_q is None else round(sum(per_q.values()), 4)


# Per-query drift-gate bands (r8, verdict demand #2): a query's verdict is
#   ok         normalized <= pin_median + pin_spread   (inside what the pin
#              runs' MIDDLE band showed on an idle host, same statistic;
#              spread is outlier-trimmed — see pin_bench_baseline.py)
#   noise-band normalized <= that bound + slack, where
#              slack = max(NOISE_REL_BAND * pin_median, NOISE_ABS_FLOOR_S)
#   host-tail  normalized <= pin_median + pin_tail + slack, where tail is
#              the pin runs' own WORST excursion above their median (the
#              outlier the trimmed spread dropped). A single live sample
#              landing where the pin's own no-change runs landed cannot
#              honestly be called a regression — this host measured
#              ann_ivf_pq_topk at 0.77-5.51 around a 2.13 median with
#              zero code change — but it is flagged distinctly: re-run to
#              confirm, and a repeat offender across rounds IS evidence.
#   regressed  beyond anything the pin ever saw — investigate, don't
#              eyeball away.
# The slack terms are measured, not guessed: this host's sentinel probes
# drift up to ~0.37 s within a single run (r7: 0.95 -> 0.58 s) and
# unchanged sub-second queries have swung ±30-50% across rounds since r4,
# so same-session pin spread alone under-captures cross-day host weather.
# The ABSOLUTE floor dominates for sub-second queries (a 0.25 s query
# jumping to 0.55 s is scheduler jitter, not code); the RELATIVE band
# dominates for multi-second queries, where a genuine 2x regression lands
# far outside the band + 0.35 s and still trips the gate (for queries
# with a small recorded tail — exactly the ones where a single sample IS
# evidence).
#
# The relative band is GRADUATED (r9, r8 verdict demand #3): 50% of a
# 0.3 s pin is scheduler jitter, but 50% of a 1.6 s pin is 800 ms of
# unflagged drift — dedup_semantic_keep rode a 1.30x raw excursion
# through as `ok` in r8. Pins >= NOISE_REL_TIGHT_AT_S get the tighter
# 25% band; positional normalization has already removed host weather at
# that point, and multi-second queries' normalized times are the stable
# ones (their work dwarfs per-task scheduling noise). The band
# INTERPOLATES linearly between NOISE_REL_TIGHT_FROM_S (50%) and
# NOISE_REL_TIGHT_AT_S (25%) — r10, r9 ADVICE: the r9 step function was
# non-monotonic at the 1 s threshold (a 0.99 s pin got 0.495 s slack, a
# 1.0 s pin 0.35 s), so a re-pin drifting across 1 s would have flipped
# the band width discontinuously. With interpolation the resulting slack
# max(rel(m)*m, floor) is monotone non-decreasing in the pin median:
# rel(m)*m <= 0.35 everywhere below 1.4 s (0.5*0.7 = 0.35 at the left
# edge, decreasing product through the ramp, 0.25*1.4 = 0.35 at the
# right), so slack is the 0.35 s floor up to 1.4 s and 25% beyond —
# locked by a hypothesis property (tests/test_gate_properties.py).
# Validated by replaying the r8 pin's own recorded runs through the
# tightened gate: zero false `regressed` (tests/test_round9_additions.py)
# — a property that holds for ANY slack >= 0 (the regressed floor sits
# strictly below the pin's own worst run before slack is even added).
NOISE_REL_BAND = 0.5          # pins at/below the ramp start
NOISE_REL_BAND_BIG = 0.25     # pins >= NOISE_REL_TIGHT_AT_S
NOISE_REL_TIGHT_FROM_S = 0.7  # ramp start: 0.5*0.7 s = the 0.35 s floor
NOISE_REL_TIGHT_AT_S = 1.0
NOISE_ABS_FLOOR_S = 0.35


def noise_slack(pin_median: float) -> float:
    """Cross-day host-weather allowance above a query's pinned band.
    Monotone non-decreasing in ``pin_median`` (see band comment)."""
    if pin_median >= NOISE_REL_TIGHT_AT_S:
        rel = NOISE_REL_BAND_BIG
    elif pin_median <= NOISE_REL_TIGHT_FROM_S:
        rel = NOISE_REL_BAND
    else:
        frac = (pin_median - NOISE_REL_TIGHT_FROM_S) / (
            NOISE_REL_TIGHT_AT_S - NOISE_REL_TIGHT_FROM_S
        )
        rel = NOISE_REL_BAND + (NOISE_REL_BAND_BIG - NOISE_REL_BAND) * frac
    return max(rel * pin_median, NOISE_ABS_FLOOR_S)


# CPU-axis slack (r13, r12 ADVICE): the wall slack's 0.35 s absolute
# floor is sized for SCHEDULER jitter on wall-clock times — applying it
# to raw cpu_user seconds let a ~2x user-CPU regression on the 7 cpu
# pins with sub-0.7 s medians read `noise-band` and count as
# corroboration. CPU user time has no scheduler-wait component (waiting
# burns no utime), so its cross-day allowance is RELATIVE-ONLY with a
# small floor for /proc/stat's sampling granularity (USER_HZ ticks
# across ~32 cpus plus turbo/frequency drift; the pins' own recorded
# spread/tail already capture run-to-run variance on top). Replaying
# the r12 driver + self-check corroborations under this slack flips
# zero recorded verdicts (tests/test_round13_additions.py) — it only
# tightens what a FUTURE real regression can hide behind.
CPU_NOISE_REL_BAND = 0.25
CPU_NOISE_ABS_FLOOR_S = 0.1


def cpu_noise_slack(pin_median: float) -> float:
    """Cross-day allowance above a query's pinned CPU band — relative
    band with a tick-granularity floor, never the wall 0.35 s floor."""
    return max(CPU_NOISE_REL_BAND * pin_median, CPU_NOISE_ABS_FLOOR_S)


# User-CPU inflation episodes (r13, FINDINGS_HOST_MEMORY.md second
# pathology): the host intermittently slows ALL retired user-space work
# up to ~3.6x (SMT/neighbor contention; steal reads 0), inflating every
# query's cpu_user at once. A kernel regression from a code change hits
# specific queries; a majority of the adjudicated set regressing in the
# SAME sweep is the episode's signature.
CPU_WEATHER_MIN_REGRESSED = 3
CPU_WEATHER_REGRESSED_FRAC = 0.5

# Automated solo re-sample of flagged small-pin cpu regressions (r14,
# r13 verdict finding #5): pins under CPU_RESAMPLE_MAX_PIN_S are the
# fragile bands a user-CPU inflation episode can fake-regress (19 of 56
# were sub-1 s at r13 close; two needed hand adjudication). Flagged
# queries are re-run after the sweep and adjudicated on the MIN
# re-sample — exculpatory-only, see the in-line comment at the call
# site. Larger pins regressing on the 25% relative band are treated as
# real findings and are NOT softened by re-sampling.
CPU_RESAMPLE_RUNS = 5
CPU_RESAMPLE_MAX_PIN_S = 2.0


def cpu_weather_suspected(cpu_verdicts: dict) -> dict | None:
    """Advisory episode flag over a sweep's per-query cpu verdicts:
    non-None when >= CPU_WEATHER_MIN_REGRESSED queries AND >=
    CPU_WEATHER_REGRESSED_FRAC of the adjudicated set read `regressed`
    together. The per-query verdicts stand as recorded — the flag routes
    the reviewer to solo_cpu_measure.py re-sampling on a quieter window
    before treating correlated regressions as kernel findings."""
    regressed = [n for n, v in cpu_verdicts.items() if v == "regressed"]
    adjudicated = [n for n, v in cpu_verdicts.items() if v != "no-pin"]
    if (
        len(regressed) >= CPU_WEATHER_MIN_REGRESSED
        and adjudicated
        and len(regressed) >= CPU_WEATHER_REGRESSED_FRAC * len(adjudicated)
    ):
        return {
            "regressed": len(regressed),
            "adjudicated": len(adjudicated),
            "note": (
                "correlated cpu regression across the floored set on an "
                "unchanged tree — consistent with a user-cpu inflation "
                "episode (FINDINGS_HOST_MEMORY.md second pathology); "
                "re-sample via solo_cpu_measure.py before adjudicating "
                "as kernel findings"
            ),
        }
    return None


def validate_query_pins(
    base: dict, headline: list[str]
) -> tuple[dict | None, str | None]:
    """Extract the per-query drift-gate pins from a loaded baseline,
    refusing pins the live run can't be compared against. Returns
    ``(query_pins, invalid_reason)`` — exactly one is non-None.

    Positional normalization interpolates host speed by SWEEP SLOT, so
    per-query pins are only comparable when the live HEADLINE order
    matches the order the pin ran under: one insertion shifts every later
    query's noise factor and its pinned median silently. A pin without a
    recorded headline (pre-r8) or with a different one degrades to no-pin
    verdicts rather than mis-adjudicating (r8 review)."""
    query_pins = base.get("query_pins")
    if not query_pins:
        return None, (
            "pin has no query_pins (pre-r8 pin); re-pin with "
            "pin_bench_baseline.py"
        )
    if base.get("headline") != list(headline):
        return None, (
            "pin headline order differs from live HEADLINE; re-pin with "
            "pin_bench_baseline.py"
        )
    return query_pins, None


def load_pin_calibration(
    sf: float, headline: list[str], path: str
) -> tuple[float | None, float | None, float | None, dict | None, str | None]:
    """Load every pin-side calibration statistic a live run compares
    against, refusing incomparable pins with a REASON instead of silence.
    Returns ``(sentinel_pin, median_run_pin, median_norm_pin, query_pins,
    invalid_reason)``; the pins are None whenever ``invalid_reason`` says
    why (no readable pin, sf mismatch — r8 ADVICE: that path previously
    omitted the gate keys entirely, the same 'silently absent gate
    misread as no regressions' ambiguity the pre-r8-pin and
    headline-mismatch paths already fix — or a layout mismatch from
    validate_query_pins).

    - ``median_run_pin``: the pin runs' median raw total — the
      statistic-matched target for value_noise_normalized (the headline
      ``value`` is the elementwise best across runs, unattainable in any
      single run; comparing against it carries ~20% built-in bias).
    - ``median_norm_pin``: median of the pin runs' own
      positionally-normalized totals (computed with this same
      sentinel_probe_pin) — the target for value_positional_normalized.
    """
    try:
        with open(path) as f:
            base = json.load(f)
    except (OSError, ValueError):
        return None, None, None, None, (
            "no readable BENCH_SELF_BASELINE.json pin; bootstrap with "
            "pin_bench_baseline.py"
        )
    # The pin only calibrates runs at the baseline's own scale factor.
    if base.get("sf") != sf:
        return None, None, None, None, (
            f"pin sf {base.get('sf')} differs from run sf {sf}; "
            "normalization and per-query pins only calibrate at the "
            "pin's own scale factor"
        )
    query_pins, invalid = validate_query_pins(base, headline)
    return (
        base.get("sentinel_probe_pin"),
        base.get("value_median_of_runs"),
        base.get("value_median_of_runs_normalized"),
        query_pins,
        invalid,
    )


def query_verdicts(
    normalized: dict[str, float],
    query_pins: dict[str, dict],
    slack_fn=noise_slack,
) -> dict[str, str]:
    """Machine adjudication of per-query drift (replaces the r7 eyeball):
    compare each query's positionally-normalized time against its pinned
    median + spread (same statistic, pinned by pin_bench_baseline.py).
    Queries without a pin entry (newly added to HEADLINE since the pin)
    are reported ``no-pin`` — indeterminate, never silently ok.

    ``slack_fn`` selects the cross-day allowance for the statistic being
    adjudicated: wall times use :func:`noise_slack` (default); raw
    cpu_user comparisons must pass :func:`cpu_noise_slack` (r13, r12
    ADVICE — the wall floor over-forgives sub-second cpu pins)."""
    verdicts: dict[str, str] = {}
    for name, val in normalized.items():
        pin = query_pins.get(name)
        if not pin or pin.get("median") is None:
            verdicts[name] = "no-pin"
            continue
        med, spread = pin["median"], pin.get("spread", 0.0)
        ok_bound = med + spread
        slack = slack_fn(med)
        # tail = the pin runs' own worst excursion above their median
        # (outlier-trimmed out of `spread`). Absent in a pin without it
        # -> 0.0, i.e. the band collapses into `regressed` (strictest).
        tail = pin.get("tail", 0.0) or 0.0
        if val <= ok_bound:
            verdicts[name] = "ok"
        elif val <= ok_bound + slack:
            verdicts[name] = "noise-band"
        elif val <= med + tail + slack:
            verdicts[name] = "host-tail"
        else:
            verdicts[name] = "regressed"
    return verdicts


# Gate memory (r10, r9 verdict demand #2): the per-round gate evaluates
# each run independently against the fixed pin, so a query that settles
# PERMANENTLY ~1 band above its pin median reads `noise-band` forever and
# never escalates (sample_stratified_exact and dedup_interdoc_segments
# read noise-band in both the r8 and r9 driver benches). The run output
# therefore counts consecutive non-ok verdicts — current run first, then
# each immediately-prior driver round (BENCH_r{N}.json) that also read
# non-ok — and at ESCALATE_AT the query is listed in escalation_queries:
# the verdict may no longer ride as "probably jitter"; it requires an
# interleaved A/B against the last-known-good kernel (the r9
# ab_semdedup.py recipe) or a re-pin with recorded rationale.
ESCALATE_AT = 3
NON_OK_VERDICTS = frozenset({"noise-band", "host-tail", "regressed"})
ESCALATION_POLICY = (
    f"{ESCALATE_AT}+ consecutive non-ok driver verdicts: adjudicate with "
    "an interleaved A/B vs the last-known-good kernel (ab_semdedup.py "
    "recipe) or re-pin with recorded rationale — a permanent settle "
    "above the pin is evidence, not jitter"
)


def load_query_cpu_pins(path: str) -> dict | None:
    """Per-query cpu-axis pins (``query_cpu_pins``: name -> {median,
    spread, tail} over RAW cpu_user seconds) from the baseline, or None
    for pins that predate the r12 cpu axis. Kept separate from
    load_pin_calibration: cpu times are compared RAW (no positional
    normalization — host weather is exactly what the statistic is
    insensitive to), so none of the wall-side comparability guards
    (sentinel, headline order) apply; only the sf must match, which the
    caller has already established before consulting cpu pins."""
    try:
        with open(path) as f:
            v = json.load(f).get("query_cpu_pins")
        return v if isinstance(v, dict) and v else None
    except (OSError, ValueError):
        return None


def load_cpu_pin_provisional(path: str) -> dict | None:
    """The baseline's ``cpu_pin_provisional`` marker (stamped by
    pin_bench_baseline.py --allow-fewer-runs), or None for a
    full-protocol cpu pin. Consulted wherever cpu verdicts resolve an
    escalation (r13, r12 ADVICE): a below-protocol band must be SEEN by
    the adjudication, not silently treated as a 5-run pin."""
    try:
        with open(path) as f:
            v = json.load(f).get("cpu_pin_provisional")
        return v if isinstance(v, dict) else None
    except (OSError, ValueError):
        return None


def load_pin_round(path: str) -> int | None:
    """The round during which the current pin was created (recorded by
    pin_bench_baseline.py as ``pin_round``), or None for pins that
    predate the field. Feeds the streak computation's epoch boundary."""
    try:
        with open(path) as f:
            v = json.load(f).get("pin_round")
        return v if isinstance(v, int) else None
    except (OSError, ValueError):
        return None


def load_driver_verdict_history(
    repo_dir: str, since_round: int | None = None
) -> list[tuple[int, dict]]:
    """Per-query verdicts from each prior DRIVER bench round, ascending
    by round number. Only ``BENCH_r{N}.json`` files count (self-checks,
    imaging and A/B records are not rounds). The driver wraps bench.py's
    stdout and may store only its tail, so verdicts are recovered from
    the embedded ``"query_verdicts": {...}`` fragment when the file is a
    wrapper; rounds that predate the per-query gate (r1-r7) or whose
    recorded tail lost the block contribute nothing — an absent round is
    indeterminate history, never a synthetic `ok`.

    ``since_round`` is the pin epoch boundary: verdicts recorded under a
    RETIRED pin (rounds < since_round, i.e. before the current pin was
    created) are dropped — they measured drift against a baseline that
    no longer exists, and the re-pin itself is the recorded adjudication
    that closes their streaks (the escalation policy's second arm).
    Rounds >= since_round are kept: a pin created during round N is
    active for round N's driver bench, which runs at round end."""
    out: list[tuple[int, dict]] = []
    for fn in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(fn))
        if not m:
            continue
        if since_round is not None and int(m.group(1)) < since_round:
            continue
        try:
            with open(fn) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        v = None
        if isinstance(d.get("query_verdicts"), dict):
            v = d["query_verdicts"]
        elif isinstance(d.get("parsed"), dict):
            v = d["parsed"].get("query_verdicts")
        elif isinstance(d.get("tail"), str):
            # verdict values are flat strings, so the object has no
            # nested braces — non-greedy to the first `}` is exact
            tm = re.search(r'"query_verdicts": (\{[^{}]*\})', d["tail"])
            if tm:
                try:
                    v = json.loads(tm.group(1))
                except ValueError:
                    v = None
        if isinstance(v, dict) and v:
            out.append((int(m.group(1)), v))
    return sorted(out)


# Inactive-streak escalation for the relational gate (r11, mirroring
# bench_imaging): a query whose verdict reads `inactive` (memory-floored
# host) contributes nothing to non-ok streaks — correctly — but N
# consecutive floored rounds would otherwise never demand a measurement.
ESCALATE_INACTIVE_AT = 2
INACTIVE_ESCALATION_POLICY = (
    f"{ESCALATE_INACTIVE_AT}+ consecutive inactive driver verdicts: the "
    "query has gone that many rounds unmeasured under a memory-floored "
    "host — re-run bench.py on a host whose first-touch probe clears "
    "MEM_FAULT_FLOOR_GB_S or record a documented environment finding"
)


def memory_floor_verdicts(
    verdicts: dict[str, str], mem: float | None
) -> tuple[dict[str, str], list[str]]:
    """The exculpatory transform: on a memory-floored host every NON-OK
    verdict becomes `inactive` (the kernel was not measured); ok and
    no-pin verdicts pass through untouched (an ok under slower-only bias
    is conservative, valid evidence). Returns the transformed verdicts
    and the list of queries that went inactive. A healthy or unknown
    probe returns the input unchanged."""
    if mem is None or mem >= MEM_FAULT_FLOOR_GB_S:
        return verdicts, []
    floored = sorted(n for n, v in verdicts.items() if v in NON_OK_VERDICTS)
    if not floored:
        return verdicts, []
    return (
        {n: ("inactive" if n in floored else v) for n, v in verdicts.items()},
        floored,
    )


def _contiguous_newest_first(
    history: list[tuple[int, dict]]
) -> list[dict]:
    """History verdict dicts newest-first, truncated at the first GAP in
    round numbers (r12, r11 verdict finding #1): a driver round whose
    BENCH_r{N}.json is unparseable or whose recorded tail lost the
    query_verdicts block never reaches the history list, so without this
    check the folds below would treat the rounds on either side of it as
    adjacent and splice a streak across unknown history — the exact hole
    bench_imaging.consecutive_inactive closes by breaking on
    ``rnd != prev - 1``. Enforceable here for the same reason: history
    is keyed by round number. The newest recorded round is still taken
    as adjacent to the current run (the same assumption the imaging
    twin makes — bench.py cannot know its own round number)."""
    out: list[dict] = []
    prev: int | None = None
    for rnd, v in sorted(history, reverse=True):
        if prev is not None and rnd != prev - 1:
            break
        out.append(v)
        prev = rnd
    return out


def consecutive_inactive_queries(
    current: dict[str, str], history: list[tuple[int, dict]]
) -> dict[str, int]:
    """Streak length per currently-inactive query: 1 for this run plus
    the consecutive immediately-prior driver rounds that also recorded
    `inactive` for it. Any other verdict — ok, non-ok, no-pin, absent —
    breaks the walk, and so does a GAP in recorded round numbers
    (unknown or measured history never extends an unmeasured streak).
    Same fold shape as consecutive_non_ok; property coverage rides the
    same test style (tests/test_gate_properties.py)."""
    newest_first = _contiguous_newest_first(history)
    streaks: dict[str, int] = {}
    for name, v in current.items():
        if v != "inactive":
            continue
        n = 1
        for round_verdicts in newest_first:
            if round_verdicts.get(name) == "inactive":
                n += 1
            else:
                break
        streaks[name] = n
    return streaks


def consecutive_non_ok(
    current: dict[str, str], history: list[tuple[int, dict]]
) -> dict[str, int]:
    """Streak length per currently-non-ok query: 1 for this run plus the
    consecutive immediately-prior driver rounds whose verdict was also
    non-ok. `ok` resets the streak; an indeterminate verdict (`no-pin`,
    query absent from a round's record) BREAKS it — unknown history must
    never escalate — and so does a GAP in recorded round numbers (a
    round whose record never parsed is unknown history too; see
    _contiguous_newest_first). Queries whose current verdict is
    ok/no-pin are omitted (streak 0 by definition)."""
    newest_first = _contiguous_newest_first(history)
    streaks: dict[str, int] = {}
    for name, v in current.items():
        if v not in NON_OK_VERDICTS:
            continue
        n = 1
        for round_verdicts in newest_first:
            if round_verdicts.get(name) in NON_OK_VERDICTS:
                n += 1
            else:
                break
        streaks[name] = n
    return streaks


# The driver keeps only the last ~2000 characters of bench stdout and
# parses the final JSON line found there (verified against the r2-r4
# artifacts, which parsed, vs r5-r12, whose single line had grown past
# the window and recorded `parsed: null`). The contract line must
# therefore stay comfortably under this budget INCLUDING its newline.
CONTRACT_LINE_BUDGET = 1950


def contract_line(
    metric: str,
    value: float,
    queries: dict[str, float],
    sf: float,
    partial: bool = False,
) -> str:
    """The driver-contract JSON line: exactly the keys the round driver
    parses ({metric, value, unit, queries, sf}), compact separators, and
    per-query times rounded to 3 dp (falling to 2 dp only if the line
    would still overflow the driver's tail window — name count decides,
    not value magnitude). The full-resolution times always precede this
    line in the diagnostics object."""
    for nd in (3, 2, 1, 0):
        doc: dict = {
            "metric": metric,
            "value": round(value, 4),
            "unit": "sec",
            "queries": {
                k: (int(round(v)) if nd == 0 else round(v, nd))
                for k, v in queries.items()
            },
            "sf": sf,
        }
        if partial:
            doc["partial"] = True
        line = json.dumps(doc, separators=(",", ":"))
        if len(line) <= CONTRACT_LINE_BUDGET:
            return line
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.session import get_spark

    spark = get_spark("etl-mri-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Conf hygiene between queries (r8): the imaging query shrinks the
    # Arrow batch size at plan time (operators/pipeline.py volume-batch
    # guard) and the bench's noop write IS its terminal action — without
    # a restore here every later pandas-UDF query in the sweep would run
    # with 16-row Arrow batches. arrow_batch_restore is the shared guard
    # (one implementation, not three hand-rolled copies) and restores in
    # a finally: a query that RAISES after shrinking must not leak the
    # shrink into every later query of the sweep (r8 review). The
    # snapshot/restore sits OUTSIDE the timed region, so per-query times
    # are unaffected.
    from etl_mri_scripts_spark.operators.pipeline import arrow_batch_restore

    def run(name: str) -> float:
        with arrow_batch_restore(spark):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

    def clear_query_caches() -> None:
        # r14 (r13 verdict finding #3): drop every cached intermediate
        # BEFORE each query's run block, outside the timed region. The
        # dedup family persists shingle/signature tables per invocation
        # (CacheManager matches analyzed plans), so without this a
        # query's run 1 could inherit caches built by an EARLIER query's
        # runs and the sweep's storage footprint grew monotonically.
        # Within a block, runs 2..N still share run 1's caches — the
        # same warm-median statistic the pins were taken under (the
        # median of 5 is a warm run either way), so pin comparisons are
        # unaffected; only the cross-QUERY leakage is gone. Queries with
        # an internal materialization point (the CC/pagerank family)
        # release their caches in-query since r14 and are cold every
        # run by construction.
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 — hygiene must never kill a sweep
            pass

    def measure_aux() -> tuple[dict[str, float], dict[str, float], dict[str, str]]:
        """The census-promoted aux set (AUX_CPU_QUERIES), median-of-
        AUX_RUNS_PER_QUERY wall + system-wide user-cpu per query. Runs
        OUTSIDE the positional sentinel probes so it perturbs neither the
        noise normalization nor the memory gate."""
        a_times: dict[str, float] = {}
        a_cpu: dict[str, float] = {}
        a_errors: dict[str, str] = {}
        for name in AUX_CPU_QUERIES:
            if name not in QUERIES:
                a_errors[name] = "not registered"
                continue
            clear_query_caches()
            try:
                ws: list[float] = []
                cs: list[float] = []
                for _ in range(AUX_RUNS_PER_QUERY):
                    c0 = read_user_cpu_sec()
                    ws.append(run(name))
                    c1 = read_user_cpu_sec()
                    if c0 is not None and c1 is not None:
                        cs.append(round(c1 - c0, 4))
                a_times[name] = round(median(ws), 4)
                if cs:
                    a_cpu[name] = round(median(cs), 4)
            except Exception as exc:  # noqa: BLE001
                a_errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        return a_times, a_cpu, a_errors

    pin_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF_BASELINE.json"
    )

    if "--aux-only" in sys.argv:
        # Pin-protocol mode (pin_bench_baseline --aux-cpu-augment): only
        # the aux set, after the same session/JIT warmup the full bench
        # gives it — ~1.5 min instead of a full sweep per pin run.
        for warm in ("flagship_revenue_by_region_priority",):
            try:
                run(warm)
            except Exception:
                pass
        a_times, a_cpu, a_errors = measure_aux()
        out = {
            "metric": "aux_cpu_queries_only",
            "sf": sf,
            "aux_queries_sec": a_times,
            "aux_queries_cpu_user_sec": a_cpu,
        }
        if a_errors:
            out["aux_errors"] = a_errors
        print(json.dumps(out))
        spark.stop()
        return

    # Memory probe BEFORE the sweep (r12, r11 ADVICE): the sweep itself
    # is sustained touching and this host's lazy page backend self-warms
    # under it (bench_imaging r11: end probe 0.782 GB/s on a host that
    # was floored throughout), so a single post-sweep probe can read
    # healthy and leave false `regressed` verdicts standing — the exact
    # failure the exculpatory gate exists to prevent. The gate keys on
    # min(start, end), mirroring bench_census/bench_imaging.
    mem_probe_start = host_memory_probe()

    # warmup: touch every table + codegen paths once — INCLUDING one
    # unrecorded sentinel run. Without it the first noise probe carries
    # session/JIT warmup (r5: start probe 1.23 s vs mid/end 0.51/0.55 s)
    # and biases the noise factor; with it start/mid/end probes agree
    # within ~15% on an idle host.
    # the sentinel warms TWICE: its first ~3 post-warmup runs still decay
    # ~1.1 -> 0.8 s (measured r7) — residual JIT — and the start probe
    # should sample the settled distribution the mid/end probes see.
    for warm in ("flagship_revenue_by_region_priority", NOISE_SENTINEL, NOISE_SENTINEL):
        try:
            run(warm)
        except Exception:
            pass

    def read_cpu_stat() -> tuple[float, float]:
        # (total jiffies, steal jiffies) across all cpus; best-effort.
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()[1:]
            vals = [float(x) for x in parts]
            return sum(vals), vals[7] if len(vals) > 7 else 0.0
        except OSError:
            return 0.0, 0.0

    def probe_sentinel() -> float | None:
        try:
            return round(median(run(NOISE_SENTINEL) for _ in range(NOISE_PROBE_RUNS)), 4)
        except Exception:  # noqa: BLE001
            return None

    cpu_total0, cpu_steal0 = read_cpu_stat()
    probes: list[float | None] = [probe_sentinel()]

    # Crash-proof: one bad query must never zero the whole run — record the
    # error and keep timing the rest (round-1 postmortem).
    times: dict[str, float] = {}
    cpu_times: dict[str, float] = {}
    errors: dict[str, str] = {}
    budget_degraded: list[str] = []
    sweep_start = time.perf_counter()
    midpoint = len(HEADLINE) // 2
    for i, name in enumerate(HEADLINE):
        if i == midpoint:
            probes.append(probe_sentinel())
        if name not in QUERIES:
            errors[name] = "not registered"
            continue
        clear_query_caches()
        over_budget = time.perf_counter() - sweep_start > BUDGET_SECS
        n_runs = 2 if over_budget else RUNS_PER_QUERY
        try:
            samples: list[float] = []
            cpu_samples: list[float] = []
            for _ in range(n_runs):
                # Floor-insensitive cpu axis (r12): system-wide user+nice
                # CPU consumed by each sample — the statistic the memory
                # floor cannot inflate (read_user_cpu_sec docstring).
                # Same summary statistic as wall (median, min-of-2 when
                # budget-degraded) so pin comparisons stay like-for-like.
                c0 = read_user_cpu_sec()
                samples.append(run(name))
                c1 = read_user_cpu_sec()
                if c0 is not None and c1 is not None:
                    cpu_samples.append(round(c1 - c0, 4))
            times[name] = round(min(samples) if over_budget else median(samples), 4)
            if cpu_samples:
                cpu_times[name] = round(
                    min(cpu_samples) if over_budget else median(cpu_samples), 4
                )
            if over_budget:
                # min-of-2 is a DIFFERENT statistic from the pinned
                # median-of-5: biased low, so it can only mask a
                # regression, never fake one — but a masked regression is
                # still a silent gap, so the degraded queries are listed
                # in the output for the reader to discount.
                budget_degraded.append(name)
        except Exception as exc:  # noqa: BLE001 — harness must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    probes.append(probe_sentinel())
    cpu_total1, cpu_steal1 = read_cpu_stat()
    mem_probe_end = host_memory_probe()

    # Census-promoted aux set (r13, r12 verdict demand #5): measured
    # after the end probe so the positional normalization and memory
    # gate see exactly the sweep they always saw.
    aux_times, aux_cpu, aux_errors = measure_aux()

    # Noise factor = observed sentinel probe median / the SAME statistic
    # recorded during the pin runs (sentinel_probe_pin = median of the
    # pin runs' own start/mid/end probes). The statistic must match on
    # both sides: dividing a median probe by the baseline's
    # elementwise-best query time would report noise > 1 on an identical
    # idle host and let a real regression hide in the normalized total.
    # >1 means the host is slower than at pin time; divide totals by it
    # to compare code, not host weather. (pin_path is bound above, before
    # the --aux-only fork.)
    (
        sentinel_pin,
        median_run_pin,
        median_norm_pin,
        query_pins,
        query_pins_invalid,
    ) = load_pin_calibration(sf, HEADLINE, pin_path)
    good_probes = [p for p in probes if p is not None]
    noise_factor = (
        round(median(good_probes) / sentinel_pin, 4)
        if good_probes and sentinel_pin
        else None
    )
    d_total = cpu_total1 - cpu_total0
    steal_frac = round((cpu_steal1 - cpu_steal0) / d_total, 4) if d_total > 0 else None

    total = round(sum(times.values()), 4)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "noise": {
            "sentinel": NOISE_SENTINEL,
            "sentinel_pin": sentinel_pin,
            "probes_start_mid_end": probes,
            "factor": noise_factor,
            "steal_frac": steal_frac,
            # GATE key since r11 (memory_floor_verdicts below) — no
            # longer record-only: at this host's deepest floors the whole
            # relational sweep inflates too (census r11: 4.1x wall). The
            # key is the MIN of the pre-sweep and post-sweep probes (r12,
            # r11 ADVICE): the sweep is sustained touching, which
            # self-warms the lazy backend, so the post-sweep probe alone
            # can read healthy on a host that was floored throughout.
            "first_touch_gb_s": min(mem_probe_start, mem_probe_end),
            "first_touch_start_end": [mem_probe_start, mem_probe_end],
        },
    }
    # A normalized total from a run with errors covers FEWER queries than
    # the pin totals, so it must never be hand-compared against them as if
    # complete (r7 ADVICE): mark it partial and list what's missing.
    if cpu_times:
        # Always recorded (r12): the raw material for query_cpu_pins and
        # for the memory-floored cpu corroboration below. Same summary
        # statistic as `queries` (median of the in-run samples, min-of-2
        # when budget-degraded).
        out["queries_cpu_user_sec"] = cpu_times
    if aux_times:
        # Aux promotion set (r13): cpu-gated advisory only — see the
        # AUX_CPU_QUERIES comment for why these are not HEADLINE rows
        # yet. Wall times recorded for the forensic trail; the verdict
        # compares RAW cpu_user vs aux_query_cpu_pins under the
        # cpu-specific slack.
        out["aux_queries_sec"] = aux_times
        out["aux_queries_cpu_user_sec"] = aux_cpu
        try:
            with open(pin_path) as f:
                _pin_doc = json.load(f)
        except (OSError, ValueError):
            _pin_doc = {}
        aux_pins = _pin_doc.get("aux_query_cpu_pins")
        if isinstance(aux_pins, dict) and aux_pins and aux_cpu:
            out["aux_cpu_verdicts"] = query_verdicts(
                aux_cpu, aux_pins, slack_fn=cpu_noise_slack
            )
            if _pin_doc.get("aux_cpu_pin_provisional"):
                out["aux_cpu_pin_provisional"] = _pin_doc[
                    "aux_cpu_pin_provisional"
                ]
        else:
            out["aux_cpu_verdicts"] = {
                n: "no-pin" for n in aux_cpu
            } or {"note": "no aux cpu recorded"}
    if aux_errors:
        out["aux_errors"] = aux_errors
    if errors:
        out["partial"] = True
        out["partial_missing_queries"] = sorted(errors)
    if budget_degraded:
        # These queries were measured as min-of-2 after the soft budget
        # tripped — a low-biased statistic vs the pinned median-of-5, so
        # their `ok` verdicts can mask (never fake) a regression (r9).
        out["budget_degraded_queries"] = budget_degraded
    if noise_factor:
        normalized = round(total / noise_factor, 4)
        out["value_noise_normalized"] = normalized
        # vs-pin ratios only when every headline query produced a time:
        # the pin totals cover ALL queries, so a crashed heavy query would
        # shrink the live total and make the ratio read as an IMPROVEMENT
        # — a green signal masking a broken query (r7 review).
        if median_run_pin and not errors:
            out["noise"]["median_run_pin"] = median_run_pin
            out["value_noise_normalized_vs_median_pin"] = round(
                normalized / median_run_pin, 4
            )
    # Positional normalization (r7): each query divided by the host speed
    # interpolated at ITS sweep position — corrects the within-run warmup
    # drift a scalar factor misattributes. Compared against the pin runs'
    # own positionally-normalized median (same function, same pin).
    if sentinel_pin:
        per_q_norm = positional_normalize_queries(
            times, HEADLINE, probes, sentinel_pin
        )
        if per_q_norm is not None:
            out["value_positional_normalized"] = round(
                sum(per_q_norm.values()), 4
            )
            if median_norm_pin and not errors:
                out["noise"]["median_norm_pin"] = median_norm_pin
                out["value_positional_normalized_vs_pin"] = round(
                    out["value_positional_normalized"] / median_norm_pin, 4
                )
            # Per-query drift gate (r8): machine verdicts against the
            # pinned per-query median+spread. `regressed` names surface
            # top-level so a reviewer (and the judge) can't miss them.
            # The verdict keys are emitted EVEN when the gate can't run
            # (pre-r8 pin, headline-order mismatch): every verdict reads
            # `no-pin` and query_gate says why — a silently absent gate
            # would let "no regressed_queries key" be misread as "no
            # regressions" (r8 review).
            verdicts = query_verdicts(per_q_norm, query_pins or {})
            # Exculpatory memory-floor gate, extended from the imaging
            # bench (r11): at the r10 floor depth (0.05 GB/s first-touch)
            # the pooled-JVM relational bench measured unaffected — the
            # probe stayed record-only here. At this session's 0.005-0.01
            # the WHOLE sweep inflates (census 4.1x wall, self-check 2.2x
            # raw, with per-query ratios uncorrelated with plan shape),
            # so for a non-ok verdict kernel and host are
            # indistinguishable, while an ok under slower-only bias is
            # conservative evidence and stands. Non-ok verdicts on a
            # floored host are recorded as `inactive` (indeterminate):
            # not in NON_OK_VERDICTS, so they neither extend nor break
            # into non-ok streaks — and mirroring the imaging gate,
            # consecutive inactive rounds escalate at
            # ESCALATE_INACTIVE_AT so floored rounds can't accumulate
            # silently.
            mem = out["noise"]["first_touch_gb_s"]
            verdicts, floored = memory_floor_verdicts(verdicts, mem)
            if floored:
                out["memory_floored"] = {
                    "first_touch_gb_s": mem,
                    "floor_gb_s": MEM_FAULT_FLOOR_GB_S,
                    "inactive_queries": floored,
                    "note": (
                        "non-ok verdicts recorded as inactive: the "
                        "host's lazy page backend was below the "
                        "first-touch floor, so a slow query is not "
                        "evidence against the kernel; ok verdicts "
                        "stand (degraded memory only biases slower)"
                    ),
                }
                # CPU-axis corroboration (r12, r11 verdict demand #1):
                # adjudicate each floored query's RAW cpu_user time
                # against its cpu pin via the same verdict bands the
                # wall gate uses but under the cpu-specific slack
                # (r13, r12 ADVICE — the wall slack's 0.35 s absolute
                # floor over-forgave sub-second cpu pins).
                # Advisory-only — the wall verdict stays
                # `inactive` — but it gives the round a kernel signal
                # the floor cannot fake: extra user-CPU per query is a
                # real finding regardless of host memory
                # (FINDINGS_HOST_MEMORY.md has the getrusage evidence).
                cpu_pins = load_query_cpu_pins(pin_path)
                cpu_pin_prov = load_cpu_pin_provisional(pin_path)
                if cpu_pins:
                    cpu_v = query_verdicts(
                        {n: cpu_times[n] for n in floored if n in cpu_times},
                        cpu_pins,
                        slack_fn=cpu_noise_slack,
                    )
                    out["memory_floored"]["cpu_corroboration"] = cpu_v
                    if cpu_pin_prov:
                        out["memory_floored"]["cpu_pin_provisional"] = (
                            cpu_pin_prov
                        )
                    out["memory_floored"]["cpu_corroboration_note"] = (
                        "per floored query: RAW cpu_user seconds vs the "
                        "pinned cpu band (query_cpu_pins) under the "
                        "cpu-specific slack (cpu_noise_slack: relative-"
                        "only band, no 0.35 s wall floor — r13) — "
                        "ok/noise-band corroborates the kernel despite "
                        "the wall floor; regressed is a REAL finding "
                        "(the floor inflates stime/wall, never utime)"
                    )
                    cpu_regressed = sorted(
                        n for n, v in cpu_v.items() if v == "regressed"
                    )
                    if cpu_regressed:
                        out["cpu_regressed_queries"] = cpu_regressed
                        weather = cpu_weather_suspected(cpu_v)
                        if weather:
                            out["cpu_weather_suspected"] = weather
                        # r14 (r13 verdict finding #5): AUTOMATED solo
                        # re-sample of small-pin cpu regressions — the
                        # in-run version of the r13c/r13d/r13e hand
                        # adjudications (19 of 56 cpu pins are sub-1 s;
                        # host user-CPU inflation episodes fake-regress
                        # them). Each flagged query with a pin median
                        # under CPU_RESAMPLE_MAX_PIN_S is re-run
                        # CPU_RESAMPLE_RUNS times AFTER the sweep and
                        # adjudicated on the MIN re-sample: min-of-N is
                        # biased low, so it can only EXCULPATE a flag
                        # (an episode that ended), never fake one — a
                        # real kernel regression inflates every sample
                        # including the min. Original verdicts stand in
                        # cpu_corroboration; the resolved view is
                        # cpu_regressed_after_resample.
                        resample: dict[str, dict] = {}
                        still_regressed: list[str] = []
                        for rname in cpu_regressed:
                            pin = (cpu_pins or {}).get(rname) or {}
                            pmed = pin.get("median")
                            if (
                                pmed is None
                                or pmed >= CPU_RESAMPLE_MAX_PIN_S
                                or rname not in QUERIES
                            ):
                                still_regressed.append(rname)
                                continue
                            clear_query_caches()
                            try:
                                rs: list[float] = []
                                for _ in range(CPU_RESAMPLE_RUNS):
                                    rc0 = read_user_cpu_sec()
                                    run(rname)
                                    rc1 = read_user_cpu_sec()
                                    if rc0 is not None and rc1 is not None:
                                        rs.append(round(rc1 - rc0, 4))
                            except Exception as exc:  # noqa: BLE001
                                resample[rname] = {
                                    "error": f"{type(exc).__name__}: {exc}"[:200]
                                }
                                still_regressed.append(rname)
                                continue
                            if not rs:
                                still_regressed.append(rname)
                                continue
                            rv = query_verdicts(
                                {rname: min(rs)},
                                cpu_pins,
                                slack_fn=cpu_noise_slack,
                            )[rname]
                            resample[rname] = {
                                "samples": rs,
                                "min": min(rs),
                                "verdict_on_min": rv,
                            }
                            if rv == "regressed":
                                still_regressed.append(rname)
                        if resample:
                            out["cpu_regressed_resample"] = resample
                        out["cpu_regressed_after_resample"] = sorted(
                            still_regressed
                        )
            out["queries_normalized"] = per_q_norm
            out["query_verdicts"] = verdicts
            out["regressed_queries"] = sorted(
                n for n, v in verdicts.items() if v == "regressed"
            )
            out["host_tail_queries"] = sorted(
                n for n, v in verdicts.items() if v == "host-tail"
            )
            if query_pins_invalid:
                out["query_gate"] = f"inactive: {query_pins_invalid}"
            else:
                out["query_gate"] = "active"
                # Gate memory (r10): streaks across prior driver rounds;
                # >= ESCALATE_AT consecutive non-ok verdicts escalate from
                # "probably jitter" to "adjudicate it" (see the block
                # comment on ESCALATE_AT). Only computed under an active
                # gate — no-pin verdicts are indeterminate, not streaks.
                # History starts at the current pin's epoch (pin_round):
                # verdicts against a retired pin can't extend a streak
                # against this one — the re-pin IS the adjudication that
                # closed them (recorded in the pin's history.note).
                history = load_driver_verdict_history(
                    os.path.dirname(os.path.abspath(__file__)),
                    since_round=load_pin_round(pin_path),
                )
                streaks = consecutive_non_ok(verdicts, history)
                out["consecutive_non_ok"] = streaks
                out["escalation_queries"] = sorted(
                    n for n, k in streaks.items() if k >= ESCALATE_AT
                )
                if out["escalation_queries"]:
                    out["escalation_policy"] = ESCALATION_POLICY
                # Inactive streaks (r11): unmeasured rounds are a finding
                # too — a query that reads `inactive` in
                # ESCALATE_INACTIVE_AT consecutive driver rounds demands
                # a healthy-host measurement, mirroring the imaging
                # gate's consecutive_inactive.
                inactive_streaks = consecutive_inactive_queries(
                    verdicts, history
                )
                if inactive_streaks:
                    out["consecutive_inactive"] = inactive_streaks
                    esc = sorted(
                        n
                        for n, k in inactive_streaks.items()
                        if k >= ESCALATE_INACTIVE_AT
                    )
                    if esc:
                        out["escalation_inactive_queries"] = esc
                        out["escalation_inactive_policy"] = (
                            INACTIVE_ESCALATION_POLICY
                        )
                        # r12 third arm: a cpu-corroborated query HAS a
                        # kernel measurement this round — the escalation
                        # resolves in-file against the cpu axis plus the
                        # documented environment finding, instead of
                        # demanding a healthy host this sandbox may
                        # never provide.
                        cpu_v = (
                            out.get("memory_floored", {}) or {}
                        ).get("cpu_corroboration", {})
                        cpu_prov = (
                            out.get("memory_floored", {}) or {}
                        ).get("cpu_pin_provisional")

                        def _resolve(n: str) -> str:
                            v = cpu_v.get(n)
                            if v in ("ok", "noise-band"):
                                # A below-protocol pin cannot fully
                                # discharge the escalation (r13, r12
                                # ADVICE): its band lacks real
                                # spread/tail, so an in-band reading is
                                # weaker evidence — say so.
                                if cpu_prov:
                                    return (
                                        f"provisionally resolved: cpu-"
                                        f"corroborated {v} against a "
                                        f"BELOW-PROTOCOL cpu pin "
                                        f"(n_runs="
                                        f"{cpu_prov.get('n_runs')}); "
                                        "the escalation re-resolves "
                                        "when the pin reaches the 5-run "
                                        "protocol "
                                        "(FINDINGS_HOST_MEMORY.md)"
                                    )
                                return (
                                    f"resolved: cpu-corroborated {v} — "
                                    "the kernel was measured on the "
                                    "floor-insensitive axis this round "
                                    "(FINDINGS_HOST_MEMORY.md)"
                                )
                            if v == "regressed":
                                return (
                                    "NOT resolved: the cpu axis itself "
                                    "regressed — a real kernel finding, "
                                    "adjudicate with an interleaved A/B"
                                )
                            return (
                                f"cpu verdict {v or 'absent'}: "
                                "indeterminate — "
                                "FINDINGS_HOST_MEMORY.md is the standing "
                                "documented environment finding"
                            )

                        out["escalation_inactive_resolution"] = {
                            n: _resolve(n) for n in esc
                        }
    # The gate key must appear on EVERY path (r8 ADVICE): when the pin's
    # sf differs from the run, the pin file is unreadable, or the probes
    # failed, the normalized block above never runs and the output would
    # otherwise carry no query_gate at all — the exact silently-absent
    # ambiguity the in-block reasons exist to prevent.
    if "query_gate" not in out:
        out["query_gate"] = "inactive: " + (
            query_pins_invalid
            or "sentinel probes unavailable; cannot positionally normalize"
        )
    if errors:
        out["errors"] = errors
    # Diagnostics line first (full structure, 4-dp times — the "old
    # numbers" the optimization-round rules require keeping), then the
    # compact contract line LAST so the driver's ~2000-char tail window
    # always contains one complete, parseable JSON line (r13 fix; r5-r12
    # driver artifacts all read `parsed: null` because the diagnostics
    # had outgrown the window).
    print(json.dumps(out))
    print(contract_line(out["metric"], total, times, sf, partial=bool(errors)))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
