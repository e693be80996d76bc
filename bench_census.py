#!/usr/bin/env python
"""One-shot wall-time census of EVERY registered query at sf0.1
(r10, r9 verdict demand #3).

The per-round bench (bench.py) times the 51-query HEADLINE set under the
pinned drift gate; the other ~149 registered queries were plan-audited
(PLANS.md) and oracle-checked (CORRECTNESS/check_window) but had never
been TIMED — a query with a clean plan shape can still hide a
constant-factor problem (an expensive expression per row, an interpreted
higher-order function in the hot path). This census closes that blind
spot: single run per query, registry order, no gate and no pin — the
point is order-of-magnitude outliers, not regression tracking.

Flagging: a NON-headline query slower than the headline p95 (computed
from the pinned per-query medians in BENCH_SELF_BASELINE.json, the
stable statistic) is flagged and must carry an adjudication below —
either "inherent shape" (justified) or a pointer to the fix. Headline
queries are exempt: they are already measured 5x per round under the
drift gate. Single-run census times land ABOVE pinned medians on
average (they include each query's Catalyst compile, which the bench's
median-of-5 absorbs), so adjudications should compare against the
flagged query's own structure, not chase ±30% noise.

Adjudications live HERE (reviewable, versioned, survive re-runs):
a flagged query without an entry is listed as `unadjudicated` in the
output — the census is not done until that list is empty.

Usage: python bench_census.py [--out BENCH_CENSUS_r10.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# Adjudications for queries the census flags (> headline p95). Keys must
# name registered queries; values say WHY the cost is inherent (or cite
# the commit that fixed it). Reviewed per census run.
ADJUDICATIONS: dict[str, str] = {
    "dedup_pagerank_representatives": (
        "FIXED in r10 (the census's one real finding): the old form "
        "called dedup_connected_components() for component labels, "
        "re-running the whole LSH+verify pipeline a second time, and "
        "re-joined the static out-degree aggregate inside every power "
        "iteration — 11.8 s census. Now both iterative algorithms share "
        "one persisted edge list decorated with out-degree once. "
        "Adjudicated by interleaved ABAB A/B (BENCH_AB_PAGERANK_r10.json, "
        "the r9 recipe): new kernel 0.80x the old (7.91 vs 9.91 s "
        "median-of-medians, faster in all 3 interleaved rounds) — the "
        "flat census number was single-run host noise. The remainder is "
        "inherent: PR_ITERS=10 fixed-point passes, each one shuffle + "
        "eager lineage checkpoint — job-latency-bound at sf0.1, the "
        "scale-correct shape at 100 TB"
    ),
    "dedup_lsh_quality_eval": (
        "inherent: eval harness joining TWO different pipelines — the "
        "exact n-gram-Jaccard ground truth (the diagnostic pair query) "
        "and the LSH verified pairs — to score precision/recall; cost is "
        "the sum of both pipelines by construction (queries/dedup.py "
        "lsh_quality_eval)"
    ),
    "dedup_cluster_representatives": (
        "inherent: composition over dedup_connected_components (iterative "
        "CC, a gated headline query) plus one join + per-component window "
        "on cluster-sized groups; cost = CC + epsilon"
    ),
    "dedup_keep_best_quality": (
        "inherent: same composition as dedup_cluster_representatives with "
        "a quality ORDER BY — labels from the same iterative CC; the "
        "policy swap adds one documents join + window"
    ),
    "join_bucketed_colocated": (
        "inherent (demonstration cost): the census time is dominated by "
        "the one-time bucketed CTAS of orders+lineitem into the catalog — "
        "the layout the query exists to demonstrate; the join itself is "
        "exchange-free (PLANS.md: no shuffle before the 5-row rollup)"
    ),
    "dedup_triangle_count": (
        "inherent: LSH verified-pairs pipeline + the two-equi-join "
        "ordered-triangle enumeration over the persisted edge list; "
        "upstream LSH (~1.8 s warm) dominates"
    ),
    "dedup_rate_by_source": (
        "inherent: LSH verified-pairs pipeline + a documents join and "
        "per-source rollup; upstream LSH dominates"
    ),
    "dedup_split_leakage_matrix": (
        "inherent: LSH verified-pairs pipeline + split-pair crosstab; "
        "upstream LSH dominates"
    ),
    "dedup_ngram_jaccard_pairs_diagnostic": (
        "inherent: the exact-Jaccard pair pipeline verifies EVERY "
        "DF-capped shingle-join candidate (no LSH pre-filter — it IS the "
        "ground-truth side of the eval), keeping per-pair intersection "
        "sizes for diagnostics"
    ),
    "two_phase_robust_normalize": (
        "inherent: exact per-group percentiles then broadcast back over "
        "the fact table — the same exact-percentile shape as the gated "
        "headline agg_percentiles_exact (1.8 s pin); census single-run "
        "adds its compile"
    ),
    "agg_median_abs_deviation": (
        "inherent: MAD chains two exact-median aggregations (median, then "
        "median of absolute deviations) — two full per-group sorts by "
        "definition; each is the audited one-buffer percentile aggregate"
    ),
    "dedup_minhash_signatures": (
        "inherent: the N_MINHASH signature computation over every "
        "document — the shared base cost of the whole minhash family; "
        "single projection + agg, no join"
    ),
    "customer_rfm_segments": (
        "inherent: three deterministic NTILE quartile scores = three "
        "range-partitioned global sorts of the customer-grain frame "
        "(operators/rank.py two-phase scheme — never a single-partition "
        "window); 0.27 s above the p95 threshold"
    ),
    "ann_pq_adc_topk": (
        "inherent: per-subspace PQ codebook training (bounded-sample "
        "Lloyd, driver-side K x dim only) + Arrow-batched ADC scan — the "
        "sibling kernel of the gated headline ann_ivf_pq_topk (2.7 s "
        "pin); 0.11 s above the p95 threshold"
    ),
    "dedup_simhash_16bit": (
        "inherent: simhash over every document + 16-bit bucket self-join; "
        "0.02 s above the p95 threshold — at the measurement floor"
    ),
    "key_build_and_normalize": (
        "inherent (threshold-straddling jitter): 1.79 s in the first r10 "
        "census sweep, 2.14 s in the recorded one vs a 2.127 threshold. "
        "The plan is already the optimized shape — groups on the five "
        "narrow key COMPONENTS and runs format_string + the normalization "
        "regex once per distinct key, not per input row"
    ),
}


# Quantitative bounds on host absolution (r13; r12 ADVICE + verdict
# demand #2). Wall: floored-to-floored per-query census ratios measured
# r11->r12 span 0.04-8.58x (host-absolved flags themselves up to 6.83x),
# so the wall bound can only be a coarse ceiling — it exists to stop
# "arbitrarily slower every round" from chaining forever, not to catch a
# 2x regression. CPU: once a prior census carries queries_cpu_user_sec
# (r13+), a host-absolved flag's single-run cpu must be non-regressed vs
# that record — the floor-insensitive check with real teeth. The cpu
# tolerance is generous because census cpu is single-run WITH each
# query's Catalyst compile (driver-side user cpu): 1.5x + 1.0 s absorbs
# compile and sampling jitter while still refusing the >=2x structural
# costs the census exists to catch; tighten once several census cpu
# records exist to calibrate from.
CENSUS_CHAIN_WALL_MAX_X = 10.0
CENSUS_CPU_CHAIN_REL = 1.5
CENSUS_CPU_CHAIN_ABS_S = 1.0


def _census_round(path: str) -> int | None:
    m = re.search(r"BENCH_CENSUS_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else None


def _prior_censuses(prev_path: str) -> list[str]:
    """Census files at or before ``prev_path``'s round, newest first —
    the search space for healthy anchors and prior cpu records."""
    rnd = _census_round(prev_path)
    if rnd is None:
        return [prev_path]
    import glob

    out = []
    for fn in glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(prev_path)) or HERE, "BENCH_CENSUS_r*.json")):
        r = _census_round(fn)
        if r is not None and r <= rnd:
            out.append((r, fn))
    return [fn for _, fn in sorted(out, reverse=True)]


def find_healthy_anchor(name: str, prev_path: str):
    """The most recent NON-floored census at/before prev that timed
    ``name`` — the actual evidence anchor a chained absolution rests on
    (r13, r12 ADVICE: the chained message claimed the healthy census was
    'named there' while only naming the immediate previous file).
    Returns ``(basename, time_sec, threshold_sec)`` or None."""
    for fn in _prior_censuses(prev_path):
        try:
            with open(fn) as f:
                c = json.load(f)
        except (OSError, ValueError):
            continue
        if c.get("host_floored"):
            continue
        t = (c.get("queries") or {}).get(name)
        if t is not None:
            return os.path.basename(fn), t, c.get("threshold_sec")
    return None


def find_prior_cpu(name: str, prev_path: str):
    """The most recent census at/before prev carrying a cpu record for
    ``name`` (``queries_cpu_user_sec``, r13+). Returns
    ``(basename, cpu_sec)`` or None. Valid on floored censuses too —
    user-cpu is the floor-insensitive statistic
    (FINDINGS_HOST_MEMORY.md)."""
    for fn in _prior_censuses(prev_path):
        try:
            with open(fn) as f:
                c = json.load(f)
        except (OSError, ValueError):
            continue
        cpu = (c.get("queries_cpu_user_sec") or {}).get(name)
        if cpu is not None:
            return os.path.basename(fn), cpu
    return None


def host_inflation_adjudications(
    flagged: list[str],
    prev_path: str,
    times: dict[str, float] | None = None,
    cpu_times: dict[str, float] | None = None,
) -> tuple[dict[str, str], dict[str, str]]:
    """Auto-adjudications for a memory-floored sweep (r11): on a host
    whose first-touch throughput is below bench.MEM_FAULT_FLOOR_GB_S the
    WHOLE census inflates (measured r11: 945 s wall vs 229.7 r10, 4.1x,
    with sentinel queries 2.7-60x their prior rows and uncorrelated
    magnitudes — host weather, not structure). A flag whose query ran
    UNDER the previous census's threshold is attributed to the host and
    deferred to a healthy-host census; a query that was flagged (or
    absent) in the previous census too stays unadjudicated — the floor
    must never absolve a genuinely new structural cost. Callers must
    separately confirm the query's code is unchanged since the previous
    census (the round rotation's re-check list is that record).

    CHAINED absolution (r12): consecutive floored censuses would
    otherwise trap every once-host-flagged query forever — its
    prev-census time is over the prev threshold *because that census
    was floored too*, so the clean-before rule can never fire again
    even though the prev census's own adjudication already attributed
    the flag to the host. A flag whose prev-census adjudication is
    itself a host-inflation absolution therefore chains: the evidence
    anchor is the last HEALTHY census (resolved by walking the census
    files, NAMED with its recorded time — r13, r12 ADVICE), and the
    chain still breaks for genuinely new costs (a query flagged in the
    prev census WITHOUT a host adjudication — structurally slow, or
    manually adjudicated as inherent — does not chain).

    BOUNDED absolution (r13; r12 ADVICE + verdict demand #2): every
    host absolution — fresh or chained — must now clear two
    quantitative checks before it lands, otherwise the flag is REFUSED
    absolution and returned in the second dict (landing in
    ``unadjudicated`` — a real finding to investigate, not weather):

    1. CPU non-regression: once any prior census carries a cpu record
       for the query (``queries_cpu_user_sec``, r13+), the current
       single-run cpu must be within CENSUS_CPU_CHAIN_REL x prior
       + CENSUS_CPU_CHAIN_ABS_S — the floor cannot inflate user-cpu,
       so a cpu regression is kernel evidence no absolution may
       override.
    2. Wall ceiling (chained path only): the current time must be
       within CENSUS_CHAIN_WALL_MAX_X of the prev floored time — a
       coarse stop on drifting arbitrarily slower across consecutive
       floored censuses (measured floored-to-floored jitter reaches
       8.6x, so only order-of-magnitude drift trips this).

    Returns ``(adjudications, refused)``."""
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        return {}, {}
    prev_times, prev_th = prev.get("queries", {}), prev.get("threshold_sec")
    if not prev_times or prev_th is None:
        return {}, {}
    prev_adjud = prev.get("adjudications", {}) or {}
    times = times or {}
    cpu_times = cpu_times or {}
    out: dict[str, str] = {}
    refused: dict[str, str] = {}

    def cpu_check(n: str) -> str | None:
        """None = passes (or no prior record); else the refusal text."""
        prior = find_prior_cpu(n, prev_path)
        if prior is None:
            return None
        src, cpu_prev = prior
        cpu_now = cpu_times.get(n)
        if cpu_now is None:
            return (
                f"cpu record exists ({cpu_prev}s in {src}) but this "
                "sweep recorded no cpu for the query — absolution "
                "requires the floor-insensitive check once it is "
                "available"
            )
        bound = CENSUS_CPU_CHAIN_REL * cpu_prev + CENSUS_CPU_CHAIN_ABS_S
        if cpu_now > bound:
            return (
                f"cpu REGRESSED: {cpu_now}s user-cpu vs {cpu_prev}s in "
                f"{src} (bound {round(bound, 2)}s = "
                f"{CENSUS_CPU_CHAIN_REL}x + {CENSUS_CPU_CHAIN_ABS_S}s) "
                "— the memory floor cannot explain extra user-cpu; "
                "investigate as a real kernel finding"
            )
        return None

    for n in flagged:
        t_prev = prev_times.get(n)
        chained = str(prev_adjud.get(n, "")).startswith("host-inflated")
        if not ((t_prev is not None and t_prev <= prev_th) or chained):
            continue  # not absolution-eligible; stays unadjudicated
        cpu_refusal = cpu_check(n)
        if cpu_refusal:
            refused[n] = f"host absolution refused: {cpu_refusal}"
            continue
        cpu_prior = find_prior_cpu(n, prev_path)
        cpu_cite = ""
        if cpu_prior and cpu_times.get(n) is not None:
            cpu_cite = (
                f" CPU corroborates: {cpu_times[n]}s user-cpu vs "
                f"{cpu_prior[1]}s in {cpu_prior[0]} (non-regressed, the "
                "floor-insensitive axis)."
            )
        if t_prev is not None and t_prev <= prev_th:
            out[n] = (
                f"host-inflated (memory-floored sweep): this query ran "
                f"{t_prev}s in {os.path.basename(prev_path)} — under that "
                f"census's {prev_th}s threshold — with no code change "
                f"since; the flag is the host's lazy page backend, not "
                f"the plan.{cpu_cite} Deferred to a healthy-host census."
            )
        else:
            t_now = times.get(n)
            if (
                t_now is not None
                and t_prev
                and t_now > CENSUS_CHAIN_WALL_MAX_X * t_prev
            ):
                refused[n] = (
                    f"host absolution refused: {t_now}s is more than "
                    f"{CENSUS_CHAIN_WALL_MAX_X}x the prev floored time "
                    f"{t_prev}s — beyond every measured floored-to-"
                    "floored jitter (max 8.6x); a chained absolution "
                    "may not cover order-of-magnitude drift"
                )
                continue
            anchor = find_healthy_anchor(n, prev_path)
            anchor_cite = (
                f"anchored on the last healthy census: {anchor[1]}s in "
                f"{anchor[0]} (threshold {anchor[2]}s)"
                if anchor
                else "no healthy census has timed this query yet — the "
                "chain rests on the prev adjudication alone"
            )
            out[n] = (
                f"host-inflated (chained): flagged at {t_prev}s in "
                f"{os.path.basename(prev_path)}, where its own "
                "adjudication already attributed the flag to the "
                f"memory-floored host; {anchor_cite}; within "
                f"{CENSUS_CHAIN_WALL_MAX_X}x of the prev floored time; "
                f"no code change since.{cpu_cite} Deferred to a "
                "healthy-host census."
            )
    return out, refused


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument(
        "--prev",
        default=None,
        help="previous census JSON: enables host-inflation auto-"
        "adjudication when the sweep ran on a memory-floored host",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import bench
    from etl_mri_scripts_spark.operators.pipeline import arrow_batch_restore
    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.session import get_spark

    spark = get_spark("etl-mri-spark-census")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> tuple[float, float | None]:
        """(wall_sec, cpu_user_sec) for one query. CPU is the system-wide
        /proc/stat user+nice delta (bench.read_user_cpu_sec) — valid
        because the census runs queries strictly serially on an otherwise
        quiet host; it is the floor-insensitive axis the adjudications
        consult (r13, r12 verdict demand #2)."""
        with arrow_batch_restore(spark):
            c0 = bench.read_user_cpu_sec()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            c1 = bench.read_user_cpu_sec()
            cpu = (
                round(c1 - c0, 2)
                if c0 is not None and c1 is not None and c1 > c0
                else None
            )
            return wall, cpu

    # Headline p95 from the PIN medians (stable, statistic-documented);
    # fall back to the verdict's 2.5 s yardstick when no pin matches.
    threshold = 2.5
    threshold_src = "fallback 2.5 s (no sf-matched pin)"
    try:
        with open(os.path.join(HERE, "BENCH_SELF_BASELINE.json")) as f:
            pin = json.load(f)
        if pin.get("sf") == sf and pin.get("query_pins"):
            meds = sorted(
                p["median"] for p in pin["query_pins"].values()
                if p.get("median") is not None
            )
            threshold = round(meds[min(len(meds) - 1, int(0.95 * len(meds)))], 4)
            threshold_src = (
                f"p95 of the {len(meds)} pinned headline per-query medians"
            )
    except (OSError, ValueError):
        pass

    # one warmup absorbs session/JIT startup so the first census row isn't
    # charged for it (same reasoning as bench.py's warmup)
    try:
        run("flagship_revenue_by_region_priority")
    except Exception:
        pass

    headline = set(bench.HEADLINE)
    times: dict[str, float] = {}
    cpu_times: dict[str, float] = {}
    errors: dict[str, str] = {}
    mem_start = bench.host_memory_probe()
    t_census = time.perf_counter()
    for name in QUERIES:
        try:
            wall, cpu = run(name)
            times[name] = round(wall, 4)
            if cpu is not None:
                cpu_times[name] = cpu
        except Exception as exc:  # noqa: BLE001 — census must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        spark.catalog.clearCache()
    mem_end = bench.host_memory_probe()

    flagged = sorted(
        (n for n, t in times.items() if t > threshold and n not in headline),
        key=lambda n: -times[n],
    )
    slow_headline = sorted(
        (n for n, t in times.items() if t > threshold and n in headline),
        key=lambda n: -times[n],
    )
    out = {
        "metric": "full_registry_census_single_run",
        "unit": "sec",
        "sf": sf,
        "n_queries": len(times),
        "census_wall_sec": round(time.perf_counter() - t_census, 1),
        "threshold_sec": threshold,
        "threshold_source": threshold_src,
        "flagged": {n: times[n] for n in flagged},
        "first_touch_gb_s": min(mem_start, mem_end),
        "first_touch_start_end": [mem_start, mem_end],
    }
    adjud = {n: ADJUDICATIONS[n] for n in flagged if n in ADJUDICATIONS}
    # host_floored is set whenever the probe is below the floor (r12, r11
    # ADVICE): the "artifact says loudly that the host was floored"
    # contract must not depend on --prev being supplied; only the
    # auto-adjudication needs a previous census to compare against.
    if out["first_touch_gb_s"] < bench.MEM_FAULT_FLOOR_GB_S:
        out["host_floored"] = True
        if args.prev:
            auto, refused = host_inflation_adjudications(
                flagged, args.prev, times=times, cpu_times=cpu_times
            )
            adjud.update({n: v for n, v in auto.items() if n not in adjud})
            if refused:
                # Refusals land in `unadjudicated` (no entry in adjud) —
                # surfaced with their evidence so the census isn't done
                # until each is investigated as a real finding.
                out["host_absolution_refused"] = refused
    out |= {
        "adjudications": adjud,
        "unadjudicated": [n for n in flagged if n not in adjud],
        "slow_headline_already_gated": {n: times[n] for n in slow_headline},
        # the top flagged queries are the natural additions to HEADLINE at
        # the next re-pin (the r4 precedent: the three slowest registry
        # queries were invisible to the gate until benched)
        "headline_promotion_candidates": flagged[:5],
        "caveat": (
            "single-run times include each query's Catalyst compile; the "
            "bench's pinned medians-of-5 do not — expect census > pin for "
            "headline queries. This file is a coverage census, not a "
            "regression gate."
        ),
        "queries": times,
        # Per-query user-cpu (r13, r12 verdict demand #2): the census
        # tail's floor-insensitive signal. Future floored censuses must
        # cite a non-regressed cpu vs this record before host-absolving
        # a flag (host_inflation_adjudications.cpu_check).
        "queries_cpu_user_sec": cpu_times,
    }
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
