#!/usr/bin/env python
"""Re-pin BENCH_SELF_BASELINE.json from N fresh bench.py runs (default 5).

Encodes the pin protocol that was previously ad hoc (r5/r6 pins were
assembled by hand), so every statistic in the baseline is derived by the
same code path a reviewer can re-run:

- ``value``                 elementwise best: sum over queries of the
                            per-query MIN across runs (diagnostic only —
                            unattainable in any single run)
- ``value_median_of_runs``  median of the runs' raw totals
- ``sentinel_probe_pin``    median over runs of each run's
                            median(probes_start_mid_end) — the exact
                            statistic a live bench run reports
- ``value_median_of_runs_normalized``
                            median of the runs' POSITIONALLY normalized
                            totals, computed by bench.positional_normalize
                            with the final sentinel_probe_pin — the
                            statistic-matched yardstick for a live run's
                            ``value_positional_normalized`` (r7: within-run
                            warmup drift makes a scalar factor misattribute
                            early-sweep slowness; see bench.py
                            NOISE_PROBE_RUNS / positional_factors notes)
- ``query_pins``            per-query median + outlier-trimmed spread +
                            tail (worst recorded excursion) of the
                            positionally-normalized times across pin runs
                            — feeds bench.query_verdicts, the per-query
                            drift gate (r8: machine-adjudicated ok /
                            noise-band / host-tail / regressed instead of
                            eyeballing sub-second host-noise excursions)

Usage: python pin_bench_baseline.py [--runs 5] [--note "..."] [--recompute]
Writes BENCH_SELF_BASELINE.json; the previous pin's headline numbers are
preserved under ``history``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
from statistics import median

HERE = os.path.dirname(os.path.abspath(__file__))


def parse_bench_stdout(stdout: str) -> dict:
    """Locate the DIAGNOSTICS object in bench.py stdout. Since r13
    bench.py prints two JSON lines — full diagnostics first, then the
    compact driver-contract line last (sized for the driver's ~2000-char
    tail window) — so the last line no longer carries the noise block /
    cpu axis this tool pins. Walk the lines from the end and return the
    first object with a diagnostics marker ('noise' for a full sweep,
    'aux_queries_cpu_user_sec' for --aux-only); fall back to the last
    parseable object (pre-r13 single-line output)."""
    fallback: dict | None = None
    for ln in reversed(stdout.strip().splitlines()):
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            doc = json.loads(ln)
        except ValueError:
            continue
        if not isinstance(doc, dict):
            continue
        if "noise" in doc or "aux_queries_cpu_user_sec" in doc:
            return doc
        if fallback is None:
            fallback = doc
    if fallback is None:
        raise ValueError("no JSON object found in bench.py stdout")
    return fallback

CPU_PIN_NOTE = (
    "query_cpu_pins pin the floor-INSENSITIVE auxiliary statistic: each "
    "query's RAW system-wide user+nice CPU seconds per sample "
    "(bench.read_user_cpu_sec; median of the in-run samples, matching "
    "queries_cpu_user_sec). No positional normalization — host weather "
    "is exactly what the statistic is insensitive to (measured r12, "
    "FINDINGS_HOST_MEMORY.md: the lazy page backend's fault cost lands "
    "in stime/off-CPU, never utime), which is also why these MAY be "
    "pinned on a memory-floored host. bench.py consults them "
    "advisory-only, for the cpu_corroboration of memory-floored "
    "verdicts; they never replace the wall-side query_pins."
)


def derive_query_cpu_pins(
    run_cpu: list[dict[str, float]]
) -> dict[str, dict] | None:
    """Per-query {median, spread, tail} over the RAW cpu_user seconds
    across pin runs — the same trim/tail recipe as the wall-side
    query_pins so bench.query_verdicts adjudicates both axes with one
    band algebra. None when any run lacks the cpu record entirely (an
    axis pinned from fewer runs than the wall stats would compare a
    live run against a different population)."""
    if not run_cpu or any(not rc for rc in run_cpu):
        return None
    names = sorted({n for rc in run_cpu for n in rc})
    pins: dict[str, dict] = {}
    for n in names:
        samples = sorted(rc[n] for rc in run_cpu if n in rc)
        if not samples:
            continue
        med_all = median(samples)
        trimmed = samples[1:-1] if len(samples) >= 4 else samples
        pins[n] = {
            "median": round(median(trimmed), 4),
            "spread": round(trimmed[-1] - trimmed[0], 4),
            "tail": round(max(samples[-1] - med_all, 0.0), 4),
        }
    return pins or None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--note", default="")
    ap.add_argument("--out", default=os.path.join(HERE, "BENCH_SELF_BASELINE.json"))
    ap.add_argument(
        "--pin-round",
        type=int,
        default=None,
        help=(
            "the build round during which this pin is created — bench.py "
            "starts its streak history (gate memory) at this round, so "
            "verdicts recorded against the RETIRED pin can't extend a "
            "streak against this one. Default: latest BENCH_r{N}.json "
            "round + 1 (the round in progress — a pin lands before that "
            "round's driver bench runs). --recompute carries the existing "
            "pin_round through unchanged: re-deriving statistics from the "
            "same recorded runs is not a new pin epoch."
        ),
    )
    ap.add_argument(
        "--cpu-augment",
        action="store_true",
        help=(
            "run bench.py --runs times and merge ONLY the cpu-axis pins "
            "(query_cpu_pins over each run's queries_cpu_user_sec) into "
            "the existing baseline, leaving every wall statistic "
            "untouched. Allowed on a memory-floored host — the cpu "
            "statistic is floor-insensitive (CPU_PIN_NOTE) — which is "
            "why this path exists: wall re-pins are refused there."
        ),
    )
    ap.add_argument(
        "--aux-cpu-augment",
        action="store_true",
        help=(
            "run `bench.py --aux-only` --runs times and merge ONLY the "
            "aux-set cpu pins (aux_query_cpu_pins over each run's "
            "aux_queries_cpu_user_sec) into the existing baseline — the "
            "census promotion path (r13): the five census outliers get "
            "floor-insensitive cpu bands now, wall pins when a healthy "
            "host permits the full HEADLINE re-pin. Allowed on a "
            "memory-floored host for the same reason as --cpu-augment."
        ),
    )
    ap.add_argument(
        "--allow-fewer-runs",
        action="store_true",
        help=(
            "with --cpu-augment: accept fewer than 5 runs, stamping the "
            "pin PROVISIONAL (cpu_pin_provisional) with the run count and "
            "the --note as rationale — mirroring pin_imaging_baseline "
            "(r13, r12 ADVICE: '--cpu-augment --runs 1' previously "
            "recorded zero-spread/zero-tail query_cpu_pins silently "
            "indistinguishable from full-protocol pins). The first "
            "session that can afford it must re-augment at full protocol."
        ),
    )
    ap.add_argument(
        "--recompute",
        action="store_true",
        help=(
            "re-derive every pinned statistic from the raw per-run data "
            "already recorded in the pin file (run_queries / noise_at_pin "
            "/ run_totals) instead of running bench.py again — for "
            "statistic-formula changes that don't need new measurement. "
            "The pin stays reproducible: the recorded runs are the "
            "measurement, this script is the derivation."
        ),
    )
    args = ap.parse_args()

    sys.path.insert(0, HERE)
    from bench import HEADLINE, positional_normalize_queries

    def latest_driver_round() -> int | None:
        rounds = [
            int(m.group(1))
            for fn in glob.glob(os.path.join(HERE, "BENCH_r*.json"))
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(fn)))
        ]
        return max(rounds) if rounds else None

    runs: list[dict] = []
    prev_pin = None
    if args.aux_cpu_augment:
        try:
            with open(args.out) as f:
                pin = json.load(f)
        except (OSError, ValueError):
            print("--aux-cpu-augment needs an existing baseline to merge "
                  "into; take a full pin first", file=sys.stderr)
            return 1
        if args.runs < 5 and not args.allow_fewer_runs:
            print("r9 protocol requires >= 5 runs; pass --allow-fewer-"
                  "runs to record a PROVISIONAL pin with rationale",
                  file=sys.stderr)
            return 1
        if args.allow_fewer_runs and not args.note:
            print("--allow-fewer-runs demands a --note rationale",
                  file=sys.stderr)
            return 1
        from bench import AUX_CPU_QUERIES

        aux_records: list[dict] = []
        for i in range(args.runs):
            print(f"aux-cpu run {i + 1}/{args.runs} ...",
                  file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench.py"),
                 "--aux-only"],
                capture_output=True, text=True, check=True, cwd=HERE,
            )
            run = parse_bench_stdout(proc.stdout)
            if run.get("aux_errors"):
                print(f"run {i + 1} had errors: {run['aux_errors']}",
                      file=sys.stderr)
                return 1
            if run.get("sf") != pin.get("sf"):
                print(f"run sf {run.get('sf')} differs from pin sf "
                      f"{pin.get('sf')}", file=sys.stderr)
                return 1
            cpu = run.get("aux_queries_cpu_user_sec") or {}
            if set(cpu) != set(AUX_CPU_QUERIES):
                print(f"run {i + 1} cpu record covers {sorted(cpu)} — "
                      f"expected exactly {AUX_CPU_QUERIES}",
                      file=sys.stderr)
                return 1
            aux_records.append(cpu)
            print(f"  aux_cpu={json.dumps(cpu)}", file=sys.stderr,
                  flush=True)
        aux_pins = derive_query_cpu_pins(aux_records)
        if aux_pins is None:
            print("aux cpu records incomplete; not pinning",
                  file=sys.stderr)
            return 1
        pin["aux_query_cpu_pins"] = aux_pins
        pin["aux_cpu_pin_note"] = (
            "Floor-insensitive cpu bands for the census-promoted aux set "
            "(bench.AUX_CPU_QUERIES): RAW system-wide cpu_user seconds, "
            "median-of-3 per run, pinned with the same trim/tail recipe "
            "as query_cpu_pins from "
            f"{len(aux_records)} dedicated `bench.py --aux-only` runs"
            + (f" ({args.note})" if args.note else "")
            + ". Wall pins deferred to the first healthy-host HEADLINE "
            "re-pin (positional normalization forbids mid-list "
            "insertions)."
        )
        if len(aux_records) < 5:
            pin["aux_cpu_pin_provisional"] = {
                "n_runs": len(aux_records),
                "rationale": args.note,
                "obligation": (
                    "below the 5-run protocol; re-augment at full "
                    "protocol in the first session that can afford it"
                ),
            }
        else:
            pin.pop("aux_cpu_pin_provisional", None)
        pin["run_aux_queries_cpu"] = aux_records
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pin, f, indent=1)
        os.replace(tmp, args.out)
        print(json.dumps({"aux_query_cpu_pins": aux_pins}))
        return 0
    if args.cpu_augment:
        try:
            with open(args.out) as f:
                pin = json.load(f)
        except (OSError, ValueError):
            print("--cpu-augment needs an existing baseline to merge "
                  "into; take a full pin first", file=sys.stderr)
            return 1
        if pin.get("headline") != list(HEADLINE):
            print("pin headline order differs from live HEADLINE — the "
                  "cpu pins would cover a different query set than the "
                  "wall pins; re-pin fully instead", file=sys.stderr)
            return 1
        # r9 protocol guard, mirrored from pin_imaging_baseline (r13,
        # r12 ADVICE): spread/tail need >= 5 runs for the trim to mean
        # anything; fewer is only accepted explicitly, with rationale,
        # and leaves a machine-readable provisional marker.
        if args.runs < 5 and not args.allow_fewer_runs:
            print("r9 protocol requires >= 5 runs (spread/tail need the "
                  "trim to mean anything); pass --allow-fewer-runs to "
                  "record a PROVISIONAL pin with rationale",
                  file=sys.stderr)
            return 1
        if args.allow_fewer_runs and not args.note:
            print("--allow-fewer-runs demands a --note rationale",
                  file=sys.stderr)
            return 1
        cpu_records: list[dict] = []
        for i in range(args.runs):
            print(f"cpu-augment run {i + 1}/{args.runs} ...",
                  file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench.py")],
                capture_output=True, text=True, check=True, cwd=HERE,
            )
            run = parse_bench_stdout(proc.stdout)
            if run.get("errors"):
                print(f"run {i + 1} had errors: {run['errors']}",
                      file=sys.stderr)
                return 1
            if run.get("sf") != pin.get("sf"):
                print(f"run sf {run.get('sf')} differs from pin sf "
                      f"{pin.get('sf')}", file=sys.stderr)
                return 1
            if not run.get("queries_cpu_user_sec"):
                print(f"run {i + 1} carries no queries_cpu_user_sec "
                      "(unreadable /proc?) — cannot pin the cpu axis",
                      file=sys.stderr)
                return 1
            cpu_records.append(run["queries_cpu_user_sec"])
            print(f"  total={run['value']}s "
                  f"cpu_total={round(sum(run['queries_cpu_user_sec'].values()), 2)}s "
                  f"first_touch={run['noise'].get('first_touch_gb_s')}GB/s",
                  file=sys.stderr, flush=True)
        cpu_pins = derive_query_cpu_pins(cpu_records)
        if cpu_pins is None:
            print("cpu records incomplete; not pinning", file=sys.stderr)
            return 1
        pin["query_cpu_pins"] = cpu_pins
        pin["cpu_pin_note"] = CPU_PIN_NOTE + (
            f" Augmented from {len(cpu_records)} dedicated runs"
            + (f" ({args.note})" if args.note else "")
            + "; wall statistics untouched."
        )
        if len(cpu_records) < 5:
            pin["cpu_pin_provisional"] = {
                "n_runs": len(cpu_records),
                "rationale": args.note,
                "obligation": (
                    "below the 5-run protocol: spread/tail are untrimmed "
                    "(n<4 uses all samples; n=1 pins zero spread/tail, "
                    "leaving only the cpu noise slack as the band). The "
                    "first session that can afford it must re-augment at "
                    "full protocol; until then treat cpu verdicts from "
                    "this pin as provisional."
                ),
            }
        else:
            pin.pop("cpu_pin_provisional", None)
        pin["run_queries_cpu"] = cpu_records
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pin, f, indent=1)
        os.replace(tmp, args.out)
        print(json.dumps({
            "query_cpu_pins": len(cpu_pins),
            "cpu_total_median": round(
                median(sum(rc.values()) for rc in cpu_records), 2
            ),
        }))
        return 0

    if args.recompute:
        with open(args.out) as f:
            prev_pin = json.load(f)
        # Guards BEFORE touching the raw-run keys: a pre-r8 or
        # hand-assembled pin without them must hit the designed error
        # message, not a KeyError traceback (r8 review).
        if prev_pin.get("headline") != list(HEADLINE):
            print("recorded headline differs from live HEADLINE; the raw "
                  "runs are not recomputable against this code — re-run "
                  "the pin instead", file=sys.stderr)
            return 1
        missing = [k for k in ("run_queries", "noise_at_pin", "run_totals")
                   if k not in prev_pin]
        if missing:
            print(f"pin lacks raw per-run data {missing}; nothing to "
                  "recompute from — re-run the pin instead", file=sys.stderr)
            return 1
        if len({len(prev_pin["run_queries"]), len(prev_pin["noise_at_pin"]),
                len(prev_pin["run_totals"])}) != 1:
            # a silently-truncating zip would derive a self-consistent-
            # looking pin from a SUBSET of the runs (r8 review)
            print("pin's raw per-run arrays disagree in length; refusing "
                  "to recompute from inconsistent data", file=sys.stderr)
            return 1
        for q, n, t in zip(
            prev_pin["run_queries"], prev_pin["noise_at_pin"], prev_pin["run_totals"]
        ):
            runs.append(
                {"queries": q, "noise": n, "value": t, "sf": prev_pin["sf"]}
            )
        print(f"recomputing statistics from {len(runs)} recorded runs",
              file=sys.stderr)
    else:
        for i in range(args.runs):
            print(f"pin run {i + 1}/{args.runs} ...", file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench.py")],
                capture_output=True,
                text=True,
                check=True,
                cwd=HERE,
            )
            run = parse_bench_stdout(proc.stdout)
            if run.get("errors"):
                print(f"run {i + 1} had errors: {run['errors']}", file=sys.stderr)
                return 1
            # Floored-host wall-pin refusal (r13 — closes a gap vs the
            # imaging twin, which has refused since r10): rates measured
            # below bench.MEM_FAULT_FLOOR_GB_S encode the hypervisor's
            # lazy page backend, not the kernel; a pin taken there would
            # rebase the gate onto the pathology. --recompute is
            # unaffected (it re-derives from runs already accepted) and
            # --cpu-augment is exempt by design (floor-insensitive).
            from bench import MEM_FAULT_FLOOR_GB_S

            ft = (run.get("noise") or {}).get("first_touch_gb_s")
            if ft is not None and ft < MEM_FAULT_FLOOR_GB_S:
                print(
                    f"run {i + 1} measured first-touch {ft} GB/s, below "
                    f"the {MEM_FAULT_FLOOR_GB_S} GB/s memory-fault floor "
                    "(FINDINGS_HOST_MEMORY.md) — refusing to wall-pin on "
                    "a floored host; use --cpu-augment for the "
                    "floor-insensitive axis",
                    file=sys.stderr,
                )
                return 1
            runs.append(run)
            print(f"  total={run['value']}s probes={run['noise']['probes_start_mid_end']}",
                  file=sys.stderr, flush=True)

    # Standing reminder for the first healthy-host full re-pin (r13):
    # the census-promoted aux set rides cpu-only until a wall re-pin can
    # absorb it into HEADLINE (mid-list insertion invalidates positional
    # pins, so the fold must coincide with a full pin). Loud, not fatal.
    from bench import AUX_CPU_QUERIES

    aux_missing = [n for n in AUX_CPU_QUERIES if n not in HEADLINE]
    if aux_missing:
        print(
            "NOTE: this full pin is the moment to fold the aux cpu set "
            f"into HEADLINE ({aux_missing}); they are currently measured "
            "cpu-only after the sweep. Append them to bench.HEADLINE and "
            "re-run this pin so they get wall pins too.",
            file=sys.stderr,
        )

    sf = runs[0]["sf"]
    names = sorted({n for r in runs for n in r["queries"]})
    best = {n: round(min(r["queries"][n] for r in runs if n in r["queries"]), 4)
            for n in names}
    totals = [r["value"] for r in runs]
    if any(
        all(p is None for p in r["noise"]["probes_start_mid_end"]) for r in runs
    ):
        print("a run lacked probes entirely; cannot pin the probe statistic",
              file=sys.stderr)
        return 1
    probe_medians = [
        round(median(p for p in r["noise"]["probes_start_mid_end"] if p is not None), 4)
        for r in runs
    ]
    sentinel_pin = round(median(probe_medians), 4)
    # Per-query pins for bench.py's drift gate (r8, verdict demand #2):
    # for each query, the median AND spread (outlier-trimmed range) of its
    # positionally-normalized time across the pin runs — the exact
    # statistic a live run's queries_normalized reports, so the gate
    # compares like with like. Spread is same-session; bench.py adds the
    # documented cross-day noise slack on top (NOISE_REL_BAND /
    # NOISE_ABS_FLOOR_S). The normalized TOTALS are just these dicts
    # summed (bench.positional_normalize is that sum), so one pass
    # computes both statistics.
    runs_normalized_queries = [
        positional_normalize_queries(
            r["queries"], HEADLINE, r["noise"]["probes_start_mid_end"], sentinel_pin
        )
        for r in runs
    ]
    if any(rq is None for rq in runs_normalized_queries):
        print("a run lacked probes; cannot pin the normalized statistic", file=sys.stderr)
        return 1
    normalized_totals = [round(sum(rq.values()), 4) for rq in runs_normalized_queries]
    # Spread is OUTLIER-TRIMMED (drop the single best and worst run when
    # n >= 4): max-min over all runs is dominated by one noisy run — the
    # r8 pin measured ann_ivf_pq_topk samples [0.77, 1.86, 2.13, 2.22,
    # 5.51] (median 2.13), where raw max-min = 4.74 makes the gate
    # toothless (a genuine 2x regression reads ok) while the middle-3
    # band = 0.36 is the actual repeatability. bench.py's noise slack
    # (max(50%, 0.35 s)) absorbs cross-day weather ON TOP of this, so the
    # pin side should encode repeatability, not the worst outlier.
    # `tail` records what the trim dropped: the worst excursion above the
    # median across ALL runs. bench.query_verdicts uses it for the
    # host-tail verdict band — a live sample landing inside the pin's own
    # recorded no-change excursions is flagged distinctly, not called a
    # regression (without it, replaying this pin's own run 4 through the
    # gate read 3 queries as 'regressed' on the very code the pin
    # measured — r8 review).
    query_pins = {}
    for n in names:
        all_samples = sorted(rq[n] for rq in runs_normalized_queries if rq and n in rq)
        if not all_samples:
            continue
        med_all = median(all_samples)
        trimmed = all_samples[1:-1] if len(all_samples) >= 4 else all_samples
        query_pins[n] = {
            "median": round(median(trimmed), 4),
            "spread": round(trimmed[-1] - trimmed[0], 4),
            "tail": round(max(all_samples[-1] - med_all, 0.0), 4),
        }

    prev_history = {}
    try:
        # --recompute already parsed args.out; don't read it twice
        prev = prev_pin if prev_pin is not None else json.load(open(args.out))
        prev_history = {
            "previous_pin_value": prev.get("value"),
            "previous_value_median_of_runs": prev.get("value_median_of_runs"),
            "previous_sentinel_probe_pin": prev.get("sentinel_probe_pin"),
            "previous_note": (prev.get("history") or {}).get("note"),
        }
    except (OSError, ValueError):
        pass

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(best.values()), 4),
        "unit": "sec",
        "sf": sf,
        "pin_method": (
            # len(runs), never args.runs: --recompute derives from however
            # many runs the pin recorded, and the provenance string must
            # say which path produced it (r8 review)
            f"elementwise best of {len(runs)} runs (each query the median of 5 "
            "in-run samples), idle host, pinned by pin_bench_baseline.py "
            "(7-sample probes, double sentinel warmup — bench.py r7 protocol)"
            + ("; statistics recomputed from the recorded runs via "
               "--recompute (no new measurement)" if args.recompute else "")
        ),
        "value_median_of_runs": round(median(totals), 4),
        "value_median_of_runs_method": (
            "median of the pin runs' raw totals - yardstick for a live run's "
            "scalar value_noise_normalized"
        ),
        "value_median_of_runs_normalized": round(median(normalized_totals), 4),
        "value_median_of_runs_normalized_method": (
            "median of the pin runs' positionally-normalized totals "
            "(bench.positional_normalize, this file's sentinel_probe_pin) - "
            "the statistic-matched yardstick for a live run's "
            "value_positional_normalized"
        ),
        "run_totals": totals,
        "run_totals_normalized": normalized_totals,
        "noise_at_pin": [r["noise"] for r in runs],
        "sentinel_probe_pin": sentinel_pin,
        "sentinel_probe_pin_method": (
            "median over pin runs of each run's median(probes_start_mid_end) - "
            "the exact statistic a single bench run reports as its probe "
            "median; probes are median-of-7 single-run times under the r7 "
            "double-warmup protocol"
        ),
        "history": {**prev_history, "note": args.note},
        # Pin epoch for bench.py's gate memory: streaks only count driver
        # rounds >= pin_round (verdicts against a retired pin are closed
        # by the re-pin itself). --recompute preserves the recorded epoch
        # — same runs, same pin, no new epoch.
        "pin_round": (
            prev_pin.get("pin_round")
            if args.recompute
            else (
                args.pin_round
                if args.pin_round is not None
                else (lambda r: r + 1 if r is not None else None)(latest_driver_round())
            )
        ),
        "queries": best,
        # The exact sweep order the pin ran under: positional noise
        # factors are interpolated by sweep SLOT, so bench.py refuses to
        # apply query_pins (degrades to no-pin verdicts) when the live
        # HEADLINE order differs — an insertion/reorder shifts every later
        # query's factor and its pinned median silently (r8 review).
        "headline": list(HEADLINE),
        "query_pins": query_pins,
        "query_pins_method": (
            "per query: median and OUTLIER-TRIMMED spread (range of the "
            "runs with the single best and worst dropped, n>=4) of its "
            "positionally-normalized time across the pin runs, plus "
            "`tail` = the untrimmed worst excursion above the all-runs "
            "median - the statistic-matched inputs for "
            "bench.query_verdicts (ok / noise-band / host-tail / "
            "regressed); raw max-min as the ok-bound is dominated by one "
            "noisy run and makes the gate toothless for heavy queries, "
            "while ignoring the tail entirely makes the gate flag the "
            "pin's own recorded runs as regressed"
        ),
        "run_queries": [r["queries"] for r in runs],
    }
    # r12 cpu axis: a full pin whose runs all carry queries_cpu_user_sec
    # pins it too (no separate --cpu-augment pass needed on a healthy
    # host). --recompute carries the existing cpu fields through
    # unchanged: its reconstructed runs have no cpu records, and
    # re-deriving wall statistics is not a new cpu measurement.
    if args.recompute:
        for k in ("query_cpu_pins", "cpu_pin_note", "run_queries_cpu"):
            if prev_pin and k in prev_pin:
                out[k] = prev_pin[k]
    else:
        cpu_pins_full = derive_query_cpu_pins(
            [r.get("queries_cpu_user_sec") or {} for r in runs]
        )
        if cpu_pins_full:
            out["query_cpu_pins"] = cpu_pins_full
            out["cpu_pin_note"] = CPU_PIN_NOTE
            out["run_queries_cpu"] = [
                r["queries_cpu_user_sec"] for r in runs
            ]
    # Atomic replace: args.out may be the --recompute INPUT (the only
    # copy of the raw measurement) — a truncating open('w') interrupted
    # mid-dump would destroy it (r8 review).
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, args.out)
    print(json.dumps({k: out[k] for k in (
        "value", "value_median_of_runs", "value_median_of_runs_normalized",
        "sentinel_probe_pin")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
