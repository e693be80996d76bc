"""Imaging-pipeline throughput bench (the flagship capability).

Runs the full lineage — synthetic volumes -> slice explode -> per-volume
robust normalize -> degradation (per scale) -> patch grid -> fused dark/
approved gate -> split — at the reference's v2 geometry (crop 128 / step 64,
v2/nii_to_lmdb.py:343-344) and reports slices/s and patches/s.

Prints ONE JSON line. Env:
  SPARK_GRAFT_CPUS        local[N]
  SPARK_GRAFT_IMG_VOLS    number of (small) volumes, default 8
  SPARK_GRAFT_IMG_SHAPE   small-volume shape, default "192,192,48"
  SPARK_GRAFT_IMG_MODE    "uniform" (default), "skew", or "skewsmall"
  SPARK_GRAFT_IMG_BIG_SHAPE  skew mode's single big volume, default
                          "960,840,640" — the reference's worst case
                          (show_images.py:21-23, SURVEY §4 fan-out risk):
                          a 2.06 GB float32 volume fanning out into
                          ~2,100 slices of ~3.2 MB. "skewsmall" defaults
                          it to "360,315,240" instead (same 24:21:16
                          aspect, ~8% of the voxels): the SAME slab-wise
                          code path (synthetic_volume_slabs ->
                          explode_slab_slices) and kernel mix at a cost
                          the 5-run cpu-pin protocol can afford on a
                          memory-floored host (r13, r12 verdict demand
                          #1: the full-geometry skew cpu pin was n=1
                          provisional because one floored run cost
                          5726 s — this mode gives the skew path an
                          independently banded cpu signal until a
                          healthy host affords the full-geometry
                          protocol).

Skew mode ingests that one big volume SLAB-WISE (synthetic_volume_slabs
-> explode_slab_slices) and unions its slices with the small monolithic
fleet inside run_pipeline. Slab ingest is not an optimization, it is the
only correct path: shipping the volume as one 2.06 GB Arrow cell trips
Spark's python-runner buffer growth past 1 GiB (capacity<<1 overflows
int; growth degenerates to a full-buffer copy per chunk write — measured
live as 400+ s of serializer CPU with no progress), and anything past
2.147 GB fails outright on int32 Arrow offsets. As ~280 bounded slabs
the big volume's explode also parallelizes across the cluster instead
of running as one straggler task; repartition-after-explode then
spreads patch/degradation work as in the uniform case.

Context for the numbers: each slice runs the degradation once per LR scale
(2 scales here = 2 full k-space/motion/bias/chi-noise passes per slice),
matching the reference's per-slice job (v2/nii_to_lmdb_paralel.py:114-221).
"""

from __future__ import annotations

import json
import os
import time
from statistics import median

from pyspark.sql import functions as F


def _slices_for(n_vols: int, shape: tuple[int, int, int]) -> int:
    sx, sy, sz = shape
    return n_vols * (sz + sz + sy)  # axial + coronal (sz quirk) + sagittal


# --------------------- host-load sentinel probe ---------------------------
# A fixed pure-numpy degradation workload (the pipeline's own hot kernel —
# FFT low-pass, motion, bias, chi noise on a 192x192 slice) timed
# immediately before and after the pipeline. It is a recorded DIAGNOSTIC,
# not a corrector: the r9 skew pin measured the probe ANTI-correlated
# with pipeline throughput on this host (probe ratio 1.33 on the
# 2nd-fastest run, 0.60 on the slowest — the single-thread probe keeps
# its boost exactly when the 32-thread pipeline is being squeezed), so
# probe-normalizing the rates AMPLIFIED the same-tree spread from 1.41x
# to 2.94x and would have pinned a toothless band. A corrector must
# reduce variance to earn its place; this one adds evidence instead: a
# run with a normal probe and a low rate is scheduler weather, a run
# with a slow probe and a low rate is CPU contention, and a >2x
# start-vs-end split means the load shifted mid-run. Verdicts are
# adjudicated on RAW rates against the pin runs' own raw trimmed
# spread + tail, which encode precisely this host's no-change variance.

PROBE_REPEATS = 5
PROBE_SHAPE = (192, 192)
PROBE_SEED = 12345


def host_probe(repeats: int = PROBE_REPEATS) -> float:
    """Median seconds for one fixed degrade_slice call (1 unrecorded
    warmup absorbs FFT plan/JIT caches)."""
    import numpy as np

    from etl_mri_scripts_spark.operators.degradation import degrade_slice

    rng = np.random.default_rng(PROBE_SEED)
    img = rng.random(PROBE_SHAPE, dtype=np.float32)
    degrade_slice(img, seed=PROBE_SEED)  # warmup
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        degrade_slice(img, seed=PROBE_SEED)
        samples.append(time.perf_counter() - t0)
    return round(median(samples), 5)


# ---------------- pin statistics + machine verdict (r9) -------------------
# Same recipe as pin_bench_baseline.py / bench.query_verdicts, mirrored
# for RATES (regression = LOWER value, so bands extend DOWNWARD and
# `tail` is the pin runs' worst downward excursion from their median).

IMG_NOISE_REL_BAND = 0.15  # cross-day host-weather allowance below the
# pinned band. Measured, not guessed: the same-session no-change scatter
# (Spark task scheduling, page cache) the pin's trimmed spread encodes
# leaves ~10-15% residual across DAYS on this host, and no corrector
# removes it (the CPU probe demonstrably can't — see the probe block).


def pin_stats(rates: list[float]) -> dict:
    """median + outlier-trimmed spread + downward tail over the pin runs'
    raw rates. Trim drops the single best and worst run when n >= 4 —
    the r8 skew triplet's 194 p/s outlier would otherwise dominate the
    band and make the gate toothless; `tail` records what the trim
    dropped so a live run landing where the pin's own runs landed reads
    host-tail, never regressed."""
    s = sorted(rates)
    med_all = median(s)
    trimmed = s[1:-1] if len(s) >= 4 else s
    return {
        "median": round(median(trimmed), 2),
        "spread": round(trimmed[-1] - trimmed[0], 2),
        "tail": round(max(med_all - s[0], 0.0), 2),
    }


def throughput_verdict(rate: float, pin: dict) -> str:
    """ok / noise-band / host-tail / regressed for an observed raw
    throughput against a pinned {median, spread, tail} — the rate-form
    mirror of bench.query_verdicts' time bands (regression = LOWER, so
    every band extends downward)."""
    med, spread = pin["median"], pin.get("spread", 0.0)
    tail = pin.get("tail", 0.0) or 0.0
    slack = IMG_NOISE_REL_BAND * med
    if rate >= med - spread:
        return "ok"
    if rate >= med - spread - slack:
        return "noise-band"
    if rate >= med - tail - slack:
        return "host-tail"
    return "regressed"


def main() -> None:
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, run_pipeline
    from etl_mri_scripts_spark.session import get_spark
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    n_vols = int(os.environ.get("SPARK_GRAFT_IMG_VOLS", "8"))
    shape = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_IMG_SHAPE", "192,192,48").split(",")
    )
    mode = os.environ.get("SPARK_GRAFT_IMG_MODE", "uniform")
    if mode not in ("uniform", "skew", "skewsmall"):
        raise SystemExit(
            "SPARK_GRAFT_IMG_MODE must be 'uniform', 'skew' or "
            f"'skewsmall', got {mode!r}"
        )
    spark = get_spark("bench-imaging")
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PipelineConfig(crop_hr=128, step_hr=64, scales=(2, 4), preset="3tFlash")
    vols = synthetic_volumes(spark, n_vols, shape, seed=3)
    n_slices = _slices_for(n_vols, shape)
    big_shape: tuple[int, int, int] | None = None
    slabs = None
    if mode in ("skew", "skewsmall"):
        from etl_mri_scripts_spark.sources.volumes import synthetic_volume_slabs

        default_big = "960,840,640" if mode == "skew" else "360,315,240"
        big_shape = tuple(
            int(x)
            for x in os.environ.get(
                "SPARK_GRAFT_IMG_BIG_SHAPE", default_big
            ).split(",")
        )
        slabs = synthetic_volume_slabs(
            spark, 1, big_shape, seed=11, pmin=cfg.pmin, pmax=cfg.pmax
        )
        n_slices += _slices_for(1, big_shape)

    from etl_mri_scripts_spark.operators.pipeline import volume_batch_scope

    # Host memory-fault capability (r10): first-touch GB/s of fresh
    # anonymous pages. The imaging pipeline streams tens of GB of fresh
    # volume/slab allocations through python workers, so on a
    # lazily-backed VM (measured 0.01-0.05 GB/s vs 1-3 healthy) the run
    # measures the hypervisor's page backend, not the kernel — the gate
    # below reads this and declines to adjudicate rather than record a
    # false `regressed` (the CPU probe alone can't see it: tiny buffers
    # ride the allocator's resident pool and measure flat).
    from bench import host_memory_probe, read_user_cpu_sec

    mem_probe = host_memory_probe()
    probe_start = host_probe()
    cpu_user0 = read_user_cpu_sec()
    t0 = time.time()
    # mem probe is re-taken AFTER the pipeline (see below): this host's
    # lazy page backend sleeps after ~45 s idle and wakes under sustained
    # touching (measured r11: 0.005 GB/s cold -> 2-4 GB/s while
    # continuously probed), so a single warm start-probe on a host that
    # floors mid-run would hand the gate a false `regressed`. The gate
    # keys on the MIN of the two probes — exculpatory if EITHER side saw
    # the floor.
    # volume_batch_scope: the Arrow batch shrink is live while the collect
    # executes the imaging plan and restored when the job completes, so a
    # session reused after this driver sees the default batch size.
    with volume_batch_scope(spark):
        out = run_pipeline(spark, vols, cfg, slabs=slabs)
        stats = (
            out.groupBy("resolution")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("value")).alias("bytes"))
            .collect()
        )
    wall = time.time() - t0
    cpu_user1 = read_user_cpu_sec()
    probe_end = host_probe()
    mem_probe_end = host_memory_probe()

    n_patches = sum(r["n"] for r in stats)
    by_res = {r["resolution"]: r["n"] for r in stats}
    parity_ok = len(set(by_res.values())) == 1  # J4: equal counts per resolution
    payload_mb = round(sum(r["bytes"] for r in stats) / 1e6, 1)
    result = {
        "metric": "imaging_pipeline_throughput",
        "value": round(n_slices / wall, 2),
        "unit": "slices/sec",
        "wall_sec": round(wall, 2),
        "mode": mode,
        "n_volumes": n_vols + (1 if big_shape else 0),
        "shape": list(shape),
        "n_slices": n_slices,
        "n_patches": n_patches,
        "patches_per_sec": round(n_patches / wall, 2),
        "payload_mb": payload_mb,
        "payload_mb_per_sec": round(payload_mb / wall, 2),
        "key_parity_ok": parity_ok,
        # start AND end recorded: a probe pair that disagrees >2x flags a
        # load spike DURING the run that the median would average away
        "host_probe_sec": round(median([probe_start, probe_end]), 5),
        "host_probe_start_end": [probe_start, probe_end],
        # gate key: the WORSE of the start/end memory probes — a backend
        # that slept through the run shows the floor on at least one side
        "first_touch_gb_s": min(mem_probe, mem_probe_end),
        "first_touch_start_end": [mem_probe, mem_probe_end],
    }
    # Floor-insensitive auxiliary metric (r12, r11 verdict demand #1):
    # patches per system-wide user-CPU-second over the pipeline region.
    # The memory floor lands its cost in stime/off-CPU, never utime
    # (bench.read_user_cpu_sec docstring + FINDINGS_HOST_MEMORY.md), so
    # this rate gives the gate a kernel signal on rounds whose wall
    # verdict goes inactive. Advisory-only: it never replaces the wall
    # verdict, it corroborates or indicts it (_drift_gate).
    if cpu_user0 is not None and cpu_user1 is not None and cpu_user1 > cpu_user0:
        result["cpu_user_sec"] = round(cpu_user1 - cpu_user0, 2)
        result["patches_per_cpu_user_sec"] = round(
            n_patches / (cpu_user1 - cpu_user0), 2
        )
    if big_shape:
        result["big_shape"] = list(big_shape)
    result["drift_gate"] = _drift_gate(mode, result)
    print(json.dumps(result))
    spark.stop()


# slices/sec is NOT shape-neutral (a 960x840 slice is ~22x the pixels of a
# 192x192 one) — the drift gate compares only the shape-neutral rates.
DRIFT_GATE_METRICS = ("patches_per_sec", "payload_mb_per_sec")
DRIFT_GATE_MAX = 2.0
# User-CPU inflation episode marker (r13, FINDINGS_HOST_MEMORY.md second
# pathology): a run whose fixed single-thread probe exceeds this ratio
# over the pin runs' own probe median carries independent evidence that
# user-space work itself was slowed — a non-ok cpu verdict then reads
# "cpu-weather" (indeterminate), never "regressed". 1.75 sits between
# the quiet population's spread (0.016-0.026 s, max ratio ~1.4 over its
# median) and the measured episode excursion (2.8-9.7x).
CPU_WEATHER_PROBE_RATIO = 1.75
PIN_FILES = {
    "uniform": "BENCH_IMAGING_SELF_BASELINE.json",
    "skew": "BENCH_IMAGING_SKEW_SELF_BASELINE.json",
    "skewsmall": "BENCH_IMAGING_SKEWSMALL_SELF_BASELINE.json",
}


def load_imaging_verdict_history(
    mode: str, pin_dir: str | None = None
) -> list[tuple[int, str | None]]:
    """(round, verdict) from each prior driver round of this mode —
    ``BENCH_IMAGING_{MODE}_r{N}.json`` files at the repo root (or
    ``pin_dir`` in tests), ascending. A round is recorded iff its
    drift_gate carries an explicit ``verdict`` key: a str is an ACTIVE
    adjudication, ``None`` is an INACTIVE one (the gate declined —
    memory-floored host, broken measurement, stats-less pin). Rounds
    without the key at all (pre-r9) contribute nothing — absent history
    is indeterminate. Recording inactive rounds explicitly (r11, r10
    verdict demand #1) serves both streaks: they BREAK the non-ok streak
    (unknown must never escalate — previously they were dropped from the
    list, silently splicing the non-ok rounds on either side together)
    and they EXTEND the inactive streak (N consecutive unmeasured rounds
    is itself the finding)."""
    import glob as _glob
    import re as _re

    here = pin_dir or os.path.dirname(os.path.abspath(__file__))
    out: list[tuple[int, str | None]] = []
    pat = f"BENCH_IMAGING_{mode.upper()}_r*.json"
    for fn in _glob.glob(os.path.join(here, pat)):
        m = _re.fullmatch(
            rf"BENCH_IMAGING_{mode.upper()}_r(\d+)\.json", os.path.basename(fn)
        )
        if not m:
            continue
        try:
            with open(fn) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        g = d.get("drift_gate") or {}
        if "verdict" in g:
            v = g["verdict"]
            out.append((int(m.group(1)), v if isinstance(v, str) else None))
    return sorted(out)


# Inactive-streak escalation (r11, closing the r10 blind spot): the
# memory-capability gate adjudicates a floored-host non-ok as verdict
# None — correctly, the kernel was not measured — but a None verdict
# contributes nothing to the non-ok streak, so N consecutive floored
# rounds never escalated: the exact hole the r9 bench gate had, reborn
# one level up. The inactive streak is the inverse asymmetry: it counts
# consecutive UNMEASURED rounds (current + immediately-prior recorded
# rounds whose verdict is None, any inactivity cause), and at
# ESCALATE_INACTIVE_AT the run may no longer ride as "indeterminate,
# try again next round".
ESCALATE_INACTIVE_AT = 2
INACTIVE_ESCALATION_POLICY = (
    f"{ESCALATE_INACTIVE_AT}+ consecutive inactive gate verdicts: this "
    "mode has gone that many driver rounds unmeasured — re-run on a host "
    "whose memory probe clears bench.MEM_FAULT_FLOOR_GB_S (poll "
    "host_memory_probe and run in the same session) or record a "
    "documented environment fix; indeterminate rounds must not "
    "accumulate silently"
)


def consecutive_inactive(
    current_inactive: bool, history: list[tuple[int, str | None]]
) -> int:
    """Streak of consecutive unmeasured rounds: 1 for the current run (if
    its gate is inactive) plus the immediately-prior recorded rounds whose
    verdict is None, newest first. Any ACTIVE verdict (ok or not) resets,
    and a GAP in recorded round numbers breaks the walk — a round with no
    record is unknown history and must never extend a streak (the rule
    consecutive_non_ok states for absent queries, here enforceable
    because imaging history keys by round number). The newest recorded
    round is taken as adjacent to the current run — the same assumption
    bench.consecutive_non_ok makes about its newest history entry.
    Property-tested in tests/test_gate_properties.py."""
    if not current_inactive:
        return 0
    n = 1
    prev: int | None = None
    for rnd, v in sorted(history, reverse=True):
        if prev is not None and rnd != prev - 1:
            break
        if v is None:
            n += 1
            prev = rnd
        else:
            break
    return n


def _drift_gate(mode: str, result: dict, pin_dir: str | None = None) -> dict:
    """2x throughput-drift gate against the mode-matched self-pin (r6
    verdict demand #2): ratio = pinned/observed on the shape-neutral
    rates; ok iff every comparable metric is within DRIFT_GATE_MAX. The
    "absent number is not evidence" rule applies to the PIN side only: a
    missing pin file — or a pin with no comparable rate fields — reports
    ok=None (bootstrap/indeterminate), NEVER ok=False. But a metric the
    pin DOES carry that the observed run reports as 0/missing is
    evidence — of a broken measurement — and fails the gate loudly
    (r7 ADVICE: the old falsy-skip masked a zero observed rate as
    indeterminate). ``pin_dir`` overrides the pin location (tests)."""
    pin_path = os.path.join(
        pin_dir or os.path.dirname(os.path.abspath(__file__)), PIN_FILES[mode]
    )
    try:
        with open(pin_path) as f:
            pin = json.load(f)
    except (OSError, ValueError):
        return {"pin_file": PIN_FILES[mode], "pinned": None, "ok": None,
                "note": "no pin recorded for this mode yet"}
    ratios = {}
    broken_run = []  # pinned metrics whose observed value is 0/missing
    broken_pin = []  # metrics the pin carries as 0 — a pin from a broken run
    for m in DRIFT_GATE_METRICS:
        pv = pin.get(m)
        if pv is None:
            continue  # pin never recorded this rate -> not comparable
        if not pv:
            # A pinned rate of 0/0.0 is the same class of broken
            # measurement the observed side fails loudly on — an
            # indeterminate skip here would hide the broken pin forever
            # and let ok=True ride on the remaining metric (r8 review).
            broken_pin.append(m)
            continue
        if result.get(m):
            ratios[m] = round(pv / result[m], 3)
        else:
            broken_run.append(m)
    out = {
        "pin_file": PIN_FILES[mode],
        "pinned": {m: pin.get(m) for m in DRIFT_GATE_METRICS},
        "ratio_pin_over_observed": ratios,
        "max_allowed": DRIFT_GATE_MAX,
        "ok": (
            False
            if broken_run or broken_pin
            else all(r <= DRIFT_GATE_MAX for r in ratios.values()) if ratios else None
        ),
    }
    # Machine verdict against pin statistics (r9, r8 verdict demand #2):
    # adjudicate each observed raw rate against the pin runs' own median /
    # trimmed spread / downward tail — ok / noise-band / host-tail /
    # regressed, so a slow-but-inside-recorded-variance run
    # self-identifies instead of needing a "decisive third run"
    # narrative. The verdict keys are emitted even when the gate can't
    # run (pre-r9 pin without stats, broken measurement) with an
    # explicit reason — a silently absent verdict would be misread as ok
    # (the bench.py r8 lesson).
    stats = pin.get("stats")
    probe_pin = pin.get("host_probe_pin")
    probe_obs = result.get("host_probe_sec")
    # Host memory-fault capability gate (r10 forensics): below the
    # documented floor the run measured the hypervisor's lazy page
    # backend, not the kernel (bench.MEM_FAULT_FLOOR_GB_S derivation:
    # healthy 1-3 GB/s vs 0.01-0.05 floored — an order of magnitude of
    # separation each side, and the probe reports the BEST of its fresh
    # attempts, so a healthy host cannot be excused by one slow sample).
    # The verdict is None (indeterminate), never `regressed`: the kernel
    # was not measured. Ratios stay recorded for the forensic trail, and
    # a None verdict contributes nothing to the streak memory — exactly
    # like a pre-r9 round without a machine verdict.
    if not stats:
        out["verdict"] = None
        out["verdict_gate"] = (
            "inactive: cpu-only pin — wall statistics deferred to the "
            "first healthy-host full pin (pin tools refuse floored wall "
            "pins; FINDINGS_HOST_MEMORY.md); the cpu verdict below is "
            "the round's kernel measurement"
            if pin.get("cpu_only_pin")
            else "inactive: pin has no stats (pre-r9 pin); "
            "re-pin with pin_imaging_baseline.py"
        )
    elif broken_run or broken_pin:
        # A 0/missing rate on either side is a broken MEASUREMENT, not a
        # slow run — the surviving metric must not let the top-level
        # verdict read `ok` while ok=False says the gate failed.
        out["verdict"] = None
        out["verdict_gate"] = "inactive: broken measurement/pin (see note)"
    else:
        # RAW rates vs the pin runs' raw trimmed spread + tail (see the
        # probe block comment: normalizing by the probe amplified the
        # no-change spread on this host, so the probe is reported as
        # diagnostic evidence, never multiplied into the statistic).
        verdicts: dict = {}
        no_stats = []
        for m in DRIFT_GATE_METRICS:
            if not result.get(m):
                continue  # neither observed nor pinned-broken (else-branch)
            if m in stats and stats[m].get("median"):
                verdicts[m] = throughput_verdict(result[m], stats[m])
            else:
                # An observed metric absent from pin['stats'] (hand-edited
                # or partially-derived pin) gets an explicit per-metric
                # verdict — mirroring bench.py's `no-pin` — instead of a
                # silent exclusion that would let the overall verdict read
                # `ok` while this rate is covered only by the loose 2x
                # backstop (r9 ADVICE).
                verdicts[m] = "no-stats"
                no_stats.append(m)
        adjudicated = {m: v for m, v in verdicts.items() if v != "no-stats"}
        severity = ["ok", "noise-band", "host-tail", "regressed"]
        if probe_obs and probe_pin:
            out["probe"] = {
                "observed_sec": probe_obs, "pin_sec": probe_pin,
                "ratio_diagnostic_only": round(probe_obs / probe_pin, 4),
            }
        out["stats_pinned"] = {m: stats[m] for m in adjudicated}
        out["metric_verdicts"] = verdicts
        out["verdict"] = (
            max(adjudicated.values(), key=severity.index) if adjudicated else None
        )
        out["verdict_gate"] = (
            "active (partial): observed metric(s) "
            f"{no_stats} absent from pin stats — covered only by the 2x "
            "backstop; re-pin with pin_imaging_baseline.py"
            if no_stats
            else "active"
        )
        if out["verdict"] == "regressed":
            out["ok"] = False  # the statistic gate has teeth, not just 2x
        # Host memory-fault capability (r10 forensics): on a lazily-backed
        # VM (first-touch below bench.MEM_FAULT_FLOOR_GB_S; healthy hosts
        # measure 1-3 GB/s, the floored r10 host 0.01-0.05) the run
        # measured the hypervisor's page backend as much as the kernel.
        # The pathology biases ONE direction only — fresh-page stalls can
        # make the kernel look slower, never faster — so the gate is
        # EXCULPATORY-ONLY: an `ok` on a floored host is conservative,
        # valid evidence and stands (measured live: the uniform run read
        # 1.036x pin at 0.18 GB/s first-touch); a NON-ok on a floored
        # host cannot distinguish kernel from host and goes inactive
        # (verdict None — indeterminate, no streak contribution, never a
        # false `regressed`). Metric verdicts and ratios stay recorded
        # for the forensic trail.
        mem = result.get("first_touch_gb_s")
        import bench as _bench

        if mem is not None and mem < _bench.MEM_FAULT_FLOOR_GB_S:
            out["host_memory"] = {
                "first_touch_gb_s": mem,
                "floor_gb_s": _bench.MEM_FAULT_FLOOR_GB_S,
            }
            if out["verdict"] not in (None, "ok"):
                out["verdict"] = None
                # Exculpatory-only applies to the 2x backstop too: only a
                # FAILING backstop is nulled (it saw the same invalid run);
                # a passing ok=True under slower-only bias is conservative,
                # valid evidence and stands — e.g. a noise-band verdict at
                # ratio < 2 (r10 ADVICE). broken_run/broken_pin can't reach
                # this branch (they route to the elif above), so ok is
                # True/False/None from the ratio gate alone here.
                if out["ok"] is False:
                    out["ok"] = None
                out["verdict_gate"] = (
                    f"inactive: host memory-fault throughput {mem} GB/s is "
                    f"below the {_bench.MEM_FAULT_FLOOR_GB_S} GB/s floor "
                    "(lazily-backed VM memory: first-touch page faults go "
                    "through the hypervisor backend; healthy hosts measure "
                    "1-3 GB/s) and the run read non-ok — kernel and host "
                    "are indistinguishable here; re-run on a host above "
                    "the floor before adjudicating. An ok verdict would "
                    "have stood: degraded memory only biases slower."
                )
    # CPU-axis corroboration (r12, r11 verdict demand #1): adjudicate the
    # floor-insensitive patches_per_cpu_user_sec against its own pinned
    # band (same {median, spread, tail} recipe, pinned by
    # pin_imaging_baseline.py --cpu-augment — valid to pin on a floored
    # host because the statistic is what the fault path doesn't inflate;
    # FINDINGS_HOST_MEMORY.md has the getrusage evidence). ADVISORY-ONLY:
    # it never changes `verdict` or `ok`. Its job is the two ends the
    # wall gate can't reach on a floored host:
    #   - wall verdict inactive + cpu within band -> "cpu-corroborated
    #     ok": the KERNEL has a measurement this round, and the inactive
    #     escalation resolves against it + the findings doc;
    #   - wall verdict inactive + cpu regressed -> a REAL finding despite
    #     the floor (the floor excuses wall-clock, never extra
    #     computation per patch), surfaced as cpu_regressed.
    cpu_rate = result.get("patches_per_cpu_user_sec")
    cpu_stats = (pin.get("cpu_stats") or {}).get("patches_per_cpu_user_sec")
    if cpu_rate and cpu_stats and cpu_stats.get("median"):
        out["cpu_stats_pinned"] = cpu_stats
        # User-CPU inflation episodes (r13, FINDINGS_HOST_MEMORY.md
        # second pathology): the host intermittently slows retired
        # user-space work up to ~3.6x (SMT/neighbor contention; steal
        # reads 0), which deflates patches_per_cpu_user_sec without any
        # kernel change. The run's own fixed single-thread probe is the
        # independent marker: pure user CPU, so the memory floor can't
        # touch it, but an episode slows it with everything else
        # (measured: 0.046-0.158 s vs the 0.017-0.021 s quiet range
        # during the r13 episode). A non-ok cpu verdict under a probe
        # excursion > CPU_WEATHER_PROBE_RATIO x the pin runs' own probe
        # median downgrades to indeterminate "cpu-weather" — like the
        # memory floor, the episode can fake a regression but never
        # mask one, so `ok`/`noise-band` always stand. Probes sample
        # only the run's edges and can miss bursts (episode run 1
        # carried normal probes), so a non-ok with NORMAL probes still
        # stands — re-sampled via solo_cpu_measure.py per the findings
        # doc before it is treated as a kernel finding.
        probe_refs = [
            r.get("host_probe_sec")
            for r in (pin.get("cpu_runs") or [])
            if r.get("host_probe_sec")
        ]
        probe_ref = (
            median(probe_refs) if probe_refs else pin.get("host_probe_pin")
        )
        probe_pair = [p for p in (result.get("host_probe_start_end") or []) if p]
        cpu_weather = bool(
            probe_ref
            and probe_pair
            and max(probe_pair) / probe_ref > CPU_WEATHER_PROBE_RATIO
        )
        # A below-protocol pin (pin_imaging_baseline --allow-fewer-runs)
        # or a pin whose samples INCLUDE this very run cannot
        # independently band it (r13, r12 ADVICE: the r12 skew record
        # compared its 84.32 against a band {median 84.32, spread 0,
        # tail 0} derived from that same single run — a tautology the
        # gate output never flagged). Both conditions are surfaced and
        # qualify any escalation resolution below as provisional.
        cpu_prov = pin.get("cpu_pin_provisional")
        if cpu_prov:
            out["cpu_pin_provisional"] = cpu_prov
        pin_sample_rates = {
            r.get("patches_per_cpu_user_sec")
            for r in (pin.get("cpu_runs") or [])
        }
        cpu_self_sample = cpu_rate in pin_sample_rates
        if cpu_self_sample:
            out["cpu_pin_self_sample"] = True
        cpu_independent = not (cpu_prov or cpu_self_sample)
        out["cpu_verdict"] = throughput_verdict(cpu_rate, cpu_stats)
        if cpu_weather and out["cpu_verdict"] in ("host-tail", "regressed"):
            out["cpu_verdict_raw"] = out["cpu_verdict"]
            out["cpu_verdict"] = "cpu-weather"
            out["cpu_weather"] = {
                "probe_observed_max": max(probe_pair),
                "probe_pin_median": probe_ref,
                "ratio": round(max(probe_pair) / probe_ref, 3),
                "threshold": CPU_WEATHER_PROBE_RATIO,
            }
        floored_inactive = out.get("verdict") is None and "host_memory" in out
        if floored_inactive:
            if out["cpu_verdict"] in ("ok", "noise-band"):
                out["cpu_corroboration"] = (
                    "ok" if cpu_independent else "ok-provisional"
                )
                out["verdict_gate"] += (
                    "; cpu-corroborated ok: patches_per_cpu_user_sec "
                    f"{cpu_rate} is within its pinned band "
                    f"(median {cpu_stats['median']}) — the floor-"
                    "insensitive axis measured the kernel this round "
                    "(FINDINGS_HOST_MEMORY.md)"
                )
                if not cpu_independent:
                    out["verdict_gate"] += (
                        "; PROVISIONAL: the cpu band is not independent "
                        "of this run ("
                        + ("below-protocol pin, n_runs="
                           f"{(cpu_prov or {}).get('n_runs')}"
                           if cpu_prov else "")
                        + ("; " if cpu_prov and cpu_self_sample else "")
                        + ("this run is one of the pin's own samples"
                           if cpu_self_sample else "")
                        + ") — corroboration is weaker evidence until a "
                        "full-protocol pin bands a run it did not include"
                    )
            elif out["cpu_verdict"] == "cpu-weather":
                out["verdict_gate"] += (
                    "; cpu axis indeterminate: patches_per_cpu_user_sec "
                    f"{cpu_rate} read {out['cpu_verdict_raw']} but the "
                    "run's own single-thread probe ran "
                    f"{out['cpu_weather']['ratio']}x its pinned median — "
                    "a user-cpu inflation episode "
                    "(FINDINGS_HOST_MEMORY.md second pathology) deflates "
                    "the rate without any kernel change; re-run on a "
                    "quieter window before adjudicating"
                )
            elif out["cpu_verdict"] == "regressed":
                out["cpu_regressed"] = True
                out["verdict_gate"] += (
                    "; cpu_regressed: patches_per_cpu_user_sec "
                    f"{cpu_rate} fell beyond everything the cpu pin saw "
                    f"(median {cpu_stats['median']}, tail "
                    f"{cpu_stats.get('tail')}) — the memory floor cannot "
                    "explain extra user-CPU per patch; investigate as a "
                    "real kernel finding (FINDINGS second pathology "
                    "caveat: probes can miss an inflation burst — "
                    "re-sample with solo runs before treating as kernel)"
                )
    elif cpu_rate and "verdict" in out:
        out["cpu_verdict"] = "no-cpu-pin"

    # Gate memory, mirrored from bench.py (r10): consecutive non-ok
    # verdicts across this mode's prior driver rounds
    # (BENCH_IMAGING_{MODE}_r{N}.json) plus the current run; a streak
    # >= bench.ESCALATE_AT escalates — a rate that settles permanently
    # one band below its pin is evidence, not weather. Streak algebra
    # is the SAME audited function (property-tested in
    # tests/test_gate_properties.py), fed one pseudo-query per mode.
    # History rounds whose verdict was None feed in as the marker string
    # "inactive" — not in NON_OK_VERDICTS, so an unmeasured round BREAKS
    # a non-ok streak instead of silently splicing its neighbors (the
    # pre-r11 loader dropped such rounds from the list entirely, which
    # would have joined the non-ok rounds on either side of a floored
    # round into one streak).
    if "verdict" in out:
        import bench

        history = load_imaging_verdict_history(mode, pin_dir)
        if out["verdict"] is not None:
            hist = [
                (rnd, {"rate": v if v is not None else "inactive"})
                for rnd, v in history
            ]
            streaks = bench.consecutive_non_ok({"rate": out["verdict"]}, hist)
            out["consecutive_non_ok"] = streaks.get("rate", 0)
            if out["consecutive_non_ok"] >= bench.ESCALATE_AT:
                out["escalation"] = bench.ESCALATION_POLICY
        # Inactive-streak memory (r11, r10 verdict demand #1): N
        # consecutive unmeasured rounds is a finding, not weather — at
        # ESCALATE_INACTIVE_AT the round owes a healthy-host measurement
        # or a documented environment fix. Counted for every emitted
        # verdict (an active one resets it to 0 via current_inactive).
        out["consecutive_inactive"] = consecutive_inactive(
            out["verdict"] is None, history
        )
        if out["consecutive_inactive"] >= ESCALATE_INACTIVE_AT:
            out["escalation"] = INACTIVE_ESCALATION_POLICY
            # The r12 third arm: the escalation's two original arms are
            # "healthy host" (which this sandbox may never provide) and
            # "documented environment fix". A cpu-corroborated ok IS the
            # demanded kernel signal — the escalation resolves in-file
            # instead of carrying another unmeasured round.
            if out.get("cpu_corroboration") == "ok":
                out["escalation_resolution"] = (
                    "resolved by the floor-insensitive cpu axis: "
                    "patches_per_cpu_user_sec is within its pinned band "
                    "(cpu_verdict above), so the kernel was measured this "
                    "round despite the wall-clock floor; environment "
                    "pathology documented in FINDINGS_HOST_MEMORY.md"
                )
            elif out.get("cpu_corroboration") == "ok-provisional":
                # r13 (r12 ADVICE): an in-band cpu reading against a
                # band this run helped define — or a below-protocol
                # band — cannot FULLY discharge the escalation; the
                # demand for an independent measurement stands.
                out["escalation_resolution"] = (
                    "provisionally resolved: patches_per_cpu_user_sec is "
                    "in-band, but the cpu band is not independent of "
                    "this run (cpu_pin_provisional / "
                    "cpu_pin_self_sample above) — the escalation "
                    "re-resolves when a full-protocol pin bands a run "
                    "it did not include, or a healthy host measures "
                    "wall throughput directly"
                )
            elif out.get("cpu_regressed"):
                out["escalation_resolution"] = (
                    "NOT resolved: the cpu axis itself regressed — this "
                    "is a real kernel finding, not host weather; "
                    "adjudicate with an interleaved A/B before anything "
                    "else this round"
                )
            elif out.get("cpu_verdict") == "cpu-weather":
                out["escalation_resolution"] = (
                    "NOT resolved: the cpu axis was itself weathered "
                    "this round (user-cpu inflation episode, probe "
                    "excursion recorded in cpu_weather) — the round "
                    "carries as unmeasured on both axes; re-run on a "
                    "quieter window (FINDINGS_HOST_MEMORY.md)"
                )
    notes = []
    probe_pair = result.get("host_probe_start_end") or [None, None]
    if all(probe_pair) and max(probe_pair) / min(probe_pair) > 2:
        notes.append(
            f"start/end probes disagree >2x ({probe_pair}) — host load "
            "shifted DURING the run; the median probe under-corrects, "
            "prefer a re-run before trusting a non-ok verdict"
        )
    if broken_run:
        notes.append(
            f"pinned metric(s) {broken_run} observed as 0/missing — broken run"
        )
    if broken_pin:
        notes.append(
            f"pin carries metric(s) {broken_pin} as 0 — broken pin, re-pin "
            "with pin_imaging_baseline.py"
        )
    if notes:
        out["note"] = "; ".join(notes)
    elif not ratios:
        out["note"] = "pin exists but has no comparable rate fields"
    return out


if __name__ == "__main__":
    main()
