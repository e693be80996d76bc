#!/usr/bin/env python
"""Re-adjudicate a recorded bench_imaging run against the CURRENT pin.

bench_imaging._drift_gate is a pure function of (mode, result-dict, pin
file): the measurement is the result dict, the gate is derivation. This
tool replays that derivation so a round record can be produced from a
run that was measured BEFORE a pin augmentation landed — specifically
the r12 cpu-axis flow, where the pin's cpu_stats are derived from N
dedicated runs (pin_imaging_baseline.py --cpu-augment --save-runs-dir)
and the LAST of those runs then becomes the round record, adjudicated
against the very statistics it helped pin, without paying another full
run (a floored-host skew run costs ~40 min wall). The output carries
explicit provenance (``readjudicated``) so a reader can distinguish it
from a live-gated run; every measured number is the recorded run's own.

Self-referential-pin caveat, stated rather than hidden: the final
augment run is one of the 5 samples its own cpu band was derived from,
so its cpu_verdict is biased TOWARD ok by construction (it can still
read noise-band/host-tail if it was the trimmed outlier). The round
after r12 gets the first genuinely out-of-sample adjudication — the
same property every fresh pin's first gated round has.

Usage: python readjudicate_imaging_run.py --mode skew \
           --run /tmp/skew_runs/cpu_run_5.json --out BENCH_IMAGING_SKEW_r12.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("uniform", "skew", "skewsmall"), required=True
    )
    ap.add_argument("--run", required=True, help="full bench_imaging JSON")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench_imaging import PIN_FILES, _drift_gate

    with open(args.run) as f:
        result = json.load(f)
    if result.get("mode") != args.mode:
        print(f"run mode {result.get('mode')!r} != --mode {args.mode}",
              file=sys.stderr)
        return 1
    result["drift_gate"] = _drift_gate(args.mode, result)
    in_sample = result["drift_gate"].get("cpu_pin_self_sample", False)
    result["readjudicated"] = {
        "note": (
            "drift_gate recomputed by readjudicate_imaging_run.py against "
            f"the current {PIN_FILES[args.mode]}; all measured values are "
            "the recorded run's own. "
            + (
                "The run is one of the samples its cpu band was derived "
                "from — the gate surfaces this (cpu_pin_self_sample) and "
                "downgrades any corroboration to provisional."
                if in_sample
                else "The run is NOT among the pin's cpu samples — the "
                "band is independent of it."
            )
        ),
        "source_run": os.path.basename(args.run),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
