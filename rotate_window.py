#!/usr/bin/env python
"""Suggest the next round's driver-window layout.

Reads every CORRECTNESS_r*.json at the repo root, computes which
registered queries still lack a driver row, and prints a ready-to-paste
`_DRIVER_ORDER` block for queries/__init__.py: sentinels first, then
explicit re-checks (pass --recheck name,name for queries whose
implementation changed since their last driver row), then the
never-checked rotation, then the overflow queue.

Usage: python rotate_window.py [--recheck a,b,c] [--window 50]
Dry-run only — it never edits files; paste the output by hand so the
rotation stays an explicit, reviewed diff.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys

SENTINELS = [
    "window_tumbling_hourly",
    "dedup_exact_hash",
    "text_token_counts",
    "ann_bruteforce_topk",
    "pricing_summary",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--recheck", default="", help="comma-separated names to re-check")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from etl_mri_scripts_spark.queries import QUERIES

    verified: set[str] = set()
    last_round: dict[str, str] = {}  # query -> newest CORRECTNESS file containing it
    for fn in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(fn) as f:
            names = set(json.load(f))
        verified |= names
        for n in names:
            last_round[n] = fn

    rechecks = [n for n in args.recheck.split(",") if n]
    missing = [n for n in rechecks if n not in QUERIES]
    if missing:
        print(f"unknown --recheck names: {missing}", file=sys.stderr)
        return 1

    # Re-check names are already placed in the head block; listing a
    # never-verified re-check again in the rotation would waste a slot.
    unverified = [
        n for n in QUERIES
        if n not in verified and n not in SENTINELS and n not in rechecks
    ]
    head = SENTINELS + rechecks
    slots = max(0, args.window - len(head))
    rotation, queue = unverified[:slots], unverified[slots:]

    # Once the whole registry is driver-verified, spare window slots go
    # to the queries whose driver rows are OLDEST — freshness rotation,
    # so every row is eventually re-earned under current code.
    freshness: list[tuple[str, str]] = []
    spare = slots - len(rotation)
    if spare > 0 and not queue:
        taken = set(head) | set(rotation)
        stalest = sorted(
            (n for n in QUERIES if n not in taken),
            key=lambda n: (last_round.get(n, ""), n),
        )
        freshness = [(n, last_round.get(n, "?")) for n in stalest[:spare]]

    print(f"# window={args.window}: {len(SENTINELS)} sentinels + "
          f"{len(rechecks)} re-checks + {len(rotation)} rotation + "
          f"{len(freshness)} freshness; "
          f"{len(queue)} queued for the round after")
    print("_DRIVER_ORDER = [")
    for n in SENTINELS:
        print(f'    "{n}",  # sentinel')
    for n in rechecks:
        print(f'    "{n}",  # re-check: implementation changed')
    for n in rotation:
        print(f'    "{n}",')
    for n, src in freshness:
        print(f'    "{n}",  # freshness: last driver row {src}')
    if queue:
        print("    # ============ next-round rotation queue ================")
        for n in queue:
            print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
