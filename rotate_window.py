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
import re
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

    def row_passed(row: dict) -> bool:
        # Mirrors the driver's verdict shapes: oracled rows pass on the
        # value hash (or rows for the weaker check); rows-only queries
        # (err == "no_oracle", by design — pixel/sketch/BPE outputs) pass
        # when the Spark side produced a row count (their values are
        # golden-pinned in pytest). Everything else — real errs, matched
        # = false — is a FAIL and must not count as a verified row.
        if row.get("hash_match") or row.get("rows_match"):
            return True
        # `is not None` — not `(x or 0) >= 0`, which is vacuously true and
        # would count a rows-only row whose Spark side never produced a
        # count as verified (r6 ADVICE).
        return row.get("err") == "no_oracle" and row.get("spark_rows") is not None

    # Numeric round order: lexicographic filename sort would break
    # newest-wins at r100 (sorts between r10 and r11).
    def round_num(fn: str) -> int:
        m = re.search(r"_r(\d+)\.json$", fn)
        return int(m.group(1)) if m else -1

    last_round: dict[str, str] = {}  # query -> newest CORRECTNESS file containing it
    last_passed: dict[str, bool] = {}  # verdict of that newest row
    for fn in sorted(glob.glob("CORRECTNESS_r*.json"), key=round_num):
        with open(fn) as f:
            rows = json.load(f)
        for n, row in rows.items():
            last_round[n] = fn
            last_passed[n] = row_passed(row)
    verified = {n for n, ok in last_passed.items() if ok}

    rechecks = [n.strip() for n in args.recheck.split(",") if n.strip()]
    missing = [n for n in rechecks if n not in QUERIES]
    if missing:
        print(f"unknown --recheck names: {missing}", file=sys.stderr)
        return 1

    # Queries whose LATEST driver row failed outrank everything: they go
    # in the head right after the sentinels, loudly labeled, so a failing
    # query can never ride a stale green row out of the window.
    failing = [
        n for n in QUERIES
        if n in last_passed and not last_passed[n]
        and n not in SENTINELS and n not in rechecks
    ]

    # Re-check names are already placed in the head block; listing a
    # never-verified re-check again in the rotation would waste a slot.
    # Dedupe the head (a sentinel passed via --recheck must not burn a
    # second slot) while preserving order.
    unverified = [
        n for n in QUERIES
        if n not in verified and n not in last_passed
        and n not in SENTINELS and n not in rechecks
    ]
    head = list(dict.fromkeys(SENTINELS + failing + rechecks))
    slots = max(0, args.window - len(head))
    rotation, queue = unverified[:slots], unverified[slots:]

    # Once the whole registry is driver-verified, spare window slots go
    # to the queries whose driver rows are OLDEST — freshness rotation,
    # so every row is eventually re-earned under current code.
    freshness: list[tuple[str, str]] = []
    next_queue: list[tuple[str, str]] = []
    spare = slots - len(rotation)
    if spare > 0 and not queue:
        taken = set(head) | set(rotation)
        stalest = sorted(
            (n for n in QUERIES if n not in taken),
            key=lambda n: (round_num(last_round.get(n, "")), n),
        )
        freshness = [(n, last_round.get(n, "?")) for n in stalest[:spare]]
        # Pre-list the NEXT round's freshness cut (r8 verdict #5): the
        # stalest names beyond this window, one window's worth, emitted as
        # comments so next round's rotation is a mechanical uncomment —
        # and so a reviewer of THIS round's paste can see what was
        # deliberately left out, not wonder whether the cut was arbitrary.
        next_queue = [
            (n, last_round.get(n, "?")) for n in stalest[spare:spare + slots]
        ]

    print(f"# window={args.window}: {len(SENTINELS)} sentinels + "
          f"{len(failing)} FAILING-latest-row + "
          f"{len(rechecks)} re-checks + {len(rotation)} rotation + "
          f"{len(freshness)} freshness; "
          f"{len(queue)} queued for the round after")
    print("_DRIVER_ORDER = [")
    for n in SENTINELS:
        print(f'    "{n}",  # sentinel')
    for n in failing:
        print(f'    "{n}",  # FAILING latest driver row ({last_round[n]}) — investigate')
    for n in rechecks:
        if n in SENTINELS or n in failing:
            continue  # already emitted; a dup would silently burn a window slot
        print(f'    "{n}",  # re-check: implementation changed')
    for n in rotation:
        print(f'    "{n}",')
    for n, src in freshness:
        print(f'    "{n}",  # freshness: last driver row {src}')
    if queue:
        print("    # ============ next-round rotation queue ================")
        for n in queue:
            print(f'    "{n}",')
    if next_queue:
        print("    # ===== next-round freshness queue (stalest beyond this")
        print("    # window; uncomment = next round's mechanical cut) =====")
        for n, src in next_queue:
            print(f'    # "{n}",  # last driver row {src}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
