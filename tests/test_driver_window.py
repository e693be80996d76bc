"""Driver-window layout invariants: the round driver oracle-checks only
the first ~50 registered queries per round, so the registry front must
always contain (a) stable sentinels that were driver-verified in an
earlier round — regression insurance — and (b) the rotation block of
not-yet-verified queries. Pure registry checks; no Spark session needed.
"""

from __future__ import annotations

import json
import os

from etl_mri_scripts_spark.queries import ORACLES, QUERIES

WINDOW = 50

# Queries that must NEVER rotate out of the window: one driver-green
# representative per module family (see queries/__init__.py).
SENTINELS = [
    "window_tumbling_hourly",
    "dedup_exact_hash",
    "text_token_counts",
    "ann_bruteforce_topk",
    "pricing_summary",
]


def test_sentinels_inside_window():
    front = list(QUERIES)[:WINDOW]
    for s in SENTINELS:
        assert s in front, f"sentinel {s} rotated out of the driver window"


def test_sentinels_have_oracles():
    for s in SENTINELS:
        assert s in ORACLES, f"sentinel {s} lost its oracle (rows-only is weaker)"


def test_window_prioritizes_unverified_queries():
    """The window should be mostly queries without a prior driver
    CORRECTNESS row (rotation), not re-runs of already-verified ones."""
    verified: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fn in sorted(os.listdir(root)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(root, fn)) as f:
                verified |= set(json.load(f))
    if not verified:  # fresh clone without driver artifacts
        return
    front = list(QUERIES)[:WINDOW]
    unverified_total = len(set(QUERIES) - verified)
    unverified_in_window = sum(1 for n in front if n not in verified)
    expected = min(unverified_total, WINDOW - len(SENTINELS) - 10)
    assert unverified_in_window >= expected, (
        f"only {unverified_in_window} unverified queries in the window; "
        f"{unverified_total} are waiting for a driver row"
    )


def test_registry_and_oracle_order_consistent():
    names = list(QUERIES)
    assert list(ORACLES) == [n for n in names if n in ORACLES]
