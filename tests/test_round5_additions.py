"""Round-5 additions.

- Fixture density contract backing middle_n_selection's top-k plan
  (ADVICE r4: the TakeOrderedAndProject form assumes event_id is a dense
  0-based index; pin that assumption so a fixture change fails loudly
  here instead of silently diverging from the oracle).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

SF_DIRS = sorted(d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d))


@pytest.mark.parametrize("sf", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_events_event_id_is_dense_zero_based(sf):
    """middle_n_selection (queries/relational.py) ranks by distance from
    the center *position* using event_id directly, which is only valid
    when row_number() over event_id == event_id + 1, i.e. event_id is a
    dense 0-based index. Assert that contract on every shipped fixture
    scale; if a future fixture breaks it, switch the query to
    operators.rank.global_row_number (density-independent)."""
    pq = os.path.join(sf, "events.parquet")
    if not os.path.exists(pq):
        pytest.skip(f"no events fixture at {sf}")
    n, lo, hi, nd = duckdb.sql(
        f"SELECT count(*), min(event_id), max(event_id), "
        f"count(DISTINCT event_id) FROM read_parquet('{pq}')"
    ).fetchone()
    assert (lo, hi, nd) == (0, n - 1, n), (
        f"{sf}: event_id not dense 0-based (n={n} min={lo} max={hi} "
        f"distinct={nd}); middle_n_selection's top-k form is invalid here"
    )
