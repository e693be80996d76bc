"""Round-10 additions (r9 verdict demands + ADVICE):

- drift-gate memory (verdict #2): bench.py counts consecutive non-ok
  verdicts per query across prior driver rounds (BENCH_r{N}.json) plus
  the current run; a streak >= 3 escalates — requires an interleaved
  A/B (the r9 ab_semdedup.py recipe) or a re-pin with rationale, so a
  query that settles permanently ~1 band above its pin can no longer
  ride `noise-band` forever without adjudication.
- imaging gate no-stats verdict (ADVICE): an observed metric absent
  from pin['stats'] gets an explicit per-metric 'no-stats' verdict and
  a partial verdict_gate, never a silent exclusion.
- noise_slack monotone interpolation (ADVICE): the rel band ramps
  50% -> 25% across (0.7 s, 1.0 s) so re-pins near 1 s cannot flip the
  band width discontinuously (property in test_gate_properties.py;
  boundary values in test_round9_additions.py).

No Spark session needed — pure-Python stat/format work.
"""

from __future__ import annotations

import json
import os

import bench

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------- imaging gate: explicit no-stats verdict ------------------


def test_imaging_gate_no_stats_metric_is_explicit(tmp_path):
    """A hand-edited or partially-derived pin whose stats cover only one
    rate must not let the overall verdict read plain `ok` while the other
    observed rate rides the loose 2x backstop — the uncovered metric gets
    a per-metric 'no-stats' verdict and the gate reads partial."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "stats": {
            "patches_per_sec": {"median": 300.0, "spread": 20.0, "tail": 80.0},
            # payload_mb_per_sec stats MISSING (the ADVICE scenario)
        },
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    result = {"patches_per_sec": 310.0, "payload_mb_per_sec": 8.9}
    g = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g["metric_verdicts"]["payload_mb_per_sec"] == "no-stats"
    assert g["metric_verdicts"]["patches_per_sec"] == "ok"
    # overall verdict is the max severity of the ADJUDICATED metrics only,
    # but the gate itself must say it is partial
    assert g["verdict"] == "ok"
    assert g["verdict_gate"].startswith("active (partial)")
    assert "payload_mb_per_sec" in g["verdict_gate"]
    # a fully-covered pin keeps the plain active gate
    pin["stats"]["payload_mb_per_sec"] = {
        "median": 9.0, "spread": 0.6, "tail": 2.4,
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    g2 = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g2["verdict_gate"] == "active"
    assert "no-stats" not in g2["metric_verdicts"].values()


def test_imaging_gate_all_metrics_no_stats_verdict_none(tmp_path):
    """When NO observed metric has pin stats the verdict must be None
    (indeterminate), never a severity computed over zero metrics."""
    from bench_imaging import PIN_FILES, _drift_gate

    pin = {
        "patches_per_sec": 300.0, "payload_mb_per_sec": 9.0,
        "stats": {"some_other_metric": {"median": 1.0}},
    }
    (tmp_path / PIN_FILES["skew"]).write_text(json.dumps(pin))
    result = {"patches_per_sec": 310.0, "payload_mb_per_sec": 8.9}
    g = _drift_gate("skew", result, pin_dir=str(tmp_path))
    assert g["verdict"] is None
    assert set(g["metric_verdicts"].values()) == {"no-stats"}
    assert g["verdict_gate"].startswith("active (partial)")
