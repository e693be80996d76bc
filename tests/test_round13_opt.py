"""Round-13 optimization-round additions.

- bench.contract_line: the driver stores only the last ~2000 chars of
  bench stdout and parses the FINAL JSON line out of that window
  (BENCH_r02-r04 parsed; r05-r12 recorded `parsed: null` because the
  single output line had outgrown the window). The contract line must
  carry exactly the driver-contract keys and stay inside the budget for
  any realistic value width.
- pin_bench_baseline.parse_bench_stdout: the pin tool must keep reading
  the DIAGNOSTICS object (noise block, cpu axis) now that the last
  stdout line is the compact contract line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
import pin_bench_baseline as pbb  # noqa: E402


def test_contract_line_keys_and_fit_at_realistic_widths():
    q = {n: 1.2345 for n in bench.HEADLINE}
    line = bench.contract_line("headline_queries_total_wall", 56.8103, q, 0.1)
    assert len(line) <= bench.CONTRACT_LINE_BUDGET
    doc = json.loads(line)
    assert set(doc) == {"metric", "value", "unit", "queries", "sf"}
    assert doc["unit"] == "sec"
    assert set(doc["queries"]) == set(bench.HEADLINE)
    assert doc["sf"] == 0.1


def test_contract_line_fits_even_on_a_floored_host():
    # r13 self-check saw per-query walls up to 18 s on the floored host;
    # stress far past that — the precision fallback must keep the line
    # inside the window rather than silently overflowing it.
    q = {n: 1234.5678 for n in bench.HEADLINE}
    line = bench.contract_line("headline_queries_total_wall", 69141.8, q, 0.1)
    assert len(line) <= bench.CONTRACT_LINE_BUDGET
    doc = json.loads(line)
    assert set(doc["queries"]) == set(bench.HEADLINE)


def test_contract_line_marks_partial_runs():
    doc = json.loads(
        bench.contract_line("m", 1.0, {"a": 1.0}, 0.01, partial=True)
    )
    assert doc["partial"] is True


def test_contract_line_survives_driver_tail_window():
    # End-to-end shape of the fix: diagnostics line then contract line;
    # the last line inside a 2000-char tail must parse and carry the
    # contract keys — exactly what the driver does.
    q = {n: 3.1415 for n in bench.HEADLINE}
    diag = json.dumps({"metric": "headline_queries_total_wall", "value": 1.0,
                       "queries": q, "noise": {"factor": 1.0}})
    contract = bench.contract_line("headline_queries_total_wall", 175.9, q, 0.1)
    stdout = diag + "\n" + contract + "\n"
    tail = stdout[-2000:]
    doc = json.loads(tail.strip().splitlines()[-1])
    assert doc["value"] == 175.9
    assert len(doc["queries"]) == len(bench.HEADLINE)


def test_parse_bench_stdout_prefers_diagnostics_line():
    diag = {"metric": "headline_queries_total_wall", "value": 2.0,
            "queries": {"a": 1.0}, "noise": {"factor": 1.1}}
    contract = {"metric": "headline_queries_total_wall", "value": 2.0,
                "unit": "sec", "queries": {"a": 1.0}, "sf": 0.1}
    stdout = json.dumps(diag) + "\n" + json.dumps(contract) + "\n"
    got = pbb.parse_bench_stdout(stdout)
    assert "noise" in got  # the pin tool needs the probes/cpu axis


def test_parse_bench_stdout_aux_only_and_legacy_fallback():
    aux = {"metric": "aux_cpu_queries_only", "sf": 0.1,
           "aux_queries_cpu_user_sec": {"x": 1.0}}
    assert parse_ok(aux)
    legacy = {"metric": "headline_queries_total_wall", "value": 1.0,
              "unit": "sec", "queries": {"a": 1.0}, "sf": 0.1}
    # pre-r13 single-line output still parses (fallback path)
    assert pbb.parse_bench_stdout(json.dumps(legacy)) == legacy


def parse_ok(doc) -> bool:
    out = pbb.parse_bench_stdout("garbage\n" + json.dumps(doc) + "\n")
    return out == doc
