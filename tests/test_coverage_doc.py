"""COVERAGE.md <-> registry consistency (round-6 meta-test).

COVERAGE.md cites `q:<name>` / `q*:<name>` queries, `t:<test file>`
pytest modules, and backticked `<path>.py [symbol]` implementation
sites by hand; nothing previously asserted those citations stay valid
as code moves (the analogous staleness bug was round 4's driver-window
meta-test lesson). These tests fail the suite the moment a cited query
name, test module, impl path, or symbol goes stale.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "etl_mri_scripts_spark")


def _coverage_text() -> str:
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        return f.read()


def test_cited_query_names_exist_in_registry():
    from etl_mri_scripts_spark.queries import ORACLES, QUERIES

    text = _coverage_text()
    oracled = set(re.findall(r"(?<!\*)\bq:([a-z0-9_]+)", text))
    rows_only = set(re.findall(r"\bq\*:([a-z0-9_]+)", text))
    assert oracled and rows_only, "COVERAGE.md citation formats changed?"

    missing = sorted((oracled | rows_only) - set(QUERIES))
    assert not missing, f"COVERAGE.md cites unregistered queries: {missing}"

    # q: means the driver hash-compares against a DuckDB oracle — the
    # oracle entry must exist; q*: means rows-only BY DESIGN — an oracle
    # appearing later should upgrade the citation, so flag that too.
    no_oracle = sorted(n for n in oracled if n not in ORACLES)
    assert not no_oracle, f"cited as q: but no oracle_sql entry: {no_oracle}"
    stale_star = sorted(n for n in rows_only if n in ORACLES)
    assert not stale_star, f"cited as q*: but an oracle now exists: {stale_star}"


def test_cited_test_modules_exist():
    names = set(re.findall(r"\bt:(test_[a-zA-Z0-9_]+)", _coverage_text()))
    assert names
    missing = sorted(
        n for n in names if not os.path.exists(os.path.join(REPO, "tests", n + ".py"))
    )
    assert not missing, f"COVERAGE.md cites absent test modules: {missing}"


def test_cited_impl_paths_and_symbols_exist():
    """Backticked `<relpath>.py [symbols...]` citations: the file must
    exist (package-relative, repo-relative, or a /root/reference
    citation), and every identifier named after it must occur in that
    file's source."""
    text = _coverage_text()
    stale: list[str] = []
    for span in re.findall(r"`([^`]*\.py[^`]*)`", text):
        parts = span.split()
        if not parts or not parts[0].endswith(".py"):
            continue  # e.g. a full command line — not a path citation
        rel = parts[0]
        path = None
        for base in (PKG, REPO, "/root/reference"):
            cand = os.path.join(base, rel)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            stale.append(f"missing file: {span!r}")
            continue
        with open(path) as f:
            src = f.read()
        for tok in parts[1:]:
            for sym in tok.split("/"):
                if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", sym) and sym not in src:
                    stale.append(f"symbol {sym!r} not in {rel}: {span!r}")
    assert not stale, "stale COVERAGE.md citations:\n" + "\n".join(stale)
