"""The adjudication docs' query-count headers must match the imported
registry (VERDICT r11 item 2: COVERAGE.md shipped a 273/262 header two
rounds after the registry reached 279/277/2 — counts stated in prose
drift unless CI derives them from the single source of truth).

No Spark session needed: the registry import is pure Python.
"""

from __future__ import annotations

import re
from pathlib import Path

from fhir_to_lakehouse_spark.plans import ORACLES, QUERIES

ROOT = Path(__file__).resolve().parents[1]

# one (file, regex) per doc that states the count triple; each regex
# captures (declared, oracle-checked, rows-only) in that order
HEADERS = [
    (
        "COVERAGE.md",
        r"(\d+) declared queries; (\d+) DuckDB-oracle-checked, (\d+) rows-only",
    ),
    (
        "QUERIES.md",
        r"(\d+) queries; (\d+) DuckDB-oracle-checked, (\d+) rows-only",
    ),
    (
        "README.md",
        r"(\d+) named\s+operators \((\d+) DuckDB-oracle-checked, (\d+) rows-only",
    ),
]


def test_doc_count_headers_match_registry():
    n_q, n_o = len(QUERIES), len(ORACLES)
    n_rows_only = n_q - n_o
    for fname, pattern in HEADERS:
        text = (ROOT / fname).read_text()
        m = re.search(pattern, text)
        assert m, f"{fname}: count header not found (pattern drift?)"
        got = tuple(int(g) for g in m.groups())
        assert got == (n_q, n_o, n_rows_only), (
            f"{fname} states {got}, registry is {(n_q, n_o, n_rows_only)}"
        )


def test_rows_only_set_is_empty():
    # round 12 promoted the last two rows-only entries (the BPE pair);
    # a new rows-only entry (or an oracle regression) must be a
    # deliberate, documented decision — this gate makes it loud
    assert sorted(set(QUERIES) - set(ORACLES)) == []
