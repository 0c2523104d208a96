"""Driver-contract checks: entry() smoke, queries()/oracle_sql() shape."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_every_oracle_key_has_a_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # coverage floor: the library should stay broad
    assert len(qs) >= 50
    assert len(oracles) >= 45


def test_rows_only_queries_are_documented():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        doc = qs[name].__doc__ or ""
        assert "rows-only" in doc.lower(), f"{name} lacks rows-only rationale"
