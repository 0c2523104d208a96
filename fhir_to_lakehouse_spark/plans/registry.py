"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracle.

Contract (driver correctness gate): for every registered query the
oracle SQL must produce the same row count, schema, and order-insensitive
value hash on the same parquet tables. Therefore:

- alias every computed column identically on both sides;
- round floating-point aggregates on both sides (accumulation order
  differs between engines, raw double sums will not hash-match);
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT);
- break ties deterministically in every top-k / LIMIT query (include a
  unique key in the ORDER BY) — the result *set* must be identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is equivalent DuckDB SQL.

    Queries whose semantics are not SQL-expressible (stateful streaming,
    iterative algorithms, hash functions DuckDB lacks) pass oracle=None
    and get the driver's weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
