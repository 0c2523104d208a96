"""referral_depth_doubling must agree with the recursive CTE exactly.

The pointer-doubling twin (VERDICT r9 item 5) shares an oracle with
recursive_cte_referral_depth, but the two Spark plans are built from
entirely different mechanics (iterative union vs squaring self-joins)
— this pins them to each other directly so a doubling-logic bug (e.g.
the root self-loop adding distance, or one round too few) cannot hide
behind a sampling gap in the driver's oracle check.
"""

from __future__ import annotations

from fhir_to_lakehouse_spark.plans import QUERIES


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_doubling_matches_recursive_cte(spark, sf_dir):
    cte = _rows(QUERIES["recursive_cte_referral_depth"](spark, sf_dir))
    dbl = _rows(QUERIES["referral_depth_doubling"](spark, sf_dir))
    assert dbl == cte
    # depth 0 is exactly the root
    root = [r for r in dbl if r[0] == 0]
    assert root == [(0, 1, 1, 1)]


def test_doubling_depth_is_floor_log2(spark, sf_dir):
    # in the custkey DIV 2 key scheme, depth(k) == floor(log2(k)):
    # every level's key range must be [2^d, 2^(d+1)-1] (clipped at max)
    rows = QUERIES["referral_depth_doubling"](spark, sf_dir).collect()
    max_key = max(r["max_key"] for r in rows)
    for r in rows:
        d = r["depth"]
        assert r["min_key"] == 2**d
        assert r["max_key"] == min(2 ** (d + 1) - 1, max_key)
        assert r["n"] == r["max_key"] - r["min_key"] + 1
