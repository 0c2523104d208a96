"""Truth tables for functions/timeseries.py::ewma — hand-computed
kernels, short-history normalization, and tap truncation."""

from __future__ import annotations

import pytest

from fhir_to_lakehouse_spark.functions.timeseries import ewma


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = ewma(df, ["k"], ["t"], "v", **kw)
    return {(r.k, r.t): r.ewma for r in out.collect()}


def test_hand_computed_kernel(spark):
    # alpha=0.5, taps=3: weights (oldest->newest) 0.25, 0.5, 1.0
    got = _run(
        spark,
        [("u", 1, 4.0), ("u", 2, 8.0), ("u", 3, 2.0)],
        alpha=0.5,
        taps=3,
    )
    # t=1: only itself -> 4.0
    assert got[("u", 1)] == pytest.approx(4.0)
    # t=2: (4*0.5 + 8*1.0) / 1.5 = 10/1.5
    assert got[("u", 2)] == pytest.approx(10 / 1.5)
    # t=3: (4*0.25 + 8*0.5 + 2*1.0) / 1.75 = 7/1.75 = 4.0
    assert got[("u", 3)] == pytest.approx(4.0)


def test_taps_truncate_history(spark):
    # taps=2: at t=3 only t=2 and t=3 contribute
    got = _run(
        spark,
        [("u", 1, 100.0), ("u", 2, 8.0), ("u", 3, 2.0)],
        alpha=0.5,
        taps=2,
    )
    assert got[("u", 3)] == pytest.approx((8 * 0.5 + 2) / 1.5)


def test_short_history_is_unbiased(spark):
    # constant series must smooth to the constant from the first row
    got = _run(
        spark,
        [("u", i, 7.0) for i in range(1, 6)],
        alpha=0.7,
        taps=20,
    )
    for t in range(1, 6):
        assert got[("u", t)] == pytest.approx(7.0)


def test_keys_independent(spark):
    got = _run(
        spark,
        [("a", 1, 1.0), ("a", 2, 3.0), ("b", 1, 100.0)],
        alpha=0.5,
        taps=5,
    )
    assert got[("a", 2)] == pytest.approx((1 * 0.5 + 3) / 1.5)
    assert got[("b", 1)] == pytest.approx(100.0)
