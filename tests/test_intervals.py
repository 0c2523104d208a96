"""Truth tables for functions/intervals.py::coalesce_intervals — the
cases where naive lag-based merging goes wrong."""

from __future__ import annotations

from fhir_to_lakehouse_spark.functions.intervals import coalesce_intervals


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "k string, rid int, s int, e int"
    )
    out = coalesce_intervals(df, ["k"], "s", "e", order_tiebreak="rid")
    return {
        (r.k, r.rid): r.island_id
        for r in out.collect()
    }


def test_swallowing_interval_merges_later_ones(spark):
    # [0, 100] swallows [10, 20] and [30, 40] even though consecutive
    # intervals [10,20] and [30,40] do NOT overlap each other — the
    # case a lag(end)-only comparison splits incorrectly
    got = _run(
        spark,
        [("u", 1, 0, 100), ("u", 2, 10, 20), ("u", 3, 30, 40),
         ("u", 4, 150, 160)],
    )
    assert got == {("u", 1): 1, ("u", 2): 1, ("u", 3): 1, ("u", 4): 2}


def test_touching_intervals_merge(spark):
    # start == previous end counts as overlap (<=)
    got = _run(spark, [("u", 1, 0, 10), ("u", 2, 10, 20)])
    assert got == {("u", 1): 1, ("u", 2): 1}


def test_adjacent_gap_splits(spark):
    got = _run(spark, [("u", 1, 0, 10), ("u", 2, 11, 20)])
    assert got == {("u", 1): 1, ("u", 2): 2}


def test_keys_are_independent(spark):
    got = _run(
        spark,
        [("a", 1, 0, 10), ("a", 2, 5, 15), ("b", 1, 5, 15),
         ("b", 2, 100, 110)],
    )
    assert got == {("a", 1): 1, ("a", 2): 1, ("b", 1): 1, ("b", 2): 2}


def test_equal_starts_tiebreak_deterministic(spark):
    # two intervals with the same start: the tiebreak column orders
    # them, and both land in one island regardless
    got = _run(spark, [("u", 2, 0, 5), ("u", 1, 0, 50), ("u", 3, 40, 60)])
    assert got == {("u", 1): 1, ("u", 2): 1, ("u", 3): 1}
