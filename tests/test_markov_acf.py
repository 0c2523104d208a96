"""Known-answer tests for the Markov transition matrix and the lag-k
autocorrelation sweep: a hand-built two-user journey with exact
transition probabilities, and a perfectly period-2 daily series whose
ACF is exactly -1 at odd lags and +1 at even lags."""

from __future__ import annotations

import datetime as dt

from fhir_to_lakehouse_spark.plans import QUERIES

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_markov_transitions_known_matrix(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: a b a b a  -> a->b x2, b->a x2
    for i, et in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, et, 1.0, "{}"))
    # user 2: a a        -> a->a x1 (and NO chaining into user 1)
    for i, et in enumerate(["a", "a"]):
        rows.append((10 + i, t0 + dt.timedelta(minutes=i), 2, et, 1.0, "{}"))
    spark.createDataFrame(rows, _SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        (r.from_type, r.to_type): r
        for r in QUERIES["events_markov_transitions"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a"), ("a", "a")}
    assert out[("a", "b")].n_transitions == 2
    assert out[("a", "a")].n_transitions == 1
    assert out[("b", "a")].n_transitions == 2
    assert out[("a", "b")].prob == round(2 / 3, 6)
    assert out[("a", "a")].prob == round(1 / 3, 6)
    assert out[("b", "a")].prob == 1.0
    # rows come back ordered by (from_type, to_type)
    ordered = [
        (r.from_type, r.to_type)
        for r in QUERIES["events_markov_transitions"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert ordered == sorted(ordered)


def test_autocorrelation_period_two_series(spark, tmp_path):
    # one event per day, values alternating 1, 2 for 14 days: the daily
    # series is exactly period-2, so corr is -1 at odd lags, +1 at even
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i),
            1,
            "view",
            float(1 + i % 2),
            "{}",
        )
        for i in range(14)
    ]
    spark.createDataFrame(rows, _SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r.lag: r
        for r in QUERIES["events_autocorrelation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert sorted(out) == [1, 2, 3, 4, 5, 6, 7]
    for lag in range(1, 8):
        assert out[lag].n_pairs == 14 - lag
        assert out[lag].acf == (1.0 if lag % 2 == 0 else -1.0)
