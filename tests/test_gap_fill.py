"""Semantics of events_gap_fill beyond the oracle: the spine is dense,
gap hours carry zero counts, and the forward-fill respects day
boundaries (values never leak across midnight)."""

from __future__ import annotations

import datetime as dt

from fhir_to_lakehouse_spark.plans import QUERIES


def test_gap_fill_dense_spine_and_day_bounded_fill(spark, tmp_path):
    rows = [
        # day 1: events at 00h and 03h -> gaps at 01h, 02h
        (1, dt.datetime(2024, 1, 1, 0, 5), 7, "view", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 3, 10), 7, "view", 20.0, "{}"),
        # day 2 starts with a gap hour (00h empty) after events resume at 01h
        (3, dt.datetime(2024, 1, 2, 1, 30), 7, "view", 30.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {r.hour: r for r in QUERIES["events_gap_fill"](spark, str(tmp_path)).collect()}

    hours = sorted(out)
    # dense hourly spine from first to last observed hour, inclusive
    assert hours[0] == dt.datetime(2024, 1, 1, 0, 0)
    assert hours[-1] == dt.datetime(2024, 1, 2, 1, 0)
    assert len(hours) == 26
    # gap hours exist with zero counts
    assert out[dt.datetime(2024, 1, 1, 1, 0)].n_events == 0
    assert out[dt.datetime(2024, 1, 1, 2, 0)].n_events == 0
    # forward fill carries within the day...
    assert float(out[dt.datetime(2024, 1, 1, 2, 0)].sum_value_ff) == 10.0
    assert float(out[dt.datetime(2024, 1, 1, 3, 0)].sum_value_ff) == 20.0
    # ...but NOT across midnight: day-2 00h has no prior value that day
    assert out[dt.datetime(2024, 1, 2, 0, 0)].sum_value_ff is None
    assert float(out[dt.datetime(2024, 1, 2, 1, 0)].sum_value_ff) == 30.0
