"""Timestamp-encoding robustness: the events table must work however the
driver's testdata generator encodes ``ts``.

Round-2 regression postmortem: the testdata was regenerated between rounds
and ``events.ts`` silently changed from parquet TIMESTAMP(NANOS) (read as
bigint under ``nanosAsLong``) to TIMESTAMP_MICROS with ``isAdjustedToUTC=0``
(read as TIMESTAMP_NTZ) — which broke ``events_sessionize``
(``cast("long")`` is an analysis error on NTZ) and every watermarked stream
(Spark's watermark contract requires TIMESTAMP proper:
``withWatermark`` raises ``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` on any
other type — see Spark's ``EventTimeWatermark`` analysis rule).

This test writes one tiny events table THREE ways —
TIMESTAMP (UTC-adjusted micros), TIMESTAMP_NTZ (unadjusted micros), and
int64-style TIMESTAMP(NANOS) — and asserts that after ``load_table``
normalization every ``events_*`` registered query AND a watermarked
streaming aggregation run on each, producing identical results.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fhir_to_lakehouse_spark.plans import QUERIES
from fhir_to_lakehouse_spark.sources.tables import load_table
from fhir_to_lakehouse_spark.streaming import windows as W

EVENTS_QUERIES = [
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_sessionize",
    "events_user_funnel",
]

# a deterministic micro-table: 3 users, gaps straddling the 30-min
# session boundary and the 1-hour tumbling boundary
_BASE = dt.datetime(2024, 3, 1, 10, 0, 0)
_ROWS = [
    # (event_id, minutes-offset, user_id, event_type, value)
    (1, 0, 1, "view", 1.0),
    (2, 10, 1, "click", 2.0),
    (3, 55, 1, "purchase", 30.0),   # 45-min gap -> new session, same hour+1
    (4, 0, 2, "view", 1.5),
    (5, 29, 2, "view", 0.5),        # 29-min gap -> same session
    (6, 61, 2, "purchase", 12.0),   # 32-min gap -> new session, next hour
    (7, 120, 3, "view", 3.0),
]


def _arrow_table(ts_type: pa.DataType) -> pa.Table:
    ts = [_BASE + dt.timedelta(minutes=m) for _, m, _, _, _ in _ROWS]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array(ts, ts_type),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array(["{}"] * len(_ROWS), pa.string()),
        }
    )


ENCODINGS = {
    # isAdjustedToUTC=1 -> Spark reads TIMESTAMP
    "utc_micros": pa.timestamp("us", tz="UTC"),
    # isAdjustedToUTC=0 -> Spark 4 reads TIMESTAMP_NTZ (the round-2 breaker)
    "ntz_micros": pa.timestamp("us"),
    # TIMESTAMP(NANOS) -> Spark reads bigint under nanosAsLong (round-1 data)
    "int64_nanos": pa.timestamp("ns"),
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    dirs = {}
    for name, ts_type in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"enc_{name}")
        # version='2.6' keeps nanos as NANOS instead of coercing to micros
        pq.write_table(
            _arrow_table(ts_type), str(d / "events.parquet"), version="2.6"
        )
        dirs[name] = str(d)
    return dirs


def test_load_table_normalizes_every_encoding(spark, encoded_dirs):
    for name, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"{name}: load_table must yield TIMESTAMP (watermark contract)"
        )
        # identical instants regardless of encoding (UTC session zone)
        got = sorted(r["ts"] for r in df.select("ts").collect())
        want = sorted(_BASE + dt.timedelta(minutes=m) for _, m, _, _, _ in _ROWS)
        assert got == want, name


@pytest.mark.parametrize("qname", EVENTS_QUERIES)
def test_events_queries_run_on_every_encoding(spark, encoded_dirs, qname):
    results = {}
    for name, d in encoded_dirs.items():
        rows = QUERIES[qname](spark, d).collect()
        results[name] = sorted(tuple(r) for r in rows)
        assert rows, f"{qname} on {name} produced no rows"
    # all three encodings must agree exactly
    assert results["utc_micros"] == results["ntz_micros"] == results["int64_nanos"]


def test_watermarked_stream_runs_on_every_encoding(spark, encoded_dirs, tmp_path):
    for name, d in encoded_dirs.items():
        ev = load_table(spark, d, "events")
        ev_dir = str(tmp_path / f"stream_{name}")
        ev.write.mode("overwrite").parquet(ev_dir)
        stream = spark.readStream.schema(ev.schema).parquet(ev_dir)
        q = (
            W.tumbling_counts(stream)  # applies withWatermark("ts", ...)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(f"wm_{name}")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.sql(f"SELECT * FROM wm_{name}").collect()
        assert out, f"watermarked stream on {name} produced no windows"
