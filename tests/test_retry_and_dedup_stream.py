"""Retry decorator semantics + streaming cross-batch dedup."""

from __future__ import annotations

import pytest

from fhir_to_lakehouse_spark.sinks.keyed_table import retry
from fhir_to_lakehouse_spark.streaming.windows import dedup_stream


def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}

    @retry(attempts=4, base_s=0.001)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("concurrent write conflict")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_retry_exhausts_and_raises():
    @retry(attempts=2, base_s=0.001)
    def always_fails():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        always_fails()


def test_dedup_stream_drops_redelivered_rows(spark, tmp_path):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), "a"),
        (1, dt.datetime(2024, 1, 1, 10, 0), "a-redelivered"),  # same key
        (2, dt.datetime(2024, 1, 1, 10, 5), "b"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, payload string")
    src = str(tmp_path / "src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r["event_id"] for r in out) == [1, 2]
