"""Streaming window operators: drive each through a real bounded
streaming query (file source) and compare against the batch analog."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.sources.tables import load_table
from fhir_to_lakehouse_spark.streaming import windows as W
from fhir_to_lakehouse_spark.streaming.metrics import ThroughputListener


def _events_stream(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    ev_dir = str(tmp_path / "events")
    ev.write.mode("overwrite").parquet(ev_dir)
    return ev, spark.readStream.schema(ev.schema).parquet(ev_dir)


def _run(spark, sdf, name, mode):
    q = sdf.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    ev, stream = _events_stream(spark, sf_dir, tmp_path)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
        for r in _run(spark, W.tumbling_counts(stream), "tumb", "complete").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .collect()
    }
    assert got == want


def test_session_stream_produces_sessions(spark, sf_dir, tmp_path):
    ev, stream = _events_stream(spark, sf_dir, tmp_path)
    out = _run(spark, W.session_counts(stream), "sess", "complete").collect()
    assert len(out) > 0
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
    # session event counts must total the raw event count
    assert sum(r["n_events"] for r in out) == ev.count()


def test_stateful_running_totals_across_batches(spark, sf_dir, tmp_path):
    ev, stream = _events_stream(spark, sf_dir, tmp_path)
    out = _run(spark, W.running_user_totals(stream), "run_tot", "update").collect()
    # last update per user equals the batch ground truth
    last = {}
    for r in out:
        last[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert last == want


def test_throughput_listener_records_progress(spark, sf_dir, tmp_path):
    ev, stream = _events_stream(spark, sf_dir, tmp_path)
    import time

    listener = ThroughputListener()
    spark.streams.addListener(listener)
    try:
        _run(spark, W.tumbling_counts(stream), "tl_out", "complete")
        # listener events are delivered asynchronously on the bus
        deadline = time.time() + 15
        while time.time() < deadline and listener.input_rows.get("tl_out", 0) == 0:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert listener.input_rows.get("tl_out", 0) == ev.count()
    assert listener.batches.get("tl_out", 0) >= 1
    assert any(k.startswith("tl_out/src0/") for k in listener.offsets)
