"""Stream-stream (watermarked, time-bounded) and stream-static joins,
driven through real streaming queries and checked against the batch
plan on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.sources.tables import load_table
from fhir_to_lakehouse_spark.streaming.windows import (
    stream_stream_click_purchase_join,
)


def _events_split_stream(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    ev_dir = str(tmp_path / "events")
    ev.write.mode("overwrite").parquet(ev_dir)
    stream = spark.readStream.schema(ev.schema).parquet(ev_dir)
    return ev, stream


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    ev, stream = _events_split_stream(spark, sf_dir, tmp_path)
    clicks_s = stream.filter(F.col("event_type") == "click")
    purchases_s = stream.filter(F.col("event_type") == "purchase")
    joined = stream_stream_click_purchase_join(clicks_s, purchases_s)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.expr("purchase_ts - INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_enrichment(spark, sf_dir, tmp_path):
    """Streaming events enriched with a static dimension (the
    stream-static join needs no watermark: the static side is
    re-read per micro-batch)."""
    ev, stream = _events_split_stream(spark, sf_dir, tmp_path)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("purchase", "revenue"), ("view", "engagement"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, category string",
    )
    enriched = stream.join(F.broadcast(dim), "event_type").groupBy("category").count()
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sse_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["category"]: r["count"]
        for r in spark.sql("SELECT * FROM sse_out").collect()
    }
    want = {
        r["category"]: r["count"]
        for r in ev.join(dim, "event_type").groupBy("category").count().collect()
    }
    assert got == want
