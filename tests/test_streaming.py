"""Streaming shell test: drive the SAME pipeline through a real
Structured Streaming query (file source + foreachBatch) and through the
batch path, asserting identical table state — the stream/batch-agnostic
property the reference's test harness relies on (SURVEY §3.3)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig
from tests.fixtures import KAFKA_SCHEMA, delete_bundle, kafka_row, put_bundle


def test_file_stream_end_to_end(spark, tmp_path):
    rows = [
        kafka_row(put_bundle("Patient", "1", active=True), partition=0, offset=0),
        kafka_row(put_bundle("Patient", "2", active=True), partition=0, offset=1),
        kafka_row(delete_bundle("Patient", "1"), partition=0, offset=2),
        kafka_row(put_bundle("Condition", "c1"), partition=0, offset=3),
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    with open(src_dir / "batch.json", "w") as f:
        for r in rows:
            r = dict(r)
            r["timestamp"] = r["timestamp"].isoformat()
            f.write(json.dumps(r) + "\n")

    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )
    pipe = BundlePipeline(spark, cfg)

    stream = (
        spark.readStream.schema(KAFKA_SCHEMA)
        .json(str(src_dir))
        .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    )
    q = pipe.start_stream(stream, query_name="t")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    patients = pipe.table("Patient").to_df()
    assert sorted(r["id"] for r in patients.collect()) == ["2"]
    assert pipe.table("Condition").to_df().count() == 1


def test_event_time_windows_streaming_match_batch(spark, sf_dir, tmp_path):
    """Tumbling-window aggregation through readStream over the events
    parquet == the batch plan (same logical plan, streaming source)."""
    from fhir_to_lakehouse_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    # complete-mode aggregation over a bounded file stream
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(f"{sf_dir}")  # would read all tables; restrict below
    )
    # write events subset to its own dir for a clean stream source
    ev_dir = str(tmp_path / "events")
    ev.write.mode("overwrite").parquet(ev_dir)
    stream = spark.readStream.schema(ev.schema).parquet(ev_dir)

    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["window"]["start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM ev_out").collect()
    }
    want = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
