"""Deeper streaming semantics: late-data handling under watermarks and
checkpoint recovery (restart without reprocessing)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig
from tests.fixtures import KAFKA_SCHEMA, kafka_row, put_bundle


def _write_json_batch(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Append-mode windowed aggregation only emits a window after the
    watermark passes it; events arriving later than the watermark
    horizon are dropped from closed windows."""
    schema = "event_id long, ts timestamp, value double"
    src = tmp_path / "src"
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    # batch 1: two events in window [10:00,10:05) + one at 11:00 that
    # advances the watermark far past that window
    _write_json_batch(
        src / "b1.json",
        [
            {"event_id": 1, "ts": base.isoformat(), "value": 1.0},
            {"event_id": 2, "ts": (base + dt.timedelta(minutes=1)).isoformat(), "value": 2.0},
            {"event_id": 3, "ts": (base + dt.timedelta(hours=1)).isoformat(), "value": 4.0},
        ],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    ckpt = str(tmp_path / "ck")
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the long-closed 10:00 window
        _write_json_batch(
            src / "b2.json",
            [{"event_id": 4, "ts": (base + dt.timedelta(minutes=2)).isoformat(), "value": 8.0}],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM late_out").collect()}
    w1 = dt.datetime(2024, 1, 1, 10, 0)
    # the 10:00 window was emitted with the two on-time events only;
    # the late event_id=4 did not reopen or re-emit it
    assert out.get(w1) == 2


def test_checkpoint_restart_does_not_reprocess(spark, tmp_path):
    """Stop the bundle stream, add new data, restart with the same
    checkpoint: the first batch is not re-applied (offsets restored),
    and the new data lands exactly once."""
    src = tmp_path / "src"
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )
    pipe = BundlePipeline(spark, cfg)

    def rows_to_json(rows):
        out = []
        for r in rows:
            d = dict(r)
            d["timestamp"] = d["timestamp"].isoformat()
            out.append(d)
        return out

    _write_json_batch(
        src / "b1.json",
        rows_to_json(
            [kafka_row(put_bundle("Patient", "1", active=True), offset=0)]
        ),
    )

    def start():
        stream = (
            spark.readStream.schema(KAFKA_SCHEMA)
            .json(str(src))
            .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
        )
        return pipe.start_stream(stream, query_name="ckpt_t")

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert pipe.table("Patient").to_df().count() == 1

    # second run: same checkpoint, one new bundle
    _write_json_batch(
        src / "b2.json",
        rows_to_json(
            [kafka_row(put_bundle("Patient", "2", active=False), offset=1)]
        ),
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    tbl = pipe.table("Patient").to_df()
    assert sorted(r["id"] for r in tbl.collect()) == ["1", "2"]
    # id=1 unchanged (not re-upserted with different content), id=2 new
    assert tbl.where("id = '1' and active = true").count() == 1
