"""SCD2 through the real streaming machinery: a file-sourced stream
feeds merge_scd2 per micro-batch; the resulting versioned dimension
must equal the one-shot batch rebuild on the same data.

Batches are delivered in event-time order (time-bucketed files written
oldest-first; FileStreamSource picks files up oldest-mtime-first) —
the ordering contract documented in operators/scd.py. Out-of-order
WITHIN a batch is fine and exercised (rows inside each bucket are
unordered).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.scd import apply_scd2
from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable
from fhir_to_lakehouse_spark.sources.tables import load_table


def test_streaming_scd2_equals_batch_rebuild(spark, sf_dir, tmp_path):
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("id"),
            F.col("event_type").alias("status"),
            "ts",
        )
        # unique ts per key so chaining is deterministic
        .groupBy("id", "ts")
        .agg(F.max("status").alias("status"))
    )
    bounds = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    src = tmp_path / "src"
    src.mkdir()
    # four time buckets written oldest-first => per-key time-ordered
    # micro-batches (rows within a bucket stay unordered)
    span = (bounds.hi - bounds.lo) / 4
    for i in range(4):
        lo = bounds.lo + i * span
        hi = bounds.hi if i == 3 else bounds.lo + (i + 1) * span
        cond = (F.col("ts") >= lo) & (
            (F.col("ts") <= hi) if i == 3 else (F.col("ts") < hi)
        )
        ev.filter(cond).coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(0.1)  # distinct mtimes -> stable pickup order

    table = KeyedTable(spark, str(tmp_path / "dim.parquet"), key="id")

    def sink(batch_df, batch_id):
        table.merge_scd2(batch_df, "ts", ["status"])

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = table.to_df()
    want = apply_scd2(None, ev, key="id", ts_col="ts", tracked=["status"])
    cols = ["id", "status", "valid_from", "valid_to", "is_current"]
    got_set = {tuple(r) for r in got.select(*cols).collect()}
    want_set = {tuple(r) for r in want.select(*cols).collect()}
    assert got_set == want_set
    assert len(got_set) > 0
