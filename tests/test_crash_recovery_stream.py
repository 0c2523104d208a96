"""Crash-recovery e2e for the streaming shell (VERDICT r3 item 5).

Exactly-once table state under replay: in foreachBatch, the table
merge runs INSIDE the batch and the checkpoint offset commit lands
only after the callback returns (reference relies on Delta txn +
checkpoint for the same guarantee, /root/reference/src/main.py:162-175).
The failure window is therefore "table written, checkpoint commit
lost": on restart Spark replays the same micro-batch and the merge
re-runs. Exactly-once table state holds because merge_upsert /
merge_delete are idempotent by key — replaying batch N is a no-op on
rows batch N already wrote. These tests kill a query mid-window and
assert the replayed run converges to the single-run state.
"""

from __future__ import annotations

import json

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig
from tests.fixtures import KAFKA_SCHEMA, delete_bundle, kafka_row, put_bundle


def _write_batch(src_dir, name, rows):
    with open(src_dir / name, "w") as f:
        for r in rows:
            r = dict(r)
            r["timestamp"] = r["timestamp"].isoformat()
            f.write(json.dumps(r) + "\n")


def _file_stream(spark, src_dir):
    return (
        spark.readStream.schema(KAFKA_SCHEMA)
        .json(str(src_dir))
        .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    )


class CrashingPipeline(BundlePipeline):
    """Processes the batch fully (table merges land), then dies before
    returning — so the stream fails AFTER the table write but BEFORE
    the checkpoint offset commit for that batch."""

    def __init__(self, spark, cfg, crash_batches=1):
        super().__init__(spark, cfg)
        self.crashes_left = crash_batches

    def process_batch(self, batch_df, batch_id):
        super().process_batch(batch_df, batch_id)
        if self.crashes_left > 0:
            self.crashes_left -= 1
            raise RuntimeError("injected crash after merge, before commit")


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Kill after merge / before checkpoint commit; restart from the
    same checkpoint; the replayed merge must not duplicate or resurrect
    rows."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _write_batch(
        src_dir,
        "b0.json",
        [
            kafka_row(put_bundle("Patient", "1", active=True), partition=0, offset=0),
            kafka_row(put_bundle("Patient", "2", active=False), partition=0, offset=1),
            kafka_row(delete_bundle("Patient", "1"), partition=0, offset=2),
            kafka_row(put_bundle("Condition", "c1"), partition=0, offset=3),
        ],
    )
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )

    # run 1: the batch processes (merges land), then the stream dies
    # before the epoch commit
    crashing = CrashingPipeline(spark, cfg, crash_batches=1)
    q = crashing.start_stream(_file_stream(spark, src_dir), query_name="cr")
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.processAllAvailable()
        q.awaitTermination()
    # the table write DID happen before the crash — this is the
    # at-least-once half of the window
    assert sorted(
        r["id"] for r in crashing.table("Patient").to_df().collect()
    ) == ["2"]

    # run 2: fresh pipeline object (simulating a new driver process),
    # SAME checkpoint dir -> Spark replays the uncommitted batch
    recovered = BundlePipeline(spark, cfg)
    q2 = recovered.start_stream(
        _file_stream(spark, src_dir), query_name="cr", available_now=True
    )
    q2.awaitTermination(120)

    patients = recovered.table("Patient").to_df().collect()
    assert sorted(r["id"] for r in patients) == ["2"]  # no dup, no resurrection
    assert len(patients) == 1
    assert recovered.table("Condition").to_df().count() == 1


def test_recovery_processes_only_new_data_after_commit(spark, tmp_path):
    """Batches committed before the crash are NOT replayed: add data
    after recovery and verify each batch's effect lands exactly once
    (update-in-place keeps one row per key across three runs)."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _write_batch(
        src_dir,
        "b0.json",
        [kafka_row(put_bundle("Patient", "1", active=True), partition=0, offset=0)],
    )
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )

    # run 1: clean availableNow pass commits batch 0
    p1 = BundlePipeline(spark, cfg)
    q1 = p1.start_stream(
        _file_stream(spark, src_dir), query_name="cr2", available_now=True
    )
    q1.awaitTermination(120)

    # run 2: new file arrives; this batch merges then crashes uncommitted
    _write_batch(
        src_dir,
        "b1.json",
        [kafka_row(put_bundle("Patient", "1", active=False), partition=0, offset=1)],
    )
    p2 = CrashingPipeline(spark, cfg, crash_batches=1)
    q2 = p2.start_stream(_file_stream(spark, src_dir), query_name="cr2")
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q2.processAllAvailable()
        q2.awaitTermination()

    # run 3: recovery replays ONLY the uncommitted batch; final state is
    # the latest PUT, exactly one row
    _write_batch(
        src_dir,
        "b2.json",
        [kafka_row(put_bundle("Patient", "2", active=True), partition=0, offset=2)],
    )
    p3 = BundlePipeline(spark, cfg)
    q3 = p3.start_stream(
        _file_stream(spark, src_dir), query_name="cr2", available_now=True
    )
    q3.awaitTermination(120)

    rows = {
        r["id"]: r["active"]
        for r in p3.table("Patient").to_df().select("id", "active").collect()
    }
    assert rows == {"1": False, "2": True}
