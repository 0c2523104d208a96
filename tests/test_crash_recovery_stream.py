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


# --- rate-limited backfill (VERDICT r4 item 6): maxFilesPerTrigger ----
#
# A large backfill arrives as MANY micro-batches when the source is
# rate-limited (file source: maxFilesPerTrigger; the kafka double
# implements the analogous maxOffsetsPerTrigger proportional split).
# The merge path must compose across batch boundaries: within-batch W1
# dedup + cross-batch last-writer-wins via idempotent merge — the
# split into batches must never change the final table state.


class RecordingPipeline(BundlePipeline):
    def __init__(self, spark, cfg):
        super().__init__(spark, cfg)
        self.batch_ids: list[int] = []

    def process_batch(self, batch_df, batch_id):
        self.batch_ids.append(batch_id)
        super().process_batch(batch_df, batch_id)


def _backfill_files(src_dir):
    """Three files whose batch-order semantics exercise cross-batch
    update, delete-of-earlier-create, and late create. mtimes are
    staggered so the file source's oldest-first pickup is
    deterministic."""
    import os
    import time

    batches = [
        ("b0.json", [
            kafka_row(put_bundle("Patient", "1", active=True), partition=0, offset=0),
        ]),
        ("b1.json", [
            kafka_row(put_bundle("Patient", "1", active=False), partition=0, offset=1),
            kafka_row(put_bundle("Patient", "2", active=True), partition=0, offset=2),
        ]),
        ("b2.json", [
            kafka_row(delete_bundle("Patient", "2"), partition=0, offset=3),
            kafka_row(put_bundle("Patient", "3", active=True), partition=0, offset=4),
        ]),
    ]
    now = time.time()
    for i, (name, rows) in enumerate(batches):
        _write_batch(src_dir, name, rows)
        os.utime(src_dir / name, (now - 30 + i * 10, now - 30 + i * 10))


_EXPECTED = {"1": False, "3": True}  # 2 deleted after its create


def _patient_state(pipeline):
    return {
        r["id"]: r["active"]
        for r in pipeline.table("Patient").to_df().select("id", "active").collect()
    }


def test_rate_limited_backfill_splits_batches_same_final_state(spark, tmp_path):
    """maxFilesPerTrigger=1 under availableNow: the backfill runs as
    one micro-batch per file, and the final state equals an unlimited
    single-batch run over the same files."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _backfill_files(src_dir)

    limited = RecordingPipeline(
        spark,
        PipelineConfig(
            warehouse_dir=str(tmp_path / "wh_lim"),
            checkpoint_dir=str(tmp_path / "ck_lim"),
        ),
    )
    stream = (
        spark.readStream.schema(KAFKA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
        .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    )
    q = limited.start_stream(stream, query_name="bf_lim", available_now=True)
    q.awaitTermination(120)
    assert len(limited.batch_ids) == 3, limited.batch_ids

    unlimited = RecordingPipeline(
        spark,
        PipelineConfig(
            warehouse_dir=str(tmp_path / "wh_all"),
            checkpoint_dir=str(tmp_path / "ck_all"),
        ),
    )
    q2 = unlimited.start_stream(
        _file_stream(spark, src_dir), query_name="bf_all", available_now=True
    )
    q2.awaitTermination(120)
    assert len(unlimited.batch_ids) == 1, unlimited.batch_ids

    assert _patient_state(limited) == _EXPECTED
    assert _patient_state(unlimited) == _EXPECTED


def test_crash_mid_backfill_replays_only_uncommitted_batches(spark, tmp_path):
    """Crash after the FIRST rate-limited batch's merge but before its
    commit; recovery must replay that batch (idempotently) plus the
    remaining files — never the whole backfill twice — and converge to
    the same final state."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _backfill_files(src_dir)
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )

    def limited_stream():
        return (
            spark.readStream.schema(KAFKA_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src_dir))
            .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
        )

    crashing = CrashingPipeline(spark, cfg, crash_batches=1)
    q = crashing.start_stream(limited_stream(), query_name="bf_cr")
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.processAllAvailable()
        q.awaitTermination()
    # batch 0's merge landed before the crash (at-least-once half)
    assert _patient_state(crashing) == {"1": True}

    recovered = RecordingPipeline(spark, cfg)
    q2 = recovered.start_stream(
        limited_stream(), query_name="bf_cr", available_now=True
    )
    q2.awaitTermination(120)
    # replayed batch 0 + fresh batches 1 and 2 — exactly three, not six
    assert len(recovered.batch_ids) == 3, recovered.batch_ids
    assert recovered.batch_ids[0] == 0  # the uncommitted batch replays
    assert _patient_state(recovered) == _EXPECTED
