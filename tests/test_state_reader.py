"""State Data Source introspection (streaming/state_reader.py): run a
real stateful query against a checkpoint, stop it, and read the
operator's buffered state back as DataFrames."""

from __future__ import annotations

import pyspark.sql.functions as F

from fhir_to_lakehouse_spark.streaming.state_reader import (
    read_state,
    read_state_metadata,
    state_key_counts,
)


def _run_stateful_count(spark, tmp_path):
    """A streaming groupBy-count over a file source with update-mode
    output: counts per key stay IN the state store across batches, so
    the checkpoint retains exactly one state row per distinct key."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        '{"k": "a"}\n{"k": "a"}\n{"k": "b"}\n{"k": "c"}\n'
    )
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("k string").json(str(src))
    q = (
        stream.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_reader_e2e")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return ckpt


def test_state_metadata_lists_the_aggregate_operator(spark, tmp_path):
    ckpt = _run_stateful_count(spark, tmp_path)
    meta = read_state_metadata(spark, ckpt).collect()
    assert len(meta) >= 1
    ops = {r.operatorName for r in meta}
    assert "stateStoreSave" in ops  # the streaming aggregate's operator
    assert all(r.numPartitions > 0 for r in meta)


def test_read_state_returns_buffered_counts(spark, tmp_path):
    ckpt = _run_stateful_count(spark, tmp_path)
    rows = read_state(spark, ckpt, operator_id=0).collect()
    # the value struct carries the operator's INTERNAL aggregation
    # buffer (field name `count`), not the query's output alias —
    # index positionally, Row.count is a method
    counts = {r.key.k: r.value[0] for r in rows}
    assert counts == {"a": 2, "b": 1, "c": 1}
    # partition_id present and within the shuffle-partition range
    assert all(0 <= r.partition_id for r in rows)


def test_state_key_counts_sums_to_distinct_keys(spark, tmp_path):
    ckpt = _run_stateful_count(spark, tmp_path)
    per_shard = state_key_counts(spark, ckpt).collect()
    assert sum(r.n_keys for r in per_shard) == 3
