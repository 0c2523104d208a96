"""Checkpointed streaming-state introspection — the State Data Source.

Spark 4's ``statestore`` / ``state-metadata`` read formats open a
streaming query's checkpoint as ordinary DataFrames: every stateful
operator's per-key state (windowed aggregates in flight, dedup keys
within the watermark, join buffers, transformWithState variables) and
the operator/partition metadata that locates it. This is the ops
surface the reference lacks entirely — debugging "why is this key
stuck", sizing state before a rescale, or auditing what a crashed
query had buffered, all WITHOUT replaying the stream or touching the
live query.

Read-only by construction: the source reads committed state versions,
so inspecting a running query's checkpoint is safe (it sees the last
committed batch, never a partial write).

Scale: state files are partitioned exactly like the operator
(``spark.sql.shuffle.partitions`` shards per operator); the reader
parallelizes over shards, so inspecting a 10k-shard 100 TB-pipeline
checkpoint is itself a distributed scan, and predicate pushdown on
``partition_id`` prunes shards server-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator-level map of a checkpoint: one row per stateful
    operator per state-store instance (operatorId, operatorName,
    stateStoreName, numPartitions, min/max usable batch ids). The
    entry point: its operatorId/batch range feed :func:`read_state`."""
    return (
        spark.read.format("state-metadata").load(checkpoint_dir)
    )


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Per-key state rows of one stateful operator as (key, value,
    partition_id) structs — the exact buffered contents a restarted
    query would resume from. ``batch_id`` time-travels to any retained
    batch (default: latest committed); ``store_name``/``join_side``
    select among a stream-stream join's four stores."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    return reader.load(checkpoint_dir)


def state_key_counts(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> DataFrame:
    """Shard-level state sizing: (partition_id, n_keys) for one
    operator — the skew report that answers "is one state shard
    holding all the keys" before a repartition/rescale decision."""
    import pyspark.sql.functions as F

    return (
        read_state(spark, checkpoint_dir, operator_id=operator_id)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
