"""Runnable streaming app — reference src/main.py parity.

    python -m fhir_to_lakehouse_spark --source kafka
    python -m fhir_to_lakehouse_spark --source file --input /path/ndjson

Builds the session, constructs the source (Kafka with full option
parity where the connector jar exists; a file source of Kafka-shaped
JSON rows otherwise — same downstream pipeline), starts ONE streaming
query with the foreachBatch engine core, registers the throughput
listener, and blocks on termination like the reference
(/root/reference/src/main.py:194 awaitAnyTermination).

Configuration comes from environment variables with the reference's
defaults (see env_config): FHIR_KAFKA_BOOTSTRAP, FHIR_TOPICS,
FHIR_MAX_OFFSETS, FHIR_WAREHOUSE_DIR, FHIR_CHECKPOINT_DIR,
FHIR_UPKEEP_INTERVAL, ...
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.session import get_spark
from fhir_to_lakehouse_spark.sources.kafka import KafkaSourceConfig, kafka_reader
from fhir_to_lakehouse_spark.streaming.metrics import ThroughputListener
from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig


def env_config() -> tuple[KafkaSourceConfig, PipelineConfig]:
    """Typed config from env vars (reference settings.py parity:
    typed-settings tree with the same defaults)."""
    env = os.environ
    kafka = KafkaSourceConfig(
        bootstrap_servers=env.get("FHIR_KAFKA_BOOTSTRAP", "localhost:9092"),
        topics=env.get("FHIR_TOPICS", "fhir.all").split(","),
        max_offsets_per_trigger=int(env.get("FHIR_MAX_OFFSETS", "10000")),
        min_offsets_per_trigger=int(env.get("FHIR_MIN_OFFSETS", "1")),
        max_trigger_delay=env.get("FHIR_MAX_TRIGGER_DELAY", "15m"),
        ssl_enabled=env.get("FHIR_KAFKA_SSL", "") == "true",
        ssl_truststore_location=env.get("FHIR_SSL_TRUSTSTORE"),
        ssl_truststore_password=env.get("FHIR_SSL_TRUSTSTORE_PASSWORD"),
        ssl_keystore_location=env.get("FHIR_SSL_KEYSTORE"),
        ssl_keystore_password=env.get("FHIR_SSL_KEYSTORE_PASSWORD"),
    )
    pipeline = PipelineConfig(
        warehouse_dir=env.get("FHIR_WAREHOUSE_DIR", "/tmp/fhir-warehouse"),
        checkpoint_dir=env.get("FHIR_CHECKPOINT_DIR", "/tmp/fhir-checkpoints"),
        upkeep_interval=int(env.get("FHIR_UPKEEP_INTERVAL", "50")),
        vacuum_retention_hours=float(env.get("FHIR_VACUUM_RETENTION_H", "24")),
        log_batch_stats=env.get("FHIR_LOG_BATCH_STATS", "") == "true",
    )
    return kafka, pipeline


def build_source(spark, args, kafka_cfg: KafkaSourceConfig):
    if args.source == "kafka":
        return kafka_reader(spark, kafka_cfg).load()
    if args.source == "fhir_files":
        # custom Python DataSource: NDJSON bundle files, incremental
        from fhir_to_lakehouse_spark.sources.fhir_datasource import register

        register(spark)
        return spark.readStream.format("fhir_bundles").load(args.input)
    from fhir_to_lakehouse_spark.schemas import KAFKA_RECORD_SCHEMA

    return (
        spark.readStream.schema(KAFKA_RECORD_SCHEMA)
        .json(args.input)
        .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fhir_to_lakehouse_spark")
    ap.add_argument(
        "--source", choices=["kafka", "file", "fhir_files"], default="kafka"
    )
    ap.add_argument(
        "--input",
        help="file source: dir of Kafka-shaped JSON rows; "
        "fhir_files source: dir of FHIR bundle NDJSON",
    )
    ap.add_argument(
        "--once",
        action="store_true",
        help="process available data then exit (file-source testing)",
    )
    args = ap.parse_args(argv)

    kafka_cfg, pipe_cfg = env_config()
    spark = get_spark("fhir-to-lakehouse")
    listener = ThroughputListener()
    spark.streams.addListener(listener)

    pipe = BundlePipeline(spark, pipe_cfg)
    query = pipe.start_stream(build_source(spark, args, kafka_cfg))
    if args.once:
        query.processAllAvailable()
        query.stop()
        return 0
    spark.streams.awaitAnyTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
