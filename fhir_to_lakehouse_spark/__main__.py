"""Runnable streaming app — reference src/main.py parity.

    python -m fhir_to_lakehouse_spark --source kafka
    python -m fhir_to_lakehouse_spark --source file --input /path/ndjson

Builds the session, constructs the source (Kafka with full option
parity where the connector jar exists; a file source of Kafka-shaped
JSON rows otherwise — same downstream pipeline), starts ONE streaming
query with the foreachBatch engine core, registers the throughput
listener, and blocks on termination like the reference
(/root/reference/src/main.py:194 awaitAnyTermination).

Configuration is the layered settings tree (fhir_to_lakehouse_spark.
settings — reference src/settings.py parity): dataclass defaults,
overridden by an optional --config TOML file, overridden by FHIR_*
environment variables (FHIR_KAFKA_BOOTSTRAP_SERVERS, FHIR_KAFKA_TOPICS,
FHIR_SPARK_WAREHOUSE_DIR, FHIR_VACUUM_RETENTION_HOURS, ...).
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.session import get_spark
from fhir_to_lakehouse_spark.settings import load_settings
from fhir_to_lakehouse_spark.sources.kafka import KafkaSourceConfig, kafka_reader
from fhir_to_lakehouse_spark.streaming.metrics import ThroughputListener
from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig


def env_config(
    toml_path: str | None = None,
) -> tuple[KafkaSourceConfig, PipelineConfig]:
    """Runtime configs off the layered settings tree (defaults < TOML <
    environment — reference settings.py loads the same way)."""
    settings = load_settings(toml_path=toml_path)
    return settings.to_kafka_config(), settings.to_pipeline_config()


def build_source(spark, args, kafka_cfg: KafkaSourceConfig):
    if args.source == "kafka":
        return kafka_reader(spark, kafka_cfg).load()
    if args.source == "kafka_double":
        # connector-semantics double: bootstrap_servers is the broker
        # directory; every other option behaves like the real source
        from fhir_to_lakehouse_spark.sources.kafka_double import register

        register(spark)
        return kafka_reader(spark, kafka_cfg, fmt="kafka_double").load()
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
        "--source",
        choices=["kafka", "kafka_double", "file", "fhir_files"],
        default="kafka",
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
    ap.add_argument("--config", help="optional TOML settings file")
    args = ap.parse_args(argv)

    kafka_cfg, pipe_cfg = env_config(args.config)
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
