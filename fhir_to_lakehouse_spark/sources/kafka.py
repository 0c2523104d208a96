"""Kafka streaming source builder (reference S1/S2 parity).

Mirrors /root/reference/src/main.py:125-153: topic subscription,
earliest offsets, headers, rate limits (maxOffsetsPerTrigger /
minOffsetsPerTrigger / maxTriggerDelay), failOnDataLoss, optional SSL
(PKCS12 truststore/keystore).

The spark-sql-kafka connector jar is not in this container (searched
~/.ivy2 and ~/.m2 — absent; installs are out of scope here), so with
the default ``fmt="kafka"`` the builder only *constructs* the reader —
``.load()`` is the caller's decision and will raise without the jar.
``fmt="kafka_double"`` routes the IDENTICAL option set through
:mod:`fhir_to_lakehouse_spark.sources.kafka_double`, a Python
DataSource implementing the connector's offset/rate-limit semantics,
so the wiring is executable end-to-end in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader


@dataclass
class KafkaSourceConfig:
    bootstrap_servers: str = "localhost:9092"
    topics: list[str] = field(default_factory=lambda: ["fhir.all"])
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int = 10_000  # reference default, settings.py:23
    min_offsets_per_trigger: int = 1  # settings.py:24
    max_trigger_delay: str = "15m"  # settings.py:25
    fail_on_data_loss: bool = False  # settings.py:27
    include_headers: bool = True  # main.py:132
    # SSL (reference main.py:138-151)
    ssl_enabled: bool = False
    ssl_truststore_location: str | None = None
    ssl_truststore_password: str | None = None
    ssl_keystore_location: str | None = None
    ssl_keystore_password: str | None = None


def kafka_reader(
    spark: SparkSession, cfg: KafkaSourceConfig, fmt: str = "kafka"
) -> DataStreamReader:
    """Build the configured Kafka DataStreamReader (call .load() where
    the connector jar is available; ``fmt="kafka_double"`` for the
    semantics double, same options)."""
    reader = (
        spark.readStream.format(fmt)
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("subscribe", ",".join(cfg.topics))
        .option("startingOffsets", cfg.starting_offsets)
        .option("maxOffsetsPerTrigger", str(cfg.max_offsets_per_trigger))
        .option("minOffsetsPerTrigger", str(cfg.min_offsets_per_trigger))
        .option("maxTriggerDelay", cfg.max_trigger_delay)
        .option("failOnDataLoss", str(cfg.fail_on_data_loss).lower())
        .option("includeHeaders", str(cfg.include_headers).lower())
    )
    if cfg.ssl_enabled:
        reader = (
            reader.option("kafka.security.protocol", "SSL")
            .option("kafka.ssl.truststore.type", "PKCS12")
            .option("kafka.ssl.keystore.type", "PKCS12")
            .option("kafka.ssl.truststore.location", cfg.ssl_truststore_location)
            .option("kafka.ssl.truststore.password", cfg.ssl_truststore_password)
            .option("kafka.ssl.keystore.location", cfg.ssl_keystore_location)
            .option("kafka.ssl.keystore.password", cfg.ssl_keystore_password)
        )
    return reader
