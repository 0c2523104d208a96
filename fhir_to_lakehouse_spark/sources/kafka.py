"""Kafka streaming source builder (reference S1/S2 parity).

Mirrors /root/reference/src/main.py:125-153: topic subscription,
earliest offsets, headers, rate limits (maxOffsetsPerTrigger /
minOffsetsPerTrigger / maxTriggerDelay), failOnDataLoss, optional SSL
(PKCS12 truststore/keystore).

The spark-sql-kafka connector jar is not in this container, so the
builder only *constructs* the reader — ``.load()`` is the caller's
decision and will raise without the jar. Tests drive the same pipeline
through the file/memory sources instead (the engine core is
stream/batch agnostic).
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


def kafka_reader(spark: SparkSession, cfg: KafkaSourceConfig) -> DataStreamReader:
    """Build the configured Kafka DataStreamReader (call .load() where
    the connector jar is available)."""
    reader = (
        spark.readStream.format("kafka")
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
