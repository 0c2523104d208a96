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
    bootstrap_servers: str = "localhost:9094"  # reference settings.py:21
    topics: list[str] = field(default_factory=lambda: ["fhir.msg"])  # :22
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int = 10_000  # reference default, settings.py:23
    min_offsets_per_trigger: int = 1  # settings.py:24
    max_trigger_delay: str = "15m"  # settings.py:25
    fail_on_data_loss: bool = True  # reference settings.py:27 default
    include_headers: bool = True  # main.py:132
    # SSL (reference main.py:138-151)
    ssl_enabled: bool = False
    ssl_truststore_location: str | None = None
    ssl_truststore_password: str | None = None
    ssl_keystore_location: str | None = None
    ssl_keystore_password: str | None = None


def kafka_options(cfg: KafkaSourceConfig) -> dict[str, str]:
    """The exact option dict the reference sends to the connector
    (/root/reference/src/main.py:125-151) — kept as an inspectable dict
    so tests can assert key-for-key parity without a broker."""
    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "subscribe": ",".join(cfg.topics),
        "startingOffsets": cfg.starting_offsets,
        "failOnDataLoss": str(cfg.fail_on_data_loss).lower(),
        "groupIdPrefix": "fhir-to-lakehouse",  # main.py:131
        "includeHeaders": str(cfg.include_headers).lower(),
        "maxOffsetsPerTrigger": str(cfg.max_offsets_per_trigger),
        "minOffsetsPerTrigger": str(cfg.min_offsets_per_trigger),
        "maxTriggerDelay": cfg.max_trigger_delay,
    }
    if cfg.ssl_enabled:  # main.py:138-151, PKCS12 stores
        opts.update(
            {
                "kafka.security.protocol": "SSL",
                "kafka.ssl.truststore.type": "PKCS12",
                "kafka.ssl.truststore.location": cfg.ssl_truststore_location or "",
                "kafka.ssl.truststore.password": cfg.ssl_truststore_password or "",
                "kafka.ssl.keystore.type": "PKCS12",
                "kafka.ssl.keystore.location": cfg.ssl_keystore_location or "",
                "kafka.ssl.keystore.password": cfg.ssl_keystore_password or "",
            }
        )
    return opts


def kafka_reader(
    spark: SparkSession, cfg: KafkaSourceConfig, fmt: str = "kafka"
) -> DataStreamReader:
    """Build the configured Kafka DataStreamReader (call .load() where
    the connector jar is available; ``fmt="kafka_double"`` for the
    semantics double, same options)."""
    return spark.readStream.format(fmt).options(**kafka_options(cfg))
