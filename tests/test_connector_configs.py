"""Config-surface parity for the environment-gated connectors (S2/S9).

No broker or S3 endpoint exists in this container, so transport can't be
exercised — but the exact option/conf keys the reference sends CAN be
asserted key-for-key:

- Kafka incl. SSL (PKCS12): /root/reference/src/main.py:125-151
- S3A/MinIO object store:   /root/reference/src/main.py:78-93
"""

from __future__ import annotations

from fhir_to_lakehouse_spark.session import s3_conf
from fhir_to_lakehouse_spark.sources.kafka import (
    KafkaSourceConfig,
    kafka_options,
    kafka_reader,
)

# the option keys reference main.py:125-136 sets on every reader
REFERENCE_BASE_KEYS = {
    "kafka.bootstrap.servers",
    "subscribe",
    "startingOffsets",
    "failOnDataLoss",
    "groupIdPrefix",
    "includeHeaders",
    "maxOffsetsPerTrigger",
    "minOffsetsPerTrigger",
    "maxTriggerDelay",
}

# the additional keys main.py:138-151 sets when security_protocol == SSL
REFERENCE_SSL_KEYS = {
    "kafka.security.protocol",
    "kafka.ssl.truststore.type",
    "kafka.ssl.truststore.location",
    "kafka.ssl.truststore.password",
    "kafka.ssl.keystore.type",
    "kafka.ssl.keystore.location",
    "kafka.ssl.keystore.password",
}


def test_kafka_base_options_match_reference_keys():
    opts = kafka_options(KafkaSourceConfig(topics=["fhir.a", "fhir.b"]))
    assert set(opts) == REFERENCE_BASE_KEYS
    assert opts["subscribe"] == "fhir.a,fhir.b"
    assert opts["startingOffsets"] == "earliest"
    assert opts["groupIdPrefix"] == "fhir-to-lakehouse"
    assert opts["includeHeaders"] == "true"
    # reference settings.py:27 defaults failOnDataLoss to TRUE — losing
    # source data silently is the worse default for a clinical pipeline
    assert opts["failOnDataLoss"] == "true"
    # reference settings.py defaults flow through as strings
    assert opts["maxOffsetsPerTrigger"] == "10000"
    assert opts["minOffsetsPerTrigger"] == "1"
    assert opts["maxTriggerDelay"] == "15m"


def test_kafka_ssl_options_match_reference_keys():
    opts = kafka_options(
        KafkaSourceConfig(
            ssl_enabled=True,
            ssl_truststore_location="/certs/trust.p12",
            ssl_truststore_password="ts-pass",
            ssl_keystore_location="/certs/key.p12",
            ssl_keystore_password="ks-pass",
        )
    )
    assert set(opts) == REFERENCE_BASE_KEYS | REFERENCE_SSL_KEYS
    assert opts["kafka.security.protocol"] == "SSL"
    # reference uses PKCS12 stores (settings.py truststore/keystore types)
    assert opts["kafka.ssl.truststore.type"] == "PKCS12"
    assert opts["kafka.ssl.keystore.type"] == "PKCS12"
    assert opts["kafka.ssl.truststore.location"] == "/certs/trust.p12"
    assert opts["kafka.ssl.keystore.password"] == "ks-pass"


def test_kafka_reader_builds_without_broker(spark):
    # constructing the reader (not .load()) must work jar-less, with SSL
    cfg = KafkaSourceConfig(ssl_enabled=True)
    reader = kafka_reader(spark, cfg)
    assert reader is not None


def test_s3_conf_matches_reference_keys():
    conf = s3_conf(
        "http://minio:9000", "minio-user", "minio-pass", connection_ssl=False
    )
    # every fs.s3a key the reference sets (main.py:78-93), spark.hadoop-
    # prefixed so it reaches the Hadoop conf from a SparkConf
    for key in [
        "spark.hadoop.fs.s3a.endpoint",
        "spark.hadoop.fs.s3a.access.key",
        "spark.hadoop.fs.s3a.secret.key",
        "spark.hadoop.fs.s3a.path.style.access",
        "spark.hadoop.fs.s3a.connection.ssl.enabled",
        "spark.hadoop.fs.s3a.committer.name",
        "spark.hadoop.fs.s3a.committer.magic.enabled",
    ]:
        assert key in conf, key
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
