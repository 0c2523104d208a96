"""Kafka source builder: option parity (S1/S2) without the connector
jar — the reader is constructed and its options inspected; .load() is
the only step needing the jar. Plus availableNow backfill trigger."""

from __future__ import annotations

from fhir_to_lakehouse_spark.sources.kafka import KafkaSourceConfig, kafka_reader
from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig
from tests.fixtures import KAFKA_SCHEMA, kafka_row, put_bundle


def _reader_options(reader):
    # DataStreamReader keeps options in the JVM builder; reflect them
    jreader = reader._jreader
    opts = jreader.getClass().getDeclaredField("extraOptions")
    opts.setAccessible(True)
    jmap = opts.get(jreader)
    # CaseInsensitiveMap -> iterate entries via scala iterator
    it = jmap.iterator()
    out = {}
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2()
    return out


def test_kafka_reader_option_parity(spark):
    cfg = KafkaSourceConfig(
        bootstrap_servers="broker:9093",
        topics=["fhir.a", "fhir.b"],
        max_offsets_per_trigger=1234,
        ssl_enabled=True,
        ssl_truststore_location="/certs/trust.p12",
        ssl_truststore_password="tp",
        ssl_keystore_location="/certs/key.p12",
        ssl_keystore_password="kp",
    )
    opts = _reader_options(kafka_reader(spark, cfg))
    assert opts["subscribe"] == "fhir.a,fhir.b"
    assert opts["kafka.bootstrap.servers"] == "broker:9093"
    assert opts["startingoffsets"] == "earliest"
    assert opts["maxoffsetspertrigger"] == "1234"
    assert opts["minoffsetspertrigger"] == "1"
    assert opts["maxtriggerdelay"] == "15m"
    assert opts["failondataloss"] == "false"
    assert opts["includeheaders"] == "true"
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.truststore.type"] == "PKCS12"
    assert opts["kafka.ssl.keystore.location"] == "/certs/key.p12"


def test_available_now_backfill(spark, tmp_path):
    import json

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b.json", "w") as f:
        r = kafka_row(put_bundle("Patient", "an1", active=True))
        r["timestamp"] = r["timestamp"].isoformat()
        f.write(json.dumps(r) + "\n")

    from pyspark.sql import functions as F

    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )
    pipe = BundlePipeline(spark, cfg)
    stream = (
        spark.readStream.schema(KAFKA_SCHEMA)
        .json(str(src))
        .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    )
    q = pipe.start_stream(stream, query_name="an", available_now=True)
    q.awaitTermination(120)  # availableNow stops by itself
    assert pipe.table("Patient").to_df().count() == 1
