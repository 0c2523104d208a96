"""Drive the runnable app (python -m fhir_to_lakehouse_spark) in
file-source --once mode end to end."""

from __future__ import annotations

import json

from fhir_to_lakehouse_spark.__main__ import env_config, main
from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable
from tests.fixtures import delete_bundle, kafka_row, put_bundle


def test_app_file_source_once(spark, tmp_path, monkeypatch):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        kafka_row(put_bundle("Patient", "a", active=True), offset=0),
        kafka_row(put_bundle("Patient", "b", active=True), offset=1),
        kafka_row(delete_bundle("Patient", "a"), offset=2),
    ]
    with open(src / "data.json", "w") as f:
        for r in rows:
            d = dict(r)
            d["timestamp"] = d["timestamp"].isoformat()
            f.write(json.dumps(d) + "\n")

    wh = tmp_path / "wh"
    monkeypatch.setenv("FHIR_SPARK_WAREHOUSE_DIR", str(wh))
    monkeypatch.setenv("FHIR_SPARK_CHECKPOINT_DIR", str(tmp_path / "ck"))
    monkeypatch.setenv("FHIR_SPARK_UPKEEP_INTERVAL", "1000")

    rc = main(["--source", "file", "--input", str(src), "--once"])
    assert rc == 0
    table = KeyedTable(spark, str(wh / "Patient.parquet"))
    assert sorted(r["id"] for r in table.to_df().collect()) == ["b"]


def test_env_config_defaults_and_overrides(monkeypatch):
    monkeypatch.setenv("FHIR_KAFKA_TOPICS", "t1,t2")
    monkeypatch.setenv("FHIR_KAFKA_MAX_OFFSETS_PER_TRIGGER", "500")
    kafka, pipe = env_config()
    assert kafka.topics == ["t1", "t2"]
    assert kafka.max_offsets_per_trigger == 500
    assert kafka.min_offsets_per_trigger == 1  # reference default
    assert kafka.max_trigger_delay == "15m"  # reference default
    assert pipe.upkeep_interval in (50, 1000)  # default unless test env


def test_settings_tree_layering_toml_under_env(tmp_path, monkeypatch):
    """defaults < TOML < env, with nested sections and typed fields
    (reference settings.py loads the same tree via typed-settings)."""
    from fhir_to_lakehouse_spark.settings import load_settings

    cfg = tmp_path / "settings.toml"
    cfg.write_text(
        """
vacuum_retention_hours = 12.5
metastore_schema = "lakehouse"

[kafka]
bootstrap_servers = "broker:9092"
topics = ["a", "b"]
fail_on_data_loss = true

[kafka.ssl]
enabled = true
truststore_password = "from-toml"

[spark]
upkeep_interval = 7

[delta]
clustering_columns_by_resource_type = { Patient = ["id", "birthDate"] }
"""
    )
    monkeypatch.setenv("FHIR_KAFKA_SSL_TRUSTSTORE_PASSWORD", "from-env")
    monkeypatch.setenv("FHIR_SPARK_UPKEEP_INTERVAL", "9")
    s = load_settings(toml_path=str(cfg))
    # TOML wins over defaults
    assert s.vacuum_retention_hours == 12.5
    assert s.kafka.bootstrap_servers == "broker:9092"
    assert s.kafka.topics == ["a", "b"]
    assert s.kafka.fail_on_data_loss is True
    assert s.kafka.ssl.enabled is True
    # env wins over TOML
    assert s.kafka.ssl.truststore_password == "from-env"
    assert s.spark.upkeep_interval == 9
    # adapters thread everything onto the runtime configs
    kafka = s.to_kafka_config()
    assert kafka.ssl_enabled and kafka.ssl_truststore_password == "from-env"
    pipe = s.to_pipeline_config()
    assert pipe.upkeep_interval == 9
    assert pipe.register_schema == "lakehouse"
    assert pipe.clustering_columns == {"Patient": ["id", "birthDate"]}


def test_settings_env_type_conversions(monkeypatch):
    from fhir_to_lakehouse_spark.settings import load_settings

    monkeypatch.setenv("FHIR_LOG_BATCH_STATS", "yes")
    monkeypatch.setenv("FHIR_METRICS_PORT", "9100")
    monkeypatch.setenv(
        "FHIR_DELTA_CLUSTERING_COLUMNS_BY_RESOURCE_TYPE",
        '{"Observation": ["id", "effectiveDateTime"]}',
    )
    s = load_settings()
    assert s.log_batch_stats is True
    assert s.metrics_port == 9100
    assert s.delta.clustering_columns_by_resource_type == {
        "Observation": ["id", "effectiveDateTime"]
    }


def test_app_kafka_double_source_once(spark, tmp_path, monkeypatch):
    """The app runs against the Kafka semantics double end-to-end using
    only the production config surface (bootstrap = broker dir)."""
    from fhir_to_lakehouse_spark.sources.kafka_double import produce

    broker = tmp_path / "broker"
    produce(
        str(broker),
        "fhir.msg",  # the reference-parity default topic
        [
            {"key": "a", "value": put_bundle("Patient", "a", active=True),
             "timestamp": 100.0},
            {"key": "a", "value": delete_bundle("Patient", "a"),
             "timestamp": 101.0},
            {"key": "b", "value": put_bundle("Patient", "b", active=False),
             "timestamp": 102.0},
        ],
    )
    wh = tmp_path / "wh"
    monkeypatch.setenv("FHIR_KAFKA_BOOTSTRAP_SERVERS", str(broker))
    monkeypatch.setenv("FHIR_KAFKA_STARTING_OFFSETS", "earliest")
    monkeypatch.setenv("FHIR_SPARK_WAREHOUSE_DIR", str(wh))
    monkeypatch.setenv("FHIR_SPARK_CHECKPOINT_DIR", str(tmp_path / "ck"))
    rc = main(["--source", "kafka_double", "--once"])
    assert rc == 0
    table = KeyedTable(spark, str(wh / "Patient.parquet"))
    assert sorted(r["id"] for r in table.to_df().collect()) == ["b"]


def test_settings_accept_reference_unprefixed_env(tmp_path):
    """The reference loads typed-settings with env_prefix='' —
    deployments export KAFKA_BOOTSTRAP_SERVERS etc. Those must load
    as-is; the FHIR_-prefixed form wins when both are present."""
    from fhir_to_lakehouse_spark.settings import load_settings

    s = load_settings(
        env={
            "KAFKA_BOOTSTRAP_SERVERS": "ref-broker:9094",
            "VACUUM_RETENTION_HOURS": "72",
            "SPARK_UPKEEP_INTERVAL": "7",
        }
    )
    assert s.kafka.bootstrap_servers == "ref-broker:9094"
    assert s.vacuum_retention_hours == 72.0
    assert s.spark.upkeep_interval == 7

    s2 = load_settings(
        env={
            "KAFKA_BOOTSTRAP_SERVERS": "ref-broker:9094",
            "FHIR_KAFKA_BOOTSTRAP_SERVERS": "ours:9094",
        }
    )
    assert s2.kafka.bootstrap_servers == "ours:9094"


def test_settings_unprefixed_fallback_tracks_custom_prefix(tmp_path):
    """The stripped fallback form derives from the ACTUAL prefix in
    use, not a hardcoded FHIR_: with prefix='APP', APP_-prefixed keys
    win and the bare reference keys still load."""
    from fhir_to_lakehouse_spark.settings import load_settings

    s = load_settings(
        env={
            "APP_KAFKA_BOOTSTRAP_SERVERS": "ours:9094",
            "KAFKA_BOOTSTRAP_SERVERS": "ref:9094",
            "VACUUM_RETENTION_HOURS": "72",
        },
        prefix="APP",
    )
    assert s.kafka.bootstrap_servers == "ours:9094"
    assert s.vacuum_retention_hours == 72.0


def test_settings_unprefixed_fallback_is_whitelisted(tmp_path):
    """Only keys the reference tree actually reads are eligible for the
    unprefixed fallback; generic container env like METASTORE_SCHEMA is
    on the whitelist, but an unparseable value in a NON-reference key
    must never crash _convert or leak into the tree."""
    from fhir_to_lakehouse_spark import settings as S

    # whitelist is the reference field paths, derived from the tree
    assert "KAFKA_BOOTSTRAP_SERVERS" in S._REFERENCE_ENV_KEYS
    assert "KAFKA_SSL_KEYSTORE_PASSWORD" in S._REFERENCE_ENV_KEYS
    assert "UPKEEP_INTERVAL" not in S._REFERENCE_ENV_KEYS  # nested under SPARK_
    # a key that is NOT a reference settings path is ignored even if it
    # happens to collide with a field name suffix
    s = S.load_settings(env={"NOT_A_FIELD": "x", "METRICS_PORT": "9999"})
    assert s.metrics_port == 9999


def test_settings_accept_reference_parallel_types_field(tmp_path):
    """resource_types_to_process_in_parallel parses from reference
    configs (no-op here by design — single-query routing)."""
    from fhir_to_lakehouse_spark.settings import load_settings

    s = load_settings(
        env={"FHIR_RESOURCE_TYPES_TO_PROCESS_IN_PARALLEL": "Patient,Device"}
    )
    assert s.resource_types_to_process_in_parallel == ["Patient", "Device"]
