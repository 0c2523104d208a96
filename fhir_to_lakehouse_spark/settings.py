"""Layered typed configuration tree — reference settings.py parity.

The reference loads a nested typed-settings tree from env vars / TOML
(/root/reference/src/settings.py:9-78: KafkaSslSettings, KafkaSettings,
SparkSettings, DeltaSettings, Settings). Same shape here with plain
dataclasses + a small loader, layered defaults < TOML < environment:

- TOML: ``load_settings(toml_path=...)`` reads stdlib ``tomllib``
  (no third-party parser needed);
- env: ``FHIR_<PATH_TO_FIELD>`` with ``_`` joining the tree path, e.g.
  ``FHIR_KAFKA_BOOTSTRAP_SERVERS``, ``FHIR_KAFKA_SSL_KEYSTORE_PASSWORD``,
  ``FHIR_SPARK_WAREHOUSE_DIR``, ``FHIR_VACUUM_RETENTION_HOURS``.

Conversions are driven by the dataclass field types: bool accepts
true/false/1/0/yes/no, list[str] splits on commas, dict fields parse
JSON, Optional[str] treats "" as None.

``to_kafka_config()`` / ``to_pipeline_config()`` adapt the tree onto
the runtime config objects the engine already uses, so the settings
layer stays a pure shell around the core (nothing inside the engine
reads the environment).
"""

from __future__ import annotations

import dataclasses
import json
import os
import types
import typing
from dataclasses import dataclass, field

from fhir_to_lakehouse_spark.sources.kafka import KafkaSourceConfig
from fhir_to_lakehouse_spark.streaming.pipeline import PipelineConfig


@dataclass
class KafkaSslSettings:
    # reference settings.py:9-15
    enabled: bool = False
    truststore_type: str = "PKCS12"
    truststore_location: str = "/opt/kafka-certs/ca.p12"
    truststore_password: str = ""
    keystore_type: str = "PKCS12"
    keystore_location: str = "/opt/kafka-certs/user.p12"
    keystore_password: str = ""


@dataclass
class KafkaSettings:
    # reference settings.py:18-27
    ssl: KafkaSslSettings = field(default_factory=KafkaSslSettings)
    bootstrap_servers: str = "localhost:9094"  # reference settings.py:21
    topics: list[str] = field(default_factory=lambda: ["fhir.msg"])  # :22
    starting_offsets: str = "earliest"  # reference main.py:129
    max_offsets_per_trigger: int = 10_000
    min_offsets_per_trigger: int = 1
    max_trigger_delay: str = "15m"
    fail_on_data_loss: bool = True  # reference settings.py:27 default
    include_headers: bool = True


@dataclass
class SparkSettings:
    # reference settings.py:30-40 (Spark-relevant subset: master/memory
    # belong to spark-submit, not the app)
    warehouse_dir: str = "/tmp/fhir-warehouse"
    checkpoint_dir: str = "/tmp/fhir-checkpoints"
    upkeep_interval: int = 50
    streaming_processing_time: str = "0 seconds"
    s3_endpoint: str = ""
    s3_connection_ssl_enabled: bool = False


@dataclass
class DeltaSettings:
    # reference settings.py:43-49 (table-property defaults verbatim)
    auto_optimize_auto_compact: str = "false"
    auto_optimize_optimize_write: str = "false"
    checkpoint_interval: str = "100"
    checkpoint_write_stats_as_json: str = "false"
    checkpoint_write_stats_as_struct: str = "true"
    clustering_columns_by_resource_type: dict[str, list[str]] = field(
        default_factory=lambda: {
            "Patient": ["id"],
            "Condition": ["id"],
            "Observation": ["id"],
        }
    )

    def table_properties(self) -> dict[str, str]:
        """The delta.* property set the reference applies at table
        create (/root/reference/src/bundle_processor.py:172-196)."""
        return {
            "delta.autoOptimize.autoCompact": self.auto_optimize_auto_compact,
            "delta.autoOptimize.optimizeWrite": self.auto_optimize_optimize_write,
            "delta.checkpointInterval": self.checkpoint_interval,
            "delta.checkpoint.writeStatsAsJson": self.checkpoint_write_stats_as_json,
            "delta.checkpoint.writeStatsAsStruct": self.checkpoint_write_stats_as_struct,
        }


@dataclass
class Settings:
    # reference settings.py:52-75
    kafka: KafkaSettings = field(default_factory=KafkaSettings)
    spark: SparkSettings = field(default_factory=SparkSettings)
    delta: DeltaSettings = field(default_factory=DeltaSettings)
    vacuum_retention_hours: float = 24.0
    metrics_port: int = 8000
    metrics_addr: str = "127.0.0.1"
    metastore_schema: str = ""
    log_resource_count_by_source_topic: bool = False
    log_batch_stats: bool = False
    # Accepted for reference config compatibility (settings.py:69-75).
    # In the reference this list assigns resource types to their own
    # streaming queries (everything else flows to a "default" query —
    # all types are processed either way). This engine's single-query
    # design routes every observed type inside one cached micro-batch
    # (S5 improvement: one Kafka read instead of N+1), so the knob has
    # no effect here; it is parsed so reference TOML/env configs load
    # without error.
    resource_types_to_process_in_parallel: list[str] = field(
        default_factory=lambda: [
            "Patient",
            "Observation",
            "Encounter",
            "Condition",
            "Procedure",
        ]
    )

    # -- adapters onto the runtime configs ------------------------------

    def to_kafka_config(self) -> KafkaSourceConfig:
        ssl = self.kafka.ssl
        return KafkaSourceConfig(
            bootstrap_servers=self.kafka.bootstrap_servers,
            topics=list(self.kafka.topics),
            starting_offsets=self.kafka.starting_offsets,
            max_offsets_per_trigger=self.kafka.max_offsets_per_trigger,
            min_offsets_per_trigger=self.kafka.min_offsets_per_trigger,
            max_trigger_delay=self.kafka.max_trigger_delay,
            fail_on_data_loss=self.kafka.fail_on_data_loss,
            include_headers=self.kafka.include_headers,
            ssl_enabled=ssl.enabled,
            ssl_truststore_location=ssl.truststore_location or None,
            ssl_truststore_password=ssl.truststore_password or None,
            ssl_keystore_location=ssl.keystore_location or None,
            ssl_keystore_password=ssl.keystore_password or None,
        )

    def to_pipeline_config(self) -> PipelineConfig:
        return PipelineConfig(
            warehouse_dir=self.spark.warehouse_dir,
            checkpoint_dir=self.spark.checkpoint_dir,
            upkeep_interval=self.spark.upkeep_interval,
            vacuum_retention_hours=self.vacuum_retention_hours,
            clustering_columns=dict(
                self.delta.clustering_columns_by_resource_type
            ),
            table_properties=self.delta.table_properties(),
            log_batch_stats=self.log_batch_stats,
            log_topic_counts=self.log_resource_count_by_source_topic,
            register_schema=self.metastore_schema or None,
        )


# -- loader ---------------------------------------------------------------

_TRUE = {"1", "true", "yes", "on"}
_FALSE = {"0", "false", "no", "off", ""}


def _convert(text: str, typ) -> object:
    origin = typing.get_origin(typ)
    if typ is bool:
        lowered = text.strip().lower()
        if lowered in _TRUE:
            return True
        if lowered in _FALSE:
            return False
        raise ValueError(f"not a boolean: {text!r}")
    if typ is int:
        return int(text)
    if typ is float:
        return float(text)
    if typ is str:
        return text
    if origin is list:
        return [t.strip() for t in text.split(",") if t.strip()]
    if origin is dict:
        return json.loads(text)
    if origin is typing.Union or isinstance(typ, types.UnionType):  # Optional
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        if text == "":
            return None
        return _convert(text, args[0])
    raise TypeError(f"unsupported settings field type: {typ}")


def _env_keys(cls, path: str = "") -> set[str]:
    """All unprefixed env keys the reference settings tree reads
    (reference settings.py loads with env_prefix="")."""
    keys: set[str] = set()
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        key = f"{path}_{f.name.upper()}" if path else f.name.upper()
        typ = hints[f.name]
        if dataclasses.is_dataclass(typ):
            keys |= _env_keys(typ, key)
        else:
            keys.add(key)
    return keys


def _build(cls, data: dict, env: dict, env_path: str, root_prefix: str):
    kwargs = {}
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        typ = hints[f.name]
        env_key = f"{env_path}_{f.name.upper()}"
        # the reference loads with env_prefix="" (settings.py:78), so a
        # reference deployment exports KAFKA_BOOTSTRAP_SERVERS etc.
        # Accept that unprefixed form as a fallback; the prefixed form
        # wins when both are set (prefixed = explicitly ours). The
        # stripped form derives from the ACTUAL prefix in use, and only
        # keys the reference actually reads are eligible — generic names
        # set by unrelated container tooling must not leak in.
        alt_key = env_key.removeprefix(f"{root_prefix}_")
        if dataclasses.is_dataclass(typ):
            kwargs[f.name] = _build(
                typ, data.get(f.name, {}) or {}, env, env_key, root_prefix
            )
            continue
        if env_key in env:
            kwargs[f.name] = _convert(env[env_key], typ)
        elif (
            alt_key != env_key
            and alt_key in _REFERENCE_ENV_KEYS
            and alt_key in env
        ):
            kwargs[f.name] = _convert(env[alt_key], typ)
        elif f.name in data:
            value = data[f.name]
            # TOML already yields typed values; strings still convert
            # (e.g. "true"), everything else is taken as-is
            kwargs[f.name] = _convert(value, typ) if isinstance(value, str) else value
        # else: dataclass default applies
    return cls(**kwargs)


def load_settings(
    toml_path: str | None = None,
    env: dict | None = None,
    prefix: str = "FHIR",
) -> Settings:
    """Build the tree from defaults < TOML file < environment."""
    env = os.environ if env is None else env
    data: dict = {}
    if toml_path:
        import tomllib

        with open(toml_path, "rb") as fh:
            data = tomllib.load(fh)
    return _build(Settings, data, env, prefix, prefix)


_REFERENCE_ENV_KEYS = _env_keys(Settings)
