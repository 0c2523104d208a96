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
    monkeypatch.setenv("FHIR_WAREHOUSE_DIR", str(wh))
    monkeypatch.setenv("FHIR_CHECKPOINT_DIR", str(tmp_path / "ck"))
    monkeypatch.setenv("FHIR_UPKEEP_INTERVAL", "1000")

    rc = main(["--source", "file", "--input", str(src), "--once"])
    assert rc == 0
    table = KeyedTable(spark, str(wh / "Patient.parquet"))
    assert sorted(r["id"] for r in table.to_df().collect()) == ["b"]


def test_env_config_defaults_and_overrides(monkeypatch):
    monkeypatch.setenv("FHIR_TOPICS", "t1,t2")
    monkeypatch.setenv("FHIR_MAX_OFFSETS", "500")
    kafka, pipe = env_config()
    assert kafka.topics == ["t1", "t2"]
    assert kafka.max_offsets_per_trigger == 500
    assert kafka.min_offsets_per_trigger == 1  # reference default
    assert kafka.max_trigger_delay == "15m"  # reference default
    assert pipe.upkeep_interval in (50, 1000)  # default unless test env
