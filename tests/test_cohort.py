"""Truth tables for the cohort builder (operators/cohort.py):
AND/OR combination, criterion where-features, compartment linkage,
and guardrails."""

from __future__ import annotations

import json

import pytest

from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.operators.cohort import build_cohort


def _enc(spark, rtype, resources):
    return encode_resources(
        spark.createDataFrame(
            [(json.dumps(r),) for r in resources], "resource string"
        ),
        rtype,
    )


def _tables(spark):
    pats = _enc(
        spark,
        "Patient",
        [
            {"resourceType": "Patient", "id": "p1", "gender": "female"},
            {"resourceType": "Patient", "id": "p2", "gender": "female"},
            {"resourceType": "Patient", "id": "p3", "gender": "male"},
        ],
    )
    obs = _enc(
        spark,
        "Observation",
        [
            {"resourceType": "Observation", "id": "o1", "status": "final",
             "subject": {"reference": "Patient/p1"},
             "valueQuantity": {"value": 80}},
            {"resourceType": "Observation", "id": "o2", "status": "final",
             "subject": {"reference": "Patient/p2"},
             "valueQuantity": {"value": 10}},
            {"resourceType": "Observation", "id": "o3", "status": "final",
             "subject": {"reference": "Patient/p3"},
             "valueQuantity": {"value": 99}},
        ],
    )
    return {"Patient": pats, "Observation": obs}


_FEMALE = {"resource": "Patient", "where": [{"path": "gender = 'female'"}]}
_HIGH = {
    "resource": "Observation",
    "where": [
        {"path": "status = 'final'"},
        {"path": "valueQuantity.value >= 50"},
    ],
}


def test_and_or_combination(spark):
    tables = _tables(spark)
    both = {
        r.patient_id for r in build_cohort([_FEMALE, _HIGH], tables).collect()
    }
    assert both == {"p1"}  # female AND a high reading
    either = {
        r.patient_id
        for r in build_cohort(
            [_FEMALE, _HIGH], tables, combine="or"
        ).collect()
    }
    assert either == {"p1", "p2", "p3"}


def test_guardrails(spark):
    tables = _tables(spark)
    with pytest.raises(ValueError, match="combine"):
        build_cohort([_FEMALE], tables, combine="xor")
    with pytest.raises(ValueError, match="at least one"):
        build_cohort([], tables)
    with pytest.raises(ValueError, match="no table"):
        build_cohort(
            [{"resource": "Condition", "where": []}], tables
        )


def test_everything_export_with_criteria(spark, tmp_path):
    """maintenance everything --criteria: the cohort comes from a
    criteria spec evaluated against the stored tables, then drives
    the compartment NDJSON export."""
    from fhir_to_lakehouse_spark import maintenance as M
    from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable
    from fhir_to_lakehouse_spark.sources.bulk_export import read_bulk_export

    wh = tmp_path / "wh"
    tables = _tables(spark)
    KeyedTable(spark, str(wh / "Patient.parquet")).merge_upsert(
        tables["Patient"].select("id", "gender", "resource_json")
    )
    KeyedTable(spark, str(wh / "Observation.parquet")).merge_upsert(
        tables["Observation"].select(
            "id", "status", "subject", "valueQuantity", "resource_json"
        )
    )
    spec = {"combine": "and", "criteria": [_FEMALE, _HIGH]}
    sp = tmp_path / "criteria.json"
    sp.write_text(json.dumps(spec))

    M.export_everything(
        spark, str(wh), str(tmp_path / "cx"), criteria_path=str(sp)
    )
    pats = read_bulk_export(
        spark, str(tmp_path / "cx" / "Patient"), "Patient"
    )
    assert [r.id for r in pats.collect()] == ["p1"]
    obs = read_bulk_export(
        spark, str(tmp_path / "cx" / "Observation"), "Observation"
    )
    assert [r.id for r in obs.collect()] == ["o1"]
    with pytest.raises(ValueError, match="at most one"):
        M.export_everything(
            spark, str(wh), str(tmp_path / "cx2"),
            patients=["p1"], criteria_path=str(sp),
        )
