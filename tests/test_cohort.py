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
