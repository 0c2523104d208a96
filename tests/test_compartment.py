"""Truth tables for the patient-compartment operator
(operators/compartment.py): link-field discovery, typed/untyped
reference acceptance, multi-compartment membership, cohort
restriction, and $everything union."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.operators.compartment import (
    compartment_link_fields,
    compartment_members,
    patient_everything,
)


def _enc(spark, rtype, resources):
    return encode_resources(
        spark.createDataFrame(
            [(json.dumps(r),) for r in resources], "resource string"
        ),
        rtype,
    )


def test_link_field_discovery():
    assert compartment_link_fields("Observation") == ["subject"]
    assert compartment_link_fields("Claim") == ["patient"]
    # Account.subject is an ARRAY of Reference
    assert compartment_link_fields("Account") == ["subject"]
    # Organization has no patient link
    assert compartment_link_fields("Organization") == []


def test_reference_shapes_and_type_guard(spark):
    obs = _enc(
        spark,
        "Observation",
        [
            # typed relative -> in p1's compartment
            {"resourceType": "Observation", "id": "o1",
             "subject": {"reference": "Patient/p1"}},
            # urn:uuid, untyped -> accepted (globally unique)
            {"resourceType": "Observation", "id": "o2",
             "subject": {"reference": "urn:uuid:p2"}},
            # Group subject -> NOT in any patient compartment
            {"resourceType": "Observation", "id": "o3",
             "subject": {"reference": "Group/g1"}},
            # explicit Reference.type contradicting nothing: urn + type
            {"resourceType": "Observation", "id": "o4",
             "subject": {"reference": "urn:uuid:p3", "type": "Group"}},
            # no subject at all
            {"resourceType": "Observation", "id": "o5"},
        ],
    )
    rows = compartment_members(obs, "Observation").collect()
    got = {(r.patient_id, r.rid) for r in rows}
    assert got == {("p1", "o1"), ("p2", "o2")}
    # resource_json rides along for NDJSON export
    assert all(json.loads(r.resource_json)["id"] == r.rid for r in rows)


def test_array_link_multi_compartment_and_cohort(spark):
    acct = _enc(
        spark,
        "Account",
        [
            {"resourceType": "Account", "id": "a1",
             "subject": [
                 {"reference": "Patient/p1"},
                 {"reference": "Patient/p2"},
                 {"reference": "Device/d9"},
                 {"reference": "Patient/p1"},
             ]},
            {"resourceType": "Account", "id": "a2",
             "subject": [{"reference": "Location/l1"}]},
        ],
    )
    all_rows = {
        (r.patient_id, r.rid)
        for r in compartment_members(acct, "Account").collect()
    }
    # one row per DISTINCT patient; device/location refs drop out
    assert all_rows == {("p1", "a1"), ("p2", "a1")}
    cohort_rows = {
        (r.patient_id, r.rid)
        for r in compartment_members(
            acct, "Account", patient_ids=["p2", "p404"]
        ).collect()
    }
    assert cohort_rows == {("p2", "a1")}


def test_patient_everything_union(spark):
    pats = _enc(
        spark,
        "Patient",
        [
            {"resourceType": "Patient", "id": "p1"},
            {"resourceType": "Patient", "id": "p2"},
        ],
    )
    claims = _enc(
        spark,
        "Claim",
        [
            {"resourceType": "Claim", "id": "c1",
             "patient": {"reference": "Patient/p1"}},
            {"resourceType": "Claim", "id": "c2",
             "patient": {"reference": "Patient/p9"}},
        ],
    )
    out = patient_everything(
        {"Patient": pats, "Claim": claims}, patient_ids=["p1"]
    )
    got = {(r.patient_id, r.resource_type, r.rid) for r in out.collect()}
    assert got == {("p1", "Patient", "p1"), ("p1", "Claim", "c1")}
    with pytest.raises(ValueError, match="at least one"):
        patient_everything({})


def test_group_patient_ids(spark):
    from fhir_to_lakehouse_spark.operators.compartment import (
        group_patient_ids,
    )

    groups = _enc(
        spark,
        "Group",
        [
            {"resourceType": "Group", "id": "g1", "type": "person",
             "member": [
                 {"entity": {"reference": "Patient/p1"}},
                 {"entity": {"reference": "Patient/p2"}, "inactive": True},
                 {"entity": {"reference": "Device/d1"}},
                 {"entity": {"reference": "urn:uuid:p3"}},
                 {"entity": {"reference": "Patient/p1"}},
             ]},
            {"resourceType": "Group", "id": "g2", "type": "person",
             "member": [{"entity": {"reference": "Patient/p9"}}]},
        ],
    )
    active = {
        r.patient_id for r in group_patient_ids(groups, "g1").collect()
    }
    assert active == {"p1", "p3"}
    with_inactive = {
        r.patient_id
        for r in group_patient_ids(
            groups, "g1", include_inactive=True
        ).collect()
    }
    assert with_inactive == {"p1", "p2", "p3"}
    assert group_patient_ids(groups, "nope").count() == 0
