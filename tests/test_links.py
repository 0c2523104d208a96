"""Truth tables for Patient merge-chain resolution
(operators/links.py): edge extraction from both link directions,
multi-hop pointer doubling, cycle detection, and fact-side broadcast
resolution."""

from __future__ import annotations

import json

import pytest

from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.operators.links import (
    patient_link_edges,
    resolve_patient_links,
    resolve_patient_references,
)


def _pats(spark, resources):
    return encode_resources(
        spark.createDataFrame(
            [(json.dumps(r),) for r in resources], "resource string"
        ),
        "Patient",
    )


def _link(other, type_):
    return {"other": {"reference": f"Patient/{other}"}, "type": type_}


def test_edges_both_directions_and_noise(spark):
    pats = _pats(
        spark,
        [
            {"resourceType": "Patient", "id": "b",
             "link": [_link("a", "replaced-by"), _link("x", "seealso")]},
            {"resourceType": "Patient", "id": "a",
             "link": [_link("b", "replaces")]},
            {"resourceType": "Patient", "id": "z",
             "link": [_link("z", "replaced-by"),
                      {"other": {"reference": "Group/g"},
                       "type": "replaced-by"}]},
            {"resourceType": "Patient", "id": "plain"},
        ],
    )
    edges = {
        (r.old_id, r.new_id) for r in patient_link_edges(pats).collect()
    }
    # replaces+replaced-by collapse to ONE edge; self-link and
    # non-Patient reference drop; seealso is not a merge
    assert edges == {("b", "a")}


def test_multi_hop_chain_resolves_to_terminal(spark):
    # d -> c -> b -> a (3 hops: needs 2 doubling rounds)
    pats = _pats(
        spark,
        [
            {"resourceType": "Patient", "id": "d",
             "link": [_link("c", "replaced-by")]},
            {"resourceType": "Patient", "id": "c",
             "link": [_link("b", "replaced-by")]},
            {"resourceType": "Patient", "id": "b",
             "link": [_link("a", "replaced-by")]},
            {"resourceType": "Patient", "id": "a"},
        ],
    )
    got = {
        r.id: r.canonical_id
        for r in resolve_patient_links(pats).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_cycle_raises_and_keep_mode(spark):
    pats = _pats(
        spark,
        [
            {"resourceType": "Patient", "id": "a",
             "link": [_link("b", "replaced-by")]},
            {"resourceType": "Patient", "id": "b",
             "link": [_link("a", "replaced-by")]},
        ],
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        resolve_patient_links(pats, max_rounds=4)
    kept = resolve_patient_links(pats, max_rounds=4, on_unconverged="keep")
    assert kept.count() == 2
    with pytest.raises(ValueError, match="on_unconverged"):
        resolve_patient_links(pats, on_unconverged="explode")


def test_fact_side_resolution_broadcasts(spark):
    pats = _pats(
        spark,
        [
            {"resourceType": "Patient", "id": "b",
             "link": [_link("a", "replaced-by")]},
            {"resourceType": "Patient", "id": "a"},
        ],
    )
    res = resolve_patient_links(pats)
    facts = spark.createDataFrame(
        [("o1", "b"), ("o2", "a"), ("o3", "unknown")],
        "oid string, pkey string",
    )
    out = resolve_patient_references(facts, res, "pkey")
    assert {(r.oid, r.pkey) for r in out.collect()} == {
        ("o1", "a"), ("o2", "a"), ("o3", "unknown"),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
