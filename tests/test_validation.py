"""Truth tables for the profile-validation operator
(operators/validation.py): every rule type against crafted pass/fail
resources, absent-element semantics, the summary fold, and spec
guardrails."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.operators.validation import (
    ValidationSpecError,
    validate,
    validation_summary,
)


def _obs(spark):
    rows = [
        # fully conformant
        {"resourceType": "Observation", "id": "ok-1", "status": "final",
         "code": {"coding": [{"system": "http://cs", "code": "a"}]},
         "subject": {"reference": "Patient/p1"}},
        # wrong fixed status + unbound code
        {"resourceType": "Observation", "id": "bad-status", "status": "draft",
         "code": {"coding": [{"system": "http://cs", "code": "zzz"}]},
         "subject": {"reference": "Patient/p1"}},
        # missing subject + missing status
        {"resourceType": "Observation", "id": "bad missing!",
         "code": {"coding": [{"system": "http://cs", "code": "b"}]}},
    ]
    return encode_resources(
        spark.createDataFrame(
            [(json.dumps(r),) for r in rows], "resource string"
        ),
        "Observation",
    )


_SPEC = {
    "resource": "Observation",
    "rules": [
        {"key": "status_required", "type": "required", "path": "status"},
        {"key": "status_final", "type": "fixed", "path": "status",
         "value": "final"},
        {"key": "has_subject", "type": "cardinality",
         "path": "subject.reference", "min": 1},
        {"key": "id_shape", "type": "regex", "path": "id",
         "pattern": "^[A-Za-z0-9\\-\\.]{1,64}$"},
        {"key": "code_bound", "type": "binding", "path": "code",
         "valueSet": "http://vs/codes"},
    ],
}


def _vs(spark):
    return spark.createDataFrame(
        [
            Row(valueset_url="http://vs/codes", system="http://cs", code="a"),
            Row(valueset_url="http://vs/codes", system="http://cs", code="b"),
            Row(valueset_url="http://other", system="http://cs", code="zzz"),
        ]
    )


def test_validate_rule_truth_table(spark):
    flags = {
        r.id: r.asDict()
        for r in validate(_SPEC, _obs(spark), valuesets=_vs(spark)).collect()
    }
    ok = flags["ok-1"]
    assert not any(v for k, v in ok.items() if k != "id")
    bs = flags["bad-status"]
    assert bs["status_final"] is True
    assert bs["code_bound"] is True  # zzz is in the OTHER value set only
    assert bs["status_required"] is False
    bm = flags["bad missing!"]
    assert bm["status_required"] is True
    assert bm["status_final"] is True  # absent fixed value violates
    assert bm["has_subject"] is True
    assert bm["id_shape"] is True  # space and ! break the id shape
    assert bm["code_bound"] is False  # code b IS bound


def test_validation_summary_counts(spark):
    rows = {
        r.rule: (r.violations, r.checked)
        for r in validation_summary(
            _SPEC, _obs(spark), valuesets=_vs(spark)
        ).collect()
    }
    assert rows == {
        "status_required": (1, 3),
        "status_final": (2, 3),
        "has_subject": (1, 3),
        "id_shape": (1, 3),
        "code_bound": (1, 3),
    }


def test_spec_guardrails(spark):
    obs = _obs(spark)
    with pytest.raises(ValidationSpecError, match="unique 'key'"):
        validate(
            {"resource": "Observation",
             "rules": [{"type": "required", "path": "id"}]},
            obs,
        )
    with pytest.raises(ValidationSpecError, match="unknown type"):
        validate(
            {"resource": "Observation",
             "rules": [{"key": "x", "type": "nope", "path": "id"}]},
            obs,
        )
    with pytest.raises(ValidationSpecError, match="no field"):
        validate(
            {"resource": "Observation",
             "rules": [{"key": "x", "type": "required", "path": "wat"}]},
            obs,
        )
    with pytest.raises(ValidationSpecError, match="valuesets"):
        validate(
            {"resource": "Observation",
             "rules": [{"key": "x", "type": "binding", "path": "code",
                        "valueSet": "http://vs"}]},
            obs,
        )
    with pytest.raises(ValidationSpecError, match="regex needs a string"):
        validate(
            {"resource": "Observation",
             "rules": [{"key": "x", "type": "regex", "path": "subject",
                        "pattern": "a"}]},
            obs,
        )
    with pytest.raises(ValidationSpecError, match="max_inline_codes"):
        validate(
            {"resource": "Observation",
             "rules": [{"key": "x", "type": "binding", "path": "code",
                        "valueSet": "http://vs/codes"}]},
            obs,
            valuesets=_vs(spark),
            max_inline_codes=1,
        )
    with pytest.raises(ValidationSpecError, match="no rules"):
        validate({"resource": "Observation", "rules": []}, obs)


def test_validate_plan_is_single_scan_no_python(spark):
    df = validate(_SPEC, _obs(spark), valuesets=_vs(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection, zero shuffles


def test_pipeline_accumulates_validation_stats(spark, tmp_path):
    """cfg.validation_specs: per-batch validation folds into
    BundlePipeline.validation_stats across batches."""
    from fhir_to_lakehouse_spark.streaming.pipeline import (
        BundlePipeline,
        PipelineConfig,
    )
    from tests.fixtures import KAFKA_SCHEMA, kafka_row, put_bundle

    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ck"),
        upkeep_interval=50,
        validation_specs=[
            {
                "resource": "Patient",
                "rules": [
                    {"key": "gender_required", "type": "required",
                     "path": "gender"}
                ],
            }
        ],
    )
    p = BundlePipeline(spark, cfg)

    def batch(rows, bid):
        p.process_batch(
            spark.createDataFrame(
                [kafka_row(**r) for r in rows], KAFKA_SCHEMA
            ),
            bid,
        )

    batch(
        [
            {"value": put_bundle("Patient", "p1", gender="female"),
             "offset": 0},
            {"value": put_bundle("Patient", "p2"), "offset": 1},
        ],
        0,
    )
    batch(
        [{"value": put_bundle("Patient", "p3"), "offset": 2}],
        1,
    )
    assert p.validation_stats[("Patient", "gender_required")] == [2, 3]


def test_shipped_validation_spec_compiles(spark):
    """The example spec under validation_specs/ compiles and runs —
    shipped artifacts can't rot."""
    import glob

    paths = sorted(glob.glob("/root/repo/validation_specs/*.json"))
    assert paths
    for p in paths:
        spec = json.loads(open(p).read())
        assert spec["resource"] == "Observation"
        rows = validation_summary(spec, _obs(spark)).collect()
        assert {r.rule for r in rows} == {
            r["key"] for r in spec["rules"]
        }
