"""Bulk FHIR $export NDJSON source/sink (sources/bulk_export.py):
round-trip losslessness, strict-type filtering, blank-line tolerance,
and shape-identity with the bundle ingest path."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.sources.bulk_export import (
    read_bulk_export,
    write_bulk_export,
)

_PATIENTS = [
    {
        "resourceType": "Patient",
        "id": "p1",
        "active": True,
        "gender": "female",
        "name": [{"family": "Ada", "given": ["A"]}],
        "customField": {"kept": "losslessly"},
    },
    {"resourceType": "Patient", "id": "p2", "active": False},
]


def _write_ndjson(path, resources, extra_lines=()):
    with open(path, "w") as f:
        for r in resources:
            f.write(json.dumps(r) + "\n")
        for line in extra_lines:
            f.write(line + "\n")


def test_read_decodes_and_keeps_raw(spark, tmp_path):
    p = tmp_path / "Patient.ndjson"
    _write_ndjson(p, _PATIENTS, extra_lines=["", "   "])
    df = read_bulk_export(spark, str(p), "Patient")
    rows = {r.id: r for r in df.collect()}
    assert set(rows) == {"p1", "p2"}
    assert rows["p1"].name[0].family == "Ada"
    assert rows["p1"].active is True
    # the out-of-schema field survives in resource_json
    assert json.loads(rows["p1"].resource_json)["customField"] == {
        "kept": "losslessly"
    }


def test_strict_type_drops_stray_lines(spark, tmp_path):
    p = tmp_path / "Patient.ndjson"
    stray = json.dumps({"resourceType": "Observation", "id": "o1"})
    _write_ndjson(p, _PATIENTS, extra_lines=[stray])
    assert read_bulk_export(spark, str(p), "Patient").count() == 2
    # opting out keeps the line (decoded under the Patient schema)
    assert (
        read_bulk_export(spark, str(p), "Patient", strict_type=False).count()
        == 3
    )


def test_roundtrip_is_line_lossless(spark, tmp_path):
    src = tmp_path / "in.ndjson"
    _write_ndjson(src, _PATIENTS)
    enc = read_bulk_export(spark, str(src), "Patient")
    out_dir = tmp_path / "out"
    write_bulk_export(enc, str(out_dir), coalesce_files=1)
    back = read_bulk_export(spark, str(out_dir), "Patient")
    orig = sorted(r.resource_json for r in enc.collect())
    redo = sorted(r.resource_json for r in back.collect())
    assert orig == redo
    # exactly one data file when coalesced
    files = [
        f
        for f in os.listdir(out_dir)
        if f.startswith("part-") and not f.endswith(".crc")
    ]
    assert len(files) == 1


def test_shape_identical_to_bundle_path(spark, tmp_path):
    """A resource ingested via $export NDJSON and the same resource
    ingested as a JSON string through encode_resources produce the
    same schema — downstream operators can't tell the roads apart."""
    p = tmp_path / "Patient.ndjson"
    _write_ndjson(p, _PATIENTS[:1])
    via_bulk = read_bulk_export(spark, str(p), "Patient")
    via_bundle = encode_resources(
        spark.createDataFrame(
            [(json.dumps(_PATIENTS[0]),)], "resource string"
        ),
        "Patient",
    )
    assert via_bulk.schema == via_bundle.schema
    a = via_bulk.drop("resource_json").collect()
    b = via_bundle.drop("resource_json").collect()
    assert a == b


def test_read_has_no_python_row_path(spark, tmp_path):
    p = tmp_path / "Patient.ndjson"
    _write_ndjson(p, _PATIENTS)
    plan = (
        read_bulk_export(spark, str(p), "Patient")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
