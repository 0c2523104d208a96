"""Bundle-core golden tests: the reference's conflict-resolution truth
table (FIXTURES.md §4 / reference tests/unit/test_bundle_processor.py:
280-374) plus cross-batch PUT→DELETE and empty-batch no-op."""

from __future__ import annotations

import pytest

from fhir_to_lakehouse_spark.operators.bundles import (
    latest_per_key,
    prepare_stream,
)
from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig
from tests.fixtures import KAFKA_SCHEMA, delete_bundle, kafka_row, put_bundle


@pytest.fixture()
def pipeline(spark, tmp_path):
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "warehouse"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        upkeep_interval=50,
    )
    return BundlePipeline(spark, cfg)


def batch(spark, rows):
    return spark.createDataFrame([kafka_row(**r) for r in rows], KAFKA_SCHEMA)


def test_prepare_stream_extracts_routing_columns(spark):
    df = batch(
        spark,
        [{"value": put_bundle("Patient", "42", active=True), "offset": 0}],
    )
    row = prepare_stream(df).collect()[0]
    assert row["resource_type"] == "Patient"
    assert row["request_method"] == "PUT"
    assert row["request_resource_id"] == "42"
    assert row["request_url"] == "Patient/42"
    import json

    assert json.loads(row["resource"])["id"] == "42"


def test_latest_per_key_ordering_partition_asc_offset_desc(spark):
    # W1 tie-break: highest offset within the LOWEST partition wins
    # (reference src/bundle_processor.py:114-128)
    df = batch(
        spark,
        [
            {"value": put_bundle("Patient", "1", active=True), "partition": 1, "offset": 99},
            {"value": put_bundle("Patient", "1", active=False), "partition": 0, "offset": 5},
            {"value": put_bundle("Patient", "1", active=None), "partition": 0, "offset": 3},
        ],
    )
    out = latest_per_key(prepare_stream(df)).collect()
    assert len(out) == 1
    assert out[0]["partition"] == 0 and out[0]["offset"] == 5


def test_truth_table_put_delete_conflicts(spark, pipeline):
    """The reference's golden scenario: ids ['0','2'] survive, id=2 has
    the newer body (active=false)."""
    rows = [
        {"value": put_bundle("Patient", "0", active=True), "partition": 0, "offset": 0},
        {"value": put_bundle("Patient", "1", active=True), "partition": 1, "offset": 0},
        {"value": delete_bundle("Patient", "1"), "partition": 1, "offset": 1},
        {"value": put_bundle("Patient", "1", active=True), "partition": 1, "offset": 2},
        {"value": delete_bundle("Patient", "1"), "partition": 1, "offset": 3},
        {"value": put_bundle("Patient", "2", active=True), "partition": 0, "offset": 10},
        {"value": put_bundle("Patient", "2", active=False), "partition": 0, "offset": 99},
    ]
    pipeline.process_batch(batch(spark, rows), batch_id=1)
    tbl = pipeline.table("Patient").to_df()
    ids = sorted(r["id"] for r in tbl.select("id").collect())
    assert ids == ["0", "2"]
    assert tbl.where("id = '2' and active = false").count() == 1


def test_cross_batch_put_then_delete(spark, pipeline):
    pipeline.process_batch(
        batch(spark, [{"value": put_bundle("Patient", "9", active=True)}]), 1
    )
    assert pipeline.table("Patient").to_df().count() == 1
    pipeline.process_batch(
        batch(spark, [{"value": delete_bundle("Patient", "9"), "offset": 1}]), 2
    )
    assert pipeline.table("Patient").to_df().count() == 0


def test_newer_put_overwrites_across_batches(spark, pipeline):
    pipeline.process_batch(
        batch(spark, [{"value": put_bundle("Patient", "7", active=True)}]), 1
    )
    pipeline.process_batch(
        batch(spark, [{"value": put_bundle("Patient", "7", active=False), "offset": 1}]),
        2,
    )
    tbl = pipeline.table("Patient").to_df()
    assert tbl.count() == 1
    assert tbl.where("active = false").count() == 1


def test_empty_batch_noop(spark, pipeline):
    empty = spark.createDataFrame([], KAFKA_SCHEMA)
    pipeline.process_batch(empty, 0)  # must not raise nor create tables
    assert not pipeline.table("Patient").exists()


def test_multiple_resource_types_routed_to_own_tables(spark, pipeline):
    rows = [
        {"value": put_bundle("Patient", "1"), "offset": 0},
        {"value": put_bundle("Condition", "c1", subject={"reference": "Patient/1"}), "offset": 1},
        {"value": put_bundle("Observation", "o1", status="final"), "offset": 2},
    ]
    pipeline.process_batch(batch(spark, rows), 1)
    assert pipeline.table("Patient").to_df().count() == 1
    assert pipeline.table("Condition").to_df().count() == 1
    assert pipeline.table("Observation").to_df().count() == 1
    cond = pipeline.table("Condition").to_df().collect()[0]
    # stored tables keep the reference string VERBATIM (Pathling
    # storage parity, ADVICE r5); resolution is query-time
    assert cond["subject"]["reference"] == "Patient/1"
    from fhir_to_lakehouse_spark.operators.bundles import resolve_references

    resolved = resolve_references(
        pipeline.table("Condition").to_df(), "Condition"
    ).collect()[0]
    assert resolved["subject"]["reference"] == "1"
    assert resolved["subject"]["type"] == "Patient"


def test_unknown_resource_type_keeps_raw_json(spark, pipeline):
    rows = [{"value": put_bundle("Medication", "m1", status="active")}]
    pipeline.process_batch(batch(spark, rows), 1)
    import json

    med = pipeline.table("Medication").to_df().collect()[0]
    assert med["id"] == "m1"
    assert json.loads(med["resource_json"])["status"] == "active"


def test_encounter_and_procedure_encode_typed(spark, pipeline):
    """The remaining reference hot types (settings.py:69-75) get
    curated schemas: period/performed fields come out typed, not only
    as raw JSON."""
    rows = [
        {
            "value": put_bundle(
                "Encounter",
                "e1",
                status="finished",
                period={"start": "2024-01-01T10:00:00Z", "end": "2024-01-01T11:00:00Z"},
                subject={"reference": "Patient/1"},
            ),
            "offset": 0,
        },
        {
            "value": put_bundle(
                "Procedure",
                "pr1",
                status="completed",
                code={"text": "appendectomy"},
                performedDateTime="2024-01-01T10:30:00Z",
            ),
            "offset": 1,
        },
    ]
    pipeline.process_batch(batch(spark, rows), 1)
    enc = pipeline.table("Encounter").to_df().collect()[0]
    assert enc["status"] == "finished"
    assert enc["period"]["start"] == "2024-01-01T10:00:00Z"
    # verbatim reference string in storage (resolution is query-time)
    assert enc["subject"]["reference"] == "Patient/1"
    pr = pipeline.table("Procedure").to_df().collect()[0]
    assert pr["status"] == "completed"
    assert pr["code"]["text"] == "appendectomy"
    assert pr["performedDateTime"] == "2024-01-01T10:30:00Z"


def test_observation_decimal_encoding(spark, pipeline):
    """FHIR decimals encode as DecimalType (Pathling parity, SURVEY
    §7.3): Observation.valueQuantity.value survives with exact decimal
    semantics, not float."""
    import decimal

    rows = [
        {
            "value": put_bundle(
                "Observation",
                "obs1",
                status="final",
                valueQuantity={"value": 98.6, "unit": "degF", "code": "[degF]"},
            )
        }
    ]
    pipeline.process_batch(batch(spark, rows), 1)
    obs = pipeline.table("Observation").to_df()
    field = dict(obs.select("valueQuantity.value").dtypes)["value"]
    assert field.startswith("decimal")
    row = obs.collect()[0]
    assert row["valueQuantity"]["value"] == decimal.Decimal("98.6")
    assert row["valueQuantity"]["unit"] == "degF"


def test_malformed_bundles_go_to_dead_letter_table(spark, pipeline):
    """Unparseable or non-Bundle payloads land in the _corrupt table
    with provenance; valid rows in the same batch process normally.
    A syntactically valid Bundle with no entries is NOT corrupt — it
    just produces no rows (the reference silently emits nothing for
    these; dead-lettering them would flag healthy empty transactions)."""
    rows = [
        {"value": put_bundle("Patient", "ok1", active=True), "offset": 0},
        {"value": "this is not json {{{", "offset": 1},
        {"value": '{"resourceType": "Patient", "id": "naked"}', "offset": 2},
        {"value": '{"resourceType": "Bundle", "type": "transaction"}', "offset": 3},
        # entry PRESENT but the wrong shape (object, not array): Spark 4
        # partial-result parsing nulls just that field, which must read
        # as corrupt, not as a healthy empty bundle
        {"value": '{"resourceType": "Bundle", "entry": {"foo": 1}}', "offset": 4},
    ]
    pipeline.process_batch(batch(spark, rows), batch_id=7)
    assert pipeline.table("Patient").to_df().count() == 1
    corrupt = pipeline.corrupt_records().collect()
    assert len(corrupt) == 3
    assert {r["offset"] for r in corrupt} == {1, 2, 4}
    assert all(r["batch_id"] == 7 for r in corrupt)
    assert any("not json" in r["raw_value"] for r in corrupt)


def test_delete_only_first_batch_creates_empty_table(spark, pipeline):
    """Reference parity: the table is created before merging, so a
    DELETE for a never-seen type still materializes an empty table
    (reference creates from encoder schema unconditionally)."""
    pipeline.process_batch(
        batch(spark, [{"value": delete_bundle("Patient", "ghost")}]), 1
    )
    assert pipeline.table("Patient").exists()
    assert pipeline.table("Patient").to_df().count() == 0


def test_pipeline_registers_tables_when_configured(spark, tmp_path):
    from fhir_to_lakehouse_spark.streaming.pipeline import (
        BundlePipeline,
        PipelineConfig,
    )

    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ck"),
        register_schema="fhir_stream",
    )
    pipe = BundlePipeline(spark, cfg)
    pipe.process_batch(
        batch(spark, [{"value": put_bundle("Patient", "r1", active=True)}]), 1
    )
    got = spark.sql("SELECT id FROM fhir_stream.Patient").collect()
    assert [r["id"] for r in got] == ["r1"]


def test_multi_entry_bundle_explodes_to_all_entries(spark, pipeline):
    """One transaction Bundle carrying several entries of mixed types
    and methods — the 1:N explode path (reference P3). All entries
    share the Kafka offset; cross-type routing still applies."""
    import json

    bundle = json.dumps(
        {
            "resourceType": "Bundle",
            "type": "transaction",
            "entry": [
                {
                    "resource": {"resourceType": "Patient", "id": "p1", "active": True},
                    "request": {"method": "PUT", "url": "Patient/p1"},
                },
                {
                    "resource": {"resourceType": "Condition", "id": "c1"},
                    "request": {"method": "PUT", "url": "Condition/c1"},
                },
                {"request": {"method": "DELETE", "url": "Patient/p0"}},
                {
                    "resource": {"resourceType": "Patient", "id": "p2", "active": False},
                    "request": {"method": "PUT", "url": "Patient/p2"},
                },
            ],
        }
    )
    pipeline.process_batch(batch(spark, [{"value": bundle}]), 1)
    patients = pipeline.table("Patient").to_df()
    assert sorted(r["id"] for r in patients.collect()) == ["p1", "p2"]
    assert pipeline.table("Condition").to_df().count() == 1


def test_unknown_fields_do_not_break_encoding(spark, pipeline):
    """Incoming resources with fields outside the curated schema merge
    fine (schema evolution disabled like the reference,
    /root/reference/src/main.py:72); extras survive in resource_json."""
    import json

    pipeline.process_batch(
        batch(
            spark,
            [
                {
                    "value": put_bundle(
                        "Patient",
                        "x1",
                        active=True,
                        futureField={"nested": [1, 2, 3]},
                        anotherUnknown="y",
                    )
                }
            ],
        ),
        1,
    )
    row = pipeline.table("Patient").to_df().collect()[0]
    assert row["id"] == "x1" and row["active"] is True
    assert json.loads(row["resource_json"])["futureField"]["nested"] == [1, 2, 3]


def test_reprocessing_same_batch_is_idempotent(spark, pipeline):
    """foreachBatch may redeliver a batch after a crash-restart; MERGE
    semantics must make reprocessing a no-op (the reference's
    cross-batch correctness rests on this same idempotency)."""
    rows = [
        {"value": put_bundle("Patient", "1", active=True), "offset": 0},
        {"value": delete_bundle("Patient", "2"), "offset": 1},
        {"value": put_bundle("Patient", "3", active=False), "offset": 2},
    ]
    pipeline.process_batch(batch(spark, rows), 1)
    first = sorted(
        (r["id"], r["active"])
        for r in pipeline.table("Patient").to_df().collect()
    )
    pipeline.process_batch(batch(spark, rows), 1)  # redelivery
    second = sorted(
        (r["id"], r["active"])
        for r in pipeline.table("Patient").to_df().collect()
    )
    assert first == second == [("1", True), ("3", False)]


def test_upkeep_runs_on_interval_batch(spark, pipeline):
    # batch_id 0 triggers upkeep (reference test: batch_id=0 -> OPTIMIZE)
    pipeline.process_batch(
        batch(spark, [{"value": put_bundle("Patient", "1")}]), 0
    )
    assert pipeline.table("Patient").to_df().count() == 1


def test_unparseable_inner_resource_dead_lettered_not_merged(spark, pipeline):
    """A PUT whose envelope is valid but whose inner resource JSON fails
    the curated parse must NOT plant a null-id row in the keyed table —
    it goes to the resource dead-letter table with the raw payload."""
    import json

    bad = json.dumps(
        {
            "resourceType": "Bundle",
            "type": "transaction",
            "entry": [
                {
                    "resource": "{definitely not json",
                    "request": {"method": "PUT", "url": "Patient/x1"},
                }
            ],
        }
    )
    rows = [
        {"value": put_bundle("Patient", "ok", active=True), "offset": 0},
        {"value": bad, "offset": 1},
    ]
    pipeline.process_batch(batch(spark, rows), batch_id=3)
    ids = [r["id"] for r in pipeline.table("Patient").to_df().collect()]
    assert ids == ["ok"]  # no null-key row
    corrupt = pipeline.corrupt_resources().collect()
    assert len(corrupt) == 1
    assert corrupt[0]["resource_type"] == "Patient"
    assert corrupt[0]["batch_id"] == 3
    assert "definitely not json" in corrupt[0]["raw_resource"]


def test_observation_component_array_decodes_typed(spark, pipeline):
    """§2.9 encoder depth (round 4): Observation.component (multi-part
    panels) and referenceRange decode into typed nested arrays; the
    value[x] choice variants each land in their own typed column."""
    import decimal

    rows = [
        {
            "value": put_bundle(
                "Observation",
                "bp1",
                status="final",
                code={"text": "blood-pressure"},
                component=[
                    {
                        "code": {"text": "systolic"},
                        "valueQuantity": {"value": 120.5, "unit": "mm[Hg]"},
                    },
                    {
                        "code": {"text": "diastolic"},
                        "valueQuantity": {"value": 80.25, "unit": "mm[Hg]"},
                    },
                    {"code": {"text": "note"}, "valueString": "sitting"},
                ],
                referenceRange=[
                    {
                        "low": {"value": 90, "unit": "mm[Hg]"},
                        "high": {"value": 120, "unit": "mm[Hg]"},
                        "text": "normal",
                    }
                ],
                valueBoolean=True,
            )
        }
    ]
    pipeline.process_batch(batch(spark, rows), 1)
    obs = pipeline.table("Observation").to_df().collect()[0]
    comps = {c["code"]["text"]: c for c in obs["component"]}
    assert comps["systolic"]["valueQuantity"]["value"] == decimal.Decimal("120.5")
    assert comps["diastolic"]["valueQuantity"]["value"] == decimal.Decimal("80.25")
    assert comps["note"]["valueString"] == "sitting"
    assert comps["note"]["valueQuantity"] is None  # choice typing, not clobbering
    rr = obs["referenceRange"][0]
    assert rr["low"]["value"] == decimal.Decimal("90")
    assert rr["high"]["value"] == decimal.Decimal("120")
    assert rr["text"] == "normal"
    assert obs["valueBoolean"] is True


def test_medication_request_nested_dosage_decodes_typed(spark, pipeline):
    """Round-4 curated types: MedicationRequest (previously generic
    fallback) decodes doubly-nested dosageInstruction[].doseAndRate[]
    .doseQuantity; DiagnosticReport and Immunization get typed columns
    too."""
    import decimal

    rows = [
        {
            "value": put_bundle(
                "MedicationRequest",
                "mr1",
                status="active",
                intent="order",
                medicationCodeableConcept={"text": "lisinopril 10mg"},
                authoredOn="2024-03-01",
                dosageInstruction=[
                    {
                        "sequence": 1,
                        "text": "once daily",
                        "asNeededBoolean": False,
                        "doseAndRate": [
                            {"doseQuantity": {"value": 10, "unit": "mg"}}
                        ],
                    }
                ],
            ),
            "offset": 0,
        },
        {
            "value": put_bundle(
                "Immunization",
                "imm1",
                status="completed",
                vaccineCode={"text": "influenza"},
                occurrenceDateTime="2024-10-01T09:00:00Z",
                doseQuantity={"value": 0.5, "unit": "mL"},
            ),
            "offset": 1,
        },
    ]
    pipeline.process_batch(batch(spark, rows), 1)
    mr = pipeline.table("MedicationRequest").to_df().collect()[0]
    assert mr["status"] == "active"
    assert mr["medicationCodeableConcept"]["text"] == "lisinopril 10mg"
    dq = mr["dosageInstruction"][0]["doseAndRate"][0]["doseQuantity"]
    assert dq["value"] == decimal.Decimal("10")
    assert dq["unit"] == "mg"
    imm = pipeline.table("Immunization").to_df().collect()[0]
    assert imm["vaccineCode"]["text"] == "influenza"
    assert imm["doseQuantity"]["value"] == decimal.Decimal("0.5")


def test_pipeline_encode_extensions_widens_and_serves_views(spark, tmp_path):
    """encode_extensions=True (the Pathling enableExtensions analog):
    a table written WITHOUT extensions widens additively when the
    setting flips on — old rows read NULL extensions — and a compiled
    extension('url') view answers from the stored table."""
    from fhir_to_lakehouse_spark.operators.view_definition import compile_view

    base = dict(
        warehouse_dir=str(tmp_path / "warehouse"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        upkeep_interval=50,
    )
    p1 = BundlePipeline(spark, PipelineConfig(**base))
    p1.process_batch(
        batch(
            spark,
            [{"value": put_bundle("Patient", "old", active=True), "offset": 0}],
        ),
        0,
    )
    birthsex_url = (
        "http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex"
    )
    p2 = BundlePipeline(spark, PipelineConfig(**base, encode_extensions=True))
    p2.process_batch(
        batch(
            spark,
            [
                {
                    "value": put_bundle(
                        "Patient",
                        "new",
                        active=True,
                        extension=[{"url": birthsex_url, "valueCode": "F"}],
                    ),
                    "offset": 1,
                }
            ],
        ),
        1,
    )
    stored = p2.table("Patient").to_df()
    assert "extension" in stored.columns
    view = {
        "resource": "Patient",
        "select": [
            {
                "column": [
                    {"name": "pid", "path": "id"},
                    {
                        "name": "birthsex",
                        "path": f"extension('{birthsex_url}').first().valueCode",
                    },
                ]
            }
        ],
    }
    got = {r.pid: r.birthsex for r in compile_view(view, stored).collect()}
    assert got == {"old": None, "new": "F"}


def test_concurrent_type_processing_matches_sequential(spark, tmp_path):
    """The per-type thread pool (PipelineConfig.max_concurrent_types,
    r12 — guide §2.6 overlap of independent jobs) is a scheduling
    change only: a mixed-type batch lands byte-identical tables under
    workers=3 and workers=1."""
    rows = [
        {"value": put_bundle("Patient", "1", active=True), "offset": 0},
        {"value": put_bundle("Patient", "2", active=False), "offset": 1},
        {"value": delete_bundle("Patient", "2"), "offset": 2},
        {"value": put_bundle("Observation", "10", status="final"), "offset": 3},
        {"value": put_bundle("Observation", "10", status="amended"), "offset": 4},
        {"value": put_bundle("Condition", "20"), "offset": 5},
        {"value": delete_bundle("Condition", "99"), "offset": 6},
    ]
    outputs = {}
    for workers in (1, 3):
        cfg = PipelineConfig(
            warehouse_dir=str(tmp_path / f"wh{workers}"),
            checkpoint_dir=str(tmp_path / f"ck{workers}"),
            max_concurrent_types=workers,
        )
        pipe = BundlePipeline(spark, cfg)
        pipe.process_batch(batch(spark, rows), batch_id=1)
        outputs[workers] = {
            rt: sorted(
                (r["id"],) for r in pipe.table(rt).to_df().select("id").collect()
            )
            for rt in ("Patient", "Observation", "Condition")
        }
    assert outputs[1] == outputs[3]
    assert outputs[3]["Patient"] == [("1",)]
    assert outputs[3]["Observation"] == [("10",)]
    assert outputs[3]["Condition"] == [("20",)]
