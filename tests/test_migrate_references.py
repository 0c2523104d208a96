"""Round-trip test for the reference-format migration helper
(maintenance.migrate_references_all — VERDICT r6 item 4).

Rounds 4-5 wrote tables with NORMALIZED references (bare id +
stripped type); the current default stores reference strings VERBATIM
(Pathling storage parity). The migration re-encodes each row from the
losslessly-stored resource_json, so it must be EXACT both ways:

- old-format table --migrate(verbatim)--> byte-identical to what a
  pipeline under the new default writes for the same batch;
- migrating back to normalized reproduces the old-format rows.
"""

from __future__ import annotations

import pytest

from fhir_to_lakehouse_spark.maintenance import migrate_references_all
from fhir_to_lakehouse_spark.streaming.pipeline import (
    BundlePipeline,
    PipelineConfig,
)
from tests.fixtures import KAFKA_SCHEMA, kafka_row, put_bundle


def _batch(spark, rows):
    return spark.createDataFrame([kafka_row(**r) for r in rows], KAFKA_SCHEMA)


ROWS = [
    # urn form normalizes to (reference='p1', type=None) — the lossy
    # direction string surgery could not invert
    {
        "value": put_bundle(
            "Observation",
            "o1",
            status="final",
            subject={"reference": "urn:uuid:p1"},
        ),
        "offset": 0,
    },
    # Type/id form normalizes to (reference='p2', type='Patient')
    {
        "value": put_bundle(
            "Observation",
            "o2",
            status="final",
            subject={"reference": "Patient/p2"},
        ),
        "offset": 1,
    },
    # no reference at all — must pass through unchanged
    {
        "value": put_bundle("Patient", "p2", active=True),
        "offset": 2,
    },
]


def _rows_of(pipeline, rtype):
    df = pipeline.table(rtype).to_df()
    return sorted((r.asDict(recursive=True) for r in df.collect()),
                  key=lambda r: r["id"])


@pytest.fixture()
def warehouses(spark, tmp_path):
    """(old-format pipeline, new-format pipeline) over the same batch."""
    pipes = {}
    for name, normalize in (("old", True), ("new", False)):
        cfg = PipelineConfig(
            warehouse_dir=str(tmp_path / name),
            checkpoint_dir=str(tmp_path / f"{name}-ckpt"),
            normalize_references_at_write=normalize,
        )
        p = BundlePipeline(spark, cfg)
        p.process_batch(_batch(spark, ROWS), 0)
        pipes[name] = p
    return pipes


def test_migrate_to_verbatim_matches_new_default(spark, warehouses):
    old, new = warehouses["old"], warehouses["new"]
    # sanity: the formats differ before migration
    assert _rows_of(old, "Observation") != _rows_of(new, "Observation")

    done = migrate_references_all(spark, old.cfg.warehouse_dir, to="verbatim")
    assert len(done) == 2  # Observation + Patient tables

    for rtype in ("Observation", "Patient"):
        assert _rows_of(old, rtype) == _rows_of(new, rtype), rtype
    # the urn form is restored verbatim — proof the migration is not
    # string surgery on the normalized struct
    obs = {r["id"]: r for r in _rows_of(old, "Observation")}
    assert obs["o1"]["subject"]["reference"] == "urn:uuid:p1"
    assert obs["o2"]["subject"]["reference"] == "Patient/p2"


def test_migrate_round_trip_restores_old_format(spark, warehouses):
    old = warehouses["old"]
    before = {rt: _rows_of(old, rt) for rt in ("Observation", "Patient")}
    migrate_references_all(spark, old.cfg.warehouse_dir, to="verbatim")
    migrate_references_all(spark, old.cfg.warehouse_dir, to="normalized")
    for rtype, rows in before.items():
        assert _rows_of(old, rtype) == rows, rtype


def test_migrate_rejects_unknown_target(spark, tmp_path):
    with pytest.raises(ValueError, match="verbatim"):
        migrate_references_all(spark, str(tmp_path), to="bare")
