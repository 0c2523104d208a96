"""Bulk FHIR ($export) NDJSON source/sink: flat per-resource-type
files.

The reference ingests TRANSACTION BUNDLES (Kafka topic, or the
bundles.ndjson corpus via sources/fhir_datasource.py). The other
standard interchange shape in the FHIR ecosystem is the Bulk Data
$export layout: one NDJSON file set per resource type, each line a
BARE resource (no bundle envelope, no request wrapper). This module
closes that corner of the source matrix:

- ``read_bulk_export`` — NDJSON lines -> the same encoded frame
  ``encode_resources`` produces from the bundle path (typed columns +
  lossless ``resource_json``), so everything downstream (merge sink,
  resolve_references, ViewDefinitions, terminology ops) is
  shape-identical regardless of which ingest road a resource took;
- ``write_bulk_export`` — an encoded frame back to NDJSON lines
  (the carried ``resource_json``, so the write is byte-lossless even
  for fields outside the curated schema).

Scale shape: ``spark.read.text`` splits large NDJSON files by line
ranges and lists directories in parallel — a 100 TB export reads with
the same parallelism as parquet (minus column pruning, which is
inherent to the format: that is exactly why the pipeline's landing
table is parquet/Delta and this reader exists only at the edge).
Malformed lines follow the bundle pipeline's dead-letter philosophy:
they never kill the job — ``from_json`` (PERMISSIVE) decodes them to
all-null typed columns while ``resource_json`` keeps the offending
line verbatim, so callers route them with ``id IS NULL`` exactly like
the bundle path's corrupt probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.sources.tables import fan_out_small_scan


def read_bulk_export(
    spark: SparkSession,
    path: str,
    resource_type: str,
    strict_type: bool = True,
) -> DataFrame:
    """Read a Bulk-Data NDJSON file/directory for ONE resource type
    into an encoded frame (typed columns + resource_json).

    ``strict_type=True`` (default) drops lines whose ``resourceType``
    disagrees with ``resource_type`` — a real $export file set is
    per-type, so a stray line is corruption, and silently decoding it
    with the wrong schema would null most columns. Blank lines are
    always skipped (trailing newline files are the norm)."""
    # fan out BEFORE the full-schema from_json in encode_resources:
    # text splits are sized by input bytes, and a small export file
    # would otherwise pay the parse on one core (same amplification
    # rationale as the bundle chains — sources/tables.py
    # fan_out_small_scan; no-op when the export is already parallel)
    lines = fan_out_small_scan(
        spark.read.text(path)
    ).select(
        F.col("value").alias("resource")
    ).filter(F.length(F.trim("resource")) > 0)
    if strict_type:
        lines = lines.filter(
            F.get_json_object("resource", "$.resourceType")
            == F.lit(resource_type)
        )
    return encode_resources(lines, resource_type)


def write_bulk_export(
    encoded: DataFrame, path: str, coalesce_files: int | None = None
) -> None:
    """Write an encoded frame back out as Bulk-Data NDJSON: one line
    per resource, the lossless ``resource_json`` verbatim — a
    round-trip through read_bulk_export is byte-identical per line.

    ``coalesce_files`` caps output file count for small exports (a
    per-type handoff to a downstream consumer usually wants a few
    files, not one per shuffle partition); leave None at scale so the
    write keeps full parallelism."""
    out = encoded.select(F.col("resource_json").alias("value"))
    if coalesce_files is not None:
        out = out.coalesce(coalesce_files)
    out.write.mode("overwrite").text(path)
