"""FHIR XML ingestion — Spark 4 native from_xml, no external package.

FHIR resources have two official wire formats; the reference (and this
repo's pipeline) consumes the JSON one. Spark 4 ships XML parsing as a
built-in (`from_xml`, formerly the spark-xml package), which makes the
XML format a pure-codegen projection too: FHIR-XML encodes every
primitive as a ``value`` ATTRIBUTE (``<status value="final"/>``),
which from_xml surfaces under the default ``_`` attribute prefix, and
repeated elements (``component``) parse directly into arrays.

Scale shape: identical to the JSON chain — per-row parse inside
whole-stage codegen, no shuffle, no Python; a 100 TB XML backfill is
scan -> from_xml -> project at full parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

# FHIR-XML Observation subset: primitives-as-attributes (_value),
# repeated <component> as array
_OBS_XML_SCHEMA = (
    "struct<"
    "id:struct<_value:string>,"
    "status:struct<_value:string>,"
    "subject:struct<reference:struct<_value:string>>,"
    "valueQuantity:struct<value:struct<_value:double>,"
    "unit:struct<_value:string>>,"
    "component:array<struct<"
    "code:struct<text:struct<_value:string>>,"
    "valueQuantity:struct<value:struct<_value:double>>>>"
    ">"
)


@query(
    "pipeline_xml_observation_decode",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                        AS id,
           CASE WHEN event_id % 5 = 0 THEN 'amended'
                ELSE 'final' END                            AS status,
           CAST(user_id AS VARCHAR)                         AS patient_key,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)     AS obs_value,
           'mm[Hg]'                                         AS unit,
           CAST(CAST(CAST(value AS DECIMAL(18,2)) + 100
                AS DECIMAL(18,2)) AS DOUBLE)                AS systolic,
           CAST(CAST(CAST(value AS DECIMAL(18,2)) + 60
                AS DECIMAL(18,2)) AS DOUBLE)                AS diastolic,
           2                                                AS n_components
    FROM events
    """,
)
def pipeline_xml_observation_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The JSON decode chain's XML twin: blood-pressure Observations
    serialized in the REAL FHIR XML convention (primitives as value
    attributes, repeated component elements) and decoded with Spark 4's
    built-in from_xml — same projected answers as
    pipeline_observation_components, proving the engine ingests both
    official FHIR wire formats without leaving codegen.

    Numeric parity rule: the XML carries each quantity as the
    DECIMAL(18,2) cast's exact string rendering, so string->double in
    from_xml and the oracle's decimal->double land on the identical
    IEEE value (the round-9 boundary convention)."""
    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    d = "decimal(18,2)"
    vq = F.col("value").cast(d)
    status = F.when(F.col("event_id") % 5 == 0, "amended").otherwise("final")

    def prim(tag, val):
        return F.concat(F.lit(f"<{tag} value=\""), val, F.lit("\"/>"))

    def quantity(val):
        return F.concat(
            F.lit("<valueQuantity>"),
            prim("value", val.cast("string")),
            F.lit('<unit value="mm[Hg]"/>'),
            F.lit("</valueQuantity>"),
        )

    def component(code, val):
        return F.concat(
            F.lit("<component><code>"),
            prim("text", F.lit(code)),
            F.lit("</code>"),
            quantity(val),
            F.lit("</component>"),
        )

    xml = F.concat(
        F.lit("<Observation>"),
        prim("id", F.col("event_id").cast("string")),
        prim("status", status),
        F.lit("<subject>"),
        prim(
            "reference",
            F.concat(F.lit("Patient/"), F.col("user_id").cast("string")),
        ),
        F.lit("</subject>"),
        quantity(vq),
        component("systolic", (vq + 100).cast(d)),
        component("diastolic", (vq + 60).cast(d)),
        F.lit("</Observation>"),
    )
    parsed = ev.select(F.from_xml(xml, _OBS_XML_SCHEMA).alias("r"))

    def comp_named(name):
        return F.element_at(
            F.filter(
                F.col("r.component"),
                lambda c: c["code"]["text"]["_value"] == name,
            ),
            1,
        )

    return parsed.select(
        F.col("r.id._value").alias("id"),
        F.col("r.status._value").alias("status"),
        F.regexp_extract(
            F.col("r.subject.reference._value"), r"^Patient/(.+)$", 1
        ).alias("patient_key"),
        F.col("r.valueQuantity.value._value").alias("obs_value"),
        F.col("r.valueQuantity.unit._value").alias("unit"),
        comp_named("systolic")["valueQuantity"]["value"]["_value"].alias(
            "systolic"
        ),
        comp_named("diastolic")["valueQuantity"]["value"]["_value"].alias(
            "diastolic"
        ),
        F.size("r.component").alias("n_components"),
    )
