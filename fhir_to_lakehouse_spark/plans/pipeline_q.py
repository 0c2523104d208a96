"""Oracle-checked pipeline-operator queries.

The bundle pipeline's operators (P1-P7 parse/explode/extract, W1
last-writer-wins dedup) are exercised through ``queries()`` here by
synthesizing Kafka-shaped bundle events deterministically from the
testdata tables, running the REAL pipeline transforms, and checking
the result against DuckDB reproducing the same semantics in SQL.
Golden-path truth tables live in tests/test_bundles.py; these make the
same code paths part of the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import (
    latest_per_key,
    prepare_stream,
)
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)


def _bundle_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped frame of FHIR transaction bundles derived from
    events: each event becomes one PUT (or DELETE for 'error' events)
    of Patient/<user_id>; partition = event_id % 4, offset = event_id.
    Built with to_json(struct(...)) so the JSON payload is real."""
    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            F.col("user_id").cast("string").alias("id"),
            (F.col("value") > 50).alias("active"),
        )
    )
    url = F.concat_ws("/", F.lit("Patient"), F.col("user_id").cast("string"))
    method = F.when(F.col("event_type") == "error", "DELETE").otherwise("PUT")
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    F.when(method == "PUT", resource).alias("resource"),
                    F.struct(
                        method.alias("method"), url.alias("url")
                    ).alias("request"),
                )
            ).alias("entry"),
        )
    )
    return ev.select(
        F.col("user_id").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("ts").alias("timestamp"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.lit("fhir").alias("topic"),
    )


@query(
    "pipeline_parse_explode",
    oracle="""
    SELECT 'Patient'                      AS resource_type,
           CAST(user_id AS VARCHAR)       AS request_resource_id,
           CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END
                                          AS request_method,
           event_id                       AS "offset"
    FROM events
    """,
)
def pipeline_parse_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P7 end to end: binary->string cast, from_json envelope parse,
    entry explode, request-url split — the reference's prepare_stream
    (/root/reference/src/bundle_processor.py:39-77) — on synthesized
    real-JSON bundles. The oracle derives the expected routing columns
    straight from the source table."""
    events = _bundle_events(spark, sf_dir)
    return prepare_stream(events).select(
        "resource_type", "request_resource_id", "request_method", "offset"
    )


@query(
    "pipeline_latest_per_url",
    oracle="""
    SELECT 'Patient/' || CAST(user_id AS VARCHAR) AS request_url,
           CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END
                                                  AS request_method,
           "partition", "offset"
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY (event_id % 4) ASC, event_id DESC) AS rn
      FROM (SELECT user_id, event_type, event_id,
                   CAST(event_id % 4 AS INT) AS "partition",
                   event_id AS "offset"
            FROM events)
    ) WHERE rn = 1
    """,
)
def pipeline_latest_per_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 last-writer-wins dedup with the reference's exact tie-break
    (partition ASC, offset DESC — /root/reference/src/bundle_processor
    .py:114-128), driven through the real parse+explode+dedup chain.

    The projection runs BEFORE the dedup: min_by's whole-row struct is
    opaque to column pruning, so projecting first is what lets Catalyst
    prune the bundle parse down to ``entry.request`` (the resource
    payload never enters the shuffle). Same rule at 100 TB: project to
    the columns you'll keep before any whole-row argmin/argmax."""
    events = _bundle_events(spark, sf_dir)
    slim = prepare_stream(events).select(
        "request_url", "request_method", "partition", "offset"
    )
    return latest_per_key(slim, key="request_url")


def _observation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped bundles of Observation resources with the nested
    depth Synthea produces: valueQuantity, a component array (blood
    pressure panel: systolic + diastolic + a valueString note), and a
    referenceRange. Values are DECIMAL-cast before serialization so the
    DuckDB oracle reproduces them exactly (same rule as money math)."""
    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    vq = F.col("value").cast("decimal(18,2)")

    def quantity(val, unit="mm[Hg]"):
        return F.struct(
            val.alias("value"),
            F.lit(unit).alias("unit"),
            F.lit("http://unitsofmeasure.org").alias("system"),
        )

    def component(code_text, val=None, vstring=None):
        return F.struct(
            F.struct(F.lit(code_text).alias("text")).alias("code"),
            (
                quantity(val)
                if val is not None
                else F.lit(None).cast("struct<value:decimal(18,2),unit:string,system:string>")
            ).alias("valueQuantity"),
            (vstring if vstring is not None else F.lit(None).cast("string")).alias(
                "valueString"
            ),
        )

    resource = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(F.lit("blood-pressure").alias("text")).alias("code"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("user_id").cast("string")
                ).alias("reference")
            ).alias("subject"),
            quantity(vq).alias("valueQuantity"),
            F.array(
                component("systolic", val=(vq + 100).cast("decimal(18,2)")),
                component("diastolic", val=(vq + 60).cast("decimal(18,2)")),
                component("note", vstring=F.col("event_type")),
            ).alias("component"),
            F.array(
                F.struct(
                    quantity(F.lit(90).cast("decimal(18,2)")).alias("low"),
                    quantity(F.lit(120).cast("decimal(18,2)")).alias("high"),
                    F.lit("normal").alias("text"),
                )
            ).alias("referenceRange"),
        )
    )
    url = F.concat_ws("/", F.lit("Observation"), F.col("event_id").cast("string"))
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(
                        F.lit("PUT").alias("method"), url.alias("url")
                    ).alias("request"),
                )
            ).alias("entry"),
        )
    )
    return ev.select(
        F.col("event_id").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("ts").alias("timestamp"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.lit("fhir").alias("topic"),
    )


@query(
    "pipeline_observation_components",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                              AS id,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)           AS obs_value,
           'mm[Hg]'                                               AS unit,
           CAST(CAST(CAST(value AS DECIMAL(18,2)) + 100
                AS DECIMAL(18,2)) AS DOUBLE)                      AS systolic,
           CAST(CAST(CAST(value AS DECIMAL(18,2)) + 60
                AS DECIMAL(18,2)) AS DOUBLE)                      AS diastolic,
           event_type                                             AS note_text,
           CAST(value AS DECIMAL(18,2)) BETWEEN 90 AND 120        AS in_range
    FROM events
    """,
)
def pipeline_observation_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder depth: real JSON Observations with component arrays
    and referenceRange flow through the REAL parse->explode->encode
    chain (the same from_json path the pipeline's PUT branch runs,
    replacing Pathling — /root/reference/src/bundle_processor.py:162-166)
    and the nested fields are projected back out: choice-typed
    component values (valueQuantity vs valueString) via array filters,
    range membership via the decoded referenceRange struct. The oracle
    recomputes every value straight from the source table."""
    from fhir_to_lakehouse_spark.operators.bundles import encode_resources

    events = _observation_events(spark, sf_dir)
    obs = prepare_stream(events).filter(F.col("resource_type") == "Observation")
    enc = encode_resources(obs, "Observation")

    def comp_named(name):
        return F.element_at(
            F.filter(F.col("component"), lambda c: c["code"]["text"] == name), 1
        )

    return enc.select(
        "id",
        F.col("valueQuantity.value")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("obs_value"),
        F.col("valueQuantity.unit").alias("unit"),
        comp_named("systolic")["valueQuantity"]["value"]
        .cast("decimal(18,2)")
        .cast("double")
        .alias("systolic"),
        comp_named("diastolic")["valueQuantity"]["value"]
        .cast("decimal(18,2)")
        .cast("double")
        .alias("diastolic"),
        comp_named("note")["valueString"].alias("note_text"),
        F.col("valueQuantity.value")
        .between(
            F.element_at("referenceRange", 1)["low"]["value"],
            F.element_at("referenceRange", 1)["high"]["value"],
        )
        .alias("in_range"),
    )


@query(
    "pipeline_medication_request_decode",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                    AS id,
           CASE WHEN event_type = 'error' THEN 'stopped'
                ELSE 'active' END                       AS status,
           'order'                                      AS intent,
           'med-' || CAST(user_id % 10 AS VARCHAR)      AS med_text,
           strftime(ts, '%Y-%m-%d')                     AS authored_on,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS dose_mg
    FROM events
    """,
)
def pipeline_medication_request_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage beyond the reference's five hot types: a
    MedicationRequest (curated since round 4 — previously degraded to
    the generic id+JSON fallback) round-trips through the bundle chain
    with its doubly-nested dosageInstruction[].doseAndRate[]
    .doseQuantity decoded back out."""
    from fhir_to_lakehouse_spark.operators.bundles import encode_resources

    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    dose = F.col("value").cast("decimal(18,2)")
    resource = F.to_json(
        F.struct(
            F.lit("MedicationRequest").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.when(F.col("event_type") == "error", "stopped")
            .otherwise("active")
            .alias("status"),
            F.lit("order").alias("intent"),
            F.struct(
                F.concat(F.lit("med-"), (F.col("user_id") % 10).cast("string")).alias(
                    "text"
                )
            ).alias("medicationCodeableConcept"),
            F.struct(
                F.concat(F.lit("Patient/"), F.col("user_id").cast("string")).alias(
                    "reference"
                )
            ).alias("subject"),
            F.date_format("ts", "yyyy-MM-dd").alias("authoredOn"),
            F.array(
                F.struct(
                    F.lit(1).alias("sequence"),
                    F.lit("once daily").alias("text"),
                    F.lit(False).alias("asNeededBoolean"),
                    F.array(
                        F.struct(
                            F.struct(
                                dose.alias("value"),
                                F.lit("mg").alias("unit"),
                            ).alias("doseQuantity")
                        )
                    ).alias("doseAndRate"),
                )
            ).alias("dosageInstruction"),
        )
    )
    url = F.concat_ws(
        "/", F.lit("MedicationRequest"), F.col("event_id").cast("string")
    )
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(
                        F.lit("PUT").alias("method"), url.alias("url")
                    ).alias("request"),
                )
            ).alias("entry"),
        )
    )
    events = ev.select(
        F.col("event_id").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("ts").alias("timestamp"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    mr = prepare_stream(events).filter(
        F.col("resource_type") == "MedicationRequest"
    )
    enc = encode_resources(mr, "MedicationRequest")
    first_dose = F.element_at(
        F.element_at("dosageInstruction", 1)["doseAndRate"], 1
    )["doseQuantity"]
    return enc.select(
        "id",
        "status",
        "intent",
        F.col("medicationCodeableConcept.text").alias("med_text"),
        F.col("authoredOn").alias("authored_on"),
        first_dose["value"].cast("decimal(18,2)").cast("double").alias(
            "dose_mg"
        ),
    )


@query(
    "pipeline_claim_decode",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR)                    AS id,
           'active'                                       AS status,
           -- resolve_references strips 'Patient/<id>' to the bare id
           -- at QUERY time (storage keeps the verbatim string)
           CAST(o_custkey AS VARCHAR)                     AS patient_ref,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                AS DOUBLE)                                AS total_amount,
           2                                              AS n_items,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                AS DOUBLE)                                AS items_net_sum
    FROM orders
    """,
)
def pipeline_claim_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage for the round-4 curated billing types: a
    Claim with a doubly-nested item[].net Money array round-trips
    through the full bundle chain (synthesize JSON -> parse -> explode
    -> encode) and the nested decimal amounts decode back out exactly.

    Item nets are split as (total - 10.00, 10.00) — pure DECIMAL
    arithmetic on both engines, so the nested-array fold
    (items_net_sum via a higher-order aggregate, no explode/shuffle)
    reproduces the claim total digit-for-digit."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    total = F.col("o_totalprice").cast("decimal(18,2)")
    money = lambda v: F.struct(  # noqa: E731
        v.alias("value"), F.lit("USD").alias("currency")
    )
    item = lambda seq, net: F.struct(  # noqa: E731
        F.lit(seq).alias("sequence"),
        F.struct(F.lit("claim item").alias("text")).alias("productOrService"),
        money(net).alias("net"),
    )
    resource = F.to_json(
        F.struct(
            F.lit("Claim").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.lit("active").alias("status"),
            F.lit("claim").alias("use"),
            F.struct(
                F.concat(F.lit("Patient/"), F.col("o_custkey").cast("string")).alias(
                    "reference"
                )
            ).alias("patient"),
            F.array(
                item(1, (total - F.lit(10.00).cast("decimal(18,2)")).cast("decimal(18,2)")),
                item(2, F.lit(10.00).cast("decimal(18,2)")),
            ).alias("item"),
            money(total).alias("total"),
        )
    )
    url = F.concat_ws("/", F.lit("Claim"), F.col("o_orderkey").cast("string"))
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(F.lit("PUT").alias("method"), url.alias("url")).alias(
                        "request"
                    ),
                )
            ).alias("entry"),
        )
    )
    events = orders.select(
        F.col("o_orderkey").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("o_orderdate").alias("timestamp"),
        (F.col("o_orderkey") % 4).cast("int").alias("partition"),
        F.col("o_orderkey").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    claims = prepare_stream(events).filter(F.col("resource_type") == "Claim")
    # storage-parity encode (verbatim references), then QUERY-time
    # resolution for the bare-id projection below
    enc = resolve_references(encode_resources(claims, "Claim"), "Claim")
    net_sum = F.expr(
        "CAST(aggregate(item, CAST(0.00 AS DECIMAL(18,2)),"
        " (acc, x) -> CAST(acc + x.net.value AS DECIMAL(18,2)))"
        " AS DECIMAL(18,2))"
    )
    return enc.select(
        "id",
        "status",
        F.col("patient.reference").alias("patient_ref"),
        F.col("total.value").cast("double").alias("total_amount"),
        F.size("item").alias("n_items"),
        net_sum.cast("double").alias("items_net_sum"),
    )


@query(
    "pipeline_dispense_decode",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) || '-' ||
           CAST(l_linenumber AS VARCHAR)                  AS id,
           'completed'                                    AS status,
           CAST(CAST(l_quantity AS DECIMAL(18,2))
                AS DOUBLE)                                AS qty,
           CAST(30.00 AS DOUBLE)                          AS days_supply,
           -- resolve_references strips 'Patient/<id>' at query time
           CAST(l_suppkey AS VARCHAR)                     AS subject_ref,
           'rx-' || CAST(l_orderkey AS VARCHAR)           AS rx_ref
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def pipeline_dispense_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage for the round-7 pharmacy tranche: a
    MedicationDispense with Quantity/daysSupply decimals, a nested
    performer[].actor reference, and an authorizingPrescription
    Reference ARRAY round-trips through the full bundle chain
    (synthesize JSON -> parse -> explode -> storage-parity encode ->
    query-time resolve_references). Covers the array-of-Reference
    normalization branch e2e, not just in the unit probe."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    li = fan_out_small_scan(load_table(spark, sf_dir, "lineitem")).filter(F.col("l_linenumber") == 1)
    rid = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    quantity = lambda v, unit: F.struct(  # noqa: E731
        v.alias("value"), F.lit(unit).alias("unit")
    )
    resource = F.to_json(
        F.struct(
            F.lit("MedicationDispense").alias("resourceType"),
            rid.alias("id"),
            F.lit("completed").alias("status"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("l_suppkey").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.array(
                F.struct(
                    F.concat(
                        F.lit("MedicationRequest/rx-"),
                        F.col("l_orderkey").cast("string"),
                    ).alias("reference")
                )
            ).alias("authorizingPrescription"),
            quantity(qty, "tablets").alias("quantity"),
            quantity(F.lit(30.00).cast("decimal(18,2)"), "d").alias("daysSupply"),
        )
    )
    url = F.concat_ws("/", F.lit("MedicationDispense"), rid)
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(
                        F.lit("PUT").alias("method"), url.alias("url")
                    ).alias("request"),
                )
            ).alias("entry"),
        )
    )
    events = li.select(
        rid.alias("key"),
        bundle.alias("value"),
        F.col("l_shipdate").cast("timestamp").alias("timestamp"),
        (F.col("l_orderkey") % 4).cast("int").alias("partition"),
        F.col("l_orderkey").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    md = prepare_stream(events).filter(
        F.col("resource_type") == "MedicationDispense"
    )
    enc = resolve_references(
        encode_resources(md, "MedicationDispense"), "MedicationDispense"
    )
    # Quantity.value is stored in the encoder's wide FHIR-decimal
    # representation; round to the source data's DECIMAL(18,2) then
    # convert to DOUBLE at the boundary (registry convention — the
    # driver hasher cannot normalize DecimalType across engines)
    d = "decimal(18,2)"
    return enc.select(
        "id",
        "status",
        F.col("quantity.value").cast(d).cast("double").alias("qty"),
        F.col("daysSupply.value").cast(d).cast("double").alias("days_supply"),
        F.col("subject.reference").alias("subject_ref"),
        F.element_at("authorizingPrescription", 1)["reference"].alias("rx_ref"),
    )


@query(
    "pipeline_invoice_decode",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR)                         AS id,
           'issued'                                            AS status,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                AS DOUBLE)                                     AS total_net,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                + CAST(19.99 AS DECIMAL(18,2)) AS DECIMAL(18,2))
                AS DOUBLE)                                     AS total_gross,
           1                                                   AS n_lines,
           'chg-' || CAST(o_orderkey AS VARCHAR)               AS first_charge_ref
    FROM orders
    """,
)
def pipeline_invoice_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage for the round-7 billing chain: an Invoice
    with two Money structs (totalNet/totalGross, exact DECIMAL
    arithmetic on both engines) and a lineItem[].chargeItemReference
    nested Reference array round-trips bundle chain -> storage-parity
    encode -> query-time resolution of the ChargeItem link."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    net = F.col("o_totalprice").cast("decimal(18,2)")
    gross = (net + F.lit(19.99).cast("decimal(18,2)")).cast("decimal(18,2)")
    money = lambda v: F.struct(  # noqa: E731
        v.alias("value"), F.lit("USD").alias("currency")
    )
    resource = F.to_json(
        F.struct(
            F.lit("Invoice").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.lit("issued").alias("status"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("o_custkey").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.array(
                F.struct(
                    F.lit(1).alias("sequence"),
                    F.struct(
                        F.concat(
                            F.lit("ChargeItem/chg-"),
                            F.col("o_orderkey").cast("string"),
                        ).alias("reference")
                    ).alias("chargeItemReference"),
                )
            ).alias("lineItem"),
            money(net).alias("totalNet"),
            money(gross).alias("totalGross"),
        )
    )
    url = F.concat_ws("/", F.lit("Invoice"), F.col("o_orderkey").cast("string"))
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(
                        F.lit("PUT").alias("method"), url.alias("url")
                    ).alias("request"),
                )
            ).alias("entry"),
        )
    )
    events = orders.select(
        F.col("o_orderkey").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("o_orderdate").cast("timestamp").alias("timestamp"),
        (F.col("o_orderkey") % 4).cast("int").alias("partition"),
        F.col("o_orderkey").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    inv = prepare_stream(events).filter(F.col("resource_type") == "Invoice")
    enc = resolve_references(encode_resources(inv, "Invoice"), "Invoice")
    return enc.select(
        "id",
        "status",
        F.col("totalNet.value").cast("double").alias("total_net"),
        F.col("totalGross.value").cast("double").alias("total_gross"),
        F.size("lineItem").alias("n_lines"),
        F.element_at("lineItem", 1)["chargeItemReference"]["reference"].alias(
            "first_charge_ref"
        ),
    )


@query(
    "pipeline_risk_decode",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)            AS id,
           'final'                               AS status,
           CAST(CAST(c_acctbal AS DECIMAL(18,2))
                AS DOUBLE)                       AS probability,
           CASE WHEN c_acctbal < 0 THEN 'low' ELSE 'high' END AS risk,
           CAST(c_custkey AS VARCHAR)            AS subject_ref
    FROM customer
    """,
)
def pipeline_risk_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage for the round-7 decision-support tranche:
    a RiskAssessment whose prediction[] carries a FHIR decimal
    (probabilityDecimal -> DecimalType, Pathling parity) and a nested
    qualitativeRisk CodeableConcept round-trips the bundle chain; the
    decimal survives to_json -> from_json digit-for-digit."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    cust = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    prob = F.col("c_acctbal").cast("decimal(18,2)")
    risk = F.when(F.col("c_acctbal") < 0, "low").otherwise("high")
    resource = F.to_json(
        F.struct(
            F.lit("RiskAssessment").alias("resourceType"),
            F.col("c_custkey").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("c_custkey").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.array(
                F.struct(
                    F.struct(F.lit("event").alias("text")).alias("outcome"),
                    prob.alias("probabilityDecimal"),
                    F.struct(risk.alias("text")).alias("qualitativeRisk"),
                )
            ).alias("prediction"),
        )
    )
    url = F.concat_ws(
        "/", F.lit("RiskAssessment"), F.col("c_custkey").cast("string")
    )
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(
                        F.lit("PUT").alias("method"), url.alias("url")
                    ).alias("request"),
                )
            ).alias("entry"),
        )
    )
    events = cust.select(
        F.col("c_custkey").cast("string").alias("key"),
        bundle.alias("value"),
        F.current_timestamp().alias("timestamp"),
        (F.col("c_custkey") % 4).cast("int").alias("partition"),
        F.col("c_custkey").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    ra = prepare_stream(events).filter(
        F.col("resource_type") == "RiskAssessment"
    )
    enc = resolve_references(
        encode_resources(ra, "RiskAssessment"), "RiskAssessment"
    )
    pred = F.element_at("prediction", 1)
    return enc.select(
        "id",
        "status",
        pred["probabilityDecimal"]
        .cast("decimal(18,2)")
        .cast("double")
        .alias("probability"),
        pred["qualitativeRisk"]["text"].alias("risk"),
        F.col("subject.reference").alias("subject_ref"),
    )


def _linked_bundle_events(
    spark: SparkSession, sf_dir: str, ref_style: str = "urn"
) -> DataFrame:
    """Synthea-shaped TWO-entry transaction bundles: each bundle carries
    a Patient (fullUrl urn:uuid:uuid-<user_id>, resource.id the same
    uuid — Synthea's convention) and an Observation whose
    subject.reference points at the patient — through the urn form
    (``ref_style="urn"``, the way /root/reference/tests/unit/fixtures/
    resources/single-patient.json addresses entries) or the relative
    REST form 'Patient/<id>' (``ref_style="relative"``, what a
    REST-shaped source emits; exercises the typed branch of reference
    normalization e2e). The Patient payload is a pure function of
    user_id so repeated PUTs are byte-identical and W1 dedup is
    value-deterministic."""
    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    uid = F.col("user_id").cast("string")
    patient_id = F.concat(F.lit("uuid-"), uid)
    patient = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            patient_id.alias("id"),
            (F.col("user_id") % 2 == 0).alias("active"),
            F.when(F.col("user_id") % 2 == 0, "female")
            .otherwise("male")
            .alias("gender"),
        )
    )
    if ref_style == "urn":
        subject_ref = F.concat(F.lit("urn:uuid:"), patient_id)
    elif ref_style == "relative":
        subject_ref = F.concat(F.lit("Patient/"), patient_id)
    else:
        raise ValueError(f"ref_style must be 'urn' or 'relative', got {ref_style!r}")
    observation = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(F.lit("heart-rate").alias("text")).alias("code"),
            F.struct(subject_ref.alias("reference")).alias("subject"),
        )
    )
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    F.concat(F.lit("urn:uuid:"), patient_id).alias("fullUrl"),
                    patient.alias("resource"),
                    F.struct(
                        F.lit("PUT").alias("method"),
                        F.concat_ws("/", F.lit("Patient"), patient_id).alias(
                            "url"
                        ),
                    ).alias("request"),
                ),
                F.struct(
                    F.concat(
                        F.lit("urn:uuid:obs-"), F.col("event_id").cast("string")
                    ).alias("fullUrl"),
                    observation.alias("resource"),
                    F.struct(
                        F.lit("PUT").alias("method"),
                        F.concat_ws(
                            "/",
                            F.lit("Observation"),
                            F.col("event_id").cast("string"),
                        ).alias("url"),
                    ).alias("request"),
                ),
            ).alias("entry"),
        )
    )
    return ev.select(
        F.col("event_id").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("ts").alias("timestamp"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.lit("fhir").alias("topic"),
    )


@query(
    "pipeline_reference_join",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                 AS obs_id,
           'uuid-' || CAST(user_id AS VARCHAR)       AS patient_id,
           (user_id % 2 = 0)                         AS active,
           CASE WHEN user_id % 2 = 0 THEN 'female'
                ELSE 'male' END                      AS gender
    FROM events
    """,
)
def pipeline_reference_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 reference resolution (VERDICT r4 item 5): Synthea-shaped
    two-entry bundles (Patient addressed by urn:uuid fullUrl +
    Observation whose subject.reference uses the urn form) flow through
    the REAL parse -> explode -> per-type split -> W1 dedup -> encode
    chain, and the encoded Observation joins the encoded Patient
    directly on ``subject.reference = id`` — no string surgery in the
    query, because resolve_references strips the urn prefix at QUERY
    time (the stored/encoded form keeps the verbatim string, matching
    the reference's Pathling table format; ADVICE r5).
    The oracle rebuilds the joined rows straight from the source table.

    Scale shape: one parse of the batch feeds both type branches
    (same single-pass routing as the streaming pipeline); the join is
    a plain equi-join on the resolved id — broadcastable when the
    patient dimension is small, shuffle-joinable when it is not, with
    no reference-parsing expression in the join key to defeat
    pushdown."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    events = _linked_bundle_events(spark, sf_dir)
    entries = prepare_stream(events)
    patients_raw = latest_per_key(
        entries.filter(F.col("resource_type") == "Patient"),
        key="request_url",
    )
    patients = encode_resources(patients_raw, "Patient").select(
        F.col("id").alias("patient_id"), "active", "gender"
    )
    observations = (
        resolve_references(
            encode_resources(
                entries.filter(F.col("resource_type") == "Observation"),
                "Observation",
            ),
            "Observation",
        )
        # type guard: FHIR ids are unique only per type, so a sound
        # id-join filters to references that target Patient — either
        # explicitly typed, or type-null (urn:uuid form, globally
        # unique by construction)
        .filter(
            F.col("subject.type").isNull()
            | (F.col("subject.type") == "Patient")
        )
        .select(
            F.col("id").alias("obs_id"),
            F.col("subject.reference").alias("patient_id"),
        )
    )
    return observations.join(patients, "patient_id").select(
        "obs_id", "patient_id", "active", "gender"
    )


@query(
    "pipeline_dangling_references",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)             AS obs_id,
           'uuid-' || CAST(user_id AS VARCHAR)   AS missing_patient_ref
    FROM events WHERE user_id % 2 = 1
    """,
)
def pipeline_dangling_references(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity check over the ingested lakehouse: find
    Observations whose (normalized) subject reference has no matching
    Patient row — the data-quality gate a healthcare deployment runs
    after every ingest batch, and the first query reference
    normalization makes expressible as a plain anti-join.

    Bundles are synthesized so only even user_ids ship a Patient entry;
    odd ones reference a patient that never arrives. The chain is the
    real parse -> explode -> split -> dedup -> encode path; the check
    itself is encoded_observations LEFT ANTI JOIN encoded_patients ON
    subject.reference = id. At scale both sides are table scans and the
    anti-join shuffles on the id key only (no reference-parsing
    expression in the key; broadcastable when the patient dim fits)."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    uid = F.col("user_id").cast("string")
    patient_id = F.concat(F.lit("uuid-"), uid)
    patient = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            patient_id.alias("id"),
            F.lit(True).alias("active"),
        )
    )
    observation = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.concat(F.lit("urn:uuid:"), patient_id).alias("reference")
            ).alias("subject"),
        )
    )
    entry_struct_type = (
        "struct<fullUrl:string,resource:string,"
        "request:struct<method:string,url:string>>"
    )
    patient_entry = F.when(
        F.col("user_id") % 2 == 0,
        F.struct(
            F.concat(F.lit("urn:uuid:"), patient_id).alias("fullUrl"),
            patient.alias("resource"),
            F.struct(
                F.lit("PUT").alias("method"),
                F.concat_ws("/", F.lit("Patient"), patient_id).alias("url"),
            ).alias("request"),
        ),
    ).otherwise(F.lit(None).cast(entry_struct_type))
    obs_entry = F.struct(
        F.concat(F.lit("urn:uuid:obs-"), F.col("event_id").cast("string")).alias(
            "fullUrl"
        ),
        observation.alias("resource"),
        F.struct(
            F.lit("PUT").alias("method"),
            F.concat_ws(
                "/", F.lit("Observation"), F.col("event_id").cast("string")
            ).alias("url"),
        ).alias("request"),
    )
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.filter(
                F.array(patient_entry, obs_entry), lambda e: e.isNotNull()
            ).alias("entry"),
        )
    )
    events = ev.select(
        F.col("event_id").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("ts").alias("timestamp"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    entries = prepare_stream(events)
    patients = encode_resources(
        latest_per_key(
            entries.filter(F.col("resource_type") == "Patient"),
            key="request_url",
        ),
        "Patient",
    ).select(F.col("id").alias("patient_id"))
    observations = (
        resolve_references(
            encode_resources(
                entries.filter(F.col("resource_type") == "Observation"),
                "Observation",
            ),
            "Observation",
        )
        # same type guard as pipeline_reference_join: only references
        # that can target Patient participate in the integrity check
        .filter(
            F.col("subject.type").isNull()
            | (F.col("subject.type") == "Patient")
        )
        .select(
            F.col("id").alias("obs_id"),
            F.col("subject.reference").alias("patient_id"),
        )
    )
    return observations.join(patients, "patient_id", "left_anti").select(
        "obs_id", F.col("patient_id").alias("missing_patient_ref")
    )


@query(
    "pipeline_reference_join_typed",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                 AS obs_id,
           'uuid-' || CAST(user_id AS VARCHAR)       AS patient_id,
           'Patient'                                 AS ref_type,
           (user_id % 2 = 0)                         AS active
    FROM events
    """,
)
def pipeline_reference_join_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TYPED branch of reference resolution, end to end: the same
    two-entry bundles as pipeline_reference_join but with
    REST-relative 'Patient/<id>' subject references. Normalization
    strips the prefix into the Reference's `type` element, the join
    runs on the bare id WITH the explicit type predicate (the sound
    form — FHIR ids are unique only per type), and the oracle asserts
    the recorded type alongside the joined attributes."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    events = _linked_bundle_events(spark, sf_dir, ref_style="relative")
    entries = prepare_stream(events)
    patients = encode_resources(
        latest_per_key(
            entries.filter(F.col("resource_type") == "Patient"),
            key="request_url",
        ),
        "Patient",
    ).select(F.col("id").alias("patient_id"), "active")
    observations = (
        resolve_references(
            encode_resources(
                entries.filter(F.col("resource_type") == "Observation"),
                "Observation",
            ),
            "Observation",
        )
        .filter(F.col("subject.type") == "Patient")  # typed guard
        .select(
            F.col("id").alias("obs_id"),
            F.col("subject.reference").alias("patient_id"),
            F.col("subject.type").alias("ref_type"),
        )
    )
    return observations.join(patients, "patient_id").select(
        "obs_id", "patient_id", "ref_type", "active"
    )


@query(
    "pipeline_claimresponse_decode",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR)             AS id,
           'complete'                              AS outcome,
           -- resolve_references strips 'Claim/<id>' at query time
           CAST(o_orderkey AS VARCHAR)             AS request_ref,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                AS DOUBLE)                         AS payment_amount,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                AS DOUBLE)                         AS adjudicated_sum,
           2                                       AS n_items
    FROM orders
    """,
)
def pipeline_claimresponse_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage for the round-7 full-R4 catalog
    (schemas_catalog.py): a ClaimResponse — the payer-side answer to
    the Claim the reference's billing bundles carry — with a
    triply-nested item[].adjudication[].amount Money chain and a
    payment block round-trips the full bundle chain (synthesize ->
    parse -> explode -> storage-parity encode -> query-time reference
    resolution).

    The adjudicated amounts split the order total as (total - 10.00,
    10.00) across two items, pure DECIMAL(18,2) arithmetic on both
    engines, so the doubly-nested higher-order fold (sum over each
    item's first adjudication, no explode/shuffle) reproduces the
    payment amount digit-for-digit. Scale shape: identical to
    pipeline_claim_decode — one narrow projection per order row, all
    JSON work inside whole-stage codegen, zero Python."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    total = F.col("o_totalprice").cast("decimal(18,2)")
    money = lambda v: F.struct(  # noqa: E731
        v.alias("value"), F.lit("USD").alias("currency")
    )
    adjudication = lambda amt: F.array(  # noqa: E731
        F.struct(
            F.struct(F.lit("benefit").alias("text")).alias("category"),
            money(amt).alias("amount"),
        )
    )
    item = lambda seq, amt: F.struct(  # noqa: E731
        F.lit(seq).alias("itemSequence"),
        adjudication(amt).alias("adjudication"),
    )
    resource = F.to_json(
        F.struct(
            F.lit("ClaimResponse").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.lit("active").alias("status"),
            F.lit("claim").alias("use"),
            F.struct(
                F.concat(F.lit("Patient/"), F.col("o_custkey").cast("string")).alias(
                    "reference"
                )
            ).alias("patient"),
            F.struct(
                F.concat(F.lit("Claim/"), F.col("o_orderkey").cast("string")).alias(
                    "reference"
                )
            ).alias("request"),
            F.lit("complete").alias("outcome"),
            F.array(
                item(1, (total - F.lit(10.00).cast("decimal(18,2)")).cast("decimal(18,2)")),
                item(2, F.lit(10.00).cast("decimal(18,2)")),
            ).alias("item"),
            F.struct(
                F.struct(F.lit("complete").alias("text")).alias("type"),
                money(total).alias("amount"),
            ).alias("payment"),
        )
    )
    url = F.concat_ws(
        "/", F.lit("ClaimResponse"), F.col("o_orderkey").cast("string")
    )
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(F.lit("PUT").alias("method"), url.alias("url")).alias(
                        "request"
                    ),
                )
            ).alias("entry"),
        )
    )
    events = orders.select(
        F.col("o_orderkey").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("o_orderdate").cast("timestamp").alias("timestamp"),
        (F.col("o_orderkey") % 4).cast("int").alias("partition"),
        F.col("o_orderkey").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    cr = prepare_stream(events).filter(F.col("resource_type") == "ClaimResponse")
    enc = resolve_references(
        encode_resources(cr, "ClaimResponse"), "ClaimResponse"
    )
    adjudicated = F.expr(
        "CAST(aggregate(item, CAST(0.00 AS DECIMAL(18,2)),"
        " (acc, x) -> CAST(acc + element_at(x.adjudication, 1).amount.value"
        "             AS DECIMAL(18,2)))"
        " AS DECIMAL(18,2))"
    )
    return enc.select(
        "id",
        "outcome",
        F.col("request.reference").alias("request_ref"),
        F.col("payment.amount.value").cast("double").alias("payment_amount"),
        adjudicated.cast("double").alias("adjudicated_sum"),
        F.size("item").alias("n_items"),
    )


@query(
    "pipeline_measurereport_decode",
    oracle="""
    SELECT CAST(c_nationkey AS VARCHAR)                 AS id,
           'complete'                                   AS status,
           CAST(c_nationkey AS VARCHAR)                 AS reporter_ref,
           '2024-01-01'                                 AS period_start,
           CAST(COUNT(*) AS INT)                        AS numerator,
           CAST(COUNT(*) AS DOUBLE)                     AS score
    FROM customer
    GROUP BY c_nationkey
    """,
)
def pipeline_measurereport_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage: a MeasureReport (quality-measure result,
    full-R4 catalog type) whose group[].population[].count and
    group[].measureScore Quantity are REAL aggregates — one report per
    nation with the nation's customer count — exercising int-typed
    backbone fields and the Quantity decimal through the full bundle
    chain.

    Scale shape: the aggregate runs BEFORE synthesis (one
    map-side-combinable groupBy on the nation key, 25 result rows), so
    the bundle chain processes one row per report, not per customer —
    the same pre-aggregate-then-encode shape a real quality-measure
    publisher uses."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    per_nation = customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("int").alias("cnt")
    )
    score = F.col("cnt").cast("decimal(18,2)")
    resource = F.to_json(
        F.struct(
            F.lit("MeasureReport").alias("resourceType"),
            F.col("c_nationkey").cast("string").alias("id"),
            F.lit("complete").alias("status"),
            F.lit("summary").alias("type"),
            F.lit("http://example.org/Measure/customers").alias("measure"),
            F.struct(
                F.concat(
                    F.lit("Organization/"), F.col("c_nationkey").cast("string")
                ).alias("reference")
            ).alias("reporter"),
            F.struct(
                F.lit("2024-01-01").alias("start"),
                F.lit("2024-12-31").alias("end"),
            ).alias("period"),
            F.array(
                F.struct(
                    F.struct(F.lit("g1").alias("text")).alias("code"),
                    F.array(
                        F.struct(
                            F.struct(F.lit("numerator").alias("text")).alias(
                                "code"
                            ),
                            F.col("cnt").alias("count"),
                        )
                    ).alias("population"),
                    F.struct(score.alias("value")).alias("measureScore"),
                )
            ).alias("group"),
        )
    )
    url = F.concat_ws(
        "/", F.lit("MeasureReport"), F.col("c_nationkey").cast("string")
    )
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(F.lit("PUT").alias("method"), url.alias("url")).alias(
                        "request"
                    ),
                )
            ).alias("entry"),
        )
    )
    events = per_nation.select(
        F.col("c_nationkey").cast("string").alias("key"),
        bundle.alias("value"),
        F.lit("2024-12-31").cast("timestamp").alias("timestamp"),
        (F.col("c_nationkey") % 4).cast("int").alias("partition"),
        F.col("c_nationkey").cast("long").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    mr = prepare_stream(events).filter(
        F.col("resource_type") == "MeasureReport"
    )
    enc = resolve_references(
        encode_resources(mr, "MeasureReport"), "MeasureReport"
    )
    g1 = F.element_at("group", 1)
    return enc.select(
        "id",
        "status",
        F.col("reporter.reference").alias("reporter_ref"),
        F.col("period.start").alias("period_start"),
        F.element_at(g1["population"], 1)["count"].alias("numerator"),
        g1["measureScore"]["value"]
        .cast("decimal(18,2)")
        .cast("double")
        .alias("score"),
    )


@query(
    "pipeline_auditevent_decode",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                    AS id,
           'R'                                          AS action,
           '0'                                          AS outcome,
           -- resolve_references strips the relative prefixes
           CAST(user_id AS VARCHAR)                     AS agent_ref,
           'true'                                       AS agent_requestor,
           CAST(event_id AS VARCHAR)                    AS entity_ref,
           event_type                                   AS entity_name
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def pipeline_auditevent_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 encoder coverage: an AuditEvent (who-did-what access log,
    full-R4 catalog type) per purchase event — exercising the single
    (non-array) Coding struct, a boolean backbone field, and TWO
    independent Reference arrays (agent[].who, entity[].what) resolved
    in one resolve_references pass.

    Scale shape: one narrow row per event, every JSON op codegen'd;
    the boolean survives the JSON round-trip as a real BooleanType
    column (stringified only in the final projection so the DuckDB
    oracle can compare a stable literal)."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        resolve_references,
    )

    events_t = fan_out_small_scan(load_table(spark, sf_dir, "events")).filter(
        F.col("event_type") == "purchase"
    )
    resource = F.to_json(
        F.struct(
            F.lit("AuditEvent").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.struct(
                F.lit("http://dicom.nema.org/resources/ontology/DCM").alias(
                    "system"
                ),
                F.lit("110100").alias("code"),
            ).alias("type"),
            F.lit("R").alias("action"),
            F.col("ts").cast("string").alias("recorded"),
            F.lit("0").alias("outcome"),
            F.array(
                F.struct(
                    F.struct(
                        F.concat(
                            F.lit("Practitioner/"),
                            F.col("user_id").cast("string"),
                        ).alias("reference")
                    ).alias("who"),
                    F.lit(True).alias("requestor"),
                )
            ).alias("agent"),
            F.array(
                F.struct(
                    F.struct(
                        F.concat(
                            F.lit("DocumentReference/"),
                            F.col("event_id").cast("string"),
                        ).alias("reference")
                    ).alias("what"),
                    F.col("event_type").alias("name"),
                )
            ).alias("entity"),
        )
    )
    url = F.concat_ws(
        "/", F.lit("AuditEvent"), F.col("event_id").cast("string")
    )
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    resource.alias("resource"),
                    F.struct(F.lit("PUT").alias("method"), url.alias("url")).alias(
                        "request"
                    ),
                )
            ).alias("entry"),
        )
    )
    stream = events_t.select(
        F.col("event_id").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
        F.lit("fhir").alias("topic"),
    )
    ae = prepare_stream(stream).filter(F.col("resource_type") == "AuditEvent")
    enc = resolve_references(encode_resources(ae, "AuditEvent"), "AuditEvent")
    agent1 = F.element_at("agent", 1)
    entity1 = F.element_at("entity", 1)
    return enc.select(
        "id",
        "action",
        "outcome",
        agent1["who"]["reference"].alias("agent_ref"),
        agent1["requestor"].cast("string").alias("agent_requestor"),
        entity1["what"]["reference"].alias("entity_ref"),
        entity1["name"].alias("entity_name"),
    )
