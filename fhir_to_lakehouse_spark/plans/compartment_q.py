"""Oracle-checked patient-compartment queries ($everything).

The operator (operators/compartment.py) run end to end: three
resource types synthesized as real FHIR JSON from different tables
(Patient <- customer, Observation <- events, Condition <- orders),
decoded through encode_resources, compartment-extracted for a cohort,
and unioned — checked against DuckDB restating the compartment as
three plain per-table selects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.operators.compartment import patient_everything
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)


@query(
    "compartment_patient_everything",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)  AS patient_id,
           'Patient'                   AS resource_type,
           CAST(c_custkey AS VARCHAR)  AS rid
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT CAST(user_id AS VARCHAR), 'Observation', CAST(event_id AS VARCHAR)
    FROM events
    WHERE user_id % 10 = 0
      AND user_id IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT CAST(o_custkey AS VARCHAR), 'Condition', CAST(o_orderkey AS VARCHAR)
    FROM orders
    WHERE o_custkey % 10 = 0
      AND o_custkey IN (SELECT c_custkey FROM customer)
    """,
)
def compartment_patient_everything(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Patient/$everything for a cohort (every tenth customer): the
    compartment operator unions per-type slices — Patients link to
    themselves, Observations via subject 'Patient/<uid>', Conditions
    via a urn:uuid subject with an explicit Reference.type — with the
    cohort BROADCAST semi-joined into each slice, so no fact table
    shuffles and each is read exactly once. The oracle restates the
    compartment as three flat selects."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))

    pat_json = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            F.col("c_custkey").cast("string").alias("id"),
        )
    )
    patients = encode_resources(
        customer.select(pat_json.alias("resource")), "Patient"
    )
    obs_json = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("user_id").cast("string")
                ).alias("reference")
            ).alias("subject"),
        )
    )
    observations = encode_resources(
        events.select(obs_json.alias("resource")), "Observation"
    )
    # Synthea transaction shape: urn:uuid reference, type made
    # explicit — exercises the untyped-reference acceptance path
    cond_json = F.to_json(
        F.struct(
            F.lit("Condition").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.struct(
                F.concat(
                    F.lit("urn:uuid:"), F.col("o_custkey").cast("string")
                ).alias("reference"),
                F.lit("Patient").alias("type"),
            ).alias("subject"),
        )
    )
    conditions = encode_resources(
        orders.select(cond_json.alias("resource")), "Condition"
    )
    cohort = customer.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").cast("string")
    )
    out = patient_everything(
        {
            "Patient": patients,
            "Observation": observations,
            "Condition": conditions,
        },
        patient_ids=cohort,
    )
    return out.select("patient_id", "resource_type", "rid")


@query(
    "patient_link_canonical",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)                       AS id,
           CAST(c_custkey // 4 * 4 AS VARCHAR)              AS canonical_id
    FROM customer
    """,
)
def patient_link_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patient merge-chain resolution (operators/links.py) end to
    end: customers form replaced-by chains of length 3 inside every
    block of four ids (4m+3 -> 4m+2 -> 4m+1 -> 4m), so pointer
    doubling must take two rounds — a single round would leave 4m+3
    pointing at 4m+1. Every id maps to its block's head; the
    oracle states that closed form. The resolution itself is
    patient-dimension-sized; the fact-side application is the
    broadcast join resolve_patient_references (plan-asserted in
    tests/test_links.py)."""
    from fhir_to_lakehouse_spark.operators.links import (
        resolve_patient_links,
    )

    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    k = F.col("c_custkey")
    key = k.cast("string")
    prev = (k - 1).cast("string")
    link = F.when(
        k % 4 != 0,
        F.array(
            F.struct(
                F.struct(
                    F.concat(F.lit("Patient/"), prev).alias("reference")
                ).alias("other"),
                F.lit("replaced-by").alias("type"),
            )
        ),
    )
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            key.alias("id"),
            link.alias("link"),
        )
    )
    enc = encode_resources(
        customer.select(resource.alias("resource")), "Patient"
    )
    return resolve_patient_links(enc).select("id", "canonical_id")


@query(
    "cohort_inclusion_criteria",
    oracle="""
    SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS patient_id
    FROM customer
    WHERE c_custkey % 2 = 0
      AND c_custkey IN (
        SELECT user_id FROM events
        WHERE CAST(value AS DECIMAL(18,2)) >= 50
      )
    """,
)
def cohort_inclusion_criteria(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative cohort extraction (operators/cohort.py): female
    patients (customer-derived) AND at least one final Observation
    with value >= 50 (events-derived, linked through the verbatim
    'Patient/<uid>' subject) — each criterion one pushed-filter scan
    reduced to a distinct patient-id set, intersected by LEFT SEMI
    join. The oracle restates the cohort as a flat EXISTS query."""
    from fhir_to_lakehouse_spark.operators.cohort import build_cohort

    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    pat_json = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            F.col("c_custkey").cast("string").alias("id"),
            F.when(F.col("c_custkey") % 2 == 0, "female")
            .otherwise("male")
            .alias("gender"),
        )
    )
    patients = encode_resources(
        customer.select(pat_json.alias("resource")), "Patient"
    )
    obs_json = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("user_id").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.struct(
                F.col("value").cast("decimal(18,2)").alias("value")
            ).alias("valueQuantity"),
        )
    )
    observations = encode_resources(
        events.select(obs_json.alias("resource")), "Observation"
    )
    criteria = [
        {"resource": "Patient", "where": [{"path": "gender = 'female'"}]},
        {
            "resource": "Observation",
            "where": [
                {"path": "status = 'final'"},
                {"path": "valueQuantity.value >= 50"},
            ],
        },
    ]
    cohort = build_cohort(
        criteria, {"Patient": patients, "Observation": observations}
    )
    # criterion 2 can only produce ids that exist among events'
    # user_ids; intersecting with criterion 1 bounds it to customers
    return cohort


@query(
    "fhir_measure_proportion",
    oracle="""
    WITH pats AS (
      SELECT CAST(c_custkey AS VARCHAR) AS patient_id,
             CASE WHEN c_custkey % 2 = 0 THEN 'female' ELSE 'male' END
               AS gender
      FROM customer
    ),
    den AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS patient_id FROM events
    ),
    num AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS patient_id
      FROM events
      WHERE CAST(value AS DECIMAL(18,2)) >= 50
    )
    SELECT gender,
           CAST(COUNT(*) AS BIGINT)            AS initial_population,
           CAST(COUNT(d.patient_id) AS BIGINT) AS denominator,
           CAST(COUNT(n.patient_id) AS BIGINT) AS numerator,
           ROUND(COUNT(n.patient_id) * 1.0
                 / NULLIF(COUNT(d.patient_id), 0), 6) AS measure_score
    FROM pats p
    LEFT JOIN den d USING (patient_id)
    LEFT JOIN num n USING (patient_id)
    GROUP BY gender
    """,
)
def fhir_measure_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FHIR $evaluate-measure, proportion scoring: a clinical quality
    measure evaluated over declarative cohort criteria — initial
    population (every Patient), denominator (>=1 final Observation),
    numerator (>=1 final Observation with value >= 50), stratified by
    gender, scored numerator/denominator per stratum. This is the
    MeasureReport the reference ecosystem produces through a CQL
    engine; here both populations are build_cohort criteria (the same
    ViewDefinition where-subset), so the measure is pure Catalyst.

    Plan shape: each population is one pushed-filter scan reduced to a
    distinct patient-id set; the sets LEFT-join back onto the patient
    dimension (flags, not row multiplication — the sets are distinct)
    and one grouped aggregate emits the MeasureReport rows.

    100 TB shape: population sets shuffle only patient IDS (16-byte
    rows), never resources; the final stratified aggregate is
    |patients| rows into |strata| groups, map-side combinable. A
    thousand-measure batch reuses the same encoded scans — criteria
    differ only in pushed filters."""
    from fhir_to_lakehouse_spark.operators.cohort import build_cohort

    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    pat_json = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            F.col("c_custkey").cast("string").alias("id"),
            F.when(F.col("c_custkey") % 2 == 0, "female")
            .otherwise("male")
            .alias("gender"),
        )
    )
    patients = encode_resources(
        customer.select(pat_json.alias("resource")), "Patient"
    )
    obs_json = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("user_id").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.struct(
                F.col("value").cast("decimal(18,2)").alias("value")
            ).alias("valueQuantity"),
        )
    )
    observations = encode_resources(
        events.select(obs_json.alias("resource")), "Observation"
    )
    tables = {"Observation": observations}
    den = build_cohort(
        [{"resource": "Observation", "where": [{"path": "status = 'final'"}]}],
        tables,
    ).withColumn("in_den", F.lit(1))
    num = build_cohort(
        [
            {
                "resource": "Observation",
                "where": [
                    {"path": "status = 'final'"},
                    {"path": "valueQuantity.value >= 50"},
                ],
            }
        ],
        tables,
    ).withColumn("in_num", F.lit(1))
    pats = patients.select(
        F.col("id").alias("patient_id"), F.col("gender")
    )
    joined = pats.join(den, "patient_id", "left").join(
        num, "patient_id", "left"
    )
    n_den = F.count("in_den")
    n_num = F.count("in_num")
    return joined.groupBy("gender").agg(
        F.count(F.lit(1)).alias("initial_population"),
        n_den.alias("denominator"),
        n_num.alias("numerator"),
        F.round(
            F.when(n_den > 0, n_num / n_den),
            6,
        ).alias("measure_score"),
    )


@query(
    "fhir_deidentify_patients",
    oracle="""
    WITH pats AS (
      SELECT CAST(c_custkey AS VARCHAR) AS id,
             CASE WHEN c_custkey % 2 = 0 THEN 'female' ELSE 'male' END
               AS gender,
             DATE '1930-01-01' + CAST(c_custkey % 25000 AS INTEGER)
               AS birth_date,
             lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0')
               AS postal
      FROM customer
    )
    SELECT substr(sha256('Patient/' || id), 1, 16)  AS pseudonym,
           gender,
           CASE WHEN year(birth_date) <= 1936 THEN NULL
                ELSE year(birth_date) END           AS birth_year,
           CASE WHEN year(birth_date) <= 1936 THEN '90+'
                ELSE CAST(((2026 - year(birth_date)) // 10) * 10
                          AS VARCHAR) || 's'
           END                                      AS age_band,
           substr(postal, 1, 3) || '00'             AS zip3
    FROM pats
    """,
)
def fhir_deidentify_patients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIPAA Safe-Harbor-style de-identification over encoded Patient
    resources — the export gate every research lakehouse needs before
    data leaves the covered environment: direct identifiers (names)
    dropped, the resource id replaced by a deterministic pseudonym
    (sha256 of the typed reference, truncated — stable across exports
    so longitudinal joins still work), birthDate generalized to year
    with the over-89 cohort collapsed to '90+' (the Safe Harbor age
    rule, reference date 2026-01-01), and postal codes truncated to
    their first three digits.

    Plan shape: a pure projection over the encoded Patient scan —
    sha2, year(), and substring are all codegen'd; no shuffle, no
    Python, no lookup table to protect.

    100 TB shape: embarrassingly parallel (zero exchanges); the
    pseudonym needs no coordination because it's content-derived
    rather than allocated, which is exactly why Safe Harbor pipelines
    prefer keyed hashing (add a secret salt column at deploy time for
    HMAC semantics)."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    pat_json = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            F.col("c_custkey").cast("string").alias("id"),
            F.when(F.col("c_custkey") % 2 == 0, "female")
            .otherwise("male")
            .alias("gender"),
            F.date_format(
                F.date_add(
                    F.to_date(F.lit("1930-01-01")),
                    (F.col("c_custkey") % 25000).cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("birthDate"),
            F.array(
                F.struct(F.col("c_name").alias("family"))
            ).alias("name"),
            F.array(
                F.struct(
                    F.lpad(
                        (F.col("c_custkey") % 100000).cast("string"),
                        5,
                        "0",
                    ).alias("postalCode")
                )
            ).alias("address"),
        )
    )
    enc = encode_resources(
        customer.select(pat_json.alias("resource")), "Patient"
    )
    birth_year = F.year("birthDate")
    over89 = birth_year <= 1936
    return enc.select(
        F.substring(
            F.sha2(F.concat(F.lit("Patient/"), F.col("id")), 256), 1, 16
        ).alias("pseudonym"),
        "gender",
        F.when(over89, F.lit(None).cast("int"))
        .otherwise(birth_year)
        .alias("birth_year"),
        F.when(over89, F.lit("90+"))
        .otherwise(
            F.concat(
                (F.floor((F.lit(2026) - birth_year) / 10) * 10).cast(
                    "string"
                ),
                F.lit("s"),
            )
        )
        .alias("age_band"),
        F.concat(
            F.substring(F.element_at("address", 1).getField("postalCode"), 1, 3),
            F.lit("00"),
        ).alias("zip3"),
    )


@query(
    "privacy_k_anonymity",
    oracle="""
    WITH pats AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN 'female' ELSE 'male' END
               AS gender,
             DATE '1930-01-01' + CAST(c_custkey % 25000 AS INTEGER)
               AS birth_date,
             lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0')
               AS postal
      FROM customer
    ),
    quasi AS (
      SELECT gender,
             CASE WHEN year(birth_date) <= 1936 THEN '90+'
                  ELSE CAST(((2026 - year(birth_date)) // 10) * 10
                            AS VARCHAR) || 's'
             END                          AS age_band,
             substr(postal, 1, 3) || '00' AS zip3
      FROM pats
    )
    SELECT gender, age_band, zip3,
           CAST(COUNT(*) AS BIGINT)   AS group_size,
           COUNT(*) < 5               AS below_k
    FROM quasi
    GROUP BY gender, age_band, zip3
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the de-identified release — the check a
    privacy office runs BEFORE an export leaves: group the released
    rows by their quasi-identifier combination (gender, age band,
    zip3 — exactly what fhir_deidentify_patients emits) and flag every
    equivalence class smaller than k=5, since a unique-ish combination
    re-identifies a person even after Safe Harbor generalization. The
    de-identification and its audit ship as a PAIR: this entry
    consumes the other query's projection verbatim.

    Plan shape: the de-id projection (zero-shuffle) feeding one
    map-side-combinable grouped count over the quasi-identifier key.

    100 TB shape: output is |quasi-identifier combinations| rows (a
    few thousand — 2 genders x ~10 bands x zip3s), so the aggregate
    collapses map-side and the audit costs one corpus scan."""
    released = fhir_deidentify_patients(spark, sf_dir)
    return released.groupBy("gender", "age_band", "zip3").agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) < 5).alias("below_k"),
    )


@query(
    "fhir_encounter_los",
    oracle="""
    WITH enc AS (
      SELECT o_orderkey AS id,
             CASE WHEN o_orderpriority LIKE '1%'
                    OR o_orderpriority LIKE '2%'
                  THEN 'IMP' ELSE 'AMB' END AS class_code,
             CAST(o_orderdate AS DATE)      AS start_d,
             CAST(o_orderdate AS DATE)
               + CAST(o_orderkey % 14 + 1 AS INTEGER) AS end_d
      FROM orders
    )
    SELECT class_code,
           CAST(COUNT(*) AS BIGINT)              AS n_encounters,
           ROUND(AVG(end_d - start_d), 6)        AS avg_los_days,
           CAST(MAX(end_d - start_d) AS BIGINT)  AS max_los_days,
           CAST(COUNT(CASE WHEN end_d - start_d > 7 THEN 1 END)
                AS BIGINT)                       AS n_long_stays
    FROM enc
    GROUP BY class_code
    """,
)
def fhir_encounter_los(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encounter length-of-stay analytics — the first operational
    question asked of any encounter table: per encounter class
    (inpatient IMP vs ambulatory AMB, the v3-ActCode codes Synthea
    emits), the count, mean and max stay in days, and the long-stay
    (>7 d) tally. Encounters synthesize from orders (order date =
    admission, deterministic 1-14 day stay) and run the FULL encode
    path, so Encounter's period/class struct fields get end-to-end
    coverage like the other decode families.

    Plan shape: encode projection -> datediff on the period bounds ->
    one map-side-combinable grouped aggregate into 2 class rows.

    100 TB shape: one scan, one tiny aggregate; LOS arithmetic is
    codegen'd date math on the typed period columns."""
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    d = F.col("o_orderdate")
    enc_json = F.to_json(
        F.struct(
            F.lit("Encounter").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.lit("finished").alias("status"),
            F.struct(
                F.lit("http://terminology.hl7.org/CodeSystem/v3-ActCode")
                .alias("system"),
                F.when(
                    F.col("o_orderpriority").rlike("^[12]"), "IMP"
                )
                .otherwise("AMB")
                .alias("code"),
            ).alias("class"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("o_custkey").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.struct(
                F.date_format(d, "yyyy-MM-dd").alias("start"),
                F.date_format(
                    F.date_add(d, (F.col("o_orderkey") % 14 + 1).cast("int")),
                    "yyyy-MM-dd",
                ).alias("end"),
            ).alias("period"),
        )
    )
    enc = encode_resources(
        orders.select(enc_json.alias("resource")), "Encounter"
    )
    los = F.datediff(
        F.to_date(F.col("period.end")), F.to_date(F.col("period.start"))
    )
    return (
        enc.select(F.col("class.code").alias("class_code"), los.alias("los"))
        .groupBy("class_code")
        .agg(
            F.count(F.lit(1)).alias("n_encounters"),
            F.round(F.avg("los"), 6).alias("avg_los_days"),
            F.max("los").cast("long").alias("max_los_days"),
            F.count(F.when(F.col("los") > 7, 1)).alias("n_long_stays"),
        )
    )
