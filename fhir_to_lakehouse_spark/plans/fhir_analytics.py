"""Oracle-checked clinical-analytics queries over encoded resources.

The reference pipeline (/root/reference/src/bundle_processor.py) lands
Pathling-encoded resources in a lakehouse so downstream researchers can
run exactly this family of questions — the bzkf deployment feeds an
oncology research network, where prevalence, comorbidity, survival and
medication-adherence queries are the daily workload. Every entry here
synthesizes real FHIR JSON from the driver tables, runs it through the
FULL ``encode_resources`` path (so the typed schemas get end-to-end
coverage), and restates the analytics as flat SQL for the DuckDB
oracle.

100 TB shape (shared by all entries): resources encode as a pure
projection (no shuffle); every aggregate keys on low-cardinality
clinical codes or on patient id, so the single exchange per query is
map-side combinable or AQE-skew-handled; no entry collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.intervals import coalesce_intervals
from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

_SNOMED = "http://snomed.info/sct"
_RXNORM = "http://www.nlm.nih.gov/research/umls/rxnorm"


def _conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condition resources synthesized from orders: patient o_custkey,
    a 20-code diagnosis vocabulary keyed on o_orderkey, onset at the
    order date — encoded through the curated CONDITION_SCHEMA so
    code.coding / subject.reference / onsetDateTime are all typed."""
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    code = F.concat(
        F.lit("C"),
        F.lpad((F.col("o_orderkey") % 20).cast("string"), 2, "0"),
    )
    cond_json = F.to_json(
        F.struct(
            F.lit("Condition").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit(_SNOMED).alias("system"),
                        code.alias("code"),
                    )
                ).alias("coding"),
                F.concat(F.lit("diagnosis "), code).alias("text"),
            ).alias("code"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("o_custkey").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias(
                "onsetDateTime"
            ),
        )
    )
    return encode_resources(
        orders.select(cond_json.alias("resource")), "Condition"
    )


@query(
    "fhir_condition_prevalence",
    oracle="""
    WITH total AS (SELECT COUNT(*) AS n_pop FROM customer),
    cond AS (
      SELECT 'C' || lpad(CAST(o_orderkey % 20 AS VARCHAR), 2, '0') AS code,
             o_custkey
      FROM orders
    )
    SELECT code,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_patients,
           ROUND(CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) * 100 / n_pop,
                 6) AS prevalence_pct
    FROM cond, total
    GROUP BY code, n_pop
    """,
)
def fhir_condition_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period prevalence per diagnosis code — the first epidemiology
    query any disease registry runs: distinct patients carrying each
    Condition code over the registry population. The denominator is
    ONE broadcast scalar (count of the Patient dimension), so the
    per-code rate costs nothing beyond the distinct count.

    Plan shape: encoded Condition scan -> groupBy(code) distinct-count
    of subject -> broadcast 1-row population join. The distinct-count
    shuffles (code, patient) key pairs only.

    100 TB shape: 20 codes x |patients| distinct pairs is the partial
    aggregate's worst case — map-side dedup collapses repeat
    diagnoses, and a genuinely hot code is AQE-skew-split. No bodies
    move, no driver collect."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    total = customer.agg(F.count(F.lit(1)).alias("n_pop"))
    cond = _conditions(spark, sf_dir)
    per_code = cond.select(
        F.element_at("code.coding", 1).getField("code").alias("code"),
        F.col("subject.reference").alias("patient_id"),
    ).groupBy("code")
    return (
        per_code.agg(F.count_distinct("patient_id").alias("n_patients"))
        .join(F.broadcast(total))
        .select(
            "code",
            "n_patients",
            F.round(
                F.col("n_patients").cast("double") * 100 / F.col("n_pop"), 6
            ).alias("prevalence_pct"),
        )
    )


@query(
    "fhir_comorbidity_pairs",
    oracle="""
    WITH cond AS (
      SELECT DISTINCT
             'C' || lpad(CAST(o_orderkey % 20 AS VARCHAR), 2, '0') AS code,
             o_custkey AS patient_id
      FROM orders
    ),
    capped AS (
      SELECT code, patient_id FROM (
        SELECT code, patient_id,
               ROW_NUMBER() OVER (PARTITION BY patient_id ORDER BY code)
                 AS rn
        FROM cond
      ) WHERE rn <= 64
    )
    SELECT a.code                        AS code_a,
           b.code                        AS code_b,
           CAST(COUNT(*) AS BIGINT)      AS n_patients
    FROM capped a
    JOIN capped b
      ON a.patient_id = b.patient_id AND a.code < b.code
    GROUP BY a.code, b.code
    """,
)
def fhir_comorbidity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comorbidity co-occurrence: for every unordered pair of
    diagnosis codes, how many patients carry BOTH — the adjacency
    matrix behind comorbidity-network papers and Charlson-style risk
    scores. Per-patient distinct codes first (so repeat diagnoses
    don't inflate pairs), then every ordered pair code_a < code_b
    generated IN-ROW from the patient's own (capped, sorted) code set.

    Plan shape (r12 rewrite): encode -> groupBy(patient).collect_set
    (partial/map-side combinable; the set dedups codes, so the old
    separate distinct's (patient, code) exchange is gone) ->
    sort_array + slice(64) -> in-row pair generation (a higher-order
    transform over the <=64-element array, exploded) -> grouped count
    into at most C(20,2)=190 rows. Two hash exchanges total, ONE
    encode evaluation. The r11 shape was a self-join of two copies of
    the capped-distinct subtree: the planner broadcast one side
    instead of reusing the exchange, so the whole scan->to_json->
    from_json->distinct->WindowGroupLimit chain ran TWICE, and the
    join-inferred IsNotNull(patient_id) was substituted through the
    encode projection, evaluating the from_json chain a further time
    per row inside the pushed filter — four encode evaluations where
    one suffices (plans/r12/fhir_comorbidity_pairs_{before,after}.txt).

    100 TB shape: pair expansion is quadratic ONLY in per-patient
    distinct codes, capped at 64 by slice() — a pathological record
    with 10^5 codes contributes C(64,2) pairs, not 10^10, and the
    explode amplifies an already patient-aggregated relation, never
    the condition stream. Per-patient aggregation state is the
    distinct-code set (vocabulary-bounded — same bound the old window
    sort buffer had, minus the join). The null-patient guard rides
    the pair projection (explode of a when() null yields no rows), so
    no filter re-plants the encode expression below the aggregate.
    The oracle restates the identical cap via row_number <= 64 over
    the sorted distinct codes — the same first-64-sorted set."""
    cond = _conditions(spark, sf_dir)
    pc = cond.select(
        F.col("subject.reference").alias("patient_id"),
        F.element_at("code.coding", 1).getField("code").alias("code"),
    )
    codes = pc.groupBy("patient_id").agg(
        F.slice(F.sort_array(F.collect_set("code")), 1, 64).alias("codes")
    )
    # all ordered pairs (a, b) with a < b from the sorted set, in-row:
    # element i (0-based) pairs with every later element. Guarding
    # with when(patient_id IS NOT NULL) reproduces the old join's
    # null-key drop without a Filter node the optimizer could push
    # below the encode projection (explode(null) emits nothing).
    pair_expr = F.expr(
        "flatten(transform(codes, (a, i) -> "
        "transform(slice(codes, i + 2, size(codes)), "
        "b -> struct(a AS code_a, b AS code_b))))"
    )
    pairs = codes.select(
        F.explode(
            F.when(F.col("patient_id").isNotNull(), pair_expr)
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.code_a").alias("code_a"),
        F.col("p.code_b").alias("code_b"),
    ).agg(F.count(F.lit(1)).alias("n_patients"))


@query(
    "fhir_observation_range_flags",
    oracle="""
    WITH obs AS (
      SELECT event_type AS code,
             CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v,
             CAST(length(event_type) * 10 AS DOUBLE)       AS lo,
             CAST(length(event_type) * 10 + 120 AS DOUBLE) AS hi
      FROM events
    )
    SELECT code,
           CASE WHEN v > hi THEN 'H'
                WHEN v < lo THEN 'L'
                ELSE 'N' END              AS flag,
           CAST(COUNT(*) AS BIGINT)       AS n_obs,
           ROUND(CAST(COUNT(*) AS DOUBLE) * 100
                 / SUM(COUNT(*)) OVER (PARTITION BY code), 6) AS pct
    FROM obs
    GROUP BY code, CASE WHEN v > hi THEN 'H' WHEN v < lo THEN 'L'
                        ELSE 'N' END
    """,
)
def fhir_observation_range_flags(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference-range interpretation — the lab-medicine H/L/N flag:
    each Observation carries its own referenceRange (as real FHIR
    data does; ranges vary by assay, age, sex), the value is compared
    against the range IT shipped with, and the per-code flag mix is
    the quality dashboard every lab runs. Exercises
    Observation.referenceRange[].low/high Quantity structs through
    encode end-to-end.

    Plan shape: encode projection -> codegen'd decimal comparisons
    against the row's own range (no lookup join — the range travels in
    the resource) -> one grouped count into |codes| x 3 rows, plus a
    window over those few aggregated rows for the per-code share.

    100 TB shape: one scan, zero joins; the aggregate output is tiny
    so the share-window's single-stage shuffle moves |codes|x3 rows."""
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    lo = F.length("event_type") * 10
    obs_json = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit("http://loinc.org").alias("system"),
                        F.col("event_type").alias("code"),
                    )
                ).alias("coding")
            ).alias("code"),
            F.struct(
                F.col("value").cast("decimal(18,2)").alias("value")
            ).alias("valueQuantity"),
            F.array(
                F.struct(
                    F.struct(
                        lo.cast("decimal(18,2)").alias("value")
                    ).alias("low"),
                    F.struct(
                        (lo + 120).cast("decimal(18,2)").alias("value")
                    ).alias("high"),
                )
            ).alias("referenceRange"),
        )
    )
    enc = encode_resources(
        events.select(obs_json.alias("resource")), "Observation"
    )
    rr = F.element_at("referenceRange", 1)
    v = F.col("valueQuantity.value")
    flag = (
        F.when(v > rr.getField("high").getField("value"), "H")
        .when(v < rr.getField("low").getField("value"), "L")
        .otherwise("N")
    )
    counted = (
        enc.select(
            F.element_at("code.coding", 1).getField("code").alias("code"),
            flag.alias("flag"),
        )
        .groupBy("code", "flag")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    per_code = Window.partitionBy("code")
    return counted.select(
        "code",
        "flag",
        "n_obs",
        F.round(
            F.col("n_obs").cast("double") * 100 / F.sum("n_obs").over(per_code),
            6,
        ).alias("pct"),
    )


@query(
    "fhir_survival_km",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN c_custkey % 7 = 0 THEN 30
                  ELSE c_custkey % 30 END AS t,
             CASE WHEN c_custkey % 7 = 0 THEN 0 ELSE 1 END AS ev
      FROM customer
    ),
    times AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, COUNT(*) AS n_t
      FROM base GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(n_t) OVER (ORDER BY t DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_risk
      FROM times
    ),
    km AS (
      SELECT t, d, n_risk,
             ROUND(EXP(SUM(LN(1 - CAST(d AS DOUBLE) / n_risk))
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)), 6) AS survival
      FROM risk
    )
    SELECT t AS t_days, n_risk, d AS n_events, survival
    FROM km WHERE d > 0
    """,
)
def fhir_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate — THE oncology-registry query
    (the reference's bzkf deployment exists to power exactly this):
    time from Condition onset to abatement, right-censored at the
    study end (day 30) when no abatement is recorded. The product-
    limit estimator S(t) = prod_{t_i <= t} (1 - d_i / n_i) computes
    as exp of a running sum of logs — a cumulative window — because
    Spark (like SQL) has sum-windows, not product-windows; censored
    times contribute ln(1) = 0 so filtering event rows afterward is
    exact.

    Plan shape: encode projection -> duration/event flags (codegen
    date math) -> grouped aggregate to |distinct durations| rows ->
    two cumulative windows (descending risk-set count, ascending
    log-survival) over that tiny aggregate -> event-time rows out.

    100 TB shape: the only unpartitioned windows run over the
    AGGREGATED time axis (|distinct event times| rows — thousands for
    daily resolution, never corpus-sized), a deliberate single
    partition like the reference's own rollup finals. The corpus-sized
    work is one map-side-combinable groupBy(t). n_risk > d is
    structural here (the censored cohort outlives every event time),
    so ln never sees zero."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    k = F.col("c_custkey")
    onset = F.to_date(F.lit("2024-01-01"))
    abatement = F.when(
        k % 7 != 0, F.date_add(onset, (k % 30).cast("int"))
    )
    cond_json = F.to_json(
        F.struct(
            F.lit("Condition").alias("resourceType"),
            k.cast("string").alias("id"),
            F.struct(
                F.concat(F.lit("Patient/"), k.cast("string")).alias(
                    "reference"
                )
            ).alias("subject"),
            F.date_format(onset, "yyyy-MM-dd").alias("onsetDateTime"),
            F.date_format(abatement, "yyyy-MM-dd").alias(
                "abatementDateTime"
            ),
        )
    )
    enc = encode_resources(
        customer.select(cond_json.alias("resource")), "Condition"
    )
    abat = F.to_date("abatementDateTime")
    t = F.when(
        abat.isNotNull(), F.datediff(abat, F.to_date("onsetDateTime"))
    ).otherwise(F.lit(30))
    ev = abat.isNotNull().cast("int")
    times = (
        enc.select(t.alias("t_days"), ev.alias("ev"))
        .groupBy("t_days")
        .agg(F.sum("ev").alias("d"), F.count(F.lit(1)).alias("n_t"))
    )
    w_desc = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = times.withColumn("n_risk", F.sum("n_t").over(w_desc))
    km = risk.withColumn(
        "survival",
        F.round(
            F.exp(
                F.sum(
                    F.log(1 - F.col("d").cast("double") / F.col("n_risk"))
                ).over(w_asc)
            ),
            6,
        ),
    )
    return km.filter(F.col("d") > 0).select(
        "t_days", "n_risk", F.col("d").alias("n_events"), "survival"
    )


@query(
    "fhir_observation_unit_normalize",
    oracle="""
    WITH obs AS (
      SELECT event_type AS code,
             CASE WHEN event_id % 3 = 0 THEN 'mg/dL' ELSE 'mmol/L' END
               AS unit,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    conv AS (
      SELECT * FROM (VALUES
        ('mg/dL',  0.0555),
        ('mmol/L', 1.0)
      ) t(unit, factor)
    )
    SELECT code,
           CAST(COUNT(*) AS BIGINT)                     AS n_obs,
           CAST(COUNT(DISTINCT unit) AS BIGINT)         AS n_units_seen,
           ROUND(AVG(CAST(v AS DOUBLE) * factor), 6)    AS mean_canonical,
           ROUND(MIN(CAST(v AS DOUBLE) * factor), 6)    AS min_canonical,
           ROUND(MAX(CAST(v AS DOUBLE) * factor), 6)    AS max_canonical
    FROM obs JOIN conv USING (unit)
    GROUP BY code
    """,
)
def fhir_observation_unit_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unit normalization — the prerequisite for EVERY cross-site
    FHIR analysis: the same lab arrives as mg/dL from one sender and
    mmol/L from another (the classic glucose case), so values must
    convert to a canonical unit through a UCUM conversion table
    before any aggregate is meaningful. The conversion table is a
    broadcast dimension (UCUM is a few thousand rows at most); the
    per-code stats then come from ONE grouped aggregate over
    normalized values.

    Plan shape: encode projection (valueQuantity.unit travels in the
    typed Quantity struct) -> broadcast join against the conversion
    dim -> map-side-combinable per-code aggregate.

    100 TB shape: the fact side never shuffles for the conversion
    (BroadcastHashJoin); the only exchange is the |codes|-group
    aggregate. Mixed-unit detection (n_units_seen) rides the same
    aggregate as a distinct count."""
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    unit = F.when(F.col("event_id") % 3 == 0, "mg/dL").otherwise("mmol/L")
    obs_json = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.array(
                    F.struct(F.col("event_type").alias("code"))
                ).alias("coding")
            ).alias("code"),
            F.struct(
                F.col("value").cast("decimal(18,2)").alias("value"),
                unit.alias("unit"),
                F.lit("http://unitsofmeasure.org").alias("system"),
            ).alias("valueQuantity"),
        )
    )
    enc = encode_resources(
        events.select(obs_json.alias("resource")), "Observation"
    )
    conv = spark.createDataFrame(
        [("mg/dL", 0.0555), ("mmol/L", 1.0)], "unit string, factor double"
    )
    flat = enc.select(
        F.element_at("code.coding", 1).getField("code").alias("code"),
        F.col("valueQuantity.unit").alias("unit"),
        F.col("valueQuantity.value").cast("double").alias("v"),
    )
    canon = flat.join(F.broadcast(conv), "unit").withColumn(
        "cv", F.col("v") * F.col("factor")
    )
    return canon.groupBy("code").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count_distinct("unit").alias("n_units_seen"),
        F.round(F.avg("cv"), 6).alias("mean_canonical"),
        F.round(F.min("cv"), 6).alias("min_canonical"),
        F.round(F.max("cv"), 6).alias("max_canonical"),
    )


@query(
    "fhir_immunization_coverage",
    oracle="""
    WITH pats AS (
      SELECT c_custkey AS patient_id,
             1930 + CAST(FLOOR((c_custkey % 25000) / 365.0) AS INTEGER)
               AS birth_year
      FROM customer
    ),
    vacc AS (
      SELECT DISTINCT
             'V' || CAST(l_partkey % 3 AS VARCHAR) AS vaccine,
             l_suppkey % 150 + 1                   AS patient_id
      FROM lineitem
      WHERE l_linestatus = 'F'
    ),
    vaccines AS (SELECT DISTINCT vaccine FROM vacc),
    cells AS (
      SELECT p.patient_id, p.birth_year, vs.vaccine
      FROM pats p CROSS JOIN vaccines vs
    )
    SELECT CAST((c.birth_year // 10) * 10 AS BIGINT) AS birth_decade,
           c.vaccine,
           CAST(COUNT(v.patient_id) AS BIGINT)       AS n_vaccinated,
           CAST(COUNT(*) AS BIGINT)                  AS n_cohort,
           ROUND(CAST(COUNT(v.patient_id) AS DOUBLE) * 100 / COUNT(*), 6)
             AS coverage_pct
    FROM cells c
    LEFT JOIN vacc v
      ON v.patient_id = c.patient_id AND v.vaccine = c.vaccine
    GROUP BY 1, 2
    """,
)
def fhir_immunization_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Immunization coverage by birth cohort — the public-health
    dashboard query (think MMR coverage per birth decade): for every
    (birth decade, vaccine) cell, vaccinated patients over the cohort
    size. Immunizations synthesize from lineitem (COMPLETED doses
    only — the status filter is part of the definition; 'not-done'
    rows are encoded and then excluded, exercising the status path)
    and run the full Immunization encode (vaccineCode / patient /
    status); patients carry a deterministic birth year.

    The denominator must count the UNVACCINATED, so the patient
    dimension expands by the distinct-vaccine frame (broadcast) and
    the vaccination set LEFT-joins on — a plain inner join would
    silently report 100% coverage everywhere, the classic
    coverage-query bug.

    Plan shape: encode -> distinct (vaccine, patient) -> patient-dim
    x vaccine-catalog broadcast expansion -> left join -> one grouped
    aggregate into decade x vaccine cells.

    100 TB shape: the expansion multiplies the PATIENT DIMENSION by
    the vaccine catalog (CDC CVX is ~200 codes) — dimension x
    dimension, never fact-sized; the vaccination set shuffles
    (vaccine, patient) ids only and the left join keys on both."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    lineitem = fan_out_small_scan(load_table(spark, sf_dir, "lineitem"))
    imm_json = F.to_json(
        F.struct(
            F.lit("Immunization").alias("resourceType"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
            .cast("string")
            .alias("id"),
            F.when(F.col("l_linestatus") == "F", "completed")
            .otherwise("not-done")
            .alias("status"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit("http://hl7.org/fhir/sid/cvx").alias("system"),
                        F.concat(
                            F.lit("V"), (F.col("l_partkey") % 3).cast("string")
                        ).alias("code"),
                    )
                ).alias("coding")
            ).alias("vaccineCode"),
            F.struct(
                F.concat(
                    F.lit("Patient/"),
                    (F.col("l_suppkey") % 150 + 1).cast("string"),
                ).alias("reference")
            ).alias("patient"),
        )
    )
    imm = encode_resources(
        lineitem.select(imm_json.alias("resource")), "Immunization"
    )
    vacc = (
        imm.filter(F.col("status") == "completed")
        .select(
            F.element_at("vaccineCode.coding", 1)
            .getField("code")
            .alias("vaccine"),
            F.col("patient.reference").alias("patient_ref"),
        )
        .distinct()
        .withColumn("vaccinated", F.lit(1))
    )
    pats = customer.select(
        F.concat(F.lit("Patient/"), F.col("c_custkey").cast("string")).alias(
            "patient_ref"
        ),
        (
            F.lit(1930)
            + F.floor((F.col("c_custkey") % 25000) / 365).cast("int")
        ).alias("birth_year"),
    )
    vaccines = vacc.select("vaccine").distinct()
    cells = pats.crossJoin(F.broadcast(vaccines))
    full = cells.join(vacc, ["patient_ref", "vaccine"], "left")
    decade = (F.floor(F.col("birth_year") / 10) * 10).cast("long")
    return full.groupBy(
        decade.alias("birth_decade"), F.col("vaccine")
    ).agg(
        F.count("vaccinated").alias("n_vaccinated"),
        F.count(F.lit(1)).alias("n_cohort"),
        F.round(
            F.count("vaccinated").cast("double") * 100 / F.count(F.lit(1)),
            6,
        ).alias("coverage_pct"),
    )


@query(
    "fhir_readmission_rate",
    oracle="""
    WITH enc AS (
      SELECT o_orderkey AS id,
             o_custkey  AS patient_id,
             CASE WHEN o_orderpriority LIKE '1%'
                    OR o_orderpriority LIKE '2%'
                  THEN 'IMP' ELSE 'AMB' END AS class_code,
             CAST(o_orderdate AS DATE) AS admit_d,
             CAST(o_orderdate AS DATE)
               + CAST(o_orderkey % 14 + 1 AS INTEGER) AS discharge_d
      FROM orders
    ),
    seq AS (
      SELECT class_code, discharge_d,
             LEAD(admit_d) OVER (
               PARTITION BY patient_id ORDER BY admit_d, id
             ) AS next_admit
      FROM enc
    )
    SELECT class_code,
           CAST(COUNT(*) AS BIGINT) AS n_discharges,
           CAST(COUNT(CASE WHEN next_admit - discharge_d BETWEEN 0 AND 30
                           THEN 1 END) AS BIGINT) AS n_readmitted,
           ROUND(CAST(COUNT(CASE WHEN next_admit - discharge_d
                                      BETWEEN 0 AND 30
                                 THEN 1 END) AS DOUBLE) * 100
                 / COUNT(*), 6) AS readmission_pct
    FROM seq
    GROUP BY class_code
    """,
)
def fhir_readmission_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day readmission rate — the quality measure hospitals are
    penalized on (CMS HRRP): a discharge counts as a readmission when
    the patient's NEXT admission starts within 30 days of it.
    Computed per encounter class from the same encoded Encounter
    synthesis as the length-of-stay entry (period.start/end through
    encode), with the next-admission lookup as a per-patient LEAD
    window — deterministic tie-break on encounter id so both engines
    sequence same-day admissions identically.

    Plan shape: encode projection -> one patient-keyed window (LEAD)
    -> one grouped aggregate into |classes| rows.

    100 TB shape: one exchange on patient id; per-row window state is
    a single lookahead. The aggregate collapses map-side to 2 rows.
    Overlapping stays (next admit before discharge) land outside the
    [0, 30] band and are excluded, matching the measure spec."""
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    d = F.col("o_orderdate")
    enc_json = F.to_json(
        F.struct(
            F.lit("Encounter").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.lit("finished").alias("status"),
            F.struct(
                F.when(F.col("o_orderpriority").rlike("^[12]"), "IMP")
                .otherwise("AMB")
                .alias("code")
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
    w = Window.partitionBy(F.col("subject.reference")).orderBy(
        F.to_date("period.start"), F.col("id").cast("long")
    )
    seq = enc.select(
        F.col("class.code").alias("class_code"),
        F.to_date("period.end").alias("discharge_d"),
        F.lead(F.to_date("period.start")).over(w).alias("next_admit"),
    )
    gap = F.datediff("next_admit", "discharge_d")
    readmit = F.count(F.when((gap >= 0) & (gap <= 30), 1))
    return seq.groupBy("class_code").agg(
        F.count(F.lit(1)).alias("n_discharges"),
        readmit.alias("n_readmitted"),
        F.round(
            readmit.cast("double") * 100 / F.count(F.lit(1)), 6
        ).alias("readmission_pct"),
    )


@query(
    "fhir_adverse_event_prr",
    oracle="""
    WITH drugs AS (
      SELECT DISTINCT o_custkey AS patient_id,
             'M' || CAST(o_orderkey % 8 AS VARCHAR) AS med
      FROM orders
    ),
    aes AS (
      SELECT DISTINCT user_id AS patient_id, event_type AS ae
      FROM events
    ),
    pop AS (
      SELECT COUNT(*) AS n_pop FROM customer
    ),
    per_drug AS (
      SELECT med, COUNT(*) AS n_d FROM drugs GROUP BY med
    ),
    per_ae AS (
      SELECT ae, COUNT(*) AS n_e FROM aes GROUP BY ae
    ),
    pairs AS (
      SELECT d.med, a.ae, COUNT(*) AS a_cnt
      FROM drugs d JOIN aes a USING (patient_id)
      GROUP BY d.med, a.ae
    )
    SELECT med, ae,
           CAST(a_cnt AS BIGINT)        AS n_both,
           CAST(n_d - a_cnt AS BIGINT)  AS n_drug_only,
           CAST(n_e - a_cnt AS BIGINT)  AS n_ae_only,
           ROUND(
             (CAST(a_cnt AS DOUBLE) / n_d)
             / NULLIF(CAST(n_e - a_cnt AS DOUBLE)
                      / NULLIF(n_pop - n_d, 0), 0),
             6) AS prr
    FROM pairs
    JOIN per_drug USING (med)
    JOIN per_ae USING (ae)
    CROSS JOIN pop
    """,
)
def fhir_adverse_event_prr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pharmacovigilance disproportionality — the proportional
    reporting ratio (PRR) every safety-surveillance system (FAERS,
    EudraVigilance) computes: for each (drug, adverse event) pair,
    the rate of the event among exposed patients over its rate among
    unexposed patients, from the 2x2 contingency counts. PRR >> 1
    flags a safety signal worth review.

    Exposure comes from the encoded MedicationDispense frame, events
    from encoded Observations; both reduce to DISTINCT patient-level
    sets first (disproportionality is patient-level, not report-level
    — the double-count pitfall of naive FAERS queries).

    Plan shape: two distinct-reductions -> patient-keyed inner join ->
    pair counts (|drugs| x |AE terms| rows) -> broadcast joins against
    the per-drug / per-AE margins and the 1-row population scalar.

    100 TB shape: only patient-id pairs shuffle; margins are
    dimension-sized by vocabulary (drug and MedDRA terms — at most
    tens of thousands), so every enrichment join broadcasts. The wide
    work is the distinct + one co-keyed join, both AQE-skew-safe."""
    disp = _dispenses(spark, sf_dir)
    drugs = disp.select(
        F.col("subject.reference").alias("patient_id"),
        F.element_at("medicationCodeableConcept.coding", 1)
        .getField("code")
        .alias("med"),
    ).distinct()
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    obs_json = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.array(
                    F.struct(F.col("event_type").alias("code"))
                ).alias("coding")
            ).alias("code"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("user_id").cast("string")
                ).alias("reference")
            ).alias("subject"),
        )
    )
    aes = (
        encode_resources(
            events.select(obs_json.alias("resource")), "Observation"
        )
        .select(
            F.col("subject.reference").alias("patient_id"),
            F.element_at("code.coding", 1).getField("code").alias("ae"),
        )
        .distinct()
    )
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    pop = customer.agg(F.count(F.lit(1)).alias("n_pop"))
    per_drug = drugs.groupBy("med").agg(F.count(F.lit(1)).alias("n_d"))
    per_ae = aes.groupBy("ae").agg(F.count(F.lit(1)).alias("n_e"))
    pairs = (
        drugs.join(aes, "patient_id")
        .groupBy("med", "ae")
        .agg(F.count(F.lit(1)).alias("a_cnt"))
    )
    a = F.col("a_cnt").cast("double")
    unexposed_rate = (F.col("n_e") - F.col("a_cnt")).cast("double") / (
        F.col("n_pop") - F.col("n_d")
    )
    enriched = (
        pairs.join(F.broadcast(per_drug), "med")
        .join(F.broadcast(per_ae), "ae")
        .join(F.broadcast(pop))
    )
    return enriched.select(
        "med",
        "ae",
        F.col("a_cnt").alias("n_both"),
        (F.col("n_d") - F.col("a_cnt")).alias("n_drug_only"),
        (F.col("n_e") - F.col("a_cnt")).alias("n_ae_only"),
        F.round(
            (a / F.col("n_d"))
            / F.when(unexposed_rate != 0, unexposed_rate),
            6,
        ).alias("prr"),
    )


# Charlson-style comorbidity weights for the 20-code vocabulary:
# most conditions weigh 1, a few 2-3, metastatic-tumor analogs 6 —
# the shape of the real index (Charlson 1987), keyed to C00..C19.
_CHARLSON_WEIGHTS = [
    1, 1, 1, 2, 1, 2, 3, 1, 2, 1, 6, 2, 1, 1, 2, 1, 3, 2, 1, 6,
]


@query(
    "fhir_risk_score_charlson",
    oracle=f"""
    WITH w AS (
      SELECT 'C' || lpad(CAST(i AS VARCHAR), 2, '0') AS code,
             wt
      FROM (
        SELECT UNNEST(range(20)) AS i,
               UNNEST({_CHARLSON_WEIGHTS}) AS wt
      )
    ),
    cond AS (
      SELECT DISTINCT
             'C' || lpad(CAST(o_orderkey % 20 AS VARCHAR), 2, '0') AS code,
             o_custkey AS patient_id
      FROM orders
    ),
    scores AS (
      SELECT patient_id, CAST(SUM(wt) AS BIGINT) AS score
      FROM cond JOIN w USING (code)
      GROUP BY patient_id
    )
    SELECT score, CAST(COUNT(*) AS BIGINT) AS n_patients
    FROM scores GROUP BY score
    """,
)
def fhir_risk_score_charlson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charlson-style comorbidity risk score — the standard severity
    adjuster in outcomes research: each patient's DISTINCT diagnosis
    codes map through a weight table (a real deployment loads the
    published Charlson/Elixhauser mapping; here the 20-code vocabulary
    carries Charlson-shaped weights), the weights sum per patient, and
    the cohort reports as a score histogram.

    Plan shape: distinct (patient, code) -> BROADCAST join against the
    20-row weight dimension (the fact side never shuffles for the
    lookup) -> per-patient sum -> |distinct scores| histogram rows.

    100 TB shape: the weight table is dimension-sized by definition
    (every published index is < 100 rows), so the only exchange is the
    per-patient aggregate — patient-keyed, map-side combinable, AQE
    skew-safe."""
    cond = _conditions(spark, sf_dir)
    pc = cond.select(
        F.col("subject.reference").alias("patient_id"),
        F.element_at("code.coding", 1).getField("code").alias("code"),
    ).distinct()
    weights = spark.createDataFrame(
        [(f"C{i:02d}", w) for i, w in enumerate(_CHARLSON_WEIGHTS)],
        "code string, wt int",
    )
    scores = (
        pc.join(F.broadcast(weights), "code")
        .groupBy("patient_id")
        .agg(F.sum("wt").alias("score"))
    )
    return scores.groupBy("score").agg(
        F.count(F.lit(1)).alias("n_patients")
    )


@query(
    "fhir_preadmission_labs",
    oracle="""
    SELECT e.event_id                           AS encounter_id,
           CAST(e.user_id AS VARCHAR)           AS patient_id,
           e.ts                                 AS admit_ts,
           o.event_id                           AS last_lab_id,
           o.ts                                 AS last_lab_ts,
           CAST(CAST(o.value AS DECIMAL(18,2))
                AS DOUBLE)                      AS last_lab_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') o
      ON e.user_id = o.user_id AND e.ts >= o.ts
    """,
)
def fhir_preadmission_labs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-admission lab lookback — the ubiquitous clinical as-of
    question: for every Encounter, the patient's most recent lab
    Observation at or before admission (baseline creatinine before a
    contrast scan, last INR before surgery). Both resource streams run
    through encode (Encounter.period.start / Observation.
    effectiveDateTime as microsecond-precision FHIR instants, parsed
    back to timestamps), then the library's union-window as-of shape
    matches them: one shuffle on patient id, no range-join explosion,
    ties (lab at the admission instant) match like DuckDB ASOF >=.

    Plan shape: two encode projections -> unionByName -> one window
    partitioned by patient ordered by (ts, kind) with last(ignorenulls)
    carrying the lab forward -> encounter rows out.

    100 TB shape: identical to the proven as-of entries — a single
    patient-keyed exchange over (labs + encounters), per-row state is
    the carried last-lab triple; AQE handles hot patients."""
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    iso = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

    enc_json = F.to_json(
        F.struct(
            F.lit("Encounter").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("in-progress").alias("status"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("user_id").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.struct(
                F.date_format("ts", iso).alias("start")
            ).alias("period"),
        )
    )
    encounters = encode_resources(
        events.filter(F.col("event_type") == "purchase").select(
            enc_json.alias("resource")
        ),
        "Encounter",
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
            F.date_format("ts", iso).alias("effectiveDateTime"),
            F.struct(
                F.col("value").cast("decimal(18,2)").alias("value")
            ).alias("valueQuantity"),
        )
    )
    labs = encode_resources(
        events.filter(F.col("event_type") == "error").select(
            obs_json.alias("resource")
        ),
        "Observation",
    )

    pid = F.regexp_replace(F.col("subject.reference"), "^Patient/", "")
    left = encounters.select(
        pid.alias("patient_id"),
        F.to_timestamp(F.col("period.start"), iso).alias("ts"),
        F.lit(1).alias("is_enc"),
        F.col("id").cast("long").alias("encounter_id"),
        F.lit(None).cast("long").alias("lab_id"),
        F.lit(None).cast("timestamp").alias("lab_ts"),
        F.lit(None).cast("decimal(18,2)").alias("lab_value"),
    )
    right = labs.select(
        pid.alias("patient_id"),
        F.to_timestamp(F.col("effectiveDateTime"), iso).alias("ts"),
        F.lit(0).alias("is_enc"),
        F.lit(None).cast("long").alias("encounter_id"),
        F.col("id").cast("long").alias("lab_id"),
        F.to_timestamp(F.col("effectiveDateTime"), iso).alias("lab_ts"),
        F.col("valueQuantity.value").cast("decimal(18,2)").alias("lab_value"),
    )
    w = (
        Window.partitionBy("patient_id")
        .orderBy(F.col("ts").asc(), F.col("is_enc").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        left.unionByName(right)
        .withColumn("last_lab_id", F.last("lab_id", ignorenulls=True).over(w))
        .withColumn("last_lab_ts", F.last("lab_ts", ignorenulls=True).over(w))
        .withColumn(
            "last_lab_value", F.last("lab_value", ignorenulls=True).over(w)
        )
        .filter(F.col("is_enc") == 1)
    )
    return matched.select(
        "encounter_id",
        "patient_id",
        F.col("ts").alias("admit_ts"),
        "last_lab_id",
        "last_lab_ts",
        F.col("last_lab_value").cast("double").alias("last_lab_value"),
    )


@query(
    "fhir_survival_logrank",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN c_custkey % 7 = 0 THEN 30
                  ELSE c_custkey % 30 END AS t,
             CASE WHEN c_custkey % 7 = 0 THEN 0 ELSE 1 END AS ev,
             c_custkey % 2 AS grp
      FROM customer
    ),
    times AS (
      SELECT t,
             SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS d0,
             SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS d1,
             COUNT(CASE WHEN grp = 0 THEN 1 END) AS c0,
             COUNT(CASE WHEN grp = 1 THEN 1 END) AS c1
      FROM base GROUP BY t
    ),
    risk AS (
      SELECT t, d0, d1,
             SUM(c0) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n0,
             SUM(c1) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1
      FROM times
    ),
    terms AS (
      SELECT CAST(d0 AS DOUBLE) AS d0x,
             CAST(d0 + d1 AS DOUBLE) * n0 / (n0 + n1) AS e0,
             CAST(d0 + d1 AS DOUBLE) * n0 * n1
               * (n0 + n1 - d0 - d1)
               / ((n0 + n1) * (n0 + n1) * (n0 + n1 - 1)) AS v
      FROM risk WHERE d0 + d1 > 0
    )
    SELECT CAST(SUM(d0x) AS BIGINT)          AS observed_a,
           ROUND(SUM(e0), 6)                 AS expected_a,
           ROUND(POW(SUM(d0x - e0), 2) / SUM(v), 6) AS chi2
    FROM terms
    """,
)
def fhir_survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test — the companion inference to the Kaplan-Meier
    curve and THE standard two-arm survival comparison in oncology
    trials: at every event time, compare group A's observed event
    count with its expectation under the null (events distribute
    proportionally to the at-risk sets), accumulate the
    hypergeometric variance, and report chi-square =
    (sum(O-E))^2 / sum(V) on 1 df. Same cohort definition as
    fhir_survival_km (onset -> abatement, censored at day 30), with
    patient parity as the treatment arm; the KM twin drives the FHIR
    encode path for this cohort — here the flat synthesis keeps the
    statistic itself the thing under test.

    Plan shape: one grouped aggregate to the time axis (per-group
    event/at-risk tallies via conditional sums) -> two descending
    cumulative windows over the TINY aggregated frame (|distinct
    times| rows — the same deliberate single partition as the KM
    entry) -> one scalar aggregate.

    100 TB shape: the corpus-sized work is the first groupBy(t)
    (map-side combinable); everything after runs on |event times|
    rows. The variance denominator n-1 is structurally nonzero (the
    censored cohort keeps n >= 2 at every event time)."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    k = F.col("c_custkey")
    base = customer.select(
        F.when(k % 7 == 0, 30).otherwise(k % 30).alias("t"),
        F.when(k % 7 == 0, 0).otherwise(1).alias("ev"),
        (k % 2).alias("grp"),
    )
    times = base.groupBy("t").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("ev")).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0)).alias("d1"),
        F.count(F.when(F.col("grp") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("c1"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = times.select(
        "t",
        "d0",
        "d1",
        F.sum("c0").over(w_desc).alias("n0"),
        F.sum("c1").over(w_desc).alias("n1"),
    ).filter(F.col("d0") + F.col("d1") > 0)
    n = F.col("n0") + F.col("n1")
    d = (F.col("d0") + F.col("d1")).cast("double")
    e0 = d * F.col("n0") / n
    v = (
        d
        * F.col("n0")
        * F.col("n1")
        * (n - F.col("d0") - F.col("d1"))
        / (n * n * (n - 1))
    )
    terms = risk.select(
        F.col("d0").cast("double").alias("d0x"),
        e0.alias("e0"),
        v.alias("v"),
    )
    return terms.agg(
        F.sum("d0x").cast("long").alias("observed_a"),
        F.round(F.sum("e0"), 6).alias("expected_a"),
        F.round(
            F.pow(F.sum(F.col("d0x") - F.col("e0")), 2) / F.sum("v"), 6
        ).alias("chi2"),
    )


@query(
    "fhir_incidence_rate",
    oracle="""
    WITH cond AS (
      SELECT o_custkey AS patient_id,
             'C' || lpad(CAST(o_orderkey % 20 AS VARCHAR), 2, '0') AS code,
             CAST(o_orderdate AS DATE) AS onset
      FROM orders
    ),
    exposure AS (
      SELECT SUM(datediff('day', mn, mx) + 1) / 365.25 AS person_years
      FROM (SELECT patient_id, MIN(onset) AS mn, MAX(onset) AS mx
            FROM cond GROUP BY patient_id)
    ),
    first_onsets AS (
      SELECT code, COUNT(*) AS n_incident
      FROM (SELECT DISTINCT patient_id, code FROM cond)
      GROUP BY code
    )
    SELECT code,
           CAST(n_incident AS BIGINT) AS n_incident,
           ROUND(CAST(n_incident AS DOUBLE) * 1000 / person_years, 6)
             AS rate_per_1000py
    FROM first_onsets CROSS JOIN exposure
    """,
)
def fhir_incidence_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incidence rate per 1000 person-years — prevalence's
    person-TIME twin and the registry metric that handles unequal
    follow-up: incident (first-ever per patient) diagnoses of each
    code over the cohort's summed observation time (each patient's
    first-to-last encounter span). Uses the same encoded Condition
    synthesis as the prevalence entry, so onsetDateTime drives the
    exposure window end-to-end through encode.

    Plan shape: one patient-keyed min/max aggregate for exposure
    (folded to a 1-row person-years scalar, broadcast), one distinct
    (patient, code) reduction for incident cases, one grouped count.

    100 TB shape: both aggregates shuffle id-sized rows and are
    map-side combinable; the person-years scalar is the same 1-row
    broadcast class as the prevalence denominator."""
    cond = _conditions(spark, sf_dir)
    flat = cond.select(
        F.col("subject.reference").alias("patient_id"),
        F.element_at("code.coding", 1).getField("code").alias("code"),
        F.to_date("onsetDateTime").alias("onset"),
    )
    exposure = (
        flat.groupBy("patient_id")
        .agg(F.min("onset").alias("mn"), F.max("onset").alias("mx"))
        .agg(
            (
                F.sum(F.datediff("mx", "mn") + 1) / 365.25
            ).alias("person_years")
        )
    )
    incident = (
        flat.select("patient_id", "code")
        .distinct()
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("n_incident"))
    )
    return incident.join(F.broadcast(exposure)).select(
        "code",
        "n_incident",
        F.round(
            F.col("n_incident").cast("double") * 1000
            / F.col("person_years"),
            6,
        ).alias("rate_per_1000py"),
    )


@query(
    "fhir_case_control_odds",
    oracle="""
    WITH pats AS (
      SELECT c_custkey AS patient_id,
             CASE WHEN c_custkey % 4 = 0 THEN 1 ELSE 0 END AS exposed
      FROM customer
    ),
    cases AS (
      SELECT DISTINCT o_custkey AS patient_id
      FROM orders WHERE o_orderkey % 20 = 7
    ),
    cells AS (
      SELECT p.exposed,
             CASE WHEN c.patient_id IS NOT NULL THEN 1 ELSE 0 END
               AS is_case
      FROM pats p LEFT JOIN cases c USING (patient_id)
    ),
    counts AS (
      SELECT SUM(CASE WHEN exposed=1 AND is_case=1 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN exposed=1 AND is_case=0 THEN 1 ELSE 0 END) AS b,
             SUM(CASE WHEN exposed=0 AND is_case=1 THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN exposed=0 AND is_case=0 THEN 1 ELSE 0 END) AS d
      FROM cells
    )
    SELECT CAST(a AS BIGINT) AS n_exposed_cases,
           CAST(b AS BIGINT) AS n_exposed_controls,
           CAST(c AS BIGINT) AS n_unexposed_cases,
           CAST(d AS BIGINT) AS n_unexposed_controls,
           ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
             AS odds_ratio,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     - 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_low,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     + 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_high
    FROM counts
    """,
)
def fhir_case_control_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-control odds ratio with its Woolf 95% confidence interval
    — the retrospective-study estimator (PRR's cohort cousin): cases
    are patients carrying the index diagnosis (code C07 from the
    shared Condition synthesis), exposure is a patient attribute, and
    the 2x2 table yields OR = ad/bc with
    exp(ln OR +- 1.96*sqrt(1/a+1/b+1/c+1/d)). A CI that excludes 1.0
    is the signal; with exposure independent of the diagnosis by
    construction here, the interval should straddle 1 — the
    null-is-true sanity the pytest gate checks.

    Plan shape: distinct case reduction -> left join onto the patient
    dimension -> one conditional aggregate to the 2x2 -> closed-form
    arithmetic on one row.

    100 TB shape: only patient ids move; the 2x2 collapses map-side.
    Stratified (Mantel-Haenszel) variants add the stratum to the
    grouping key of the same aggregate."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    cond = _conditions(spark, sf_dir)
    cases = (
        cond.filter(
            F.element_at("code.coding", 1).getField("code") == "C07"
        )
        .select(
            F.regexp_replace("subject.reference", "^Patient/", "").alias(
                "patient_id"
            )
        )
        .distinct()
        .withColumn("is_case", F.lit(1))
    )
    pats = customer.select(
        F.col("c_custkey").cast("string").alias("patient_id"),
        F.when(F.col("c_custkey") % 4 == 0, 1).otherwise(0).alias("exposed"),
    )
    cells = pats.join(cases, "patient_id", "left").select(
        "exposed", F.coalesce("is_case", F.lit(0)).alias("is_case")
    )
    cnt = lambda e, c: F.sum(  # noqa: E731 — 2x2 cell shorthand
        F.when((F.col("exposed") == e) & (F.col("is_case") == c), 1).otherwise(0)
    )
    counts = cells.agg(
        cnt(1, 1).alias("a"),
        cnt(1, 0).alias("b"),
        cnt(0, 1).alias("c"),
        cnt(0, 0).alias("d"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    c, d = F.col("c").cast("double"), F.col("d").cast("double")
    or_ = a * d / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    return counts.select(
        F.col("a").alias("n_exposed_cases"),
        F.col("b").alias("n_exposed_controls"),
        F.col("c").alias("n_unexposed_cases"),
        F.col("d").alias("n_unexposed_controls"),
        F.round(or_, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(or_) - 1.96 * se), 6).alias("ci_low"),
        F.round(F.exp(F.log(or_) + 1.96 * se), 6).alias("ci_high"),
    )


def _dispenses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MedicationDispense resources from orders: patient o_custkey, an
    8-drug RxNorm-ish vocabulary, handed over at the order date with a
    7-27 day supply — daysSupply travels as a typed Quantity."""
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    med = F.concat(F.lit("M"), (F.col("o_orderkey") % 8).cast("string"))
    disp_json = F.to_json(
        F.struct(
            F.lit("MedicationDispense").alias("resourceType"),
            F.col("o_orderkey").cast("string").alias("id"),
            F.lit("completed").alias("status"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit(_RXNORM).alias("system"),
                        med.alias("code"),
                    )
                ).alias("coding")
            ).alias("medicationCodeableConcept"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("o_custkey").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.struct(
                (F.col("o_orderkey") % 21 + 7)
                .cast("decimal(18,2)")
                .alias("value"),
                F.lit("d").alias("unit"),
            ).alias("daysSupply"),
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias(
                "whenHandedOver"
            ),
        )
    )
    return encode_resources(
        orders.select(disp_json.alias("resource")), "MedicationDispense"
    )


@query(
    "fhir_medication_mpr",
    oracle="""
    WITH disp AS (
      SELECT o_custkey AS patient_id,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE)
               + CAST(o_orderkey % 21 + 7 AS INTEGER) AS e
      FROM orders
    ),
    flagged AS (
      SELECT patient_id, s, e,
             CASE WHEN s <= MAX(e) OVER (
                    PARTITION BY patient_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS is_new
      FROM disp
    ),
    islands AS (
      SELECT patient_id, s, e,
             SUM(is_new) OVER (
               PARTITION BY patient_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    cov AS (
      SELECT patient_id,
             SUM(ilen)           AS covered,
             MAX(emax) - MIN(smin) AS window_days
      FROM (
        SELECT patient_id, island,
               MAX(e) - MIN(s) AS ilen,
               MAX(e) AS emax, MIN(s) AS smin
        FROM islands GROUP BY patient_id, island
      ) GROUP BY patient_id
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_patients
    FROM (
      SELECT LEAST(CAST(FLOOR(CAST(covered AS DOUBLE) * 10
                               / window_days) AS INTEGER), 10) AS band
      FROM cov
    )
    GROUP BY band
    """,
)
def fhir_medication_mpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medication-possession ratio (MPR) — the standard claims-data
    adherence measure: per patient, days covered by at least one
    dispense (overlapping supplies COALESCED, not double-counted —
    that is the textbook MPR pitfall) over the patient's own refill
    span (first handed-over to last supply end), banded into deciles.
    Reuses the library's gaps-and-islands operator
    (functions/intervals.coalesce_intervals) on dispense windows
    [handedOver, handedOver + daysSupply).

    Plan shape: encode projection -> ONE exchange on patient_id serves
    the island windows, the per-island aggregate, the per-patient
    aggregate, and the span max/min (same key throughout) -> decile
    banding -> 11-row grouped count, map-side combinable.

    100 TB shape: everything keys on patient id; per-patient state is
    a running max during the island scan. The quotient is exact where
    it matters: band boundaries only bind when covered*10 divides the
    window, and integer-valued IEEE quotients are exact, so Spark and
    the oracle band identically."""
    disp = _dispenses(spark, sf_dir)
    s = F.to_date("whenHandedOver")
    spans = disp.select(
        F.col("subject.reference").alias("patient_id"),
        s.alias("s"),
        F.date_add(
            s, F.col("daysSupply.value").cast("int")
        ).alias("e"),
    )
    islands = coalesce_intervals(
        spans, ["patient_id"], "s", "e", order_tiebreak="e"
    )
    per_island = islands.groupBy("patient_id", "island_id").agg(
        F.datediff(F.max("e"), F.min("s")).alias("ilen"),
        F.max("e").alias("emax"),
        F.min("s").alias("smin"),
    )
    cov = per_island.groupBy("patient_id").agg(
        F.sum("ilen").alias("covered"),
        F.datediff(F.max("emax"), F.min("smin")).alias("window_days"),
    )
    band = F.least(
        F.floor(
            F.col("covered").cast("double") * 10 / F.col("window_days")
        ).cast("int"),
        F.lit(10),
    )
    return (
        cov.select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_patients"))
    )


@query(
    "fhir_med_coprescription",
    oracle="""
    WITH disp AS (
      SELECT o_custkey AS patient_id,
             'M' || CAST(o_orderkey % 8 AS VARCHAR) AS med,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE)
               + CAST(o_orderkey % 21 + 7 AS INTEGER) AS e
      FROM orders
    )
    SELECT a.med                                  AS med_a,
           b.med                                  AS med_b,
           CAST(COUNT(DISTINCT a.patient_id) AS BIGINT) AS n_patients
    FROM disp a
    JOIN disp b
      ON a.patient_id = b.patient_id
     AND a.med < b.med
     AND a.s < b.e AND b.s < a.e
    GROUP BY a.med, b.med
    """,
)
def fhir_med_coprescription(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-medication screening — the interaction-surveillance
    query: for every pair of DIFFERENT drugs, how many patients held
    overlapping supplies of both at any point (dispense windows
    intersect). This is the denominator feed for drug-drug interaction
    alerts and polypharmacy dashboards.

    Plan shape: encoded dispense windows self-join on patient_id with
    the overlap predicate as a join residual -> distinct-patient count
    per drug pair into at most C(8,2)=28 rows.

    100 TB shape: like the comorbidity pairs, the join keys on patient
    id so expansion is bounded by per-patient dispense counts squared
    (claims reality: tens), never corpus size; both sides are the same
    exchange. The distinct-count shuffles (pair, patient) ids only."""
    disp = _dispenses(spark, sf_dir)
    s = F.to_date("whenHandedOver")
    win = disp.select(
        F.col("subject.reference").alias("patient_id"),
        F.element_at("medicationCodeableConcept.coding", 1)
        .getField("code")
        .alias("med"),
        s.alias("s"),
        F.date_add(s, F.col("daysSupply.value").cast("int")).alias("e"),
    )
    a = win.alias("a")
    b = win.alias("b")
    return (
        a.join(
            b,
            (F.col("a.patient_id") == F.col("b.patient_id"))
            & (F.col("a.med") < F.col("b.med"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .groupBy(F.col("a.med").alias("med_a"), F.col("b.med").alias("med_b"))
        .agg(F.count_distinct(F.col("a.patient_id")).alias("n_patients"))
    )
