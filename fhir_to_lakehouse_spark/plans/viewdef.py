"""Oracle-checked SQL-on-FHIR ViewDefinition queries.

The declarative view layer (operators/view_definition.py) run
end-to-end: real ViewDefinition dicts compiled over resources that
went through the full bundle chain (synthesize JSON -> parse ->
explode -> encode), checked against DuckDB recomputing the same view
straight from the source tables. What a Pathling/SQL-on-FHIR user
writes today runs here unchanged (within the documented subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import (
    encode_resources,
    prepare_stream,
)
from fhir_to_lakehouse_spark.operators.view_definition import compile_view
from fhir_to_lakehouse_spark.plans.pipeline_q import _observation_events
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

# the blood-pressure flattening view from the SQL-on-FHIR examples,
# adapted to the synthesized Observation shape of _observation_events:
# one row per component, root columns repeated
_OBS_VIEW = {
    "resource": "Observation",
    "where": [{"path": "status = 'final'"}],
    "select": [
        {
            "column": [
                {"name": "id", "path": "getResourceKey()"},
                {"name": "obs_value", "path": "valueQuantity.value", "type": "decimal"},
                {"name": "unit", "path": "valueQuantity.unit"},
                {
                    "name": "range_low",
                    "path": "referenceRange.first().low.value",
                    "type": "decimal",
                },
                {"name": "n_components", "path": "component.count()"},
            ]
        },
        {
            "forEach": "component",
            "column": [
                {"name": "comp_code", "path": "code.text"},
                {
                    "name": "comp_value",
                    "path": "valueQuantity.value",
                    "type": "decimal",
                },
                {"name": "comp_note", "path": "valueString"},
            ],
        },
    ],
}


@query(
    "viewdef_observation_components",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                       AS id,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)    AS obs_value,
           'mm[Hg]'                                        AS unit,
           CAST(90 AS DOUBLE)                              AS range_low,
           3                                               AS n_components,
           c.comp_code                                     AS comp_code,
           CAST(CASE c.comp_code
                WHEN 'systolic'
                THEN CAST(CAST(value AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2))
                WHEN 'diastolic'
                THEN CAST(CAST(value AS DECIMAL(18,2)) + 60 AS DECIMAL(18,2))
           END AS DOUBLE)                                  AS comp_value,
           CASE WHEN c.comp_code = 'note' THEN event_type END AS comp_note
    FROM events,
         (VALUES ('systolic'), ('diastolic'), ('note')) AS c(comp_code)
    """,
)
def viewdef_observation_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ViewDefinition with root columns (getResourceKey, quantity
    value/unit, first()-indexed referenceRange, count()) plus a
    forEach over component flattens blood-pressure panels to one row
    per component — compiled to a pure projection+explode plan, the
    same rows DuckDB gets by cross-joining the 3-component domain.

    Parity anchor: the hand-written equivalent is
    pipeline_observation_components; this one is DECLARED, not coded.

    The compiled view's decimal columns carry the ENCODER's stored
    decimal representation (schemas.py maps FHIR decimal to one wide
    DecimalType, and the compiler preserves stored decimals rather
    than re-casting — r7 verdict item 1). At the QUERY BOUNDARY the
    values round to DECIMAL(18,2) and convert to DOUBLE: r7/r8 showed
    the values are bit-identical across engines yet DecimalType at the
    interface hash-mismatches in the driver's cross-engine
    normalization, so the registry convention (enforced by
    tests/test_boundary_contract.py) is doubles out, decimals
    inside."""
    events = _observation_events(spark, sf_dir)
    obs = prepare_stream(events).filter(F.col("resource_type") == "Observation")
    enc = encode_resources(obs, "Observation")
    d = "decimal(18,2)"
    return compile_view(_OBS_VIEW, enc).select(
        "id",
        F.col("obs_value").cast(d).cast("double").alias("obs_value"),
        "unit",
        F.col("range_low").cast(d).cast("double").alias("range_low"),
        "n_components",
        "comp_code",
        F.col("comp_value").cast(d).cast("double").alias("comp_value"),
        "comp_note",
    )


_PATIENT_VIEW = {
    "resource": "Patient",
    "select": [
        {
            "column": [
                {"name": "pid", "path": "getResourceKey()"},
                {"name": "family", "path": "name.first().family"},
                {"name": "is_active", "path": "active", "type": "boolean"},
            ]
        },
        {
            # forEachOrNull: patients without an address keep one row
            # with a NULL city — LEFT-JOIN-shaped unnesting
            "forEachOrNull": "address",
            "column": [{"name": "city", "path": "city"}],
        },
    ],
}


@query(
    "viewdef_patient_addresses",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)                     AS pid,
           'Fam-' || CAST(c_custkey AS VARCHAR)           AS family,
           (c_custkey % 2 = 0)                            AS is_active,
           CASE WHEN c_custkey % 3 <> 0
                THEN 'City-' || CAST(c_nationkey AS VARCHAR) END AS city
    FROM customer
    """,
)
def viewdef_patient_addresses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """forEachOrNull semantics through the compiler: every third
    synthesized Patient has NO address array, and the view must keep
    exactly one row for them with a NULL city (explode_outer), while
    addressed patients unnest normally. The oracle reproduces the
    shape with a CASE, row counts identical by construction."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    key = F.col("c_custkey").cast("string")
    empty_addr = F.expr(
        "CAST(array() AS array<struct<city:string>>)"
    )
    addr = F.when(
        F.col("c_custkey") % 3 == 0, empty_addr
    ).otherwise(
        F.array(
            F.struct(
                F.concat(
                    F.lit("City-"), F.col("c_nationkey").cast("string")
                ).alias("city")
            )
        )
    )
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            key.alias("id"),
            (F.col("c_custkey") % 2 == 0).alias("active"),
            F.array(
                F.struct(F.concat(F.lit("Fam-"), key).alias("family"))
            ).alias("name"),
            addr.alias("address"),
        )
    )
    enc = encode_resources(
        customer.select(resource.alias("resource")), "Patient"
    )
    return compile_view(_PATIENT_VIEW, enc)


_OBS_AGG = {
    "resource": "Observation",
    "where": [{"path": "status = 'final'"}],
    "grouping": [{"name": "subject_ref", "path": "subject.reference"}],
    "aggregation": [
        {"name": "n", "function": "count"},
        {"name": "total_value", "function": "sum", "path": "valueQuantity.value"},
        {"name": "min_value", "function": "min", "path": "valueQuantity.value"},
    ],
}


@query(
    "viewdef_aggregate_observations",
    oracle="""
    SELECT 'Patient/' || CAST(user_id AS VARCHAR)       AS subject_ref,
           COUNT(*)                                     AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE)            AS total_value,
           CAST(MIN(CAST(value AS DECIMAL(18,2)))
                AS DOUBLE)                              AS min_value
    FROM events
    GROUP BY user_id
    """,
)
def viewdef_aggregate_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The $aggregate analog declared as a spec, not coded: per-subject
    observation counts and exact DECIMAL value sums/mins over the
    encoded frame (grouping path = the verbatim subject.reference
    string, so this also pins storage-parity reference semantics).
    Compiles to ONE map-side-combinable grouped aggregate — single
    shuffle on the grouping key."""
    from fhir_to_lakehouse_spark.operators.view_definition import (
        compile_aggregate,
    )

    events = _observation_events(spark, sf_dir)
    obs = prepare_stream(events).filter(F.col("resource_type") == "Observation")
    enc = encode_resources(obs, "Observation")
    agg = compile_aggregate(_OBS_AGG, enc)
    return agg.select(
        "subject_ref",
        "n",
        F.col("total_value").cast("decimal(18,2)").cast("double").alias(
            "total_value"
        ),
        F.col("min_value").cast("decimal(18,2)").cast("double").alias(
            "min_value"
        ),
    )


_OBS_SUBJECT_VIEW = {
    "resource": "Observation",
    "select": [
        {
            "column": [
                {"name": "oid", "path": "getResourceKey()"},
                # the spec's join-key extractor over the VERBATIM
                # stored reference — no resolve_references pass needed
                {
                    "name": "patient_key",
                    "path": "subject.getReferenceKey(Patient)",
                },
                # FHIR choice element through ofType()
                {
                    "name": "qty",
                    "path": "value.ofType(Quantity).value",
                    "type": "decimal",
                },
            ]
        }
    ],
}


@query(
    "viewdef_observation_subjects",
    oracle="""
    SELECT CAST(event_id AS VARCHAR)                    AS oid,
           CAST(user_id AS VARCHAR)                     AS patient_key,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS qty
    FROM events
    """,
)
def viewdef_observation_subjects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getReferenceKey(Patient) + value.ofType(Quantity) through the
    compiler: the view extracts bare join keys straight from the
    storage-verbatim 'Patient/<id>' reference strings and resolves the
    choice-typed value — the two functions that make compiled views
    join-ready without any hand-written reference surgery."""
    events = _observation_events(spark, sf_dir)
    obs = prepare_stream(events).filter(F.col("resource_type") == "Observation")
    enc = encode_resources(obs, "Observation")
    view = compile_view(_OBS_SUBJECT_VIEW, enc)
    return view.select(
        "oid",
        "patient_key",
        F.col("qty").cast("decimal(18,2)").cast("double").alias("qty"),
    )


@query(
    "viewdef_memberof_filter",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR)   AS oid,
           p_brand                      AS brand_code
    FROM part
    WHERE CAST(SUBSTRING(p_brand, 7) AS INT) <= 12
    """,
)
def viewdef_memberof_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spec's terminology where-function through the compiler:
    Observations coded per part brand, filtered by
    code.memberOf(<ValueSet url>) against the SAME encoded ValueSet /
    CodeSystem artifacts the terminology queries expand — the
    expansion folds into an inline codegen predicate (<=25 codes), so
    the filter is join-free. The oracle re-derives membership from the
    brand-suffix rule the ValueSet was built with."""
    from fhir_to_lakehouse_spark.functions.terminology import expand_valueset
    from fhir_to_lakehouse_spark.plans.terminology import (
        _CS_BRAND,
        _VS_URL,
        _codesystem_df,
        _valueset_df,
    )

    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    resource = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("p_partkey").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit(_CS_BRAND).alias("system"),
                        F.col("p_brand").alias("code"),
                    )
                ).alias("coding")
            ).alias("code"),
        )
    )
    enc = encode_resources(
        part.select(resource.alias("resource")), "Observation"
    )
    expansion = expand_valueset(
        _valueset_df(spark, sf_dir), _codesystem_df(spark, sf_dir)
    )
    view = {
        "resource": "Observation",
        "where": [{"path": f"code.memberOf('{_VS_URL}')"}],
        "select": [
            {
                "column": [
                    {"name": "oid", "path": "getResourceKey()"},
                    {"name": "brand_code", "path": "code.coding[0].code"},
                ]
            }
        ],
    }
    return compile_view(view, enc, valuesets=expansion)


@query(
    "viewdef_constants_comparison",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)                            AS pid,
           CAST(printf('%04d-01-01', 1950 + c_custkey % 50)
                AS DATE)                                         AS birth_date
    FROM customer
    WHERE 1950 + c_custkey % 50 >= 1975
      AND c_custkey % 3 = 0
      AND c_custkey % 2 = 0
    """,
)
def viewdef_constants_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViewDefinition `constant` substitution plus the ordering where
    operators and not() chaining, end to end: the view declares a
    %cutoff date constant and keeps active patients born on/after it
    who have NO address (`address.exists().not()`). All three where
    entries compile to plain pushable filters below the projection —
    the constants vanish at compile time, so the plan is identical to
    a hand-written literal filter."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    key = F.col("c_custkey").cast("string")
    birth = F.format_string(
        "%04d-01-01", (F.lit(1950) + F.col("c_custkey") % 50).cast("int")
    )
    empty_addr = F.expr("CAST(array() AS array<struct<city:string>>)")
    addr = F.when(F.col("c_custkey") % 3 == 0, empty_addr).otherwise(
        F.array(F.struct(F.lit("Somewhere").alias("city")))
    )
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            key.alias("id"),
            (F.col("c_custkey") % 2 == 0).alias("active"),
            birth.alias("birthDate"),
            addr.alias("address"),
        )
    )
    enc = encode_resources(
        customer.select(resource.alias("resource")), "Patient"
    )
    view = {
        "resource": "Patient",
        "constant": [
            {"name": "cutoff", "valueDate": "1975-01-01"},
            {"name": "want_active", "valueBoolean": True},
        ],
        "where": [
            {"path": "birthDate >= %cutoff"},
            {"path": "address.exists().not()"},
            {"path": "active = %want_active"},
        ],
        "select": [
            {
                "column": [
                    {"name": "pid", "path": "getResourceKey()"},
                    {"name": "birth_date", "path": "birthDate", "type": "date"},
                ]
            }
        ],
    }
    return compile_view(view, enc)


_RACE_URL = "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race"
_BIRTHSEX_URL = (
    "http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex"
)


@query(
    "viewdef_extension_uscore",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)                              AS pid,
           CASE WHEN c_custkey % 5 <> 0
                THEN CASE WHEN c_custkey % 2 = 0 THEN 'F' ELSE 'M' END
           END                                                     AS birthsex,
           CASE WHEN c_custkey % 5 <> 0
                THEN CASE WHEN c_nationkey % 2 = 0
                          THEN '2106-3' ELSE '2054-5' END
           END                                                     AS race_code,
           (c_custkey % 5 <> 0)                                    AS has_race
    FROM customer
    """,
)
def viewdef_extension_uscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """US-Core-profile extension extraction through the compiler: the
    Pathling `enableExtensions` analog end to end. Patients are
    encoded with include_extensions=True carrying the real US Core
    race (complex, nested ombCategory valueCoding) and birthsex
    (valueCode) extensions; every fifth patient has none. The view's
    extension('url') chains compile to nested codegen'd array
    filters — no explode, no shuffle, no Python — and absent
    extensions surface as NULL, exactly the oracle's CASE."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    key = F.col("c_custkey").cast("string")
    sex = F.when(F.col("c_custkey") % 2 == 0, "F").otherwise("M")
    race = F.when(F.col("c_nationkey") % 2 == 0, "2106-3").otherwise(
        "2054-5"
    )
    sub_t = "array<struct<url:string,valueCoding:struct<system:string,code:string>>>"
    race_ext = F.struct(
        F.lit(_RACE_URL).alias("url"),
        F.lit(None).cast("string").alias("valueCode"),
        F.array(
            F.struct(
                F.lit("ombCategory").alias("url"),
                F.struct(
                    F.lit("urn:oid:2.16.840.1.113883.6.238").alias("system"),
                    race.alias("code"),
                ).alias("valueCoding"),
            )
        ).cast(sub_t).alias("extension"),
    )
    sex_ext = F.struct(
        F.lit(_BIRTHSEX_URL).alias("url"),
        sex.alias("valueCode"),
        F.lit(None).cast(sub_t).alias("extension"),
    )
    ext = F.when(F.col("c_custkey") % 5 != 0, F.array(race_ext, sex_ext))
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            key.alias("id"),
            ext.alias("extension"),
        )
    )
    enc = encode_resources(
        customer.select(resource.alias("resource")),
        "Patient",
        include_extensions=True,
    )
    view = {
        "resource": "Patient",
        "select": [
            {
                "column": [
                    {"name": "pid", "path": "getResourceKey()"},
                    {
                        "name": "birthsex",
                        "path": f"extension('{_BIRTHSEX_URL}').first().valueCode",
                    },
                    {
                        "name": "race_code",
                        "path": (
                            f"extension('{_RACE_URL}').first()"
                            ".extension('ombCategory').first()"
                            ".value.ofType(Coding).code"
                        ),
                    },
                    {
                        "name": "has_race",
                        "path": f"extension('{_RACE_URL}').exists()",
                    },
                ]
            }
        ],
    }
    return compile_view(view, enc)


@query(
    "viewdef_official_name",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)               AS pid,
           'Fam-' || CAST(c_custkey AS VARCHAR)     AS official_family,
           'First Middle'                           AS official_given,
           1                                        AS n_official
    FROM customer
    """,
)
def viewdef_official_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FHIRPath where()/join() through the compiler: each synthesized
    Patient carries a nickname AND an official name; the view selects
    the official one with name.where(use='official') and joins its
    given parts — the collection filter compiles to a codegen'd
    higher-order `filter`, no explode, no shuffle."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    key = F.col("c_custkey").cast("string")
    name = lambda use, family, given: F.struct(  # noqa: E731
        F.lit(use).alias("use"),
        family.alias("family"),
        given.alias("given"),
    )
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            key.alias("id"),
            F.array(
                name("nickname", F.lit("Nick"), F.array(F.lit("N"))),
                name(
                    "official",
                    F.concat(F.lit("Fam-"), key),
                    F.array(F.lit("First"), F.lit("Middle")),
                ),
            ).alias("name"),
        )
    )
    enc = encode_resources(
        customer.select(resource.alias("resource")), "Patient"
    )
    view = {
        "resource": "Patient",
        "select": [
            {
                "column": [
                    {"name": "pid", "path": "getResourceKey()"},
                    {
                        "name": "official_family",
                        "path": "name.where(use='official').first().family",
                    },
                    {
                        "name": "official_given",
                        "path": "name.where(use='official').first().given.join(' ')",
                    },
                    {
                        "name": "n_official",
                        "path": "name.where(use='official').count()",
                    },
                ]
            }
        ],
    }
    return compile_view(view, enc)


@query(
    "viewdef_collection_columns",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)                          AS pid,
           CASE WHEN c_custkey % 2 = 0
                THEN 'G1-' || c_custkey || ',G2-' || c_custkey
                     || ',G3-' || c_custkey
                ELSE 'G1-' || c_custkey || ',G2-' || c_custkey
           END                                                 AS given_csv,
           CASE WHEN c_custkey % 2 = 0
                THEN 'Fam-' || c_custkey || ',Alt-' || c_custkey
                ELSE 'Fam-' || c_custkey
           END                                                 AS family_csv,
           CASE WHEN c_custkey % 3 = 0 THEN ''
                ELSE 'City-' || c_nationkey END                AS city_csv,
           CASE WHEN c_custkey % 2 = 0 THEN 3 ELSE 2 END       AS n_given
    FROM customer
    """,
)
def viewdef_collection_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spec's `collection: true` columns end to end: name.given
    flattens across BOTH name entries (transform + flatten + null
    drop, all codegen — no explode, so the row count never changes),
    name.family maps element-wise, and address.city over an empty
    address array yields [] not null. Arrays serialize to CSV only
    for the engine-portable oracle compare."""
    customer = fan_out_small_scan(load_table(spark, sf_dir, "customer"))
    key = F.col("c_custkey").cast("string")
    name = lambda fam, givens: F.struct(  # noqa: E731
        fam.alias("family"), givens.alias("given")
    )
    g = lambda n: F.concat(F.lit(f"G{n}-"), key)  # noqa: E731
    one = F.array(name(F.concat(F.lit("Fam-"), key), F.array(g(1), g(2))))
    two = F.concat(
        one, F.array(name(F.concat(F.lit("Alt-"), key), F.array(g(3))))
    )
    names = F.when(F.col("c_custkey") % 2 == 0, two).otherwise(one)
    empty_addr = F.expr("CAST(array() AS array<struct<city:string>>)")
    addr = F.when(F.col("c_custkey") % 3 == 0, empty_addr).otherwise(
        F.array(
            F.struct(
                F.concat(
                    F.lit("City-"), F.col("c_nationkey").cast("string")
                ).alias("city")
            )
        )
    )
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            key.alias("id"),
            names.alias("name"),
            addr.alias("address"),
        )
    )
    enc = encode_resources(
        customer.select(resource.alias("resource")), "Patient"
    )
    view = {
        "resource": "Patient",
        "select": [
            {
                "column": [
                    {"name": "pid", "path": "getResourceKey()"},
                    {
                        "name": "all_given",
                        "path": "name.given",
                        "collection": True,
                    },
                    {
                        "name": "families",
                        "path": "name.family",
                        "collection": True,
                    },
                    {
                        "name": "cities",
                        "path": "address.city",
                        "collection": True,
                    },
                ]
            }
        ],
    }
    flat = compile_view(view, enc)
    return flat.select(
        "pid",
        F.concat_ws(",", "all_given").alias("given_csv"),
        F.concat_ws(",", "families").alias("family_csv"),
        F.concat_ws(",", "cities").alias("city_csv"),
        F.size("all_given").alias("n_given"),
    )


@query(
    "fhir_observation_lastn",
    oracle="""
    SELECT patient_key, code_text, oid,
           CAST(effective AS VARCHAR) AS effective,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS qty
    FROM (
      SELECT CAST(user_id AS VARCHAR)                       AS patient_key,
             CASE WHEN event_id % 2 = 0
                  THEN 'heart-rate' ELSE 'glucose' END      AS code_text,
             CAST(event_id AS VARCHAR)                      AS oid,
             STRFTIME(ts, '%Y-%m-%dT%H:%M:%S')              AS effective,
             value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_id % 2
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def fhir_observation_lastn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FHIR Observation $lastn operation: the N most recent
    observations per (patient, code), straight off the encoded frame
    — a row_number window over (subject key, code text) ordered by
    effectiveDateTime DESC with a deterministic id tie-break. Spark
    plans this as WindowGroupLimit (partial top-N map-side before the
    one shuffle on the partition key), so $lastn over a 100 TB
    observation table moves only each group's head. The oracle is the
    identical window restated over the source events."""
    events = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    code = F.when(F.col("event_id") % 2 == 0, "heart-rate").otherwise(
        "glucose"
    )
    resource = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            F.col("event_id").cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(code.alias("text")).alias("code"),
            F.struct(
                F.concat(
                    F.lit("Patient/"), F.col("user_id").cast("string")
                ).alias("reference")
            ).alias("subject"),
            F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias(
                "effectiveDateTime"
            ),
            F.struct(
                F.col("value").cast("decimal(18,2)").alias("value"),
                F.lit("1").alias("unit"),
            ).alias("valueQuantity"),
        )
    )
    enc = encode_resources(
        events.select(resource.alias("resource")), "Observation"
    )
    from pyspark.sql import Window

    key = F.regexp_extract(F.col("subject.reference"), r"^Patient/(.+)$", 1)
    w = (
        Window.partitionBy(key, F.col("code.text"))
        .orderBy(
            F.col("effectiveDateTime").desc(), F.col("id").cast("long").desc()
        )
    )
    return (
        enc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            key.alias("patient_key"),
            F.col("code.text").alias("code_text"),
            F.col("id").alias("oid"),
            F.col("effectiveDateTime").alias("effective"),
            F.col("valueQuantity.value")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("qty"),
        )
    )


# partial-precision effectiveDateTime Observations: precision cycles
# year / month / full-instant by event_id so every boundary branch of
# the compiler is exercised against real encoded resources
_EFF_VIEW = {
    "resource": "Observation",
    "where": [{"path": "status.endsWith('al')"}],
    "select": [
        {
            "column": [
                {"name": "key", "path": "getResourceKey()"},
                {"name": "key_int", "path": "id.toInteger()"},
                {"name": "eff", "path": "effectiveDateTime"},
                {"name": "eff_low", "path": "effectiveDateTime.lowBoundary()"},
                {
                    "name": "eff_high",
                    "path": "effectiveDateTime.highBoundary()",
                },
                {"name": "status_up", "path": "status.upper()"},
                {"name": "is_bp", "path": "code.text.contains('blood')"},
                {"name": "code_tail", "path": "code.text.substring(6)"},
            ]
        }
    ],
}


@query(
    "viewdef_effective_boundaries",
    oracle="""
    WITH base AS (
      SELECT event_id,
             CAST(2000 + event_id % 25 AS VARCHAR)               AS y,
             lpad(CAST(event_id % 12 + 1 AS VARCHAR), 2, '0')    AS mo,
             lpad(CAST(event_id % 28 + 1 AS VARCHAR), 2, '0')    AS dy,
             lpad(CAST(event_id % 24 AS VARCHAR), 2, '0')        AS hh,
             lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')        AS mi,
             lpad(CAST((event_id * 7) % 60 AS VARCHAR), 2, '0')  AS ss
      FROM events
    ),
    eff AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN y
                  WHEN event_id % 3 = 1 THEN y || '-' || mo
                  ELSE y || '-' || mo || '-' || dy || 'T'
                       || hh || ':' || mi || ':' || ss || 'Z'
             END AS eff
      FROM base
    )
    SELECT CAST(event_id AS VARCHAR)  AS key,
           CAST(event_id AS INTEGER)  AS key_int,
           eff                        AS eff,
           CASE length(eff)
                WHEN 4 THEN eff || '-01-01'
                WHEN 7 THEN eff || '-01'
                ELSE substr(eff, 1, 19) || '.000Z'
           END                        AS eff_low,
           CASE length(eff)
                WHEN 4 THEN eff || '-12-31'
                WHEN 7 THEN strftime(last_day(CAST(eff || '-01' AS DATE)),
                                     '%Y-%m-%d')
                ELSE substr(eff, 1, 19) || '.999Z'
           END                        AS eff_high,
           'FINAL'                    AS status_up,
           TRUE                       AS is_bp,
           'pressure'                 AS code_tail
    FROM eff
    """,
)
def viewdef_effective_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 FHIRPath additions — lowBoundary()/highBoundary(),
    string functions (upper/contains/substring/endsWith), and
    toInteger() — run as a DECLARED ViewDefinition over encoded
    Observations whose effectiveDateTime cycles year / month /
    full-instant precision, so every temporal-boundary branch compiles
    and executes against data. DuckDB recomputes the boundary fills
    (calendar month ends included) straight from the source rows.

    100 TB shape: identical to every compiled view — one projection
    over the encoded scan, all boundary CASE logic inside whole-stage
    codegen, zero shuffle, zero Python."""
    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    eid = F.col("event_id")

    def pad2(c):
        return F.lpad(c.cast("string"), 2, "0")

    y = (F.lit(2000) + eid % 25).cast("string")
    eff = (
        F.when(eid % 3 == 0, y)
        .when(eid % 3 == 1, F.concat_ws("-", y, pad2(eid % 12 + 1)))
        .otherwise(
            F.concat(
                y,
                F.lit("-"),
                pad2(eid % 12 + 1),
                F.lit("-"),
                pad2(eid % 28 + 1),
                F.lit("T"),
                pad2(eid % 24),
                F.lit(":"),
                pad2(eid % 60),
                F.lit(":"),
                pad2((eid * 7) % 60),
                F.lit("Z"),
            )
        )
    )
    resource = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            eid.cast("string").alias("id"),
            F.lit("final").alias("status"),
            F.struct(F.lit("blood-pressure").alias("text")).alias("code"),
            eff.alias("effectiveDateTime"),
        )
    )
    enc = encode_resources(ev.select(resource.alias("resource")), "Observation")
    return compile_view(_EFF_VIEW, enc)
