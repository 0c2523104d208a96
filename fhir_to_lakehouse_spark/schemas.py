"""Explicit schemas: FHIR bundle envelope + curated resource types.

The envelope mirrors the reference's deliberately partial parse schema
(/root/reference/src/bundle_processor.py:40-63): only what routing
needs; the inner resource stays an unparsed JSON string until encoding.

Resource typing replaces the reference's Pathling JVM encoder
(/root/reference/src/bundle_processor.py:162-166) with schema-directed
``from_json`` per SURVEY §7.3: curated StructTypes cover every field the
reference observably relies on (id / active / birthDate / clustering
columns), and the raw JSON is kept alongside in ``resource_json`` so no
information is lost for fields outside the curated schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Kafka record shape (string variant used by file/test sources) ------
# The real Kafka source emits key/value as BINARY; the engine's first
# step casts value to string (P1), so a string-typed source is
# pipeline-equivalent (reference test fixtures do the same,
# /root/reference/tests/unit/test_bundle_processor.py:100-105).

KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("topic", T.StringType()),
    ]
)

# --- bundle envelope (partial parse: routing fields only) ----------------

BUNDLE_SCHEMA = T.StructType(
    [
        # resourceType distinguishes "valid Bundle with no entries"
        # (produces no rows, not an error) from "JSON that parsed but
        # isn't a Bundle" (dead-lettered) in the corrupt probe
        T.StructField("resourceType", T.StringType()),
        T.StructField(
            "entry",
            T.ArrayType(
                T.StructType(
                    [
                        # Synthea transaction bundles address entries by
                        # fullUrl (urn:uuid:<id>) and cross-reference
                        # through it; carried for reference resolution
                        T.StructField("fullUrl", T.StringType()),
                        # resource kept as raw JSON string at this stage —
                        # full typing is deferred to encode_resources()
                        T.StructField("resource", T.StringType()),
                        T.StructField(
                            "request",
                            T.StructType(
                                [
                                    T.StructField("method", T.StringType()),
                                    T.StructField("url", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

# --- curated per-resource-type schemas (Pathling replacement) ------------

_CODING = T.ArrayType(
    T.StructType(
        [
            T.StructField("system", T.StringType()),
            T.StructField("code", T.StringType()),
            T.StructField("display", T.StringType()),
        ]
    )
)

_CODEABLE_CONCEPT = T.StructType(
    [T.StructField("coding", _CODING), T.StructField("text", T.StringType())]
)

# FHIR R4 Reference: the relative/urn reference string plus the
# official `type` element (resource type of the target). FHIR ids are
# unique only PER TYPE, so after normalization strips a 'Type/<id>'
# prefix the type survives here — joins stay type-safe (see
# normalize_references).
_REFERENCE = T.StructType(
    [
        T.StructField("reference", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)

# FHIR Quantity: decimal value + UCUM coding (FHIR decimal ->
# DecimalType, Pathling parity — SURVEY §7.3)
_QUANTITY = T.StructType(
    [
        T.StructField("value", T.DecimalType(38, 18)),
        T.StructField("unit", T.StringType()),
        T.StructField("system", T.StringType()),
        T.StructField("code", T.StringType()),
    ]
)

# FHIR Extension (opt-in, the Pathling `enableExtensions` analog —
# /root/reference pins Pathling as its encoder, main.py:49): url plus
# a pragmatic choice-value set covering what real corpora attach
# (US Core race/ethnicity = complex extension with valueCoding /
# valueString sub-extensions, birthsex = valueCode, billing profiles
# = valueQuantity / valueReference). ONE nesting level — complex
# extensions hold sub-extensions whose values are simple, the US-Core
# pattern; anything deeper (or any other value[x]) stays losslessly
# in resource_json. Kept OUT of the default schemas so stored-table
# layouts are unchanged unless a pipeline opts in per encode.
_EXTENSION_VALUE_FIELDS = [
    T.StructField("valueString", T.StringType()),
    T.StructField("valueCode", T.StringType()),
    T.StructField("valueUri", T.StringType()),
    T.StructField("valueBoolean", T.BooleanType()),
    T.StructField("valueInteger", T.IntegerType()),
    T.StructField("valueDecimal", T.DecimalType(38, 18)),
    T.StructField("valueDate", T.StringType()),
    T.StructField("valueDateTime", T.StringType()),
    T.StructField("valueCoding", _CODING.elementType),
    T.StructField("valueQuantity", _QUANTITY),
    T.StructField("valueReference", _REFERENCE),
    T.StructField("valueCodeableConcept", _CODEABLE_CONCEPT),
]

_SUB_EXTENSION = T.ArrayType(
    T.StructType(
        [T.StructField("url", T.StringType()), *_EXTENSION_VALUE_FIELDS]
    )
)

EXTENSION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            *_EXTENSION_VALUE_FIELDS,
            T.StructField("extension", _SUB_EXTENSION),
        ]
    )
)

PATIENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("gender", T.StringType()),
        T.StructField("birthDate", T.DateType()),
        T.StructField("deceasedDateTime", T.StringType()),
        T.StructField(
            "name",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("use", T.StringType()),
                        T.StructField("family", T.StringType()),
                        T.StructField("given", T.ArrayType(T.StringType())),
                        T.StructField("prefix", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
        T.StructField(
            "identifier",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("system", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("type", _CODEABLE_CONCEPT),
                    ]
                )
            ),
        ),
        T.StructField(
            "address",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("line", T.ArrayType(T.StringType())),
                        T.StructField("city", T.StringType()),
                        T.StructField("state", T.StringType()),
                        T.StructField("postalCode", T.StringType()),
                        T.StructField("country", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("maritalStatus", _CODEABLE_CONCEPT),
        T.StructField("multipleBirthBoolean", T.BooleanType()),
        # record-linkage links (replaced-by / replaces / seealso) —
        # operators/links.py resolves merge chains through these
        T.StructField(
            "link",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("other", _REFERENCE),
                        T.StructField("type", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

CONDITION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("clinicalStatus", _CODEABLE_CONCEPT),
        T.StructField("verificationStatus", _CODEABLE_CONCEPT),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("onsetDateTime", T.StringType()),
        T.StructField("recordedDate", T.StringType()),
        T.StructField("abatementDateTime", T.StringType()),
    ]
)

# Observation value[x] choice fields: FHIR allows exactly one of these
# per (component-)observation; the curated schema types each variant so
# a query can coalesce across them without touching raw JSON.
_OBS_VALUE_FIELDS = [
    T.StructField("valueQuantity", _QUANTITY),
    T.StructField("valueCodeableConcept", _CODEABLE_CONCEPT),
    T.StructField("valueString", T.StringType()),
    T.StructField("valueBoolean", T.BooleanType()),
    T.StructField("valueInteger", T.IntegerType()),
]

# Observation.component: multi-part results (e.g. a blood-pressure
# panel carries systolic+diastolic as two components, Synthea depth)
_OBS_COMPONENT = T.ArrayType(
    T.StructType([T.StructField("code", _CODEABLE_CONCEPT), *_OBS_VALUE_FIELDS])
)

OBSERVATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("effectiveDateTime", T.StringType()),
        T.StructField("issued", T.StringType()),
        *_OBS_VALUE_FIELDS,
        T.StructField("component", _OBS_COMPONENT),
        T.StructField(
            "referenceRange",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("low", _QUANTITY),
                        T.StructField("high", _QUANTITY),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Encounter / Procedure: the remaining reference "hot" resource types
# (/root/reference/src/settings.py:69-75 processes Patient, Observation,
# Encounter, Condition, Procedure in parallel); representative FHIR R4
# fields incl. the period/performed timestamps a clustering config
# would target.

ENCOUNTER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField(
            "class",
            T.StructType(
                [
                    T.StructField("system", T.StringType()),
                    T.StructField("code", T.StringType()),
                ]
            ),
        ),
        T.StructField("type", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("subject", _REFERENCE),
        T.StructField("serviceProvider", _REFERENCE),
        T.StructField(
            "period",
            T.StructType(
                [
                    T.StructField("start", T.StringType()),
                    T.StructField("end", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "participant",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.ArrayType(_CODEABLE_CONCEPT)),
                        T.StructField("individual", _REFERENCE),
                    ]
                )
            ),
        ),
        T.StructField("reasonCode", T.ArrayType(_CODEABLE_CONCEPT)),
    ]
)

PROCEDURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("performedDateTime", T.StringType()),
        T.StructField(
            "performedPeriod",
            T.StructType(
                [
                    T.StructField("start", T.StringType()),
                    T.StructField("end", T.StringType()),
                ]
            ),
        ),
        T.StructField("reasonCode", T.ArrayType(_CODEABLE_CONCEPT)),
    ]
)

# Beyond the reference's five parallel-processed "hot" types: the
# Synthea bundles the reference's e2e test ingests also carry
# MedicationRequest / DiagnosticReport / Immunization resources; a user
# querying those gets typed columns instead of the generic id+JSON
# fallback.

MEDICATION_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("medicationCodeableConcept", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("authoredOn", T.StringType()),
        T.StructField("requester", _REFERENCE),
        T.StructField("reasonReference", T.ArrayType(_REFERENCE)),
        T.StructField(
            "dosageInstruction",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sequence", T.IntegerType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("asNeededBoolean", T.BooleanType()),
                        T.StructField(
                            "doseAndRate",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("type", _CODEABLE_CONCEPT),
                                        T.StructField("doseQuantity", _QUANTITY),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

DIAGNOSTIC_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("effectiveDateTime", T.StringType()),
        T.StructField("issued", T.StringType()),
        T.StructField("result", T.ArrayType(_REFERENCE)),
        T.StructField(
            "presentedForm",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("contentType", T.StringType()),
                        T.StructField("data", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

IMMUNIZATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("vaccineCode", _CODEABLE_CONCEPT),
        T.StructField("patient", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("occurrenceDateTime", T.StringType()),
        T.StructField("primarySource", T.BooleanType()),
        T.StructField("doseQuantity", _QUANTITY),
    ]
)

# --- round-4 widening: the rest of the resource types a Synthea
# population (the reference's e2e corpus, tests/e2e in the reference
# repo) actually emits. Pathling types all of R4; curating the full
# Synthea working set means no resource in the reference's own test
# corpus degrades to the id+JSON fallback. Shared complex types first.

_PERIOD = T.StructType(
    [T.StructField("start", T.StringType()), T.StructField("end", T.StringType())]
)

_MONEY = T.StructType(
    [T.StructField("value", T.DecimalType(18, 2)), T.StructField("currency", T.StringType())]
)

_HUMAN_NAME = T.ArrayType(
    T.StructType(
        [
            T.StructField("use", T.StringType()),
            T.StructField("family", T.StringType()),
            T.StructField("given", T.ArrayType(T.StringType())),
            T.StructField("prefix", T.ArrayType(T.StringType())),
        ]
    )
)

_ADDRESS = T.ArrayType(
    T.StructType(
        [
            T.StructField("line", T.ArrayType(T.StringType())),
            T.StructField("city", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("postalCode", T.StringType()),
            T.StructField("country", T.StringType()),
        ]
    )
)

_TELECOM = T.ArrayType(
    T.StructType(
        [
            T.StructField("system", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("use", T.StringType()),
        ]
    )
)

ALLERGY_INTOLERANCE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("clinicalStatus", _CODEABLE_CONCEPT),
        T.StructField("verificationStatus", _CODEABLE_CONCEPT),
        T.StructField("type", T.StringType()),
        T.StructField("category", T.ArrayType(T.StringType())),
        T.StructField("criticality", T.StringType()),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("patient", _REFERENCE),
        T.StructField("recordedDate", T.StringType()),
        T.StructField(
            "reaction",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("manifestation", T.ArrayType(_CODEABLE_CONCEPT)),
                        T.StructField("severity", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

CARE_PLAN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("period", _PERIOD),
        T.StructField("careTeam", T.ArrayType(_REFERENCE)),
        T.StructField(
            "activity",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "detail",
                            T.StructType(
                                [
                                    T.StructField("code", _CODEABLE_CONCEPT),
                                    T.StructField("status", T.StringType()),
                                    T.StructField("location", _REFERENCE),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)

CARE_TEAM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("period", _PERIOD),
        T.StructField(
            "participant",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("role", T.ArrayType(_CODEABLE_CONCEPT)),
                        T.StructField("member", _REFERENCE),
                    ]
                )
            ),
        ),
        T.StructField("managingOrganization", T.ArrayType(_REFERENCE)),
    ]
)

CLAIM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("use", T.StringType()),
        T.StructField("patient", _REFERENCE),
        T.StructField("billablePeriod", _PERIOD),
        T.StructField("created", T.StringType()),
        T.StructField("provider", _REFERENCE),
        T.StructField("priority", _CODEABLE_CONCEPT),
        T.StructField(
            "insurance",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sequence", T.IntegerType()),
                        T.StructField("focal", T.BooleanType()),
                        T.StructField("coverage", _REFERENCE),
                    ]
                )
            ),
        ),
        T.StructField(
            "item",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sequence", T.IntegerType()),
                        T.StructField("productOrService", _CODEABLE_CONCEPT),
                        T.StructField("encounter", T.ArrayType(_REFERENCE)),
                        T.StructField("net", _MONEY),
                    ]
                )
            ),
        ),
        T.StructField("total", _MONEY),
    ]
)

EXPLANATION_OF_BENEFIT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("use", T.StringType()),
        T.StructField("patient", _REFERENCE),
        T.StructField("billablePeriod", _PERIOD),
        T.StructField("created", T.StringType()),
        T.StructField("insurer", _REFERENCE),
        T.StructField("provider", _REFERENCE),
        T.StructField("outcome", T.StringType()),
        T.StructField("claim", _REFERENCE),
        T.StructField(
            "total",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("category", _CODEABLE_CONCEPT),
                        T.StructField("amount", _MONEY),
                    ]
                )
            ),
        ),
        T.StructField(
            "payment", T.StructType([T.StructField("amount", _MONEY)])
        ),
    ]
)

ORGANIZATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("type", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("name", T.StringType()),
        T.StructField("telecom", _TELECOM),
        T.StructField("address", _ADDRESS),
    ]
)

PRACTITIONER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("name", _HUMAN_NAME),
        T.StructField("gender", T.StringType()),
        T.StructField("telecom", _TELECOM),
        T.StructField("address", _ADDRESS),
    ]
)

DOCUMENT_REFERENCE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("subject", _REFERENCE),
        T.StructField("date", T.StringType()),
        T.StructField(
            "content",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "attachment",
                            T.StructType(
                                [
                                    T.StructField("contentType", T.StringType()),
                                    T.StructField("data", T.StringType()),
                                    T.StructField("url", T.StringType()),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
        T.StructField(
            "context",
            T.StructType(
                [
                    T.StructField("encounter", T.ArrayType(_REFERENCE)),
                    T.StructField("period", _PERIOD),
                ]
            ),
        ),
    ]
)

GOAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("lifecycleStatus", T.StringType()),
        T.StructField("description", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField(
            "target",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("measure", _CODEABLE_CONCEPT),
                        T.StructField("detailQuantity", _QUANTITY),
                        T.StructField("dueDate", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

MEDICATION_ADMINISTRATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("medicationCodeableConcept", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("context", _REFERENCE),
        T.StructField("effectiveDateTime", T.StringType()),
        T.StructField("reasonReference", T.ArrayType(_REFERENCE)),
        T.StructField(
            "dosage",
            T.StructType(
                [
                    T.StructField("route", _CODEABLE_CONCEPT),
                    T.StructField("dose", _QUANTITY),
                ]
            ),
        ),
    ]
)

DEVICE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("patient", _REFERENCE),
        T.StructField("distinctIdentifier", T.StringType()),
        T.StructField("manufactureDate", T.StringType()),
        T.StructField("expirationDate", T.StringType()),
        T.StructField(
            "deviceName",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

IMAGING_STUDY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("started", T.StringType()),
        T.StructField("numberOfSeries", T.IntegerType()),
        T.StructField("numberOfInstances", T.IntegerType()),
        T.StructField(
            "series",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("uid", T.StringType()),
                        T.StructField("number", T.IntegerType()),
                        T.StructField(
                            "modality",
                            T.StructType(
                                [
                                    T.StructField("system", T.StringType()),
                                    T.StructField("code", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField("numberOfInstances", T.IntegerType()),
                        T.StructField("bodySite", _CODEABLE_CONCEPT),
                    ]
                )
            ),
        ),
    ]
)

SUPPLY_DELIVERY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("patient", _REFERENCE),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField(
            "suppliedItem",
            T.StructType(
                [
                    T.StructField("quantity", _QUANTITY),
                    T.StructField("itemCodeableConcept", _CODEABLE_CONCEPT),
                ]
            ),
        ),
        T.StructField("occurrenceDateTime", T.StringType()),
    ]
)

# --- round-5 widening: the common non-Synthea R4 types a hospital
# integration feed carries (admin/master-data + workflow resources).
# Same curation rule as the Synthea set: typed columns for the fields
# real queries touch, lossless resource_json for the rest.

LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("mode", T.StringType()),
        T.StructField("type", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("address", _ADDRESS.elementType),
        T.StructField(
            "position",
            T.StructType(
                [
                    T.StructField("longitude", T.DoubleType()),
                    T.StructField("latitude", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("managingOrganization", _REFERENCE),
        T.StructField("partOf", _REFERENCE),
    ]
)

MEDICATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("manufacturer", _REFERENCE),
        T.StructField("form", _CODEABLE_CONCEPT),
        T.StructField(
            "ingredient",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("itemCodeableConcept", _CODEABLE_CONCEPT),
                        T.StructField("isActive", T.BooleanType()),
                        T.StructField(
                            "strength",
                            T.StructType(
                                [
                                    T.StructField("numerator", _QUANTITY),
                                    T.StructField("denominator", _QUANTITY),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

COVERAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("subscriber", _REFERENCE),
        T.StructField("beneficiary", _REFERENCE),
        T.StructField("relationship", _CODEABLE_CONCEPT),
        T.StructField("period", _PERIOD),
        T.StructField("payor", T.ArrayType(_REFERENCE)),
        T.StructField(
            "class",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", _CODEABLE_CONCEPT),
                        T.StructField("value", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

PROVENANCE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("target", T.ArrayType(_REFERENCE)),
        T.StructField("recorded", T.StringType()),
        T.StructField(
            "agent",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", _CODEABLE_CONCEPT),
                        T.StructField("who", _REFERENCE),
                        T.StructField("onBehalfOf", _REFERENCE),
                    ]
                )
            ),
        ),
        T.StructField("activity", _CODEABLE_CONCEPT),
    ]
)

RELATED_PERSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("patient", _REFERENCE),
        T.StructField("relationship", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("name", _HUMAN_NAME),
        T.StructField("gender", T.StringType()),
        T.StructField("birthDate", T.DateType()),
        T.StructField("telecom", _TELECOM),
        T.StructField("address", _ADDRESS),
    ]
)

SERVICE_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("requester", _REFERENCE),
        T.StructField("performer", T.ArrayType(_REFERENCE)),
        T.StructField("authoredOn", T.StringType()),
        T.StructField("occurrenceDateTime", T.StringType()),
        T.StructField("reasonReference", T.ArrayType(_REFERENCE)),
    ]
)

SPECIMEN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("receivedTime", T.StringType()),
        T.StructField(
            "collection",
            T.StructType(
                [
                    T.StructField("collector", _REFERENCE),
                    T.StructField("collectedDateTime", T.StringType()),
                    T.StructField("quantity", _QUANTITY),
                    T.StructField("bodySite", _CODEABLE_CONCEPT),
                ]
            ),
        ),
        T.StructField(
            "container",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", _CODEABLE_CONCEPT),
                        T.StructField("capacity", _QUANTITY),
                        T.StructField("specimenQuantity", _QUANTITY),
                    ]
                )
            ),
        ),
    ]
)

APPOINTMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("appointmentType", _CODEABLE_CONCEPT),
        T.StructField("description", T.StringType()),
        T.StructField("start", T.StringType()),
        T.StructField("end", T.StringType()),
        T.StructField("minutesDuration", T.IntegerType()),
        T.StructField(
            "participant",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("actor", _REFERENCE),
                        T.StructField("required", T.StringType()),
                        T.StructField("status", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

PRACTITIONER_ROLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("period", _PERIOD),
        T.StructField("practitioner", _REFERENCE),
        T.StructField("organization", _REFERENCE),
        T.StructField("code", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("specialty", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("location", T.ArrayType(_REFERENCE)),
        T.StructField("telecom", _TELECOM),
    ]
)

QUESTIONNAIRE_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("questionnaire", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("authored", T.StringType()),
        T.StructField(
            "item",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("linkId", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField(
                            "answer",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("valueString", T.StringType()),
                                        T.StructField(
                                            "valueDecimal",
                                            T.DecimalType(38, 18),
                                        ),
                                        T.StructField(
                                            "valueBoolean", T.BooleanType()
                                        ),
                                        T.StructField("valueCoding", _CODING.elementType),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

# --- round-5 widening, batch 2: document/workflow/admin types that
# round out the encounter-adjacent R4 surface.

COMPOSITION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("date", T.StringType()),
        T.StructField("author", T.ArrayType(_REFERENCE)),
        T.StructField("title", T.StringType()),
        T.StructField(
            "section",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("title", T.StringType()),
                        T.StructField("code", _CODEABLE_CONCEPT),
                        T.StructField("entry", T.ArrayType(_REFERENCE)),
                    ]
                )
            ),
        ),
    ]
)

CONSENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("scope", _CODEABLE_CONCEPT),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("patient", _REFERENCE),
        T.StructField("dateTime", T.StringType()),
        T.StructField(
            "provision",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("period", _PERIOD),
                    T.StructField("action", T.ArrayType(_CODEABLE_CONCEPT)),
                ]
            ),
        ),
    ]
)

COMMUNICATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("subject", _REFERENCE),
        T.StructField("sender", _REFERENCE),
        T.StructField("recipient", T.ArrayType(_REFERENCE)),
        T.StructField("sent", T.StringType()),
        T.StructField(
            "payload",
            T.ArrayType(
                T.StructType(
                    [T.StructField("contentString", T.StringType())]
                )
            ),
        ),
    ]
)

TASK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("description", T.StringType()),
        T.StructField("focus", _REFERENCE),
        T.StructField("for", _REFERENCE),
        T.StructField("owner", _REFERENCE),
        T.StructField("requester", _REFERENCE),
        T.StructField("authoredOn", T.StringType()),
        T.StructField("lastModified", T.StringType()),
    ]
)

NUTRITION_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("patient", _REFERENCE),
        T.StructField("dateTime", T.StringType()),
        T.StructField(
            "oralDiet",
            T.StructType(
                [
                    T.StructField("type", T.ArrayType(_CODEABLE_CONCEPT)),
                    T.StructField(
                        "nutrient",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("modifier", _CODEABLE_CONCEPT),
                                    T.StructField("amount", _QUANTITY),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)

FLAG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("category", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("period", _PERIOD),
    ]
)

LIST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("mode", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("date", T.StringType()),
        T.StructField(
            "entry",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("deleted", T.BooleanType()),
                        T.StructField("item", _REFERENCE),
                    ]
                )
            ),
        ),
    ]
)

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("serviceType", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("actor", T.ArrayType(_REFERENCE)),
        T.StructField("planningHorizon", _PERIOD),
    ]
)

SLOT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("schedule", _REFERENCE),
        T.StructField("start", T.StringType()),
        T.StructField("end", T.StringType()),
        T.StructField("overbooked", T.BooleanType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("createdDateTime", T.StringType()),
        T.StructField(
            "content",
            T.StructType(
                [
                    T.StructField("contentType", T.StringType()),
                    T.StructField("data", T.StringType()),
                    T.StructField("url", T.StringType()),
                    T.StructField("size", T.IntegerType()),
                    T.StructField("title", T.StringType()),
                ]
            ),
        ),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
    ]
)

# --- round-7 widening: the next R4 tranche beyond the Synthea working
# set — pharmacy fulfillment, episode/status workflow, risk/decision
# support, and the billing chain (Account/Invoice/ChargeItem). Field
# names are the official FHIR R4 element names; choice elements
# ([x] forms) curate the commonly-populated variants and the rest
# stays queryable via resource_json.

MEDICATION_DISPENSE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("medicationCodeableConcept", _CODEABLE_CONCEPT),
        T.StructField("medicationReference", _REFERENCE),
        T.StructField("subject", _REFERENCE),
        T.StructField(
            "performer",
            T.ArrayType(T.StructType([T.StructField("actor", _REFERENCE)])),
        ),
        T.StructField("authorizingPrescription", T.ArrayType(_REFERENCE)),
        T.StructField("quantity", _QUANTITY),
        T.StructField("daysSupply", _QUANTITY),
        T.StructField("whenPrepared", T.StringType()),
        T.StructField("whenHandedOver", T.StringType()),
    ]
)

MEDICATION_STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("medicationCodeableConcept", _CODEABLE_CONCEPT),
        T.StructField("medicationReference", _REFERENCE),
        T.StructField("subject", _REFERENCE),
        T.StructField("context", _REFERENCE),
        T.StructField("effectiveDateTime", T.StringType()),
        T.StructField("effectivePeriod", _PERIOD),
        T.StructField("dateAsserted", T.StringType()),
        T.StructField("reasonCode", T.ArrayType(_CODEABLE_CONCEPT)),
    ]
)

EPISODE_OF_CARE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField(
            "statusHistory",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("status", T.StringType()),
                        T.StructField("period", _PERIOD),
                    ]
                )
            ),
        ),
        T.StructField("type", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("patient", _REFERENCE),
        T.StructField("managingOrganization", _REFERENCE),
        T.StructField("period", _PERIOD),
        T.StructField("careManager", _REFERENCE),
    ]
)

FAMILY_MEMBER_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("patient", _REFERENCE),
        T.StructField("date", T.StringType()),
        T.StructField("relationship", _CODEABLE_CONCEPT),
        T.StructField("sex", _CODEABLE_CONCEPT),
        T.StructField("bornDate", T.DateType()),
        T.StructField("deceasedBoolean", T.BooleanType()),
        T.StructField(
            "condition",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("code", _CODEABLE_CONCEPT),
                        T.StructField("onsetAge", _QUANTITY),
                        T.StructField("contributedToDeath", T.BooleanType()),
                    ]
                )
            ),
        ),
    ]
)

CLINICAL_IMPRESSION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("effectiveDateTime", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField(
            "finding",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("itemCodeableConcept", _CODEABLE_CONCEPT),
                        T.StructField("itemReference", _REFERENCE),
                        T.StructField("basis", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

DEVICE_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("intent", T.StringType()),
        T.StructField("codeReference", _REFERENCE),
        T.StructField("codeCodeableConcept", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("requester", _REFERENCE),
        T.StructField("performer", _REFERENCE),
        T.StructField("authoredOn", T.StringType()),
    ]
)

DEVICE_USE_STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("device", _REFERENCE),
        T.StructField("timingPeriod", _PERIOD),
        T.StructField("recordedOn", T.StringType()),
        T.StructField("source", _REFERENCE),
    ]
)

COMMUNICATION_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("requester", _REFERENCE),
        T.StructField("recipient", T.ArrayType(_REFERENCE)),
        T.StructField(
            "payload",
            T.ArrayType(
                T.StructType([T.StructField("contentString", T.StringType())])
            ),
        ),
        T.StructField("authoredOn", T.StringType()),
    ]
)

RISK_ASSESSMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("subject", _REFERENCE),
        T.StructField("encounter", _REFERENCE),
        T.StructField("occurrenceDateTime", T.StringType()),
        T.StructField("condition", _REFERENCE),
        T.StructField(
            "prediction",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("outcome", _CODEABLE_CONCEPT),
                        # FHIR decimal -> DecimalType (Pathling parity)
                        T.StructField(
                            "probabilityDecimal", T.DecimalType(38, 18)
                        ),
                        T.StructField("qualitativeRisk", _CODEABLE_CONCEPT),
                        T.StructField("whenPeriod", _PERIOD),
                    ]
                )
            ),
        ),
        T.StructField("mitigation", T.StringType()),
    ]
)

ACCOUNT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("name", T.StringType()),
        T.StructField("subject", T.ArrayType(_REFERENCE)),
        T.StructField("servicePeriod", _PERIOD),
        T.StructField("owner", _REFERENCE),
        T.StructField("description", T.StringType()),
    ]
)

INVOICE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("type", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("recipient", _REFERENCE),
        T.StructField("date", T.StringType()),
        T.StructField(
            "lineItem",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sequence", T.IntegerType()),
                        T.StructField("chargeItemReference", _REFERENCE),
                    ]
                )
            ),
        ),
        T.StructField("totalNet", _MONEY),
        T.StructField("totalGross", _MONEY),
    ]
)

CHARGE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("context", _REFERENCE),
        T.StructField("occurrenceDateTime", T.StringType()),
        T.StructField("quantity", _QUANTITY),
        T.StructField("performingOrganization", _REFERENCE),
        T.StructField("priceOverride", _MONEY),
    ]
)

ADVERSE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("actuality", T.StringType()),
        T.StructField("event", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("date", T.StringType()),
        T.StructField("severity", _CODEABLE_CONCEPT),
        T.StructField(
            "suspectEntity",
            T.ArrayType(
                T.StructType([T.StructField("instance", _REFERENCE)])
            ),
        ),
    ]
)

VISION_PRESCRIPTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("created", T.StringType()),
        T.StructField("patient", _REFERENCE),
        T.StructField("dateWritten", T.StringType()),
        T.StructField("prescriber", _REFERENCE),
        T.StructField(
            "lensSpecification",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("product", _CODEABLE_CONCEPT),
                        T.StructField("eye", T.StringType()),
                        T.StructField("sphere", T.DecimalType(38, 18)),
                        T.StructField("add", T.DecimalType(38, 18)),
                    ]
                )
            ),
        ),
    ]
)

GROUP_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("actual", T.BooleanType()),
        T.StructField("name", T.StringType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("managingEntity", _REFERENCE),
        T.StructField(
            "member",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("entity", _REFERENCE),
                        T.StructField("inactive", T.BooleanType()),
                    ]
                )
            ),
        ),
    ]
)

HEALTHCARE_SERVICE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("providedBy", _REFERENCE),
        T.StructField("type", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("name", T.StringType()),
        T.StructField("location", T.ArrayType(_REFERENCE)),
        T.StructField("telecom", _TELECOM),
    ]
)

ENDPOINT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        # Endpoint.connectionType is a single Coding (not an array)
        T.StructField(
            "connectionType",
            T.StructType(
                [
                    T.StructField("system", T.StringType()),
                    T.StructField("code", T.StringType()),
                    T.StructField("display", T.StringType()),
                ]
            ),
        ),
        T.StructField("name", T.StringType()),
        T.StructField("managingOrganization", _REFERENCE),
        T.StructField("payloadType", T.ArrayType(_CODEABLE_CONCEPT)),
        T.StructField("address", T.StringType()),
    ]
)

BASIC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("code", _CODEABLE_CONCEPT),
        T.StructField("subject", _REFERENCE),
        T.StructField("created", T.DateType()),
        T.StructField("author", _REFERENCE),
    ]
)

RESOURCE_SCHEMAS: dict[str, T.StructType] = {
    "Patient": PATIENT_SCHEMA,
    "Condition": CONDITION_SCHEMA,
    "Observation": OBSERVATION_SCHEMA,
    "Encounter": ENCOUNTER_SCHEMA,
    "Procedure": PROCEDURE_SCHEMA,
    "MedicationRequest": MEDICATION_REQUEST_SCHEMA,
    "DiagnosticReport": DIAGNOSTIC_REPORT_SCHEMA,
    "Immunization": IMMUNIZATION_SCHEMA,
    "AllergyIntolerance": ALLERGY_INTOLERANCE_SCHEMA,
    "CarePlan": CARE_PLAN_SCHEMA,
    "CareTeam": CARE_TEAM_SCHEMA,
    "Claim": CLAIM_SCHEMA,
    "ExplanationOfBenefit": EXPLANATION_OF_BENEFIT_SCHEMA,
    "Organization": ORGANIZATION_SCHEMA,
    "Practitioner": PRACTITIONER_SCHEMA,
    "DocumentReference": DOCUMENT_REFERENCE_SCHEMA,
    "Goal": GOAL_SCHEMA,
    "MedicationAdministration": MEDICATION_ADMINISTRATION_SCHEMA,
    "Device": DEVICE_SCHEMA,
    "ImagingStudy": IMAGING_STUDY_SCHEMA,
    "SupplyDelivery": SUPPLY_DELIVERY_SCHEMA,
    "Location": LOCATION_SCHEMA,
    "Medication": MEDICATION_SCHEMA,
    "Coverage": COVERAGE_SCHEMA,
    "Provenance": PROVENANCE_SCHEMA,
    "RelatedPerson": RELATED_PERSON_SCHEMA,
    "ServiceRequest": SERVICE_REQUEST_SCHEMA,
    "Specimen": SPECIMEN_SCHEMA,
    "Appointment": APPOINTMENT_SCHEMA,
    "PractitionerRole": PRACTITIONER_ROLE_SCHEMA,
    "QuestionnaireResponse": QUESTIONNAIRE_RESPONSE_SCHEMA,
    "Composition": COMPOSITION_SCHEMA,
    "Consent": CONSENT_SCHEMA,
    "Communication": COMMUNICATION_SCHEMA,
    "Task": TASK_SCHEMA,
    "NutritionOrder": NUTRITION_ORDER_SCHEMA,
    "Flag": FLAG_SCHEMA,
    "List": LIST_SCHEMA,
    "Schedule": SCHEDULE_SCHEMA,
    "Slot": SLOT_SCHEMA,
    # FHIR R4 Media (photo/video/audio attachments on a subject)
    "Media": MEDIA_SCHEMA,
    # round-7 tranche: pharmacy / workflow / risk / billing chain
    "MedicationDispense": MEDICATION_DISPENSE_SCHEMA,
    "MedicationStatement": MEDICATION_STATEMENT_SCHEMA,
    "EpisodeOfCare": EPISODE_OF_CARE_SCHEMA,
    "FamilyMemberHistory": FAMILY_MEMBER_HISTORY_SCHEMA,
    "ClinicalImpression": CLINICAL_IMPRESSION_SCHEMA,
    "DeviceRequest": DEVICE_REQUEST_SCHEMA,
    "DeviceUseStatement": DEVICE_USE_STATEMENT_SCHEMA,
    "CommunicationRequest": COMMUNICATION_REQUEST_SCHEMA,
    "RiskAssessment": RISK_ASSESSMENT_SCHEMA,
    "Account": ACCOUNT_SCHEMA,
    "Invoice": INVOICE_SCHEMA,
    "ChargeItem": CHARGE_ITEM_SCHEMA,
    "AdverseEvent": ADVERSE_EVENT_SCHEMA,
    "VisionPrescription": VISION_PRESCRIPTION_SCHEMA,
    "Group": GROUP_SCHEMA,
    "HealthcareService": HEALTHCARE_SERVICE_SCHEMA,
    "Endpoint": ENDPOINT_SCHEMA,
    "Basic": BASIC_SCHEMA,
}

# Round-7 tranche 3: the remaining R4 4.0.1 resource types (compact
# curated schemas, schemas_catalog.py) — the registry now covers the
# FULL official list of 146 concrete types, so no resourceType ever
# degrades to GENERIC_SCHEMA. The catalog module registers itself into
# RESOURCE_SCHEMAS at its import; this is a plain MODULE import (no
# attribute access) so both import orders resolve the cycle — if the
# catalog module started first, it is partially initialized here and
# finishes its registration right after this module completes.
import fhir_to_lakehouse_spark.schemas_catalog  # noqa: E402,F401

# Fallback for a resourceType OUTSIDE the R4 registry (custom/basic
# profiles, future-version types): id only (the merge key) + the raw
# JSON column that every encoded frame carries.
GENERIC_SCHEMA = T.StructType([T.StructField("id", T.StringType())])


def schema_for(
    resource_type: str, include_extensions: bool = False
) -> T.StructType:
    """Curated schema for a resource type (GENERIC_SCHEMA fallback:
    id only, everything else via resource_json).

    ``include_extensions=True`` appends the shared ``extension``
    element (EXTENSION_SCHEMA) — opt-in so default table layouts stay
    byte-identical; pass the same flag to ``encode_resources`` and
    the view compiler auto-detects it from the frame."""
    base = RESOURCE_SCHEMAS.get(resource_type, GENERIC_SCHEMA)
    if not include_extensions:
        return base
    return T.StructType(
        list(base.fields) + [T.StructField("extension", EXTENSION_SCHEMA)]
    )


# --- reference normalization (Bundle.entry.fullUrl resolution) -----------

# Synthea transaction bundles cross-reference entries as
# 'urn:uuid:<id>' (the entry fullUrl), and REST-shaped sources use
# relative '<Type>/<id>'; in both shapes the suffix IS the target
# resource id (Synthea sets resource.id to the fullUrl's uuid; the
# reference ingests via Pathling which resolves this implicitly,
# /root/reference/src/main.py:49). Normalization strips either prefix
# so Observation.subject.reference joins Patient.id directly — but
# FHIR ids are unique only PER TYPE, so a stripped 'Type/<id>' prefix
# is PRESERVED in the Reference's official `type` element: a sound
# join checks `type` too (urn uuids are globally unique, so their
# null type is unambiguous). Matched forms:
# - 'urn:uuid:<anything>'                -> (id, type unchanged)
# - '<Type>/<id>' with a strict FHIR id  -> (id, Type)
# Everything else — absolute URLs, conditional references
# ('Patient?x=y'), versioned references ('Patient/1/_history/2') —
# passes through UNTOUCHED (a half-stripped versioned ref would be
# wrong; callers needing history resolution parse resource_json).
_URN_UUID_RE = "^urn:uuid:(.+)$"
_RELATIVE_REF_RE = r"^([A-Za-z]+)/([A-Za-z0-9\-\.]{1,64})$"


def _is_reference_struct(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.StructType) and any(
        f.name == "reference" and isinstance(f.dataType, T.StringType)
        for f in dtype.fields
    )


def _contains_reference(dtype: T.DataType) -> bool:
    if isinstance(dtype, T.StructType):
        return _is_reference_struct(dtype) or any(
            _contains_reference(f.dataType) for f in dtype.fields
        )
    if isinstance(dtype, T.ArrayType):
        return _contains_reference(dtype.elementType)
    return False


def normalize_references(col, dtype: T.DataType):
    """Rebuild ``col`` (typed by ``dtype``) with every FHIR Reference
    struct normalized: ``reference`` becomes the bare target id
    ('urn:uuid:X' and 'Type/X' -> 'X'), and for the relative form the
    stripped resource type is recorded in the struct's ``type`` field
    (unless the document already set one — FHIR allows an explicit
    Reference.type, which wins). Ids are only unique per type, so
    joins built on the normalized id must include the type guard
    ``type IS NULL OR type = '<Target>'`` — null type means a
    urn:uuid reference, which is globally unique.

    Only subtrees that actually contain a Reference are rebuilt — all
    other columns pass through untouched, so the projection stays
    minimal. Null structs are preserved as nulls (a naive struct
    rebuild would turn a NULL subject into struct(NULL), changing
    IS NULL semantics downstream).
    """
    from pyspark.sql import functions as F

    if isinstance(dtype, T.StructType):
        if not _contains_reference(dtype):
            return col
        is_ref = _is_reference_struct(dtype)
        fields = []
        for f in dtype.fields:
            child = col.getField(f.name)
            if is_ref and f.name == "reference":
                ref = child
                child = (
                    F.when(
                        ref.rlike(_URN_UUID_RE),
                        F.regexp_extract(ref, _URN_UUID_RE, 1),
                    )
                    .when(
                        ref.rlike(_RELATIVE_REF_RE),
                        F.regexp_extract(ref, _RELATIVE_REF_RE, 2),
                    )
                    .otherwise(ref)
                )
            elif is_ref and f.name == "type":
                ref = col.getField("reference")
                child = F.coalesce(
                    child,  # explicit Reference.type wins
                    F.when(
                        ref.rlike(_RELATIVE_REF_RE),
                        F.regexp_extract(ref, _RELATIVE_REF_RE, 1),
                    ),
                )
            else:
                child = normalize_references(child, f.dataType)
            fields.append(child.alias(f.name))
        return F.when(
            col.isNull(), F.lit(None).cast(dtype)
        ).otherwise(F.struct(*fields))
    if isinstance(dtype, T.ArrayType):
        if not _contains_reference(dtype):
            return col
        return F.transform(
            col, lambda x: normalize_references(x, dtype.elementType)
        )
    return col
