"""Patient compartment extraction — the FHIR ``Patient/$everything``
operation (and Bulk Data patient-level group export) over encoded
resource frames or stored warehouse tables.

The reference's deployments serve compartment queries through
Pathling over the same Delta tables its pipeline writes
(/root/reference/src/main.py:49); here the compartment is a pure
Spark plan: per resource type, extract every patient key its
compartment-linking Reference elements carry, optionally semi-join a
patient cohort, and union the per-type slices.

Link semantics (R4 patient CompartmentDefinition, expressed against
the curated element names): a resource belongs to patient P when one
of its ``subject`` / ``patient`` / ``individual`` / ``beneficiary`` /
``actor`` elements references P — either a typed relative
``Patient/<id>`` (other target types are ignored: ``subject:
Group/x`` is NOT in any patient compartment), an explicit
``Reference.type = Patient``, or a Synthea-style ``urn:uuid:<id>``
(globally unique, untyped — compartment-linking elements target
patients in that corpus shape). Multi-reference elements (arrays)
contribute every distinct key, so one resource can sit in several
compartments — the spec's semantics, realized as one exploded row per
(patient, resource).

100 TB shape: each per-type slice is a projection + explode of a
handful of extracted keys (bounded by the element count, usually 1-2)
+ an optional BROADCAST semi-join against the cohort — the fact
tables never shuffle, filters and column pruning push into every
scan, and types union independently. Exporting the full compartment
of a cohort of K patients reads each table once, not K times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhir_to_lakehouse_spark.schemas import (
    _RELATIVE_REF_RE,
    _URN_UUID_RE,
    _is_reference_struct,
    schema_for,
)

# curated element names that carry the patient link in the R4 patient
# CompartmentDefinition's reference search-params
_PATIENT_LINK_FIELDS = (
    "subject",
    "patient",
    "individual",
    "beneficiary",
    "actor",
)


def _patient_key(ref_struct, dtype: T.StructType):
    """Bare patient id from one Reference struct, NULL when the
    reference targets another type (or carries no local key)."""
    ref = ref_struct.getField("reference")
    has_type = any(f.name == "type" for f in dtype.fields)
    explicit = ref_struct.getField("type") if has_type else F.lit(None)
    rel_type = F.when(
        ref.rlike(_RELATIVE_REF_RE), F.regexp_extract(ref, _RELATIVE_REF_RE, 1)
    )
    rtype = F.coalesce(explicit, rel_type)
    key = (
        F.when(ref.rlike(_URN_UUID_RE), F.regexp_extract(ref, _URN_UUID_RE, 1))
        .when(
            ref.rlike(_RELATIVE_REF_RE),
            F.regexp_extract(ref, _RELATIVE_REF_RE, 2),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    # typed references must type as Patient; urn:uuid has NULL rtype
    return F.when(rtype.isNull() | (rtype == "Patient"), key)


def compartment_link_fields(resource_type: str) -> list[str]:
    """The curated schema's top-level elements (Reference or
    Reference-array) that link this type into patient compartments."""
    schema = schema_for(resource_type)
    out = []
    for f in schema.fields:
        if f.name not in _PATIENT_LINK_FIELDS:
            continue
        if _is_reference_struct(f.dataType) or (
            isinstance(f.dataType, T.ArrayType)
            and _is_reference_struct(f.dataType.elementType)
        ):
            out.append(f.name)
    return out


def compartment_members(
    df: DataFrame,
    resource_type: str,
    patient_ids: DataFrame | list[str] | None = None,
) -> DataFrame:
    """One row per (patient_id, resource) for every resource of this
    frame that sits in a patient compartment — columns
    ``(patient_id, resource_type, rid, resource_json)`` (resource_json
    NULL when the frame doesn't carry it). ``Patient`` rows link to
    themselves. ``patient_ids`` (list or a one-column DataFrame)
    restricts to a cohort via a broadcast semi-join."""
    schema = schema_for(resource_type)
    if resource_type == "Patient":
        keys = F.array(F.col("id"))
    else:
        parts = []
        # only link fields the frame actually materializes — a stored
        # table written from a projection (or before a schema widening)
        # simply contributes no links through the missing element
        present = set(df.columns)
        for name in compartment_link_fields(resource_type):
            if name not in present:
                continue
            field = next(f for f in schema.fields if f.name == name)
            if isinstance(field.dataType, T.ArrayType):
                elem = field.dataType.elementType

                def _one_arg(e):
                    # a 2-arg lambda would make F.transform pass the
                    # array INDEX as the second argument
                    return lambda x: _patient_key(x, e)

                arr = F.transform(F.col(name), _one_arg(elem))
            else:
                arr = F.array(_patient_key(F.col(name), field.dataType))
            parts.append(
                F.coalesce(
                    F.filter(arr, lambda k: k.isNotNull()),
                    F.array().cast("array<string>"),
                )
            )
        if not parts:
            keys = F.array().cast("array<string>")
        else:
            keys = F.array_distinct(F.concat(*parts))
    body = (
        F.col("resource_json")
        if "resource_json" in df.columns
        else F.lit(None).cast("string")
    )
    out = df.select(
        F.explode(keys).alias("patient_id"),
        F.lit(resource_type).alias("resource_type"),
        F.col("id").alias("rid"),
        body.alias("resource_json"),
    )
    if patient_ids is None:
        return out
    if isinstance(patient_ids, list):
        cohort = out.sparkSession.createDataFrame(
            [(p,) for p in patient_ids], "patient_id string"
        )
    else:
        cohort = patient_ids.toDF("patient_id")
    # No .distinct() on the build side (r12): a left-semi join is
    # duplicate-invariant, and the broadcast hash relation dedups keys
    # as it builds — the distinct only added an exchange + aggregate
    # pair ahead of every broadcast (one PER SLICE under
    # patient_everything's union).
    return out.join(F.broadcast(cohort), "patient_id", "left_semi")


def patient_everything(
    tables: dict[str, DataFrame],
    patient_ids: DataFrame | list[str] | None = None,
) -> DataFrame:
    """``$everything`` across a warehouse: union the compartment
    slices of every (resource_type -> encoded frame) entry. Each
    table is read once regardless of cohort size; per-type slices
    stay independent Spark jobs under one union plan.

    A DataFrame cohort is materialized ONCE (eager localCheckpoint)
    before the per-slice loop: without it, every slice re-plans and
    re-executes the whole cohort subtree (its scan, filters and
    aggregates) just to rebuild an identical broadcast — measured as
    three extra customer-table scans in
    plans/r12/compartment_patient_everything_before.txt. The cohort
    is broadcast-sized by contract, so the checkpoint is a tiny
    single-stage job and every slice's BroadcastExchange reads the
    materialized blocks.

    Deliberate tradeoff (ADVICE r12, re-measured r13): persist()+count
    keeps the lineage recomputable after an executor loss, but each
    slice then carries the whole InMemoryRelation subtree — plan 34->48
    operators, isolated bench 0.94 s -> 1.51 s and 47 -> 119 CPU-s —
    so localCheckpoint stays. The exposure is bounded: checkpoint
    blocks are non-replicated, so losing an executor mid-query (e.g.
    under dynamic allocation) fails the downstream slices, but the
    cohort is dimension-sized and the caller just re-runs the query;
    the eager materialization job is the same job persist's count()
    would run."""
    if isinstance(patient_ids, DataFrame):
        patient_ids = patient_ids.toDF("patient_id").localCheckpoint(
            eager=True
        )
    slices = [
        compartment_members(df, rtype, patient_ids)
        for rtype, df in sorted(tables.items())
    ]
    if not slices:
        raise ValueError("patient_everything needs at least one table")
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out


def group_patient_ids(
    groups: DataFrame, group_id: str, include_inactive: bool = False
) -> DataFrame:
    """Cohort extraction for Bulk Data GROUP-LEVEL export
    (``Group/<id>/$export``): the patient ids a Group resource's
    ``member.entity`` references enumerate — one-column frame ready
    for :func:`patient_everything` / :func:`compartment_members`.
    Inactive members are excluded unless ``include_inactive`` (the
    Bulk Data spec exports active membership). Non-patient members
    (Group of devices, say) drop out via the same type guard every
    compartment link uses. A Group is a tiny dimension — the result
    rides the cohort broadcast."""
    gschema = schema_for("Group")
    member_t = next(
        f for f in gschema.fields if f.name == "member"
    ).dataType.elementType
    entity_t = next(
        f for f in member_t.fields if f.name == "entity"
    ).dataType
    m = groups.filter(F.col("id") == group_id).select(
        F.explode("member").alias("m")
    )
    if not include_inactive:
        m = m.filter(~F.coalesce(F.col("m.inactive"), F.lit(False)))
    return (
        m.select(_patient_key(F.col("m.entity"), entity_t).alias("patient_id"))
        .filter(F.col("patient_id").isNotNull())
        .distinct()
    )
