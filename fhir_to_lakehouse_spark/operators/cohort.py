"""Declarative cohort extraction across resource types — the
Pathling-style "patients where Condition X and Observation Y"
question, composed from the engine's own layers.

A cohort spec is a list of criteria, each a resource type plus the
SAME ``where`` subset a ViewDefinition takes (comparisons, boolean
paths, exists/not chains, memberOf, %constants):

    criteria = [
      {"resource": "Patient",
       "where": [{"path": "gender = 'female'"}]},
      {"resource": "Observation",
       "where": [{"path": "status = 'final'"},
                 {"path": "valueQuantity.value >= 50"}]},
    ]
    build_cohort(criteria, tables, combine="and")  # -> patient_id frame

Each criterion compiles through the ViewDefinition machinery
(operators/view_definition.compile_view — so every where feature,
including terminology memberOf, works here unchanged), and its
matching resources map to patient ids through the compartment link
elements (operators/compartment.compartment_members — typed-relative
/ urn:uuid acceptance, array links). ``combine="and"`` intersects
the per-criterion id sets (chained LEFT SEMI joins), ``"or"`` unions
them.

100 TB shape: per criterion one fact-table scan with the where
filters PUSHED into it, reduced immediately to a distinct patient-id
set (compartment keys are a projection; the distinct is the only
shuffle, over ids not rows). The combine step joins id SETS — each
bounded by the patient dimension — never fact tables. The result
feeds patient_everything / group export / any broadcast semi-join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.compartment import (
    compartment_members,
)
from fhir_to_lakehouse_spark.operators.view_definition import (
    compile_view,
)


def criterion_patient_ids(
    criterion: dict,
    encoded: DataFrame,
    valuesets: DataFrame | None = None,
) -> DataFrame:
    """Distinct patient ids whose compartment contains at least one
    resource matching the criterion's where clauses."""
    rtype = criterion["resource"]
    view = {
        "resource": rtype,
        "constant": criterion.get("constant"),
        "where": criterion.get("where", []),
        "select": [
            {"column": [{"name": "rid", "path": "getResourceKey()"}]}
        ],
    }
    matching = compile_view(view, encoded, valuesets=valuesets)
    rows = encoded.join(
        matching.select(F.col("rid").alias("id")).distinct(),
        "id",
        "left_semi",
    )
    return (
        compartment_members(rows, rtype)
        .select("patient_id")
        .distinct()
    )


def build_cohort(
    criteria: list[dict],
    tables: dict[str, DataFrame],
    combine: str = "and",
    valuesets: DataFrame | None = None,
) -> DataFrame:
    """One-column ``patient_id`` frame satisfying the criteria.
    ``tables`` maps resource type -> encoded frame (a criterion whose
    type is missing raises — a silently-empty criterion under "and"
    would silently empty the cohort)."""
    if combine not in ("and", "or"):
        raise ValueError(f"combine must be 'and' or 'or', got {combine!r}")
    if not criteria:
        raise ValueError("build_cohort needs at least one criterion")
    sets = []
    for c in criteria:
        rtype = c.get("resource")
        if rtype not in tables:
            raise ValueError(
                f"criterion resource {rtype!r} has no table (have: "
                f"{sorted(tables)})"
            )
        sets.append(criterion_patient_ids(c, tables[rtype], valuesets))
    if combine == "or":
        return reduce(DataFrame.unionByName, sets).distinct()
    return reduce(
        lambda acc, s: acc.join(s, "patient_id", "left_semi"), sets
    )
