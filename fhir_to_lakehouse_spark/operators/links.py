"""Patient merge-chain resolution through ``Patient.link``.

Real deployments accumulate merged patient records: when record B is
merged into A, B survives as an inactive Patient carrying
``link: [{other: Reference(A), type: replaced-by}]`` (and A may carry
the inverse ``replaces`` link). Every analytic join on patient
identity then needs each id mapped to its CANONICAL survivor —
following multi-hop chains (B→A after A itself was merged into Z).

Spark-first shape: the link elements flatten to (old_id, new_id)
edges — a patient-DIMENSION-sized frame, tiny next to the fact
tables — and chains collapse by POINTER DOUBLING: each round joins
the mapping with itself so every pointer jumps to its target's
target, halving the longest chain. Convergence in ceil(log2(longest
chain)) rounds (a 1000-hop pathological chain needs 10), each round
one self-join + a changed-row count that doubles as the termination
probe, lineage truncated per round via localCheckpoint (the
functions/graph.py convention). Cycles — malformed data, A replaced
by B replaced by A — never converge and raise at ``max_rounds``
rather than looping or silently picking a winner.

The resolved mapping is then a broadcast join for fact-side use:
``resolve_patient_references`` maps any key column to its canonical
id, so 100 TB fact tables never shuffle for record linkage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.cache import release_checkpoint
from fhir_to_lakehouse_spark.operators.compartment import _patient_key
from fhir_to_lakehouse_spark.schemas import schema_for


def patient_link_edges(patients: DataFrame) -> DataFrame:
    """(old_id, new_id) merge edges from encoded Patient rows: a
    ``replaced-by`` link is (self -> other), a ``replaces`` link is
    (other -> self); ``seealso``/``refer`` links are NOT merges and
    contribute nothing. Self-edges (malformed) drop."""
    pschema = schema_for("Patient")
    link_t = next(
        f for f in pschema.fields if f.name == "link"
    ).dataType.elementType
    other_t = next(f for f in link_t.fields if f.name == "other").dataType
    l = patients.select(  # noqa: E741
        F.col("id"), F.explode("link").alias("l")
    )
    other = _patient_key(F.col("l.other"), other_t)
    replaced_by = l.filter(F.col("l.type") == "replaced-by").select(
        F.col("id").alias("old_id"), other.alias("new_id")
    )
    replaces = l.filter(F.col("l.type") == "replaces").select(
        other.alias("old_id"), F.col("id").alias("new_id")
    )
    return (
        replaced_by.unionByName(replaces)
        .filter(
            F.col("new_id").isNotNull()
            & F.col("old_id").isNotNull()
            & (F.col("old_id") != F.col("new_id"))
        )
        .distinct()
    )


def resolve_patient_links(
    patients: DataFrame,
    max_rounds: int = 16,
    on_unconverged: str = "raise",
) -> DataFrame:
    """(id, canonical_id) for EVERY patient row — its terminal
    survivor through any number of merge hops (canonical_id = id when
    never merged). ``max_rounds`` bounds pointer doubling (2^16-hop
    chains are beyond malformed); ``on_unconverged='raise'`` (default)
    fails loudly on cycles, ``'keep'`` returns the partially
    compressed mapping.

    The result reads the final round's localCheckpoint blocks — a
    long-lived caller should wrap the call in
    ``functions.cache.persist_scope`` (which frees them on exit),
    the same residual-block contract as connected_components."""
    if on_unconverged not in ("raise", "keep"):
        raise ValueError(f"on_unconverged must be raise|keep, got {on_unconverged!r}")
    mapping = patient_link_edges(patients).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_rounds):
        nxt = (
            mapping.alias("a")
            .join(
                mapping.alias("b"),
                F.col("a.new_id") == F.col("b.old_id"),
                "left",
            )
            .select(
                F.col("a.old_id").alias("old_id"),
                F.coalesce(F.col("b.new_id"), F.col("a.new_id")).alias(
                    "new_id"
                ),
                F.col("b.new_id").isNotNull().alias("__jumped"),
            )
        )
        nxt = nxt.localCheckpoint(eager=True)
        jumped = nxt.filter(F.col("__jumped")).count()
        release_checkpoint(mapping)
        mapping = nxt.select("old_id", "new_id")
        if jumped == 0:
            converged = True
            break
    if not converged and on_unconverged == "raise":
        raise RuntimeError(
            f"patient link resolution did not converge in {max_rounds} "
            "rounds — cyclic replaced-by links in the data"
        )
    return patients.select("id").join(
        mapping, patients["id"] == mapping["old_id"], "left"
    ).select(
        F.col("id"),
        F.coalesce(F.col("new_id"), F.col("id")).alias("canonical_id"),
    )


def resolve_patient_references(
    facts: DataFrame,
    resolution: DataFrame,
    key_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Map a fact-side patient-key column to canonical ids via the
    BROADCAST resolution frame (from :func:`resolve_patient_links`) —
    unmapped keys pass through unchanged, the fact side never
    shuffles."""
    out_col = out_col or key_col
    dim = resolution.filter(F.col("id") != F.col("canonical_id")).select(
        F.col("id").alias("__pl_old"),
        F.col("canonical_id").alias("__pl_new"),
    )
    joined = facts.join(
        F.broadcast(dim), facts[key_col] == F.col("__pl_old"), "left"
    )
    return joined.withColumn(
        out_col, F.coalesce(F.col("__pl_new"), facts[key_col])
    ).drop("__pl_old", "__pl_new")
