"""Terminology operations: ValueSet expansion/membership, ConceptMap
translation.

The reference ingests with Pathling, whose query layer offers
terminology functions (`memberof`, `translate`) alongside the encoder
(/root/reference/src/main.py:49 pulls the Pathling engine in). This
module re-expresses the data-parallel core of those operations
Spark-first over the encoded ValueSet / ConceptMap / CodeSystem frames
(schemas_catalog.py):

- ``expand_valueset`` — ValueSet.compose.include (explicit concepts +
  whole-system includes against a CodeSystem frame) and pre-computed
  ValueSet.expansion.contains, flattened to a (system, code) membership
  frame;
- ``member_of`` — tag a fact-side (system, code) pair with a boolean:
  is it in the expansion;
- ``conceptmap_rules`` / ``translate`` — flatten
  ConceptMap.group[].element[].target[] to mapping rules and apply them.

100 TB shape: terminology artifacts are classic small dimensions — a
large ValueSet is ~100k codes, a large ConceptMap ~1M rules; both fit
in a broadcast comfortably, while the fact side (observations, claims)
is the 100 TB table. Every join here therefore BROADCASTS the
terminology side explicitly so the fact side is never shuffled; the
plan-audit test asserts BroadcastHashJoin. No remote terminology-server
calls: expansion is computed from the encoded resources themselves
(the $expand-over-REST path is an external service, out of engine
scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_valueset(valuesets: DataFrame, codesystems: DataFrame | None = None) -> DataFrame:
    """Flatten encoded ValueSet rows to (valueset_url, system, code).

    Three include shapes, unioned:

    - ``compose.include[].concept[]`` — explicit code list;
    - ``compose.include[]`` with NO concept list — include the whole
      code system: joined against ``codesystems`` (encoded CodeSystem
      rows, ``concept[]`` flattened) when provided, else contributes
      nothing (the system's codes are unknowable without its
      CodeSystem resource);
    - ``expansion.contains[]`` — a pre-expanded snapshot carried in
      the resource.

    Duplicates across shapes collapse with one distinct on the
    (valueset_url, system, code) key — the output is a membership SET.
    Each explode is linear in the number of codes; nothing here touches
    a fact table.
    """
    inc = valuesets.select(
        F.col("url").alias("valueset_url"),
        F.explode("compose.include").alias("include"),
    )
    explicit = inc.filter(F.col("include.concept").isNotNull()).select(
        "valueset_url",
        F.col("include.system").alias("system"),
        F.explode("include.concept").alias("c"),
    ).select("valueset_url", "system", F.col("c.code").alias("code"))

    parts = [explicit]

    whole_system = inc.filter(F.col("include.concept").isNull()).select(
        "valueset_url", F.col("include.system").alias("system")
    )
    if codesystems is not None:
        cs_codes = codesystems.select(
            F.col("url").alias("system"),
            F.explode("concept").alias("c"),
        ).select("system", F.col("c.code").alias("code"))
        # whole-system includes are few; the CodeSystem side is the
        # larger of the two dims — broadcast the include list
        parts.append(
            cs_codes.join(F.broadcast(whole_system), "system").select(
                "valueset_url", "system", "code"
            )
        )

    snapshot = valuesets.filter(F.col("expansion").isNotNull()).select(
        F.col("url").alias("valueset_url"),
        F.explode("expansion.contains").alias("c"),
    ).select(
        "valueset_url",
        F.col("c.system").alias("system"),
        F.col("c.code").alias("code"),
    )
    parts.append(snapshot)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def member_of(
    facts: DataFrame,
    expansion: DataFrame,
    system_col: str = "system",
    code_col: str = "code",
    out_col: str = "member_of",
    broadcast: bool = True,
) -> DataFrame:
    """Append ``out_col`` (boolean): is (system_col, code_col) in the
    expansion frame (as produced by :func:`expand_valueset`, already
    filtered to ONE value set)?

    Pathling's ``memberof(uri)`` per-element call, as a columnar join:
    the expansion is deduplicated then BROADCAST, so the fact side —
    the 100 TB table — streams through a BroadcastHashJoin with no
    shuffle and no row-count change (left join on a deduped key cannot
    fan out). NULL system/code → false, matching memberof's empty-
    collection semantics.

    ``broadcast=False`` opts out for a pathological expansion too big
    for executor memory (a full SNOMED transitive closure): the join
    falls back to Spark's size-based strategy choice (shuffle join),
    trading one fact-side shuffle for bounded memory — the same
    escape hatch pattern as functions/graph.py's broadcast_threshold.
    """
    dim = (
        expansion.select(
            F.col("system").alias("__vs_system"),
            F.col("code").alias("__vs_code"),
        )
        .distinct()
        .withColumn("__vs_hit", F.lit(True))
    )
    joined = facts.join(
        F.broadcast(dim) if broadcast else dim,
        on=(
            (F.col(system_col) == F.col("__vs_system"))
            & (F.col(code_col) == F.col("__vs_code"))
        ),
        how="left",
    )
    return joined.withColumn(
        out_col, F.coalesce(F.col("__vs_hit"), F.lit(False))
    ).drop("__vs_system", "__vs_code", "__vs_hit")


def conceptmap_rules(conceptmaps: DataFrame) -> DataFrame:
    """Flatten encoded ConceptMap rows to one mapping rule per row:
    (map_url, source_system, source_code, target_system, target_code,
    equivalence). Pure explodes, linear in rule count."""
    g = conceptmaps.select(
        F.col("url").alias("map_url"),
        F.explode("group").alias("g"),
    )
    return g.select(
        "map_url",
        F.col("g.source").alias("source_system"),
        F.col("g.target").alias("target_system"),
        F.explode("g.element").alias("e"),
    ).select(
        "map_url",
        "source_system",
        "target_system",
        F.col("e.code").alias("source_code"),
        F.explode("e.target").alias("t"),
    ).select(
        "map_url",
        "source_system",
        "source_code",
        "target_system",
        F.col("t.code").alias("target_code"),
        F.col("t.equivalence").alias("equivalence"),
    )


def translate(
    facts: DataFrame,
    rules: DataFrame,
    system_col: str = "system",
    code_col: str = "code",
    keep_unmapped: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """Apply ConceptMap rules (from :func:`conceptmap_rules`, already
    filtered to ONE map) to a fact frame: appends target_system /
    target_code / equivalence for each rule matching (system_col,
    code_col).

    Pathling's ``translate(uri)``. One source code may map to several
    targets, so this CAN fan rows out — deliberate, same as the spec's
    collection result; callers needing 1:1 filter on equivalence
    first. The rules frame is the broadcast dim; the fact side never
    shuffles. ``keep_unmapped=False`` drops unmatched rows (inner
    join) instead of carrying NULL targets. ``broadcast=False`` is the
    giant-map escape hatch (see member_of).
    """
    dim = rules.select(
        F.col("source_system").alias("__cm_system"),
        F.col("source_code").alias("__cm_code"),
        "target_system",
        "target_code",
        "equivalence",
    )
    joined = facts.join(
        F.broadcast(dim) if broadcast else dim,
        on=(
            (F.col(system_col) == F.col("__cm_system"))
            & (F.col(code_col) == F.col("__cm_code"))
        ),
        how="left" if keep_unmapped else "inner",
    )
    return joined.drop("__cm_system", "__cm_code")


def codesystem_edges(codesystems: DataFrame) -> DataFrame:
    """Flatten encoded CodeSystem rows to is-a hierarchy edges:
    (system, parent_code, child_code).

    Both R4 hierarchy encodings, unioned:

    - nested ``concept[].concept[]`` containment (what
      ``hierarchyMeaning: is-a`` means structurally; typed one level
      deep in the curated schema — each fragment level still yields
      its edges because deep distributions ship as flat fragments);
    - ``concept[].property[]`` entries with code ``parent`` — how
      flat SNOMED-style fragment distributions express the hierarchy
      (child concept carries its parent's code as a property).

    Pure explodes + one distinct on the edge key; linear in concept
    count, never touches a fact table. Multiple CodeSystem resources
    sharing a url (``content: fragment`` shards) union naturally —
    edges key on the url."""
    base = codesystems.select(
        F.col("url").alias("system"), F.explode("concept").alias("c")
    )
    nested = (
        base.filter(F.col("c.concept").isNotNull())
        .select(
            "system",
            F.col("c.code").alias("parent_code"),
            F.explode("c.concept").alias("ch"),
        )
        .select("system", "parent_code", F.col("ch.code").alias("child_code"))
    )
    via_prop = (
        base.filter(F.col("c.property").isNotNull())
        .select(
            "system",
            F.col("c.code").alias("child_code"),
            F.explode("c.property").alias("p"),
        )
        .filter(
            (F.col("p.code") == "parent") & F.col("p.valueCode").isNotNull()
        )
        .select(
            "system",
            F.col("p.valueCode").alias("parent_code"),
            "child_code",
        )
    )
    return (
        nested.unionByName(via_prop)
        # malformed concepts (null codes) can't form edges
        .filter(
            F.col("parent_code").isNotNull() & F.col("child_code").isNotNull()
        )
        .distinct()
    )


def subsumed_by(
    facts: DataFrame,
    edges: DataFrame,
    ancestor_code: str,
    system: str | None = None,
    code_col: str = "code",
    system_col: str | None = None,
    out_col: str = "subsumed_by",
    direction: str = "down",
    max_depth: int = 32,
    driver_bfs_max_edges: int = 2_000_000,
) -> DataFrame:
    """Pathling's ``subsumedBy`` / ``subsumes`` terminology test as a
    columnar join: append ``out_col`` (boolean) — is the fact's code
    a descendant-or-self of ``ancestor_code`` in the CodeSystem
    hierarchy (``direction='down'``, the subsumedBy test), or an
    ancestor-or-self (``direction='up'``, the subsumes test)?

    The descendant/ancestor set is computed by semi-naive BFS over
    the hierarchy edges (:func:`~fhir_to_lakehouse_spark.functions.
    graph.bfs_hops` — per-round broadcast-vs-shuffle strategy,
    localCheckpoint lineage truncation), NOT by materializing the full
    O(N x depth) transitive closure: a subsumption query only ever
    needs ONE code's cone, which is O(subtree). The resulting code
    set — bounded by the CodeSystem size, a classic small dimension —
    is then broadcast left-joined onto the fact frame, so the 100 TB
    fact side never shuffles. DAG-shaped hierarchies (multi-parent
    codes, legal in FHIR) are fine: BFS visits each node once.

    ``max_depth`` bounds the iteration (SNOMED's deepest path is
    ~30); deeper unconverged hierarchies simply truncate the cone,
    matching bfs_hops' max_hops contract. NULL fact codes are never
    subsumed (false), matching the empty-collection semantics.

    **Where the BFS runs** — a CodeSystem hierarchy is a DIMENSION:
    the largest real one (SNOMED CT) has ~360k concepts / ~550k is-a
    edges, kilobytes-to-tens-of-MB, while the fact side is the 100 TB
    table. So when the (system-filtered) edge list fits under
    ``driver_bfs_max_edges`` — checked with a LIMIT-guarded collect
    that reads at most threshold+1 rows, the same guard pattern as the
    ViewDefinition memberOf inliner — the cone is computed as a plain
    Python BFS on the driver (microseconds; r8 measurement: the
    distributed level-synchronous loop spent ~8 s at sf0.1 purely on
    ~18 rounds of tiny-task scheduling, with chunked sync_every=4
    expansion measured NO faster because scheduling, not driver
    syncs, dominated). Pathling makes the same call: subsumption is
    answered by the terminology service off-cluster, never by an
    executor-side closure. Hierarchies above the threshold fall back
    to the distributed semi-naive BFS (sync_every=4), which scales to
    arbitrary edge counts."""
    from fhir_to_lakehouse_spark.functions.graph import bfs_hops

    if direction not in ("down", "up"):
        raise ValueError(f"direction must be 'down' or 'up', got {direction!r}")
    e = edges
    if system is not None:
        e = e.filter(F.col("system") == system)
    src, dst = (
        ("parent_code", "child_code")
        if direction == "down"
        else ("child_code", "parent_code")
    )
    spark = facts.sparkSession
    pairs = None
    if driver_bfs_max_edges and driver_bfs_max_edges > 0:
        probe = (
            e.select(F.col(src).alias("s"), F.col(dst).alias("d"))
            .limit(driver_bfs_max_edges + 1)
            .collect()
        )
        if len(probe) <= driver_bfs_max_edges:
            pairs = probe
    if pairs is not None:
        adj: dict[str, list[str]] = {}
        for r in pairs:
            adj.setdefault(r.s, []).append(r.d)
        seen = {ancestor_code}
        frontier = [ancestor_code]
        depth = 0
        while frontier and depth < max_depth:
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        nxt.append(v)
            frontier = nxt
            depth += 1
        dim = spark.createDataFrame(
            [(c,) for c in sorted(seen)], "__sub_code: string"
        ).withColumn("__sub_hit", F.lit(True))
    else:
        cone = bfs_hops(
            e,
            ancestor_code,
            src=src,
            dst=dst,
            max_hops=max_depth,
            sync_every=4,
        )
        dim = (
            cone.select(F.col("node").alias("__sub_code"))
            .distinct()
            .withColumn("__sub_hit", F.lit(True))
        )
    cond = facts[code_col] == F.col("__sub_code")
    if system_col is not None and system is not None:
        cond = cond & (facts[system_col] == F.lit(system))
    joined = facts.join(F.broadcast(dim), on=cond, how="left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("__sub_hit"), F.lit(False))
    ).drop("__sub_code", "__sub_hit")
