"""Oracle-checked terminology queries: ValueSet expansion, memberof,
ConceptMap translate.

Pathling — the encoder the reference builds on
(/root/reference/src/main.py:49) — pairs resource encoding with
terminology functions (`memberof`, `translate`). These queries run the
Spark-first equivalents (functions/terminology.py) end-to-end: the
terminology artifacts are synthesized as real FHIR JSON from the part
table, decoded through `encode_resources` with the full-R4 catalog
schemas (ValueSet / CodeSystem / ConceptMap, schemas_catalog.py), then
applied to a fact frame with the terminology side broadcast.

Scale shape shared by all three: the artifact build aggregates the
code domain (25 brands / 6 types — map-side-combinable collect_set on
a one-row result), so the expensive side of every join is the fact
table, which streams through a BroadcastHashJoin unshuffled — the
plan-audit test pins that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhir_to_lakehouse_spark.functions.terminology import (
    codesystem_edges,
    conceptmap_rules,
    expand_valueset,
    member_of,
    subsumed_by,
    translate,
)
from fhir_to_lakehouse_spark.operators.bundles import encode_resources
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

_CS_BRAND = "http://example.org/cs/brand"
_CS_TYPE = "http://example.org/cs/type"
_CS_EXTRA = "http://example.org/cs/extra"
_CS_TIER = "http://example.org/cs/tier"
_VS_URL = "http://example.org/vs/selected"
_CM_URL = "http://example.org/cm/type-to-tier"

# brands whose numeric suffix is <= 12 ('Brand#1'..'Brand#12') form the
# explicit include — a strict subset of the 25-brand domain so the
# membership boolean is non-trivial on both sides
_BRAND_CUTOFF = 12


def _brand_suffix(col):
    return F.substring(col, 7, 10).cast("int")


def _valueset_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE encoded ValueSet row exercising all three include shapes:
    explicit concepts (brand subset), a whole-system include (type
    code system, no concept list), and a pre-expanded
    expansion.contains snapshot (one extra code)."""
    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    codes = part.filter(_brand_suffix(F.col("p_brand")) <= _BRAND_CUTOFF).agg(
        F.sort_array(F.collect_set("p_brand")).alias("codes")
    )
    concept = F.transform(
        F.col("codes"), lambda c: F.struct(c.alias("code"))
    )
    # both include entries must share one struct type; the whole-system
    # include carries an explicitly-null concept list (to_json omits
    # null fields, so the JSON matches hand-written FHIR)
    concept_type = T.ArrayType(T.StructType([T.StructField("code", T.StringType())]))
    vs_json = F.to_json(
        F.struct(
            F.lit("ValueSet").alias("resourceType"),
            F.lit("vs-selected").alias("id"),
            F.lit(_VS_URL).alias("url"),
            F.lit("active").alias("status"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit(_CS_BRAND).alias("system"),
                        concept.alias("concept"),
                    ),
                    F.struct(
                        F.lit(_CS_TYPE).alias("system"),
                        F.lit(None).cast(concept_type).alias("concept"),
                    ),
                ).alias("include")
            ).alias("compose"),
            F.struct(
                F.lit("2024-01-01T00:00:00Z").alias("timestamp"),
                F.lit(1).alias("total"),
                F.array(
                    F.struct(
                        F.lit(_CS_EXTRA).alias("system"),
                        F.lit("zzz").alias("code"),
                        F.lit("Extra").alias("display"),
                    )
                ).alias("contains"),
            ).alias("expansion"),
        )
    )
    return encode_resources(codes.select(vs_json.alias("resource")), "ValueSet")


def _codesystem_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE encoded CodeSystem row holding the full p_type domain —
    the target of the ValueSet's whole-system include."""
    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    codes = part.agg(F.sort_array(F.collect_set("p_type")).alias("codes"))
    cs_json = F.to_json(
        F.struct(
            F.lit("CodeSystem").alias("resourceType"),
            F.lit("cs-type").alias("id"),
            F.lit(_CS_TYPE).alias("url"),
            F.lit("active").alias("status"),
            F.lit("complete").alias("content"),
            F.size("codes").alias("count"),
            F.transform(
                F.col("codes"), lambda c: F.struct(c.alias("code"))
            ).alias("concept"),
        )
    )
    return encode_resources(codes.select(cs_json.alias("resource")), "CodeSystem")


def _conceptmap_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE encoded ConceptMap row mapping every p_type except
    'STANDARD' to a tier code — the gap exercises unmapped-source
    passthrough."""
    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    codes = part.filter(F.col("p_type") != "STANDARD").agg(
        F.sort_array(F.collect_set("p_type")).alias("codes")
    )
    element = F.transform(
        F.col("codes"),
        lambda c: F.struct(
            c.alias("code"),
            F.array(
                F.struct(
                    F.concat(F.lit("tier-"), F.lower(c)).alias("code"),
                    F.lit("equivalent").alias("equivalence"),
                )
            ).alias("target"),
        ),
    )
    cm_json = F.to_json(
        F.struct(
            F.lit("ConceptMap").alias("resourceType"),
            F.lit("cm-type-tier").alias("id"),
            F.lit(_CM_URL).alias("url"),
            F.lit("active").alias("status"),
            F.lit("type to tier").alias("description"),
            F.array(
                F.struct(
                    F.lit(_CS_TYPE).alias("source"),
                    F.lit(_CS_TIER).alias("target"),
                    element.alias("element"),
                )
            ).alias("group"),
        )
    )
    return encode_resources(codes.select(cm_json.alias("resource")), "ConceptMap")


@query(
    "terminology_expand_valueset",
    oracle=f"""
    SELECT '{_VS_URL}' AS valueset_url, '{_CS_BRAND}' AS system, p_brand AS code
    FROM (SELECT DISTINCT p_brand FROM part
          WHERE CAST(SUBSTRING(p_brand, 7) AS INT) <= {_BRAND_CUTOFF})
    UNION
    SELECT '{_VS_URL}', '{_CS_TYPE}', p_type
    FROM (SELECT DISTINCT p_type FROM part)
    UNION
    SELECT '{_VS_URL}', '{_CS_EXTRA}', 'zzz'
    """,
)
def terminology_expand_valueset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$expand over encoded resources: a ValueSet whose compose mixes
    an explicit concept list, a whole-system include satisfied from an
    encoded CodeSystem, and a carried expansion snapshot flattens to
    one (valueset_url, system, code) membership set. All three shapes
    land distinct-unioned; nothing touches a fact table."""
    return expand_valueset(
        _valueset_df(spark, sf_dir), _codesystem_df(spark, sf_dir)
    ).select("valueset_url", "system", "code")


@query(
    "terminology_memberof",
    oracle=f"""
    SELECT p_partkey,
           p_brand AS code,
           CAST(SUBSTRING(p_brand, 7) AS INT) <= {_BRAND_CUTOFF} AS is_member
    FROM part
    """,
)
def terminology_memberof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathling's memberof() as a columnar operator: every part row's
    brand coding is tagged with membership in the expanded ValueSet.
    The expansion (a few dozen codes) broadcasts; the part fact side
    streams through unshuffled with its row count provably unchanged
    (left join on a deduped key)."""
    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    expansion = expand_valueset(
        _valueset_df(spark, sf_dir), _codesystem_df(spark, sf_dir)
    ).filter(F.col("system") == _CS_BRAND)
    facts = part.select(
        "p_partkey",
        F.lit(_CS_BRAND).alias("system"),
        F.col("p_brand").alias("code"),
    )
    return member_of(facts, expansion, out_col="is_member").select(
        "p_partkey", "code", "is_member"
    )


@query(
    "terminology_translate",
    oracle="""
    SELECT p_partkey,
           p_type AS source_code,
           CASE WHEN p_type <> 'STANDARD'
                THEN 'tier-' || LOWER(p_type) END AS target_code,
           CASE WHEN p_type <> 'STANDARD'
                THEN 'equivalent' END AS equivalence
    FROM part
    """,
)
def terminology_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathling's translate() as a columnar operator: ConceptMap rules
    (flattened from the encoded resource) map each part row's type
    code to a tier code; the deliberately-unmapped 'STANDARD' source
    passes through with NULL targets. Rules broadcast; the fact side
    never shuffles."""
    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    rules = conceptmap_rules(_conceptmap_df(spark, sf_dir)).filter(
        F.col("map_url") == _CM_URL
    )
    facts = part.select(
        "p_partkey",
        F.lit(_CS_TYPE).alias("system"),
        F.col("p_type").alias("code"),
    )
    return translate(facts, rules).select(
        "p_partkey",
        F.col("code").alias("source_code"),
        "target_code",
        "equivalence",
    )


_CS_TREE = "http://example.org/cs/parttree"


@query(
    "terminology_subsumed_by",
    oracle="""
    WITH RECURSIVE sub(k) AS (
        SELECT 3
        UNION ALL
        SELECT p.p_partkey
        FROM part p, sub s
        WHERE p.p_partkey // 2 = s.k AND p.p_partkey > 3
    )
    SELECT CAST(k AS VARCHAR) AS code FROM sub
    """,
)
def terminology_subsumed_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathling's subsumedBy test end to end over a DEEP hierarchy:
    the part keys form a binary tree (parent = k div 2, depth ~log2 N
    — 15 levels at sf0.01, 18 at sf0.1), shipped as flat CodeSystem
    FRAGMENT shards (512 concepts per resource, hierarchy as
    concept.property 'parent' entries — the SNOMED distribution
    shape), decoded through the full-R4 catalog schema, flattened to
    edges, and BFS'd from code '3' (functions/terminology.subsumed_by
    -> graph.bfs_hops: semi-naive, per-round broadcast-vs-shuffle
    pick, localCheckpoint lineage truncation). Facts keep only codes
    in the subsumption cone. The oracle is the recursive CTE stating
    the same subtree — an ITERATIVE Spark algorithm value-checked
    against declarative recursion, like graph_reachability_bfs."""
    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    k = F.col("p_partkey")
    parent = F.expr("CAST(p_partkey / 2 AS INT)").cast("string")
    concept = F.struct(
        k.cast("string").alias("code"),
        F.when(
            k >= 2,
            F.array(
                F.struct(
                    F.lit("parent").alias("code"),
                    parent.alias("valueCode"),
                )
            ),
        ).alias("property"),
    )
    cs = part.groupBy(F.floor(k / 512).alias("frag")).agg(
        F.collect_list(concept).alias("concepts")
    )
    cs_json = F.to_json(
        F.struct(
            F.lit("CodeSystem").alias("resourceType"),
            F.concat(F.lit("frag-"), F.col("frag").cast("string")).alias("id"),
            F.lit(_CS_TREE).alias("url"),
            F.lit("fragment").alias("content"),
            F.lit("is-a").alias("hierarchyMeaning"),
            F.col("concepts").alias("concept"),
        )
    )
    enc = encode_resources(cs.select(cs_json.alias("resource")), "CodeSystem")
    edges = codesystem_edges(enc)
    facts = part.select(k.cast("string").alias("code"))
    out = subsumed_by(facts, edges, "3", system=_CS_TREE)
    return out.filter(F.col("subsumed_by")).select("code")


@query(
    "fhir_validation_summary",
    oracle=f"""
    SELECT rule, violations, checked FROM (
      SELECT 'status_required' AS rule,
             SUM(CASE WHEN p_partkey % 7 = 0 THEN 1 ELSE 0 END) AS violations,
             COUNT(*) AS checked FROM part
      UNION ALL
      SELECT 'status_final',
             SUM(CASE WHEN p_partkey % 7 = 0 OR p_partkey % 5 = 0
                      THEN 1 ELSE 0 END),
             COUNT(*) FROM part
      UNION ALL
      SELECT 'has_subject',
             SUM(CASE WHEN p_partkey % 3 = 0 THEN 1 ELSE 0 END),
             COUNT(*) FROM part
      UNION ALL
      SELECT 'id_shape',
             SUM(CASE WHEN p_partkey % 11 = 0 THEN 1 ELSE 0 END),
             COUNT(*) FROM part
      UNION ALL
      SELECT 'code_bound',
             SUM(CASE WHEN CAST(SUBSTRING(p_brand, 7) AS INT)
                      > {_BRAND_CUTOFF} THEN 1 ELSE 0 END),
             COUNT(*) FROM part
    )
    """,
)
def fhir_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile validation end to end (operators/validation.py): five
    rule types — required, fixed value, cardinality, id-shape regex,
    ValueSet binding (answered from the SAME encoded terminology
    artifacts the memberof queries expand) — over Observations with
    deterministically injected faults, folded to per-rule violation
    counts in ONE scan + one global aggregate. The oracle recomputes
    each fault population straight from the source table."""
    from fhir_to_lakehouse_spark.functions.terminology import expand_valueset
    from fhir_to_lakehouse_spark.operators.validation import (
        validation_summary,
    )

    part = fan_out_small_scan(load_table(spark, sf_dir, "part"))
    k = F.col("p_partkey")
    rid = F.when(
        k % 11 == 0, F.concat(F.lit("bad id "), k.cast("string"))
    ).otherwise(F.concat(F.lit("o"), k.cast("string")))
    status = F.when(k % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.when(k % 5 == 0, "draft").otherwise("final")
    )
    subject = F.when(
        k % 3 != 0,
        F.struct(
            F.concat(F.lit("Patient/"), k.cast("string")).alias("reference")
        ),
    )
    resource = F.to_json(
        F.struct(
            F.lit("Observation").alias("resourceType"),
            rid.alias("id"),
            status.alias("status"),
            subject.alias("subject"),
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
    spec = {
        "resource": "Observation",
        "rules": [
            {"key": "status_required", "type": "required", "path": "status"},
            {"key": "status_final", "type": "fixed", "path": "status",
             "value": "final"},
            {"key": "has_subject", "type": "cardinality",
             "path": "subject.reference", "min": 1},
            {"key": "id_shape", "type": "regex", "path": "id",
             "pattern": r"^[A-Za-z0-9\-\.]{1,64}$"},
            {"key": "code_bound", "type": "binding", "path": "code",
             "valueSet": _VS_URL},
        ],
    }
    expansion = expand_valueset(
        _valueset_df(spark, sf_dir), _codesystem_df(spark, sf_dir)
    )
    return validation_summary(spec, enc, valuesets=expansion)
