"""Profile-style resource validation over encoded frames — the
engine-side analog of a FHIR validator's structural checks (required
elements, cardinality, fixed values, id/regex shape, ValueSet
bindings), compiled to ONE Spark scan.

The reference stack validates through Pathling/HAPI at the API edge
(/root/reference/src/main.py:49 pulls the Pathling engine in); in a
lakehouse the same question — "which stored resources violate the
profile?" — is a columnar query. A validation spec is a dict:

    {"resource": "Observation",
     "rules": [
       {"key": "status-required", "type": "required", "path": "status"},
       {"key": "status-fixed",    "type": "fixed",  "path": "status",
        "value": "final"},
       {"key": "one-subject",     "type": "cardinality", "path": "subject",
        "min": 1},
       {"key": "id-shape",        "type": "regex", "path": "id",
        "pattern": "^[A-Za-z0-9\\-\\.]{1,64}$"},
       {"key": "code-binding",    "type": "binding", "path": "code",
        "valueSet": "http://..."}]}

Rule paths use the SAME FHIRPath subset as ViewDefinition columns
(view_definition._resolve, collection mode — so ``name.given`` counts
every given). ``validate`` returns one row per resource with a
boolean per rule key (True = VIOLATION, so the frame sums directly);
``validation_summary`` folds that to one row per rule (violations /
checked) in a single map-side-combinable aggregate — the shape of
plans/quality_checks.py's Deequ-style suite, applied to FHIR.

100 TB shape: every rule is a codegen'd column expression over the
one scan; binding expansions fold to LITERAL arrays (bounded by
``max_inline_codes``, raising — never silently degrading — beyond
it; profile bindings are small code lists, and a giant-ValueSet
membership question belongs to functions/terminology.member_of's
broadcast join, not a per-rule literal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhir_to_lakehouse_spark.operators.view_definition import (
    ViewCompileError,
    _codings_array,
    _resolve,
)
from fhir_to_lakehouse_spark.schemas import schema_for


class ValidationSpecError(ValueError):
    """A validation spec uses an unknown rule type or a path outside
    the supported subset."""


def _binding_pred(
    arr, pairs: DataFrame, url: str, max_inline_codes: int
):
    probe = (
        pairs.filter(F.col("valueset_url") == url)
        .select("system", "code")
        .limit(max_inline_codes + 1)
        .collect()
    )
    if len(probe) > max_inline_codes:
        raise ValidationSpecError(
            f"binding {url!r}: expansion exceeds max_inline_codes="
            f"{max_inline_codes} — use functions/terminology.member_of "
            "for giant value sets"
        )
    if not probe:
        return F.lit(False)
    lit_arr = F.array(
        *[
            F.struct(
                F.lit(r["system"]).alias("system"),
                F.lit(r["code"]).alias("code"),
            )
            for r in probe
        ]
    )
    return F.coalesce(
        F.exists(
            arr,
            lambda c: F.array_contains(
                lit_arr,
                F.struct(c["system"].alias("system"), c["code"].alias("code")),
            ),
        ),
        F.lit(False),
    )


def validate(
    spec: dict,
    encoded: DataFrame,
    valuesets: DataFrame | None = None,
    max_inline_codes: int = 4096,
) -> DataFrame:
    """One row per resource: ``id`` plus a BOOLEAN per rule key —
    True means the resource VIOLATES that rule. Single projection,
    no shuffle, no Python."""
    rtype = spec.get("resource")
    if not rtype:
        raise ValidationSpecError("validation spec needs a 'resource'")
    schema = schema_for(
        rtype, include_extensions="extension" in encoded.columns
    )
    if len(schema_for(rtype).fields) <= 1:
        raise ValidationSpecError(f"{rtype!r} has no curated schema")

    cols = [F.col("id")]
    seen: set[str] = set()
    for rule in spec.get("rules", []) or []:
        key, rt, path = rule.get("key"), rule.get("type"), rule.get("path")
        if not key or key in seen:
            raise ValidationSpecError(f"rule needs a unique 'key': {rule}")
        seen.add(key)
        if not path:
            raise ValidationSpecError(f"rule {key!r} needs a 'path'")
        try:
            col, cdt = _resolve(None, schema, path, allow_collection=True)
        except ViewCompileError as e:
            raise ValidationSpecError(f"rule {key!r}: {e}") from e
        if rt == "required":
            if isinstance(cdt, T.ArrayType):
                ok = F.coalesce(F.size(col), F.lit(0)) > 0
            else:
                ok = col.isNotNull()
        elif rt == "cardinality":
            lo = rule.get("min", 0)
            hi = rule.get("max")
            if isinstance(cdt, T.ArrayType):
                n = F.coalesce(F.size(col), F.lit(0))
            else:
                n = F.when(col.isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ok = n >= F.lit(lo)
            if hi is not None:
                ok = ok & (n <= F.lit(hi))
        elif rt == "fixed":
            if "value" not in rule:
                raise ValidationSpecError(f"rule {key!r} needs a 'value'")
            if isinstance(cdt, (T.ArrayType, T.StructType)):
                raise ValidationSpecError(
                    f"rule {key!r}: fixed needs a primitive path"
                )
            # absent element -> violation (a fixed value is required)
            ok = col == F.lit(rule["value"])
            ok = F.coalesce(ok, F.lit(False))
        elif rt == "regex":
            pat = rule.get("pattern")
            if not pat:
                raise ValidationSpecError(f"rule {key!r} needs a 'pattern'")
            if not isinstance(cdt, T.StringType):
                raise ValidationSpecError(
                    f"rule {key!r}: regex needs a string path"
                )
            # regex constrains PRESENT values only (absent passes —
            # pair with a `required` rule to forbid absence)
            ok = F.coalesce(col.rlike(pat), F.lit(True))
        elif rt == "binding":
            url = rule.get("valueSet")
            if not url:
                raise ValidationSpecError(f"rule {key!r} needs a 'valueSet'")
            if valuesets is None:
                raise ValidationSpecError(
                    f"rule {key!r} uses a binding — pass the valuesets "
                    "expansion frame"
                )
            arr = _codings_array(col, cdt, path)
            member = _binding_pred(arr, valuesets, url, max_inline_codes)
            # absent codings violate a required binding only when the
            # element itself is present-but-unbound; pair with
            # `required` to forbid absence entirely
            ok = F.when(col.isNull(), F.lit(True)).otherwise(member)
        else:
            raise ValidationSpecError(
                f"rule {key!r}: unknown type {rt!r} (have: required, "
                "cardinality, fixed, regex, binding)"
            )
        cols.append((~ok).alias(key))
    if len(cols) == 1:
        raise ValidationSpecError("validation spec declares no rules")
    return encoded.select(*cols)


def validation_summary(
    spec: dict,
    encoded: DataFrame,
    valuesets: DataFrame | None = None,
    max_inline_codes: int = 4096,
) -> DataFrame:
    """One row per rule: (rule, violations, checked) — the whole
    suite in a single scan + one map-side-combinable global
    aggregate, unpivoted via stack like
    plans/quality_checks.quality_constraint_checks."""
    flags = validate(spec, encoded, valuesets, max_inline_codes)
    keys = [c for c in flags.columns if c != "id"]
    agg = flags.agg(
        F.count(F.lit(1)).alias("checked"),
        *[
            F.sum(F.col(k).cast("long")).alias(f"__v_{k}")
            for k in keys
        ],
    )
    stack = ", ".join(f"'{k}', __v_{k}" for k in keys)
    return agg.selectExpr(
        f"stack({len(keys)}, {stack}) as (rule, violations)", "checked"
    ).select("rule", "violations", "checked")
