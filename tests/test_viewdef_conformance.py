"""SQL-on-FHIR v2 conformance-suite fixtures through compile_view.

The public spec ships machine-readable test cases (the sql-on-fhir-v2
repo's ``tests/*.json``: a resource set, a ViewDefinition, expected
rows). This vendored subset mirrors that format and coverage areas —
basic selection, FHIRPath functions, where clauses, constants,
forEach/forEachOrNull, unionAll, collection columns, and compile-time
validation — and drives every case through the real pipeline:
resources serialized to JSON -> encode_resources -> compile_view ->
collected rows compared as an order-insensitive multiset against the
fixture's ``expect``. ``expectError`` cases must raise
ViewCompileError. Cases the compiler's documented subset does not
cover are xfailed by (file, title) in UNSUPPORTED with the reason —
the same pass/xfail accounting the spec's implementation reports use.

Reference parity anchor: the reference gets this layer via Pathling,
which is validated against the same public suite.
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import os

import pytest

from fhir_to_lakehouse_spark.operators.view_definition import (
    ViewCompileError,
    compile_view,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "fixtures", "sof_conformance"
)

# (file, test title) -> reason. Empty today: every vendored case is in
# the supported subset. When a new fixture lands that the compiler
# can't express yet, record it here instead of deleting the case.
UNSUPPORTED: dict[tuple[str, str], str] = {}


def _load_cases():
    cases = []
    for fname in sorted(os.listdir(FIXTURE_DIR)):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(FIXTURE_DIR, fname)) as fh:
            suite = json.load(fh)
        for test in suite["tests"]:
            cases.append(
                pytest.param(
                    suite["resources"],
                    test,
                    id=f"{fname[:-5]}::{test['title'].replace(' ', '_')}",
                    marks=(
                        [pytest.mark.xfail(
                            reason=UNSUPPORTED[(fname, test["title"])],
                            strict=True,
                        )]
                        if (fname, test["title"]) in UNSUPPORTED
                        else []
                    ),
                )
            )
    return cases


def _norm(v):
    """Normalize a collected Spark cell for JSON-literal comparison."""
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, (dt.date, dt.datetime)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _norm_expected(v):
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, list):
        return tuple(_norm_expected(x) for x in v)
    return v


def _encode(spark, resources, rtype):
    from fhir_to_lakehouse_spark.operators.bundles import encode_resources

    payloads = [
        (json.dumps(r),) for r in resources if r.get("resourceType") == rtype
    ]
    if not payloads:
        pytest.fail(f"fixture has no {rtype} resources")
    df = spark.createDataFrame(payloads, "resource: string")
    return encode_resources(df, rtype)


@pytest.mark.parametrize("resources,test", _load_cases())
def test_conformance_case(spark, resources, test):
    view = test["view"]
    if test.get("expectError"):
        with pytest.raises(ViewCompileError):
            # some invalid views only fail once the plan is executed
            # against the encoded frame; force the action inside
            enc = _encode(spark, resources, view.get("resource", "Patient"))
            compile_view(view, enc).collect()
        return
    enc = _encode(spark, resources, view["resource"])
    got = compile_view(view, enc)
    # declared column order is part of the contract
    declared = []

    def walk(selects):
        for sel in selects:
            for c in sel.get("column", []) or []:
                declared.append(c["name"])
            if sel.get("select"):
                walk(sel["select"])
            for b in sel.get("unionAll", []) or []:
                walk([b])

    walk(view["select"])
    # unionAll branches repeat the same names — dedupe, keep order
    want_cols = list(dict.fromkeys(declared))
    assert got.columns == want_cols
    rows = [tuple(_norm(r[c]) for c in want_cols) for r in got.collect()]
    expected = [
        tuple(_norm_expected(e.get(c)) for c in want_cols)
        for e in test["expect"]
    ]
    assert sorted(rows, key=repr) == sorted(expected, key=repr), (
        f"view rows diverge\n got: {sorted(rows, key=repr)}\n "
        f"want: {sorted(expected, key=repr)}"
    )
