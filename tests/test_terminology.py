"""Golden-path truth tables for functions/terminology.py (ValueSet
expansion / memberof / ConceptMap translate) plus the broadcast-plan
guarantees the 100 TB docstrings promise."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.terminology import (
    conceptmap_rules,
    expand_valueset,
    member_of,
    translate,
)


_VS_DDL = (
    "url string, "
    "compose struct<include: array<struct<system: string,"
    " concept: array<struct<code: string>>>>>, "
    "expansion struct<timestamp: string, total: int,"
    " contains: array<struct<system: string, code: string, display: string>>>"
)


def _vs(spark, include, expansion=None, url="http://x/vs"):
    return spark.createDataFrame(
        [Row(url=url, compose=Row(include=include), expansion=expansion)],
        _VS_DDL,
    )


def _inc(system, codes):
    concept = (
        [Row(code=c) for c in codes] if codes is not None else None
    )
    return Row(system=system, concept=concept)


class TestExpandValueset:
    def test_explicit_concepts(self, spark):
        vs = _vs(spark, [_inc("http://x/cs", ["a", "b"])])
        got = {
            (r.system, r.code)
            for r in expand_valueset(vs).collect()
        }
        assert got == {("http://x/cs", "a"), ("http://x/cs", "b")}

    def test_whole_system_include_needs_codesystem(self, spark):
        vs = _vs(spark, [_inc("http://x/cs", None)])
        # without the CodeSystem frame the system's codes are
        # unknowable — the include contributes nothing (no crash)
        assert expand_valueset(vs).count() == 0
        cs = spark.createDataFrame(
            [Row(url="http://x/cs", concept=[Row(code="a"), Row(code="b")])]
        )
        got = {r.code for r in expand_valueset(vs, cs).collect()}
        assert got == {"a", "b"}

    def test_duplicates_collapse_across_shapes(self, spark):
        # 'a' appears in the explicit include AND the expansion
        # snapshot — the output is a set
        exp = Row(
            timestamp="t",
            total=2,
            contains=[
                Row(system="http://x/cs", code="a", display=None),
                Row(system="http://x/cs", code="c", display=None),
            ],
        )
        vs = _vs(spark, [_inc("http://x/cs", ["a", "b"])], expansion=exp)
        rows = expand_valueset(vs).collect()
        assert len(rows) == 3
        assert {r.code for r in rows} == {"a", "b", "c"}


class TestMemberOf:
    @pytest.fixture()
    def expansion(self, spark):
        return spark.createDataFrame(
            [Row(valueset_url="u", system="s", code="a")]
        )

    def test_hit_miss_and_null(self, spark, expansion):
        facts = spark.createDataFrame(
            [
                Row(id=1, system="s", code="a"),
                Row(id=2, system="s", code="b"),
                Row(id=3, system="other", code="a"),
                Row(id=4, system="s", code=None),
            ]
        )
        got = {
            r.id: r.member_of
            for r in member_of(facts, expansion).collect()
        }
        # null code -> false (memberof over an empty collection),
        # wrong system -> false: membership is the (system, code) PAIR
        assert got == {1: True, 2: False, 3: False, 4: False}

    def test_row_count_never_changes(self, spark, expansion):
        # a duplicated expansion row must not fan facts out
        dup = expansion.union(expansion)
        facts = spark.createDataFrame([Row(id=1, system="s", code="a")])
        assert member_of(facts, dup).count() == 1

    def test_plan_broadcasts_the_expansion(self, spark, expansion):
        facts = spark.createDataFrame([Row(id=1, system="s", code="a")])
        plan = member_of(facts, expansion)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan


class TestTranslate:
    @pytest.fixture()
    def rules(self, spark):
        cm = spark.createDataFrame(
            [
                Row(
                    url="http://x/cm",
                    group=[
                        Row(
                            source="s",
                            target="t",
                            element=[
                                Row(
                                    code="a",
                                    target=[
                                        Row(code="x", equivalence="equivalent"),
                                        Row(code="y", equivalence="wider"),
                                    ],
                                ),
                                Row(
                                    code="b",
                                    target=[
                                        Row(code="z", equivalence="equivalent")
                                    ],
                                ),
                            ],
                        )
                    ],
                )
            ]
        )
        return conceptmap_rules(cm)

    def test_rules_flatten(self, rules):
        got = {
            (r.source_code, r.target_code, r.equivalence)
            for r in rules.collect()
        }
        assert got == {
            ("a", "x", "equivalent"),
            ("a", "y", "wider"),
            ("b", "z", "equivalent"),
        }
        assert rules.columns == [
            "map_url",
            "source_system",
            "source_code",
            "target_system",
            "target_code",
            "equivalence",
        ]

    def test_multi_target_fans_out_unmapped_passes_through(self, spark, rules):
        facts = spark.createDataFrame(
            [
                Row(id=1, system="s", code="a"),
                Row(id=2, system="s", code="q"),
            ]
        )
        out = translate(facts, rules).collect()
        # 'a' -> two targets (spec collection semantics), 'q' -> one
        # NULL-target passthrough row
        by_id = {}
        for r in out:
            by_id.setdefault(r.id, []).append((r.target_code, r.equivalence))
        assert sorted(by_id[1]) == [("x", "equivalent"), ("y", "wider")]
        assert by_id[2] == [(None, None)]

    def test_keep_unmapped_false_drops(self, spark, rules):
        facts = spark.createDataFrame([Row(id=2, system="s", code="q")])
        assert translate(facts, rules, keep_unmapped=False).count() == 0

    def test_plan_broadcasts_the_rules(self, spark, rules):
        facts = spark.createDataFrame([Row(id=1, system="s", code="a")])
        plan = translate(facts, rules)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan


def test_broadcast_opt_out_plans_shuffle_join(spark):
    """broadcast=False is the giant-dim escape hatch: the plan must
    NOT force a broadcast (Spark may still pick one by size stats, so
    pin autoBroadcastJoinThreshold off for the assertion)."""
    from pyspark.sql import Row

    expansion = spark.createDataFrame(
        [Row(valueset_url="u", system="s", code="a")]
    )
    facts = spark.createDataFrame([Row(id=1, system="s", code="a")])
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            member_of(facts, expansion, broadcast=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" not in plan, plan
        got = {r.id: r.member_of for r in member_of(
            facts, expansion, broadcast=False
        ).collect()}
        assert got == {1: True}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)


# --- subsumption (codesystem_edges + subsumed_by) ------------------------

_CS_DDL = (
    "url string, "
    "concept array<struct<code: string, display: string,"
    " property: array<struct<code: string, valueCode: string>>,"
    " concept: array<struct<code: string, display: string>>>>"
)


def _hierarchy(spark):
    """Mixed-encoding DAG:       a
                                / \\
                               b   c      (b,c nested under a)
                              / \\ /
                             d    e       (property parents; e has TWO
                                           parents: b and c)
    plus an unrelated system with its own a->x edge."""
    from fhir_to_lakehouse_spark.functions.terminology import codesystem_edges

    rows = [
        Row(
            url="http://x/cs",
            concept=[
                Row(
                    code="a",
                    display=None,
                    property=None,
                    concept=[
                        Row(code="b", display=None),
                        Row(code="c", display=None),
                    ],
                ),
                Row(
                    code="d",
                    display=None,
                    property=[Row(code="parent", valueCode="b")],
                    concept=None,
                ),
                Row(
                    code="e",
                    display=None,
                    property=[
                        Row(code="parent", valueCode="b"),
                        Row(code="parent", valueCode="c"),
                        Row(code="status", valueCode="active"),
                    ],
                    concept=None,
                ),
            ],
        ),
        Row(
            url="http://other/cs",
            concept=[
                Row(
                    code="a",
                    display=None,
                    property=[Row(code="parent", valueCode=None)],
                    concept=[Row(code="x", display=None)],
                )
            ],
        ),
    ]
    return codesystem_edges(spark.createDataFrame(rows, _CS_DDL))


def test_codesystem_edges_both_encodings(spark):
    edges = {
        (r.system, r.parent_code, r.child_code)
        for r in _hierarchy(spark).collect()
    }
    assert edges == {
        ("http://x/cs", "a", "b"),
        ("http://x/cs", "a", "c"),
        ("http://x/cs", "b", "d"),
        ("http://x/cs", "b", "e"),
        ("http://x/cs", "c", "e"),
        ("http://other/cs", "a", "x"),
    }


def test_subsumed_by_down_up_and_system_scope(spark):
    from fhir_to_lakehouse_spark.functions.terminology import subsumed_by

    edges = _hierarchy(spark)
    facts = spark.createDataFrame(
        [Row(code=c) for c in ["a", "b", "c", "d", "e", "x", None]],
        "code string",
    )
    # subsumedBy(b): descendant-or-self of b = {b, d, e}; NULL false
    down = {
        r.code: r.subsumed_by
        for r in subsumed_by(facts, edges, "b", system="http://x/cs").collect()
    }
    assert down == {
        "a": False, "b": True, "c": False, "d": True, "e": True,
        "x": False, None: False,
    }
    # subsumes test (direction up) from e: ancestor-or-self through
    # BOTH parents = {e, b, c, a}
    up = {
        r.code: r.anc
        for r in subsumed_by(
            facts, edges, "e", system="http://x/cs",
            direction="up", out_col="anc",
        ).collect()
    }
    assert up == {
        "a": True, "b": True, "c": True, "d": False, "e": True,
        "x": False, None: False,
    }
    # system scoping: the other system's a->x edge never leaks in
    assert down["x"] is False
    # max_depth truncation: depth 0 keeps only the seed itself
    shallow = {
        r.code: r.subsumed_by
        for r in subsumed_by(
            facts, edges, "a", system="http://x/cs", max_depth=1
        ).collect()
    }
    assert shallow == {
        "a": True, "b": True, "c": True, "d": False, "e": False,
        "x": False, None: False,
    }
    with pytest.raises(ValueError, match="direction"):
        subsumed_by(facts, edges, "a", direction="sideways")


def test_subsumed_by_distributed_fallback_matches_driver_path(spark):
    """The large-hierarchy fallback (distributed semi-naive BFS) and
    the small-dimension driver-side BFS must agree exactly — both
    directions, including the multi-parent diamond and the
    other-system edge that must stay scoped out."""
    from fhir_to_lakehouse_spark.functions.terminology import subsumed_by

    edges = _hierarchy(spark)
    facts = spark.createDataFrame(
        [Row(code=c) for c in ["a", "b", "c", "d", "e", "x", None]],
        "code string",
    )
    for direction, seed in (("down", "b"), ("up", "e"), ("down", "a")):
        via_driver = {
            r.code: r.subsumed_by
            for r in subsumed_by(
                facts, edges, seed, system="http://x/cs", direction=direction
            ).collect()
        }
        via_cluster = {
            r.code: r.subsumed_by
            for r in subsumed_by(
                facts, edges, seed, system="http://x/cs",
                direction=direction, driver_bfs_max_edges=0,
            ).collect()
        }
        assert via_driver == via_cluster, (direction, seed)


def test_subsumed_by_limit_guard_falls_back(spark):
    """An edge list one row over the driver threshold takes the
    distributed path and still answers correctly."""
    from fhir_to_lakehouse_spark.functions.terminology import subsumed_by

    edges = _hierarchy(spark)  # 5 edges in-system, 1 out-of-system
    facts = spark.createDataFrame(
        [Row(code=c) for c in ["a", "d", "x"]], "code string"
    )
    got = {
        r.code: r.subsumed_by
        for r in subsumed_by(
            facts, edges, "a", system="http://x/cs", driver_bfs_max_edges=3
        ).collect()
    }
    assert got == {"a": True, "d": True, "x": False}
