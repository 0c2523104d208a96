"""Change Data Feed analog on the parquet fallback sink: change types,
version increments, incremental reads, and replay reconstruction.

(Delta's own CDF is delta.enableChangeDataFeed + table_changes(); this
certifies the same contract on the fallback backend.)
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _table(spark, tmp_path):
    return KeyedTable(
        spark, str(tmp_path / "t.parquet"), key="id", changelog=True
    )


def test_change_types_across_merges(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_upsert(_df(spark, [("a", 1), ("b", 2)]))           # v0: 2 inserts
    t.merge_upsert(_df(spark, [("b", 20), ("c", 3)]))          # v1: update b, insert c
    t.merge_delete(_df(spark, [("a", 0)]).select("id"))        # v2: delete a
    assert t.changelog_version() == 2

    v0 = t.table_changes(0).filter("commit_version = 0")
    assert {r["_change_type"] for r in v0.collect()} == {"insert"}

    v1 = {(r["id"], r["_change_type"]): r["v"] for r in
          t.table_changes(1).filter("commit_version = 1").collect()}
    assert v1[("b", "update_preimage")] == 2
    assert v1[("b", "update_postimage")] == 20
    assert v1[("c", "insert")] == 3

    v2 = t.table_changes(2).collect()
    assert [(r["id"], r["_change_type"], r["v"]) for r in v2] == [
        ("a", "delete", 1)
    ]


def test_incremental_read_prunes_old_versions(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_upsert(_df(spark, [("a", 1)]))
    t.merge_upsert(_df(spark, [("a", 2)]))
    since_1 = t.table_changes(starting_version=1)
    assert [
        r["commit_version"]
        for r in since_1.select("commit_version").distinct().collect()
    ] == [1]
    # consumer sees only the v1 update pair, not the v0 insert
    assert {r["_change_type"] for r in since_1.collect()} == {
        "update_preimage", "update_postimage",
    }


def test_replaying_changelog_reconstructs_table(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_upsert(_df(spark, [("a", 1), ("b", 2)]))
    t.merge_upsert(_df(spark, [("a", 10), ("c", 3)]))
    t.merge_delete(_df(spark, [("b", 0)]).select("id"))
    t.merge_upsert(_df(spark, [("d", 4)]))

    # fold the feed in version order onto an empty state
    state: dict[str, int] = {}
    changes = t.table_changes(0).orderBy("commit_version").collect()
    for r in sorted(changes, key=lambda r: r["commit_version"]):
        if r["_change_type"] in ("insert", "update_postimage"):
            state[r["id"]] = r["v"]
        elif r["_change_type"] == "delete":
            state.pop(r["id"], None)
    want = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert state == want


def test_changelog_off_by_default(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t.parquet"), key="id")
    t.merge_upsert(_df(spark, [("a", 1)]))
    assert t.changelog_version() == -1


def test_as_of_reconstructs_each_version(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_upsert(_df(spark, [("a", 1), ("b", 2)]))        # v0
    t.merge_upsert(_df(spark, [("a", 10), ("c", 3)]))       # v1
    t.merge_delete(_df(spark, [("b", 0)]).select("id"))     # v2

    def snap(v):
        return {r["id"]: r["v"] for r in t.as_of(v).collect()}

    assert snap(0) == {"a": 1, "b": 2}
    assert snap(1) == {"a": 10, "b": 2, "c": 3}
    assert snap(2) == {"a": 10, "c": 3}
    assert snap(-1) == {}


def test_restore_to_is_a_new_commit_preserving_history(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_upsert(_df(spark, [("a", 1), ("b", 2)]))        # v0
    t.merge_upsert(_df(spark, [("a", 10), ("c", 3)]))       # v1
    t.merge_delete(_df(spark, [("b", 0)]).select("id"))     # v2
    v_before = t.changelog_version()

    t.restore_to(0)

    # table content is the v0 state
    assert {r["id"]: r["v"] for r in t.to_df().collect()} == {"a": 1, "b": 2}
    # the restore appended exactly one new commit (history intact)
    assert t.changelog_version() == v_before + 1
    # the restore diff reads as ordinary changes: c deleted, b re-inserted,
    # a updated 10 -> 1
    diff = t.table_changes(v_before + 1).collect()
    by_type = {}
    for r in diff:
        by_type.setdefault(r["_change_type"], set()).add((r["id"], r["v"]))
    assert by_type["delete"] == {("c", 3)}
    assert by_type["insert"] == {("b", 2)}
    assert by_type["update_preimage"] == {("a", 10)}
    assert by_type["update_postimage"] == {("a", 1)}
    # and as_of still reproduces the pre-restore state
    assert {r["id"]: r["v"] for r in t.as_of(2).collect()} == {"a": 10, "c": 3}


def test_as_of_requires_changelog(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t.parquet"), key="id")
    t.merge_upsert(_df(spark, [("a", 1)]))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="changelog"):
        t.as_of(0)


def test_change_feed_survives_schema_widening(spark, tmp_path):
    """An encoder-catalog upgrade widens nested struct columns; the
    append-only changelog then holds files with BOTH schemas. The
    change feed must merge them — before the mergeSchema fix, Spark
    sampled one file's schema and silently dropped the new nested
    field from every post-image, corrupting as_of and incremental
    view refresh."""
    from pyspark.sql import Row

    t = KeyedTable(spark, str(tmp_path / "T.parquet"), changelog=True)
    t.merge_upsert(
        spark.createDataFrame(
            [Row(id="a", s=Row(x="1"))], "id string, s struct<x:string>"
        )
    )
    t.merge_upsert(
        spark.createDataFrame(
            [Row(id="b", s=Row(x="2", y="new"))],
            "id string, s struct<x:string, y:string>",
        )
    )
    ch = t.table_changes(0)
    assert "y:string" in ch.schema.simpleString()
    by_id = {r["id"]: r["s"] for r in ch.collect()}
    # old-commit rows widen with null; new-commit rows KEEP their data
    assert by_id["a"].asDict() == {"x": "1", "y": None}
    assert by_id["b"].asDict() == {"x": "2", "y": "new"}
    state = {r["id"]: r["s"] for r in t.as_of(t.changelog_version()).collect()}
    assert state["b"]["y"] == "new"
