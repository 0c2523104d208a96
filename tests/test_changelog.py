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
