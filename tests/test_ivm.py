"""Incremental view maintenance: the maintained aggregate must equal a
full recompute after every merge — the CDF consumer contract."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhir_to_lakehouse_spark.operators.ivm import maintain_view
from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _recompute(table_df):
    return {
        r["grp"]: (r["n"], round(r["total"], 6))
        for r in table_df.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("total"))
        .collect()
    }


def _view_dict(view):
    return {r["grp"]: (r["n"], round(r["total"], 6)) for r in view.collect()}


def test_maintained_view_tracks_merges(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t.parquet"), key="id", changelog=True)
    view = None
    next_version = 0

    batches = [
        # inserts across two groups
        [("a", "x", 10.0), ("b", "x", 5.0), ("c", "y", 1.0)],
        # update a (x: amount 10 -> 2), insert d into y
        [("a", "x", 2.0), ("d", "y", 4.0)],
        # move b from group x to group y (update changes the group key)
        [("b", "y", 5.0)],
    ]
    for rows in batches:
        t.merge_upsert(spark.createDataFrame(rows, SCHEMA))
        changes = t.table_changes(starting_version=next_version)
        next_version = t.changelog_version() + 1
        view = maintain_view(view, changes, ["grp"], "amount")
        assert _view_dict(view) == _recompute(t.to_df())

    # deletes drain groups; empty groups disappear from the view
    t.merge_delete(spark.createDataFrame([("c",), ("d",)], "id STRING"))
    view = maintain_view(
        view, t.table_changes(starting_version=next_version), ["grp"], "amount"
    )
    assert _view_dict(view) == _recompute(t.to_df())
    t.merge_delete(spark.createDataFrame([("a",), ("b",)], "id STRING"))
    view = maintain_view(
        view,
        t.table_changes(starting_version=t.changelog_version()),
        ["grp"],
        "amount",
    )
    assert _view_dict(view) == _recompute(t.to_df()) == {}
