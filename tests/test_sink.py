"""KeyedTable sink goldens: upsert/delete/read-back/optimize/vacuum."""

from __future__ import annotations

from pyspark.sql import types as T

from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def make(spark, tmp_path):
    return KeyedTable(spark, str(tmp_path / "t.parquet"), key="id")


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_upsert_insert_then_update(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1), ("b", 2)]))
    assert t.to_df().count() == 2
    t.merge_upsert(df(spark, [("b", 20), ("c", 3)]))
    out = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert out == {"a": 1, "b": 20, "c": 3}


def test_merge_delete(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    t.merge_delete(df(spark, [("b", 0)]).select("id"))
    assert sorted(r["id"] for r in t.to_df().collect()) == ["a", "c"]


def test_delete_on_missing_table_is_noop(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_delete(df(spark, [("x", 0)]).select("id"))
    assert not t.exists()


def test_create_if_not_exists_idempotent(spark, tmp_path):
    t = make(spark, tmp_path)
    t.create_if_not_exists(SCHEMA)
    t.create_if_not_exists(SCHEMA)
    assert t.exists() and t.to_df().count() == 0


def test_optimize_compacts_files(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [(str(i), i) for i in range(100)]).repartition(8))
    t.optimize(target_files=1)
    assert t.to_df().count() == 100
    assert t.detail()["numFiles"] == 1


def test_vacuum_noop_without_garbage(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge_upsert(df(spark, [("a", 1)]))
    t.vacuum(0.0)
    assert t.to_df().count() == 1
