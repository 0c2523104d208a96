"""Batch Observation-API write metrics (operators/observed_write.py):
QA numbers must come from the write job itself and match the written
data exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from fhir_to_lakehouse_spark.operators.observed_write import (
    null_fraction_metrics,
    write_parquet_observed,
)


def test_default_metric_is_row_count(spark, tmp_path):
    df = spark.range(100).select(F.col("id"))
    got = write_parquet_observed(df, str(tmp_path / "t1"))
    assert got == {"rows_written": 100}
    assert spark.read.parquet(str(tmp_path / "t1")).count() == 100


def test_custom_metrics_match_written_rows(spark, tmp_path):
    df = spark.range(1000).select(
        "id",
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") * 2)
        .alias("v"),
    )
    got = write_parquet_observed(
        df,
        str(tmp_path / "t2"),
        metrics={
            "rows_written": F.count(F.lit(1)),
            "null_v": F.count_if(F.col("v").isNull()),
            "max_v": F.max("v"),
        },
    )
    assert got["rows_written"] == 1000
    assert got["null_v"] == 100
    assert got["max_v"] == 1998
    # the metrics describe the WRITTEN rows — re-reading agrees
    back = spark.read.parquet(str(tmp_path / "t2"))
    assert back.filter("v IS NULL").count() == got["null_v"]


def test_null_fraction_metrics_helper(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c")], "x int, y string"
    )
    got = write_parquet_observed(
        df, str(tmp_path / "t3"), metrics=null_fraction_metrics(df)
    )
    assert got == {"rows_written": 3, "nulls_x": 1, "nulls_y": 1}
