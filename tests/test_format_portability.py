"""Source-format portability: the engine's plans are format-agnostic —
the same logical query over the same rows must return identical results
whether the table arrives as parquet, ORC, CSV, or JSON lines (all four
readers are Spark built-ins; ORC jars ship in this distribution, unlike
the avro/protobuf connectors — see COVERAGE.md). Pins both directions:
writers round-trip without row loss, and a q1-shaped aggregate is
value-identical across formats."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.sources.tables import load_table


def _agg(df):
    # DECIMAL-cast money sums (the repo's oracle float rule): each
    # format rewrite changes scan splits and thus double-sum merge
    # order, so a double SUM rounded to 2dp could flip near a boundary
    # while decimal partial sums are exact under any layout
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("string")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("string")
            .alias("sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def test_same_answers_across_parquet_orc_csv_json(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    want = [tuple(r) for r in _agg(li).collect()]
    n = li.count()

    # ORC: full schema fidelity, like parquet
    orc_dir = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(orc_dir)
    orc = spark.read.orc(orc_dir)
    assert orc.count() == n
    assert orc.schema == li.schema
    assert [tuple(r) for r in _agg(orc).collect()] == want

    # CSV: schema must be re-imposed (text format); dates round-trip
    # through the default ISO encoding
    csv_dir = str(tmp_path / "li_csv")
    li.write.mode("overwrite").option("header", "true").csv(csv_dir)
    csv = spark.read.schema(li.schema).option("header", "true").csv(csv_dir)
    assert csv.count() == n
    assert [tuple(r) for r in _agg(csv).collect()] == want

    # JSON lines: schema re-imposed to pin long-vs-double inference
    json_dir = str(tmp_path / "li_json")
    li.write.mode("overwrite").json(json_dir)
    js = spark.read.schema(li.schema).json(json_dir)
    assert js.count() == n
    assert [tuple(r) for r in _agg(js).collect()] == want
