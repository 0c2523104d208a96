"""Z-order layout: bit-interleave correctness and locality property."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.layout import morton_key, morton_key_sql


def _interleave2(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in (0, 1, 3, 77, 255) for y in (0, 2, 128, 255)]
    df = spark.createDataFrame(rows, "bx INT, by INT").withColumn(
        "z", morton_key(["bx", "by"], 8)
    )
    for r in df.collect():
        assert r.z == _interleave2(r.bx, r.by), (r.bx, r.by)


def test_morton_sql_generator_is_bit_identical(spark):
    import duckdb

    expr = morton_key_sql(["bx", "by"], 8)
    con = duckdb.connect()
    for bx, by in [(0, 0), (5, 9), (255, 1), (170, 85)]:
        want = _interleave2(bx, by)
        got = con.execute(
            f"SELECT {expr} FROM (SELECT {bx} AS bx, {by} AS by)"
        ).fetchone()[0]
        assert got == want


def test_zorder_page_locality(spark):
    """Sorting by the Morton key bounds the per-page span in BOTH
    dimensions (a lexicographic (bx, by) sort bounds only bx): every
    256-key Z-page is a 16x16 tile."""
    df = spark.range(0, 1 << 16).select(
        (F.col("id") % 256).cast("int").alias("bx"),
        (F.col("id") / 256).cast("int").alias("by"),
    )
    pages = (
        df.withColumn("z", morton_key(["bx", "by"], 8))
        .withColumn("z_page", F.shiftright("z", 8))
        .groupBy("z_page")
        .agg(
            (F.max("bx") - F.min("bx")).alias("span_x"),
            (F.max("by") - F.min("by")).alias("span_y"),
        )
        .agg(F.max("span_x").alias("sx"), F.max("span_y").alias("sy"))
        .first()
    )
    assert pages.sx <= 15 and pages.sy <= 15


def test_morton_rejects_overflow():
    import pytest

    with pytest.raises(ValueError):
        morton_key(["a", "b", "c", "d"], 16)
