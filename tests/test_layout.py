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


def test_zorder_write_skips_files_on_nonleading_dimension(spark, sf_dir, tmp_path):
    """Write the same data (a) sorted by bx only and (b) sorted by the
    Morton key of (bx, by), 16 files each; a by-range predicate must
    touch every file of the linear layout but only a fraction of the
    Z-ordered one — min/max file stats are what Delta/parquet skipping
    consumes, so fewer overlapping files = fewer files read at 100 TB."""
    from fhir_to_lakehouse_spark.sources.tables import load_table

    # orderkey/partkey both spread over the full bucket range at every
    # sf (suppkey at sf0.001 has ~10 values — useless as a dimension)
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 256).cast("int").alias("bx"),
        (F.col("l_partkey") % 256).cast("int").alias("by"),
        "l_quantity",
    )

    linear = str(tmp_path / "linear")
    li.repartitionByRange(16, "bx").sortWithinPartitions("bx").write.parquet(linear)
    zpath = str(tmp_path / "zorder")
    z = morton_key(["bx", "by"], 8)
    (
        li.withColumn("z", z)
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.parquet(zpath)
    )

    def files_touched(path, lo, hi):
        stats = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(F.min("by").alias("mn"), F.max("by").alias("mx"))
            .collect()
        )
        return sum(1 for r in stats if r.mn <= hi and r.mx >= lo), len(stats)

    lin_touched, lin_total = files_touched(linear, 0, 31)
    z_touched, z_total = files_touched(zpath, 0, 31)
    # linear-by-bx layout: every file spans all of by
    assert lin_touched == lin_total
    # Z-order: a 1/8th by-slice overlaps only a fraction of the files
    assert z_touched <= z_total // 2, (z_touched, z_total)


def test_optimize_zorder_by_clusters_files_in_both_dims(spark, tmp_path):
    """OPTIMIZE ZORDER BY in the parquet fallback: the rewritten table
    holds identical data, the requested file count, and the files are
    range-disjoint in MORTON KEY space — so per-file min/max stats
    tighten in both z-order dimensions at once."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "t.parquet"), key="id")
    rows = [(f"k{i}", i % 37, (i * 7) % 53) for i in range(500)]
    df = spark.createDataFrame(rows, "id string, a long, b long")
    t.merge_upsert(df)

    t.optimize(target_files=4, zorder_by=["a", "b"])

    out = t.to_df()
    assert {(r.id, r.a, r.b) for r in out.collect()} == set(rows)
    files = out.select(F.input_file_name().alias("f")).distinct().collect()
    assert len(files) == 4
    # recompute the z-key per row and check per-file ranges are disjoint
    zkey = t._zorder_expr(t.to_df(), ["a", "b"])
    per_file = (
        t.to_df()
        .select(F.input_file_name().alias("f"), zkey.alias("z"))
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file z-ranges overlap: {spans}"


def test_optimize_zorder_rejects_string_dims(spark, tmp_path):
    import pytest as _pytest

    from fhir_to_lakehouse_spark.sinks.keyed_table import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "t.parquet"), key="id")
    t.merge_upsert(spark.createDataFrame([("a", 1)], "id string, a long"))
    with _pytest.raises(ValueError, match="non-numeric"):
        t.optimize(zorder_by=["id"])
