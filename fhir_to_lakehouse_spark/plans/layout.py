"""Z-order layout queries: the Morton key computed both as Catalyst
bit expressions and as generated oracle SQL (bit-for-bit identical),
plus a locality measurement showing why the layout wins at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.layout import morton_key, morton_key_sql
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table

_BITS = 8  # 256 buckets per dimension, 16-bit combined key

_Z_SQL = morton_key_sql(["bx", "by"], _BITS)


@query(
    "layout_zorder_key",
    oracle=f"""
    WITH bucketed AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 256 AS bx, l_suppkey % 256 AS by
      FROM lineitem
    )
    SELECT CAST(({_Z_SQL}) >> 8 AS BIGINT)        AS z_page,
           CAST(COUNT(*) AS BIGINT)               AS n_rows,
           CAST(MIN(bx) AS BIGINT) AS min_bx, CAST(MAX(bx) AS BIGINT) AS max_bx,
           CAST(MIN(by) AS BIGINT) AS min_by, CAST(MAX(by) AS BIGINT) AS max_by
    FROM bucketed
    GROUP BY 1
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleave (l_partkey, l_suppkey) buckets and group rows
    by 256-key Z-pages — each page's min/max span in BOTH dimensions is
    narrow (<=16 of 256 buckets), which is exactly the file-statistics
    tightening a Z-ordered write gives multi-dimensional predicates.
    Oracle SQL is generated from the same bit spec, so the check is
    bit-exact across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 256).alias("bx"),
        (F.col("l_suppkey") % 256).alias("by"),
    )
    z = morton_key(["bx", "by"], _BITS)
    return (
        li.withColumn("z_page", F.shiftright(z, 8))
        .groupBy("z_page")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("bx").alias("min_bx"),
            F.max("bx").alias("max_bx"),
            F.min("by").alias("min_by"),
            F.max("by").alias("max_by"),
        )
    )
