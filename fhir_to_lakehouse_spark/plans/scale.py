"""Scale-technique queries: salted join equivalence, repartitioned
aggregation, broadcast-vs-shuffle contrast. The salted join is checked
against the plain-join oracle — proving the skew mitigation is
semantics-preserving, which is the property that matters before you
deploy it on a hot-key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.skew import salted_join
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "join_salted_supplier_revenue",
    oracle="""
    SELECT s_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def join_salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (8 salt buckets) — identical results to the
    plain join the oracle runs; the salt spreads any hot l_suppkey over
    8 reducers. l_suppkey IS skew-prone at TPC-H ratios (6k lineitems
    per supplier at sf0.001)."""
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_suppkey", "suppkey"
    )
    supp = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "suppkey"
    )
    joined = salted_join(li, supp, key="suppkey", salt_buckets=8)
    return joined.groupBy("s_name").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "agg_two_level_skew_safe",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_two_level_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (salted) aggregation for low-cardinality hot group
    keys: first aggregate by (key, salt), then by key. With only 3
    returnflag values, a direct groupBy funnels everything into 3
    reducers; the pre-aggregation spreads the heavy partial work across
    salt×3 reducers and the final pass merges 24 tiny rows. (Spark's
    partial hash-agg does this automatically when maps stay small; the
    explicit form is the fallback when per-key state is too big for
    map-side combine.)"""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)).cast("int"),
    )
    partial = li.groupBy("l_returnflag", "_salt").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("t"),
        F.count(F.lit(1)).alias("c"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("t").cast("double").alias("total"),
        F.sum("c").alias("n"),
    )
