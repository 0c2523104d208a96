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


@query(
    "profile_join_key_skew",
    oracle="""
    WITH c AS (
        SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
    )
    SELECT COUNT(*)                                   AS n_keys,
           CAST(MAX(cnt) AS BIGINT)                   AS max_cnt,
           ROUND(AVG(cnt), 6)                         AS avg_cnt,
           ROUND(quantile_cont(cnt, 0.5), 6)          AS p50_cnt,
           ROUND(quantile_cont(cnt, 0.99), 6)         AS p99_cnt,
           ROUND(MAX(cnt) / AVG(cnt), 6)              AS skew_ratio,
           ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_key_share
    FROM c
    """,
)
def profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the profiling pass that decides
    whether a planned shuffle join needs salting or AQE skew handling
    BEFORE it runs at 100 TB: per-key row counts reduced to key count,
    max/avg/percentiles, the max:avg skew ratio, and the heaviest
    key's share of all rows.

    Shape: one map-side-combinable count per key, then a global
    aggregate over one row per key (the second stage's input is the
    key cardinality, not the table). skew_ratio near 1 = uniform;
    a ratio of k means the hottest reducer gets k times the average
    partition's work — the threshold this repo's salted-join guard
    (functions/skew.py) keys off."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    cnt = F.col("cnt")
    return c.agg(
        F.count("*").alias("n_keys"),
        F.max(cnt).alias("max_cnt"),
        F.round(F.avg(cnt), 6).alias("avg_cnt"),
        F.round(F.percentile(cnt, F.lit(0.5)), 6).alias("p50_cnt"),
        F.round(F.percentile(cnt, F.lit(0.99)), 6).alias("p99_cnt"),
        F.round(F.max(cnt) / F.avg(cnt), 6).alias("skew_ratio"),
        F.round(F.max(cnt) / F.sum(cnt).cast("double"), 6).alias("top_key_share"),
    )
