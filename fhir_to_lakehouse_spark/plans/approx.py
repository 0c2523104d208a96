"""Percentiles, sketches, sampling, frequency estimation.

Exact percentile (Spark ``percentile`` == DuckDB ``quantile_cont``,
identical linear interpolation) is oracle-checked; the sketch-based
variants (approx_count_distinct/HLL, percentile_approx/KLL-ish,
count_min_sketch) are engine-specific estimators — rows-only checks
with pytest accuracy bounds against the exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "percentile_exact_prices",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_exact_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based; at 100 TB
    prefer percentile_approx below — kept exact here for the oracle).

    All three fractions go through ONE percentile aggregate with an
    array argument: three separate percentile() calls each buffer and
    sort the group's values independently (measured 2.2 s vs 0.9 s at
    sf0.1 — the honest noop-action bench surfaced this; count() had
    pruned the aggregates entirely)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(ps.alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 6).alias("p50"),
            F.round(F.col("ps")[1], 6).alias("p90"),
            F.round(F.col("ps")[2], 6).alias("p99"),
        )
    )


@query(
    "median_order_value_per_status",
    oracle="""
    SELECT o_orderstatus,
           ROUND(median(o_totalprice), 6)     AS median_price,
           CAST(COUNT(*) AS BIGINT)           AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def median_order_value_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median via exact percentile; DuckDB median == quantile_cont 0.5."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("approx_distinct_sketch")
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approx distinct per group — engine-specific sketch,
    rows-only check; accuracy vs exact asserted in pytest."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query("approx_percentile_sketch")
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx sketch — the 100 TB path for quantiles (bounded
    memory, mergeable); rows-only, accuracy pytest-checked."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    # one sketch pass, quantiles unpacked to scalar columns at the
    # boundary (registry convention: no ARRAY output columns)
    return li.groupBy("l_returnflag").agg(
        F.element_at(pcts, 1).alias("p50"),
        F.element_at(pcts, 2).alias("p90"),
        F.element_at(pcts, 3).alias("p99"),
    )


@query(
    "sample_deterministic_bucket",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (l_orderkey * 2654435761 + l_linenumber) % 100 < 5
    """,
)
def sample_deterministic_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample via hash-mod bucketing (reproducible
    across engines/runs, unlike rand() — the right way to sample a
    100 TB table for pipeline experiments)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_orderkey") * 2654435761 + F.col("l_linenumber")) % 100 < 5
    ).select("l_orderkey", "l_linenumber")


@query(
    "topk_heavy_hitters",
    oracle="""
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY n DESC, l_suppkey ASC
    LIMIT 5
    """,
)
def topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency heavy hitters (exact top-k; the sketch path would be
    count_min + TakeOrdered at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("l_suppkey").asc())
        .limit(5)
    )


@query("approx_distinct_hll_union")
def approx_distinct_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (rows-only: Datasketches HLL
    binary layout is Spark-specific, no DuckDB twin): per-nation
    customer sketches are built once, then UNIONED into a global
    estimate WITHOUT touching the raw data again — the reaggregation
    property that lets 100 TB pipelines keep pre-computed per-partition
    sketches and answer rollups from kilobytes. Accuracy is
    pytest-bounded in tests/test_extensions.py."""
    cust = load_table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_nation.agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("approx_total_customers"),
        F.sum("n_rows").alias("exact_total_rows"),
    )
