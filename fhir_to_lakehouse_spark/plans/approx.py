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


@query(
    "approx_distinct_sketch",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(1 AS INT) AS within_3rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approx distinct per group. The HLL++ register state
    is engine-specific, so the registered output carries the exact
    count plus a bounded-error VERDICT (|approx-exact|/exact <= 3*rsd,
    as 1/0) instead of the raw estimate — the DuckDB oracle computes
    the same exact count and asserts the verdict is 1, upgrading the
    entry from rows-only to a value-checked error-bound gate (VERDICT
    r9 item 6). The estimate itself stays pytest-asserted
    (tests/test_sketches.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("_approx") - F.col("exact_orders"))
                / F.col("exact_orders")
                <= 0.06
            )
            .cast("int")
            .alias("within_3rsd"),
        )
    )


@query(
    "approx_percentile_sketch",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(1 AS INT) AS p50_rank_ok,
           CAST(1 AS INT) AS p90_rank_ok,
           CAST(1 AS INT) AS p99_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx sketch — the 100 TB path for quantiles
    (bounded memory, mergeable). The sketch values are engine-specific,
    so the registered output is the RANK-ERROR GATE the sketch
    guarantees (value's rank interval must cover q*n within
    n/accuracy + 1), computed exactly by re-ranking each returned
    value against its group: group size plus a 1/0 verdict per
    quantile, which the DuckDB oracle reproduces exactly (VERDICT r9
    item 6 upgrade from rows-only). The raw sketch values stay
    pytest-asserted (tests/test_sketches.py)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    sk = li.groupBy("l_returnflag").agg(
        F.element_at(pcts, 1).alias("_v50"),
        F.element_at(pcts, 2).alias("_v90"),
        F.element_at(pcts, 3).alias("_v99"),
    )
    # 3-row sketch frame broadcast back onto the fact scan: one more
    # pass computes each value's exact rank interval per group
    j = li.join(F.broadcast(sk), "l_returnflag")
    aggs = [F.count(F.lit(1)).alias("n")]
    for q, c in [(0.5, "_v50"), (0.9, "_v90"), (0.99, "_v99")]:
        aggs.append(
            F.sum((F.col("l_extendedprice") < F.col(c)).cast("long")).alias(
                f"_lo{c}"
            )
        )
        aggs.append(
            F.sum((F.col("l_extendedprice") <= F.col(c)).cast("long")).alias(
                f"_hi{c}"
            )
        )
    g = j.groupBy("l_returnflag").agg(*aggs)
    err = F.col("n") / 10000 + 1
    out = [F.col("l_returnflag"), F.col("n")]
    for q, c in [(0.5, "_v50"), (0.9, "_v90"), (0.99, "_v99")]:
        target = F.lit(q) * F.col("n")
        ok = (F.col(f"_lo{c}") - err <= target) & (
            target <= F.col(f"_hi{c}") + err
        )
        out.append(ok.cast("int").alias(f"p{int(q * 100)}_rank_ok"))
    return g.select(*out)


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


@query(
    "approx_distinct_hll_union",
    oracle="""
    SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT)   AS exact_customers,
           CAST(COUNT(*) AS BIGINT)                    AS exact_total_rows,
           CAST(1 AS INT)                              AS union_within_5pct
    FROM customer
    """,
)
def approx_distinct_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-nation customer sketches
    are built once, then UNIONED into a global estimate WITHOUT
    touching the raw data again — the reaggregation property that lets
    100 TB pipelines keep pre-computed per-partition sketches and
    answer rollups from kilobytes. The Datasketches binary layout is
    Spark-specific, so the registered output carries the exact global
    counts plus a 1/0 error-bound verdict on the merged estimate
    (within 5% of exact — the pytest bound in
    tests/test_extensions.py), which the DuckDB oracle reproduces
    exactly (VERDICT r9 item 6 upgrade from rows-only)."""
    cust = load_table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").alias("n_exact"),
    )
    return per_nation.agg(
        F.count(F.lit(1)).alias("n_nations"),
        # custkeys never repeat across nations, so the exact global
        # distinct is the sum of per-nation exacts (one pass)
        F.sum("n_exact").alias("exact_customers"),
        F.sum("n_rows").alias("exact_total_rows"),
        (
            F.abs(
                F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast(
                    "double"
                )
                - F.sum("n_exact")
            )
            / F.sum("n_exact")
            <= 0.05
        )
        .cast("int")
        .alias("union_within_5pct"),
    )
