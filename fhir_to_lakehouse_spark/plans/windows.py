"""Window-function operators: ranking, top-k per group, frames, lag/lead.

Generalizes the reference's single window pattern W1 — last-writer-wins
dedup via row_number over (partitionBy key, orderBy partition asc /
offset desc) at /root/reference/src/bundle_processor.py:114-128 — into
the full analytic family.

Scale notes: every window here partitions by a high-cardinality key
(custkey / suppkey / orderkey), so state per partition stays small and
the single hash Exchange on the partition key is the only shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the W1 dedup pattern generalized to
    k>1 (reference keeps rn==1 only)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
    )


@query(
    "window_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    WHERE rn = 1
    """,
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact W1 semantics on batch data: keep the single latest row per
    key (reference /root/reference/src/bundle_processor.py:114-128)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit ROWS frame."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_lag_lead_gap",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
             LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
           ROUND(LEAD(o_totalprice) OVER w - o_totalprice, 2) AS next_price_delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offsets: inter-order gap in days and next-order delta."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        )
        .cast("long")
        .alias("days_since_prev"),
        F.round(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2).alias(
            "next_price_delta"
        ),
    )


@query(
    "window_rank_dense_pct",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(RANK()       OVER w AS INT)    AS rnk,
           CAST(DENSE_RANK() OVER w AS INT)    AS drnk,
           CAST(NTILE(4)     OVER w AS INT)    AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)
    """,
)
def window_rank_dense_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE ranking family."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_range_frame_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           ROUND(AVG(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING), 6) AS avg_near_qty
    FROM lineitem
    """,
)
def window_range_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window) — average over quantity ±5."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.col("l_quantity"))
        .rangeBetween(-5, 5)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.avg("l_quantity").over(w), 6).alias("avg_near_qty"),
    )
