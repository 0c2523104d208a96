"""As-of / range / interval joins — operators Spark lacks natively,
built per the preference order: composition of built-in DataFrame ops
first (union + window trick), Pandas-UDF merge_asof as the alternate
path. DuckDB has native ASOF JOIN, which makes a strong oracle.

Scale notes (the union-window as-of): instead of a range-condition
join (which Spark executes as broadcast-nested-loop), tag both sides,
union on the shared sort key, and run one window pass partitioned by
the join key — a single hash shuffle on user_id, linear state, no
quadratic candidate explosion, skew bounded by per-user event counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


def _purchases_and_clicks(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


_ASOF_ORACLE = """
    SELECT p.user_id,
           p.event_id                    AS purchase_id,
           p.ts                          AS purchase_ts,
           c.event_id                    AS click_id,
           c.ts                          AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@query("asof_join_last_click_before_purchase", oracle=_ASOF_ORACLE)
def asof_join_last_click_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it
    (per user). Union-window formulation: one shuffle on user_id, no
    range-join explosion. Ties (click_ts == purchase_ts) match, like
    DuckDB ASOF (>=)."""
    clicks, purchases = _purchases_and_clicks(spark, sf_dir)
    left = purchases.select(
        "user_id",
        F.col("purchase_ts").alias("ts"),
        F.lit(1).alias("is_purchase"),
        "purchase_id",
        F.col("purchase_ts"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    right = clicks.select(
        "user_id",
        F.col("click_ts").alias("ts"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("timestamp").alias("purchase_ts"),
        "click_id",
        F.col("click_ts"),
    )
    # order clicks before purchases at equal ts so >= semantics hold
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_purchase").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = left.unionByName(right)
    matched = (
        unioned.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
    )
    return matched.select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        F.col("last_click_id").alias("click_id"),
        F.col("last_click_ts").alias("click_ts"),
    )


@query("asof_join_pandas_variant", oracle=_ASOF_ORACLE)
def asof_join_pandas_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via the Arrow path: applyInPandas per
    user-group, pd.merge_asof inside — the pattern for as-of logic too
    gnarly for the union-window trick (multi-column tolerance bands
    etc.). Shuffle key = user_id, group state = that user's events."""
    clicks, purchases = _purchases_and_clicks(spark, sf_dir)
    joined_schema = (
        "user_id long, purchase_id long, purchase_ts timestamp, "
        "click_id long, click_ts timestamp"
    )
    tagged = purchases.select(
        "user_id", "purchase_id", "purchase_ts",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit("p").alias("side"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(None).cast("timestamp").alias("purchase_ts"),
            "click_id", "click_ts",
            F.lit("c").alias("side"),
        )
    )

    def asof_group(pdf: pd.DataFrame) -> pd.DataFrame:
        p = (
            pdf[pdf["side"] == "p"][["user_id", "purchase_id", "purchase_ts"]]
            .sort_values(["purchase_ts", "purchase_id"])
            .reset_index(drop=True)
        )
        c = (
            pdf[pdf["side"] == "c"][["click_id", "click_ts"]]
            .sort_values(["click_ts", "click_id"])
            .reset_index(drop=True)
        )
        if p.empty:
            return p.assign(click_id=pd.Series(dtype="int64"),
                            click_ts=pd.Series(dtype="datetime64[us]"))
        if c.empty:
            return p.assign(click_id=None, click_ts=pd.NaT)
        out = pd.merge_asof(
            p, c, left_on="purchase_ts", right_on="click_ts", direction="backward"
        )
        out["click_id"] = out["click_id"].astype("Int64")  # nullable long
        return out[["user_id", "purchase_id", "purchase_ts", "click_id", "click_ts"]]

    return tagged.groupBy("user_id").applyInPandas(asof_group, schema=joined_schema)


@query(
    "range_join_events_in_order_window",
    oracle="""
    SELECT o.o_orderkey, CAST(COUNT(e.event_id) AS BIGINT) AS n_events
    FROM (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1995-03-01') o
    LEFT JOIN events e
      ON e.ts >= o.o_orderdate + INTERVAL 10592 DAYS
     AND e.ts <  o.o_orderdate + INTERVAL 10599 DAYS
    GROUP BY o.o_orderkey
    """,
)
def range_join_events_in_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events within a 7-day window anchored at
    each order date (shifted +29 years so early-1995 order dates
    overlap the Jan-2024 event stream). Executed by bucketizing the range
    key to days and equi-joining on the bucket — candidates are
    bounded per bucket instead of the broadcast-nested-loop a raw
    range predicate produces."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
        .withColumn(
            "win_start", F.timestamp_add("DAY", F.lit(10592), F.col("o_orderdate"))
        )
        .withColumn(
            "win_end", F.timestamp_add("DAY", F.lit(10599), F.col("o_orderdate"))
        )
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    # bucket by day: order contributes its 7 candidate day-buckets,
    # events join on their own day bucket, then the exact range filter
    o_b = orders.withColumn(
        "day_bucket",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", "win_start").cast("date"),
                F.date_trunc("DAY", "win_end").cast("date"),
            )
        ),
    )
    e_b = ev.withColumn("day_bucket", F.col("ts").cast("date"))
    matched = o_b.join(e_b, "day_bucket", "left").filter(
        F.col("event_id").isNull()
        | ((F.col("ts") >= F.col("win_start")) & (F.col("ts") < F.col("win_end")))
    )
    return (
        matched.groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events"))
    )
