"""SCD Type 2 as a batch-checkable query family.

Rebuilds a versioned dimension from the ``events`` log — the batch
analog of what ``KeyedTable.merge_scd2`` maintains incrementally per
micro-batch, so the DuckDB oracle certifies the same interval semantics
the sink produces (operators/scd.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "scd2_user_event_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL
             AS is_current
    FROM changes
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension rebuild: per user, each *change* of event_type
    opens a version; valid_to = next version's valid_from, open-ended
    for the current one. One window pass, shuffles once on user_id
    (both windows share the partitioning, so Catalyst plans a single
    Exchange). Ties broken by event_id for cross-engine determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id", "event_type", F.col("ts").alias("valid_from"), "event_id"
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


@query(
    "scd2_point_in_time",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ), versioned AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, event_id) AS valid_to
      FROM changes
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM versioned
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
    GROUP BY event_type
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF query over the rebuilt SCD2 dimension: which version was
    valid for each user at a past instant, aggregated by attribute —
    the time-travel read pattern the versioned layout exists to serve."""
    versions = scd2_user_event_history(spark, sf_dir)
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        versions.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
