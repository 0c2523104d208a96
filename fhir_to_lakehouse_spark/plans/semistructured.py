"""Spark 4 semi-structured features (VariantType) + cohort analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "variant_json_access",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
    FROM events
    """,
)
def variant_json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-free semi-structured access via Spark 4 VariantType:
    parse_json once into a Variant column, typed path extraction with
    variant_get — the modern alternative to per-path get_json_object
    re-parsing (one parse, many typed reads; SURVEY §7.3's optional
    Variant path made concrete)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    return v.select("event_id", k.alias("k"), (k % 7).alias("k_mod"))


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on
    each subsequent active day (first week). First-seen is a per-user
    aggregate broadcast back onto the event stream — the one shuffle is
    on user_id and serves both steps."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
