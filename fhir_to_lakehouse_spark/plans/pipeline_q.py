"""Oracle-checked pipeline-operator queries.

The bundle pipeline's operators (P1-P7 parse/explode/extract, W1
last-writer-wins dedup) are exercised through ``queries()`` here by
synthesizing Kafka-shaped bundle events deterministically from the
testdata tables, running the REAL pipeline transforms, and checking
the result against DuckDB reproducing the same semantics in SQL.
Golden-path truth tables live in tests/test_bundles.py; these make the
same code paths part of the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.operators.bundles import (
    latest_per_key,
    prepare_stream,
)
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


def _bundle_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped frame of FHIR transaction bundles derived from
    events: each event becomes one PUT (or DELETE for 'error' events)
    of Patient/<user_id>; partition = event_id % 4, offset = event_id.
    Built with to_json(struct(...)) so the JSON payload is real."""
    ev = load_table(spark, sf_dir, "events")
    resource = F.to_json(
        F.struct(
            F.lit("Patient").alias("resourceType"),
            F.col("user_id").cast("string").alias("id"),
            (F.col("value") > 50).alias("active"),
        )
    )
    url = F.concat_ws("/", F.lit("Patient"), F.col("user_id").cast("string"))
    method = F.when(F.col("event_type") == "error", "DELETE").otherwise("PUT")
    bundle = F.to_json(
        F.struct(
            F.lit("Bundle").alias("resourceType"),
            F.lit("transaction").alias("type"),
            F.array(
                F.struct(
                    F.when(method == "PUT", resource).alias("resource"),
                    F.struct(
                        method.alias("method"), url.alias("url")
                    ).alias("request"),
                )
            ).alias("entry"),
        )
    )
    return ev.select(
        F.col("user_id").cast("string").alias("key"),
        bundle.alias("value"),
        F.col("ts").alias("timestamp"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.lit("fhir").alias("topic"),
    )


@query(
    "pipeline_parse_explode",
    oracle="""
    SELECT 'Patient'                      AS resource_type,
           CAST(user_id AS VARCHAR)       AS request_resource_id,
           CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END
                                          AS request_method,
           event_id                       AS "offset"
    FROM events
    """,
)
def pipeline_parse_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P7 end to end: binary->string cast, from_json envelope parse,
    entry explode, request-url split — the reference's prepare_stream
    (/root/reference/src/bundle_processor.py:39-77) — on synthesized
    real-JSON bundles. The oracle derives the expected routing columns
    straight from the source table."""
    events = _bundle_events(spark, sf_dir)
    return prepare_stream(events).select(
        "resource_type", "request_resource_id", "request_method", "offset"
    )


@query(
    "pipeline_latest_per_url",
    oracle="""
    SELECT 'Patient/' || CAST(user_id AS VARCHAR) AS request_url,
           CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END
                                                  AS request_method,
           "partition", "offset"
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY (event_id % 4) ASC, event_id DESC) AS rn
      FROM (SELECT user_id, event_type, event_id,
                   CAST(event_id % 4 AS INT) AS "partition",
                   event_id AS "offset"
            FROM events)
    ) WHERE rn = 1
    """,
)
def pipeline_latest_per_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 last-writer-wins dedup with the reference's exact tie-break
    (partition ASC, offset DESC — /root/reference/src/bundle_processor
    .py:114-128), driven through the real parse+explode+dedup chain.

    The projection runs BEFORE the dedup: min_by's whole-row struct is
    opaque to column pruning, so projecting first is what lets Catalyst
    prune the bundle parse down to ``entry.request`` (the resource
    payload never enters the shuffle). Same rule at 100 TB: project to
    the columns you'll keep before any whole-row argmin/argmax."""
    events = _bundle_events(spark, sf_dir)
    slim = prepare_stream(events).select(
        "request_url", "request_method", "partition", "offset"
    )
    return latest_per_key(slim, key="request_url")
