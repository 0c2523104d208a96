"""Spark-4 SQL-surface features: recursive CTEs and LATERAL joins.

Spark 4 added ``WITH RECURSIVE`` (SPARK-24497) and has supported
correlated ``LATERAL`` subqueries since 3.2 — the two relational
idioms users previously had to emulate with driver-side loops
(hierarchies) or window-function rewrites (per-group top-N). Declared
through ``spark.sql`` over registered temp views, so Catalyst plans
them natively: the recursion is executed as an iterative union with
the per-level join fully distributed, and LATERAL plans as a
rewritten join (no per-outer-row re-execution).

The reference engine exposes neither; these extend the §2.7 relational
family the same way the window/setop entries do, each with an exact
DuckDB twin (DuckDB speaks both dialect variants natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "recursive_cte_referral_depth",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, chain.depth + 1
      FROM customer c JOIN chain ON c.c_custkey // 2 = chain.c_custkey
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT)      AS n,
           MIN(c_custkey)                AS min_key,
           MAX(c_custkey)                AS max_key
    FROM chain GROUP BY depth
    """,
)
def recursive_cte_referral_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy walk with a native recursive CTE: every customer's
    referrer is custkey/2 (a complete binary tree rooted at 1 — the
    org-chart / category-tree shape), and the recursion labels each
    customer with its depth from the root, aggregated per level.

    100 TB shape: each recursion level is ONE distributed hash join of
    the (growing) frontier against the customer scan — identical work
    to the hand-rolled BFS in functions/graph.py, but planned by
    Catalyst with the scan cached across levels and termination
    detected from an empty frontier. Depth is log2(|customers|), so
    the level count stays ~40 even at trillions of rows."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sqlf_customer"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey, 0 AS depth FROM sqlf_customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, chain.depth + 1
          FROM sqlf_customer c JOIN chain ON c.c_custkey DIV 2 = chain.c_custkey
        )
        SELECT depth,
               COUNT(*)       AS n,
               MIN(c_custkey) AS min_key,
               MAX(c_custkey) AS max_key
        FROM chain GROUP BY depth
        """
    )


@query(
    "lateral_top_customers_per_nation",
    oracle="""
    SELECT n.n_name                          AS nation,
           t.c_custkey                       AS custkey,
           CAST(t.c_acctbal AS DOUBLE)       AS acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    """,
)
def lateral_top_customers_per_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated per-group top-N via JOIN LATERAL ... LIMIT — the
    other idiom for window_topk_orders_per_customer's problem, stated
    the way an analyst coming from Postgres writes it. Catalyst
    decorrelates the subquery into a join + per-key limit rather than
    re-running it per outer row; ties break on custkey so both engines
    return identical rows."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("sqlf_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sqlf_customer2"
    )
    return spark.sql(
        """
        SELECT n.n_name                    AS nation,
               t.c_custkey                 AS custkey,
               CAST(t.c_acctbal AS DOUBLE) AS acctbal
        FROM sqlf_nation n
        JOIN LATERAL (
          SELECT c_custkey, c_acctbal
          FROM sqlf_customer2 c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )
