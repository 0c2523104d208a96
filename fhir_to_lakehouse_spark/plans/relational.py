"""Core relational operators: scans, filters, aggregations, joins, set ops.

Covers SURVEY.md §2.2/§2.3/§2.5/§2.6/§2.7 generalized to a full
relational surface (the reference exercises filter/agg/merge-join; we
expose the whole family as first-class queries, per SURVEY §7.4 step 2).

Scale notes: dimension tables (region/nation/supplier/part at TPC-H
ratios) are broadcast explicitly so the big fact-side join never
shuffles the fact table on a dim key; aggregations are partial
(map-side combine) by construction in Spark's hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


def _dec(col, scale: int = 2):
    """Money columns are 2-decimal values stored as double; cast to
    DECIMAL before arithmetic/SUM so results are exact and independent
    of accumulation order (raw double sums differ between engines in the
    last ulps, which breaks value-hash comparison after ROUND whenever a
    result lands on a rounding boundary)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(12,{scale})")


# --- TPC-H Q1 style: the flagship scan + hash aggregate -----------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))
                          * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (scan -> pushed filter -> hash agg).

    Reference parity: generalizes A1/A4 group-by aggregation
    (/root/reference/src/bundle_processor.py:131) to the full
    multi-aggregate form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + _dec("l_tax"))), 2)
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / cnt, 6).alias(
                "avg_price"
            ),
            F.round(F.sum(_dec("l_discount")).cast("double") / cnt, 6).alias(
                "avg_disc"
            ),
            cnt.alias("count_order"),
        )
    )


# --- joins ---------------------------------------------------------------


@query(
    "q3_top_unshipped_orders",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-fact join + broadcast dim filter + top-k.

    customer is ~1/40 of lineitem -> broadcast; orders⋈lineitem is the
    real shuffle and joins on the key both sides can pre-partition on.
    Tie-break on l_orderkey so the LIMIT set is engine-independent.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join, every dimension broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — reference J2 delete-merge is semi-shaped
    (/root/reference/src/bundle_processor.py:287-292)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no pending order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey)                            AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE)
             AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice", 2).cast("decimal(14,2)")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


# --- aggregation variants ------------------------------------------------


@query(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r_name, n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregate (region -> nation -> grand total)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT)          AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate over two low-cardinality dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total"),
    )


@query(
    "agg_distinct_parts_per_supplier",
    oracle="""
    SELECT l_suppkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def agg_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate (expand-based in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_global_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)                AS n_rows,
           ROUND(MIN(l_extendedprice), 2)          AS min_price,
           ROUND(MAX(l_extendedprice), 2)          AS max_price,
           ROUND(AVG(l_quantity), 6)               AS avg_qty,
           ROUND(STDDEV_SAMP(l_quantity), 4)       AS std_qty
    FROM lineitem
    """,
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate — generalizes reference A1 count
    (/root/reference/src/bundle_processor.py:82)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (expressed as conditional aggregates so the oracle matches)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("status_O"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("status_F"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("status_P"),
    )


# --- filters / projections / sort-limit / set ops -----------------------


@query(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS net
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 45
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter + narrow projection (reference F1-F4/P9);
    both the predicate and the 4-column ReadSchema reach the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45)).select(
        "l_orderkey",
        "l_linenumber",
        F.round(_dec("l_extendedprice") * (1 - _dec("l_discount")), 2)
        .cast("double")
        .alias("net"),
    )


@query(
    "filter_in_list",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (reference F2 uses the negated form,
    /root/reference/src/main.py:177-179)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "sort_limit_top100_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def sort_limit_top100_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark runs per-partition TakeOrdered then merges —
    no full sort shuffle at scale. Unique (orderkey, linenumber)
    tie-break keeps the k-set deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two filtered scans."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "setop_except_intersect",
    oracle="""
    SELECT x.c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    ) x
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_nationkey < 13
    """,
)
def setop_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT + INTERSECT composition."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0).select("c_custkey")
    fin = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    low = cust.filter(F.col("c_nationkey") < 13).select("c_custkey")
    return pos.exceptAll(fin).distinct().intersect(low)


@query(
    "distinct_mktsegments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on one column (reference A3,
    /root/reference/src/bundle_processor.py:96-99)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "subquery_above_avg_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (broadcast of a 1-row aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(F.avg("o_totalprice").alias("a"))
    return (
        orders.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )
