"""Deeper TPC-H-shaped queries: correlated subqueries, nested
aggregation, existence predicates over aggregates — the harder
relational shapes (Q2/Q7/Q13/Q15/Q17/Q18/Q20 analogs adapted to the
testdata star schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_3', 'NATION_4')
    GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume by year (two aliases of
    one dimension, both broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_4"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (1 - F.col("l_discount").cast("decimal(12,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: nested aggregation — distribution of per-customer
    order counts (join condition includes a non-key predicate)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: view + scalar-subquery equality on the aggregate max
    (window-max formulation avoids recomputing the view)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (1 - F.col("l_discount").cast("decimal(12,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    w = Window.partitionBy()
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(w)
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 6) AS DOUBLE)
             AS avg_yearly
    FROM lineitem l
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part average) —
    decorrelated into an aggregate + rejoin, the plan Catalyst/DuckDB
    both produce."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_q), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
    )
    total = F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
    return joined.agg(
        F.round(total.cast("double") / 7.0, 6).alias("avg_yearly")
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered semi join (orders whose lineitems
    exceed a quantity threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).cast("double").alias("total_qty"))
    )


@query(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type LIKE 'small%'
                   THEN CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))
                   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           , 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-aggregate ratio (promo revenue share).
    Both sums run in DECIMAL; the ratio divides the exact sums as
    doubles so both engines compute identical operands."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(12,2)")
    )
    promo = F.when(F.col("p_type").like("small%"), disc).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            100.0 * F.sum(promo).cast("double") / F.sum(disc).cast("double"), 6
        ).alias("promo_revenue_pct")
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive band predicates
    across both join sides — the optimizer splits the common p_partkey
    equi-key out of the OR and pushes per-side conjuncts down."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    disc = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(12,2)")
    )
    return j.filter(band).agg(
        F.sum(disc).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average subquery + NOT EXISTS anti-join
    + aggregate (rich customers with no open orders, by nation)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated existence — the supplier is
    the ONLY one whose lineitem was returned on a multi-supplier order.
    EXISTS -> aggregated per-order supplier stats joined back (one
    lineitem aggregation serves both the EXISTS and the NOT EXISTS:
    n_supp > 1 ∧ n_flagged_supp = 1 ∧ this supplier flagged)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_flagged_supp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(per_order), l1.l_orderkey == F.col("po_key"))
        .filter((F.col("n_supp") > 1) & (F.col("n_flagged_supp") == 1))
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "profile_table_columns",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)                        AS n_rows,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT)     AS null_custkey,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)       AS nd_custkey,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)   AS nd_status,
           ROUND(MIN(o_totalprice), 2)                     AS min_price,
           ROUND(MAX(o_totalprice), 2)                     AS max_price,
           CAST(MIN(o_orderdate) AS DATE)                  AS min_date,
           CAST(MAX(o_orderdate) AS DATE)                  AS max_date
    FROM orders
    """,
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (null counts, distinct counts, ranges) —
    the describe-style data-quality sweep, all partial-aggregatable in
    a single scan."""
    orders = load_table(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))
    return orders.agg(
        cnt.alias("n_rows"),
        (cnt - F.count("o_custkey")).alias("null_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
    )


@query(
    "q20_part_supply_candidates",
    oracle="""
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN lineitem ON l_suppkey = s_suppkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%a%'
      AND l_quantity > 30
    """,
)
def q20_part_supply_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of LIKE-matched parts above a
    quantity bar (LIKE predicate + distinct projection)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "profile_functional_dependencies",
    oracle="""
    SELECT 'nation' AS tbl, 'n_nationkey' AS det, 'n_regionkey' AS dep,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT)
             AS n_violating,
           COUNT(CASE WHEN nd > 1 THEN 1 END) = 0 AS holds
    FROM (SELECT n_nationkey, COUNT(DISTINCT n_regionkey) AS nd
          FROM nation GROUP BY n_nationkey)
    UNION ALL
    SELECT 'customer', 'c_custkey', 'c_mktsegment',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN nd > 1 THEN 1 END) = 0
    FROM (SELECT c_custkey, COUNT(DISTINCT c_mktsegment) AS nd
          FROM customer GROUP BY c_custkey)
    UNION ALL
    SELECT 'orders', 'o_custkey', 'o_orderpriority',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN nd > 1 THEN 1 END) = 0
    FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nd
          FROM orders GROUP BY o_custkey)
    UNION ALL
    SELECT 'lineitem', 'l_orderkey', 'l_returnflag',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN nd > 1 THEN 1 END) = 0
    FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS nd
          FROM lineitem GROUP BY l_orderkey)
    """,
)
def profile_functional_dependencies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency validation — the Metanome/Deequ-class
    profiling primitive behind schema discovery and key detection:
    for each candidate ``determinant -> dependent`` pair, count the
    determinant groups whose dependent takes more than one value. A
    zero violation count certifies the FD (n_nationkey -> n_regionkey
    holds; o_custkey -> o_orderpriority does not), which is how a
    profiler proposes primary keys, denormalization opportunities,
    and data-quality rules.

    Plan shape: one grouped distinct-count per candidate pair (each a
    map-side-combinable aggregate over only the two columns — column
    pruning reaches the scan), folded to one summary row each and
    unioned.

    100 TB shape: each check shuffles (determinant, dependent) pairs
    only; checks over the same table still prune to two columns per
    scan. A production profiler batches same-table candidates into
    one pass — the per-pair form keeps each FD's cost attributable."""

    def check(tbl: str, det: str, dep: str) -> DataFrame:
        t = load_table(spark, sf_dir, tbl)
        per_group = t.groupBy(det).agg(
            F.count_distinct(dep).alias("nd")
        )
        viol = F.count(F.when(F.col("nd") > 1, 1))
        return per_group.agg(
            F.lit(tbl).alias("tbl"),
            F.lit(det).alias("det"),
            F.lit(dep).alias("dep"),
            F.count(F.lit(1)).alias("n_groups"),
            viol.alias("n_violating"),
            (viol == 0).alias("holds"),
        )

    out = check("nation", "n_nationkey", "n_regionkey")
    for args in (
        ("customer", "c_custkey", "c_mktsegment"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("lineitem", "l_orderkey", "l_returnflag"),
    ):
        out = out.unionByName(check(*args))
    return out


@query(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate)                    AS last_order,
             COUNT(*)                            AS frequency,
             ROUND(SUM(o_totalprice), 2)         AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT NTILE(5) OVER (ORDER BY last_order ASC,  o_custkey) AS r,
             NTILE(5) OVER (ORDER BY frequency  ASC,  o_custkey) AS f,
             NTILE(5) OVER (ORDER BY monetary   ASC,  o_custkey) AS m
      FROM rfm
    )
    SELECT r, f, m,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored
    GROUP BY r, f, m
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the CRM workhorse: per customer the recency
    (last order date), frequency (order count) and monetary (total
    spend) measures, each cut into quintiles (NTILE with a
    deterministic customer-id tie-break so both engines assign
    boundary rows identically), reported as the 5x5x5 segment-size
    cube marketing actually consumes.

    Plan shape: one customer-keyed aggregate -> three ranking windows
    over the customer-dimension-sized frame -> <=125-row grouped
    count.

    100 TB shape: windows run over the CUSTOMER DIMENSION (not the
    fact table); NTILE needs a global order, which at dimension scale
    is one rangepartition sort — the standard trade for exact
    quantile segmentation. The fact-table pass is the map-side
    combinable RFM aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    def quintile(colname: str):
        return F.ntile(5).over(
            Window.orderBy(F.col(colname).asc(), F.col("o_custkey"))
        )
    scored = rfm.select(
        quintile("last_order").alias("r"),
        quintile("frequency").alias("f"),
        quintile("monetary").alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "revenue_abc_classes",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running,
             SUM(revenue) OVER () AS total
      FROM rev
    ),
    classed AS (
      SELECT CASE WHEN running / total <= 0.8 THEN 'A'
                  WHEN running / total <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             revenue
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT)        AS n_customers,
           ROUND(SUM(revenue), 2)          AS class_revenue
    FROM classed
    GROUP BY abc_class
    """,
)
def revenue_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis — inventory and account management's
    80/15/5 rule: customers ranked by revenue, classified A while the
    running share stays within 80%, B to 95%, C after. The running
    share needs a deterministic total order (revenue DESC, customer
    id), and the per-class counts plus revenue mass are what the
    Pareto chart plots.

    Plan shape: fact-table aggregate to the customer dimension -> one
    ordered cumulative window + an unbounded total window over the
    dimension-sized frame -> 3-row grouped rollup.

    100 TB shape: like RFM, the global-order window runs over the
    customer dimension; revenue sums are rounded decimals-of-cents at
    aggregation, so the running shares divide identical numbers on
    both engines."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w_run = Window.orderBy(
        F.col("revenue").desc(), F.col("o_custkey")
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rev.select(
        "revenue",
        F.sum("revenue").over(w_run).alias("running"),
        F.sum("revenue").over(w_all).alias("total"),
    )
    share = F.col("running") / F.col("total")
    classed = ranked.select(
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "revenue",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("revenue"), 2).alias("class_revenue"),
    )


@query(
    "revenue_gini_lorenz",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT revenue,
             ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS i,
             NTILE(10)   OVER (ORDER BY revenue, o_custkey) AS decile
      FROM rev
    ),
    g AS (
      SELECT ROUND(2.0 * SUM(i * revenue)
                   / (COUNT(*) * SUM(revenue))
                   - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
             SUM(revenue) AS total,
             COUNT(*) AS n
      FROM ranked
    ),
    per_decile AS (
      SELECT decile, SUM(revenue) AS drev, COUNT(*) AS dn
      FROM ranked GROUP BY decile
    ),
    lorenz AS (
      SELECT decile,
             SUM(dn)   OVER (ORDER BY decile) AS cum_n,
             SUM(drev) OVER (ORDER BY decile) AS cum_rev
      FROM per_decile
    )
    SELECT decile,
           ROUND(CAST(cum_n AS DOUBLE) / n, 6)    AS cum_pop_share,
           ROUND(cum_rev / total, 6)              AS cum_rev_share,
           gini
    FROM lorenz CROSS JOIN g
    """,
)
def revenue_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient + Lorenz curve — the concentration measure
    behind 'whale' analyses (and the ABC entry's continuous twin):
    customers sorted by revenue with deterministic tie-breaks, the
    Gini from the rank-weighted closed form
    2*sum(i*x)/(n*sum(x)) - (n+1)/n, and the Lorenz curve sampled at
    population deciles (cumulative population share vs cumulative
    revenue share — the plot's 10 points).

    Plan shape: fact aggregate to the customer dimension -> one
    global-order window pass assigning rank and decile together ->
    one scalar aggregate (gini) + a 10-row cumulative window.

    100 TB shape: the global sort runs over the customer DIMENSION
    (same trade as RFM/ABC); rank-weighted sums are exact integer x
    cents products summed as doubles — identical addition ORDER is
    not needed because the 1e-6 rounding guard dwarfs sub-ulp drift
    on dimension-sized sums."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue"), F.col("o_custkey"))
    ranked = rev.select(
        "revenue",
        F.row_number().over(w).alias("i"),
        F.ntile(10).over(w).alias("decile"),
    )
    g = ranked.agg(
        F.round(
            2.0
            * F.sum(F.col("i") * F.col("revenue"))
            / (F.count(F.lit(1)) * F.sum("revenue"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
        F.sum("revenue").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    per_decile = ranked.groupBy("decile").agg(
        F.sum("revenue").alias("drev"), F.count(F.lit(1)).alias("dn")
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lorenz = per_decile.select(
        "decile",
        F.sum("dn").over(w_cum).alias("cum_n"),
        F.sum("drev").over(w_cum).alias("cum_rev"),
    )
    return lorenz.join(F.broadcast(g)).select(
        "decile",
        F.round(F.col("cum_n").cast("double") / F.col("n"), 6).alias(
            "cum_pop_share"
        ),
        F.round(F.col("cum_rev") / F.col("total"), 6).alias(
            "cum_rev_share"
        ),
        "gini",
    )
