"""Remaining aggregate / relational families: ordered-set collection,
arg-min/max, grouping sets, unpivot, string distance, map + bitwise
scalar families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.cache import scoped_persist

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "agg_collect_sorted_list",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_keys,
           CAST(COUNT(*) AS BIGINT)                        AS n
    FROM orders
    WHERE o_orderstatus = 'P'
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list with deterministic order (sort_array) serialized to
    a string — the engine-portable form of array aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("order_keys"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_min_by_max_by",
    oracle="""
    SELECT o_custkey,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           arg_max(o_orderkey, o_totalprice) AS priciest_order
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (argmin/argmax) — per customer the order ids with
    extreme totalprice. o_totalprice values are distinct in practice;
    ties would be engine-arbitrary."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint dimensions + grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, measure, value FROM (
      SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice', p_retailprice FROM part
    )
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long) via the native unpivot operator."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "measure", "value")


@query(
    "string_distance_suppliers",
    oracle="""
    SELECT a.s_suppkey AS sk_a, b.s_suppkey AS sk_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS lev
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
)
def string_distance_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup over entity names (the classic
    record-linkage primitive; supplier set is tiny so the self-join is
    broadcast — at scale block by name prefix/length first)."""
    supp = load_table(spark, sf_dir, "supplier")
    a, b = supp.alias("a"), supp.alias("b")
    lev = F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
    return (
        a.join(F.broadcast(b), F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        .select(
            F.col("a.s_suppkey").alias("sk_a"),
            F.col("b.s_suppkey").alias("sk_b"),
            lev.alias("lev"),
        )
        .filter(F.col("lev") <= 2)
    )


@query(
    "map_and_bits_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)      AS k,
           CAST(xor(event_id, user_id) AS BIGINT)                 AS ev_xor,
           CAST(event_id & 255 AS BIGINT)                         AS ev_and,
           CAST(event_id | 1 AS BIGINT)                           AS ev_or,
           CAST(event_id << 2 AS BIGINT)                          AS ev_shl
    FROM events
    """,
)
def map_and_bits_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map access (from_json to map<string,long>) + bitwise scalar ops
    (xor/and/or/shift) — the families SURVEY §2.10 lists beyond the
    reference's own usage."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("ev_xor"),
        F.col("event_id").bitwiseAND(F.lit(255)).alias("ev_and"),
        F.col("event_id").bitwiseOR(F.lit(1)).alias("ev_or"),
        F.shiftleft("event_id", 2).alias("ev_shl"),
    )


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ), df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
    FROM tf JOIN df USING (token), n
    ORDER BY tfidf DESC, doc_id ASC, token ASC
    LIMIT 100
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, spelled out in DataFrame ops (explode -> tf -> document
    frequency -> idf join) with the smoothed idf ln((N+1)/(df+1)).
    Top-100 weighted terms, deterministic tie-break. The MLlib
    HashingTF/IDF pipeline gives the same shape with feature hashing —
    kept out of the oracle path because hash buckets aren't
    reproducible in SQL."""
    from fhir_to_lakehouse_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    # document frequency derives FROM tf (its key set IS the distinct
    # (doc_id, token) pairs), replacing the naive tok.distinct() +
    # countDistinct(doc_id) branch: same answer without countDistinct's
    # expand rewrite or the extra distinct shuffle. tf feeds both the
    # df derivation and the score join, and ReusedExchange does NOT
    # fire across the differently-keyed aggregates (verified), so it
    # is persisted — the same bounded (doc, term) materialization
    # search_bm25_topk uses; without it the corpus is tokenized twice.
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(scoped_persist)
    )
    df_ = tf.groupBy("token").agg(F.count("tf").alias("df"))
    n_docs = docs.count()  # scalar; documents table is the small input
    return (
        tf.join(F.broadcast(df_), "token")
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), F.col("doc_id").asc(), F.col("token").asc())
        .limit(100)
    )


@query(
    "histogram_equidepth",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT)            AS n,
           ROUND(MIN(o_totalprice), 2)         AS lo,
           ROUND(MAX(o_totalprice), 2)         AS hi
    FROM ranked
    GROUP BY bucket
    """,
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram via ntile (the optimizer-statistics shape:
    every bucket holds ~n/10 rows, bucket edges are the data's own
    quantiles). Tie-broken by o_orderkey so bucket assignment is
    deterministic cross-engine. Complement of the fixed-width
    histogram_order_values."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "ratio_to_parent_revenue",
    oracle="""
    WITH nation_rev AS (
      SELECT r_name, n_name,
             SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
           ROUND(CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
             AS share_of_region,
           ROUND(CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER () AS DOUBLE), 6)
             AS share_of_total
    FROM nation_rev
    """,
)
def ratio_to_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent (BI staple): each nation's revenue share within
    its region and globally — aggregate once, then two window sums over
    the tiny aggregate (25 rows), never a second scan. Shares divide
    exact DECIMAL sums so both engines compute identical operands."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation_rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("rev"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return nation_rev.select(
        "r_name",
        "n_name",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w_region).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w_all).cast("double"), 6
        ).alias("share_of_total"),
    )


@query(
    "agg_correlation_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                                         AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6)      AS corr_qty_price,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop_qp,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_samp_qp,
           ROUND(var_samp(l_quantity), 6)                   AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.10 statistical aggregates: Pearson correlation,
    population/sample covariance, and sample variance per return flag —
    single-pass co-moment aggregation (Spark and DuckDB both use
    streaming co-moment updates; results agree to far below the 1e-4/
    1e-6 rounding guards at these magnitudes). For accumulation-order-
    exact moments on money columns see quality_outlier_zscore's
    decimal-sum formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_pop_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_samp_qp"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
    )


@query(
    "agg_skewness_kurtosis",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(l_quantity)                                       AS mu,
             AVG(l_quantity * l_quantity)                          AS r2,
             AVG(l_quantity * l_quantity * l_quantity)             AS r3,
             AVG(l_quantity * l_quantity * l_quantity * l_quantity) AS r4
      FROM lineitem
      GROUP BY l_returnflag
    ),
    c AS (
      SELECT l_returnflag, n, mu,
             r2 - mu * mu                                   AS m2,
             r3 - 3 * mu * r2 + 2 * mu * mu * mu            AS m3,
             r4 - 4 * mu * r3 + 6 * mu * mu * r2
                - 3 * mu * mu * mu * mu                     AS m4
      FROM m
    )
    SELECT l_returnflag, n,
           ROUND(m3 / POWER(m2, 1.5), 6)  AS skew_qty,
           ROUND(m4 / (m2 * m2) - 3, 6)   AS kurt_qty
    FROM c
    ORDER BY l_returnflag
    """,
)
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third/fourth-moment shape statistics per return flag: population
    skewness g1 = m3/m2^1.5 and excess kurtosis m4/m2^2 - 3 — exactly
    the definitions Spark's builtin skewness()/kurtosis() implement.
    The oracle restates them from raw moments, which is only
    cross-engine-safe because l_quantity is a SMALL INTEGER measure:
    x^4 <= 6.25e6, so every power and their partial sums stay exact in
    doubles on both engines and the central-moment cancellation (r2 -
    mu^2 etc.) sees bit-identical inputs. Stating the same oracle over
    a wide-magnitude double column would NOT round-trip at 6dp.

    Plan shape / 100 TB: single map-side-combinable aggregate — Spark's
    CentralMomentAgg carries (n, mean, m2, m3, m4) per key and merges
    partials associatively, so the shuffle moves 5 doubles per
    (partition, flag), independent of row count."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "stats_chi_square_independence",
    oracle="""
    WITH o AS (
      SELECT event_type, user_id % 2 AS cohort,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM events
      GROUP BY 1, 2
    ),
    dense AS (
      SELECT ty.event_type, co.cohort, COALESCE(o.obs, 0) AS obs
      FROM (SELECT DISTINCT event_type FROM o) ty
      CROSS JOIN (SELECT DISTINCT cohort FROM o) co
      LEFT JOIN o USING (event_type, cohort)
    ),
    t AS (
      SELECT event_type, cohort, obs,
             SUM(obs) OVER (PARTITION BY event_type) AS row_tot,
             SUM(obs) OVER (PARTITION BY cohort)     AS col_tot,
             SUM(obs) OVER ()                        AS grand
      FROM dense
    )
    SELECT CAST(COUNT(*) AS BIGINT)                       AS n_cells,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT cohort) - 1) AS BIGINT) AS dof,
           ROUND(SUM(POWER(obs - row_tot * col_tot / grand, 2)
                     / (row_tot * col_tot / grand)), 6)   AS chi2
    FROM t
    """,
)
def stats_chi_square_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson chi-square independence test on the event_type x cohort
    contingency table (cohort = user_id parity, the same deterministic
    A/B split events_ab_test_ztest uses): chi2 = sum (O-E)^2/E with
    E = row_total * col_total / N, plus the table's degrees of freedom.
    The sum runs over the DENSIFIED table (distinct types x distinct
    cohorts, absent cells as zero counts): a sparse groupBy silently
    drops empty cells, and an empty cell contributes its full expected
    count to chi2 — skipping it understates the statistic exactly when
    association is strongest. The cross-engine contract holds because
    every input to the double math is an exact integer count.

    Plan shape / 100 TB: one count aggregate over the corpus collapses
    everything to |types| x 2 cells (map-side combine makes the shuffle
    O(alphabet) per partition); the marginal windows and the chi2 fold
    then run on that tiny table. This is the generic recipe for any
    categorical independence screen at scale: aggregate first, test on
    the contingency table, never row-level."""
    ev = load_table(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("obs"))
    # densify: empty cells must contribute (0 - E)^2 / E; both sides
    # of the cross are alphabet-bounded (a broadcast of a handful of
    # rows), never data-sized
    dense = (
        o.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(o.select("cohort").distinct()))
        .join(o, ["event_type", "cohort"], "left")
        .withColumn("obs", F.coalesce("obs", F.lit(0)))
    )
    t = dense.select(
        "event_type",
        "cohort",
        "obs",
        F.sum("obs").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("cohort")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("grand"),
    )
    # double product, not long*long: marginal products overflow int64
    # around 10^12 events; doubles are exact below 2^53 so the oracle
    # still agrees at test SFs. (DuckDB's BIGINT*BIGINT does NOT
    # promote to HUGEINT — it ERRORS past ~9.2e18 rather than losing
    # precision, so at hypothetical >1e12-event scale the oracle would
    # fail loudly, not drift; the Spark side's double product is the
    # one that keeps working.)
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("grand")
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("cohort") - 1)
        ).alias("dof"),
        F.round(F.sum(F.pow(F.col("obs") - e, 2) / e), 6).alias("chi2"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      GROUP BY 1, 2
    ),
    r AS (
      SELECT o_orderstatus, o_orderpriority, n,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY n DESC, o_orderpriority) AS rk
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_mode
    FROM r WHERE rk = 1
    ORDER BY o_orderstatus
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent order priority
    within each order status, ties broken by priority string order.
    Built as count + rank-1 rather than the builtin mode() because both
    Spark's and DuckDB's mode() leave tie-breaking undefined — the
    count/row_number form pins the answer on every engine.

    Plan shape / 100 TB: the count aggregate collapses the corpus to
    |status| x |priority| rows map-side; the ranking window then runs
    on that bounded table. WindowGroupLimit keeps the rank-1 filter a
    top-1 per key, not a full sort, if the cell count were ever large."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_mode"),
        )
        .orderBy("o_orderstatus")
    )
