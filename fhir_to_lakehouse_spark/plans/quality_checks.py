"""Data-quality validation queries: Deequ-style constraint suites,
statistical outlier detection, and per-dimension feature statistics.

Production pipelines gate every ingest batch on declarative quality
constraints (completeness, uniqueness, domain membership, bounds) and
profile features before training. No reference analog (the reference
validates only JSON parseability, src/bundle_processor.py:60-74); these
extend SURVEY §2.10 per the north star.

Scale design (100 TB): the constraint suite is ONE full-scan aggregate
producing a single row that is then unpivoted driver-free into
(check, metric, passed) rows — adding a constraint adds an expression,
not a scan. Outlier detection computes exact per-group moments from
decimal sums (map-side combinable, two aggregates over one shuffle key)
rather than window functions, so no per-group sort and no skew from a
hot status value. Feature stats explode the embedding column once and
hash-aggregate on the (dense, bounded) dimension index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)


@query(
    "quality_constraint_checks",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) AS n,
               COUNT(o_custkey) AS custkey_nonnull,
               COUNT(DISTINCT o_orderkey) AS orderkey_distinct,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS status_ok
        FROM orders
    )
    SELECT 'completeness_custkey' AS check_name,
           ROUND(custkey_nonnull / CAST(n AS DOUBLE), 6) AS metric,
           custkey_nonnull = n AS passed FROM m
    UNION ALL
    SELECT 'uniqueness_orderkey',
           ROUND(orderkey_distinct / CAST(n AS DOUBLE), 6),
           orderkey_distinct = n FROM m
    UNION ALL
    SELECT 'min_totalprice_positive',
           ROUND(min_price, 6),
           min_price > 0 FROM m
    UNION ALL
    SELECT 'max_totalprice_bounded',
           ROUND(max_price, 6),
           max_price <= 1000000 FROM m
    UNION ALL
    SELECT 'status_domain',
           ROUND(status_ok / CAST(n AS DOUBLE), 6),
           status_ok = n FROM m
    """,
)
def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite over ``orders`` in ONE scan.

    All six metrics (row count, completeness, uniqueness, min/max
    bounds, domain membership) come from a single aggregate row; the
    row is unpivoted to one (check_name, metric, passed) row per
    constraint with ``stack`` — a driver-free reshape of a 1-row
    relation. COUNT(DISTINCT) is the only expression that widens the
    plan (Spark expands it to a two-phase aggregate), which is exactly
    how an exact uniqueness check must behave at scale; swap in
    approx_count_distinct for a sketched variant when exactness is
    not required.
    """
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    m = orders.agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_orderkey").alias("orderkey_distinct"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("status_ok"),
    )
    checks = m.select(
        F.expr(
            """stack(5,
              'completeness_custkey', round(custkey_nonnull / cast(n as double), 6),
                  custkey_nonnull = n,
              'uniqueness_orderkey', round(orderkey_distinct / cast(n as double), 6),
                  orderkey_distinct = n,
              'min_totalprice_positive', round(min_price, 6), min_price > 0,
              'max_totalprice_bounded', round(max_price, 6), max_price <= 1000000,
              'status_domain', round(status_ok / cast(n as double), 6),
                  status_ok = n
            ) as (check_name, metric, passed)"""
        )
    )
    return checks


@query(
    "quality_outlier_zscore",
    oracle="""
    WITH t AS (SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS p
               FROM orders),
    g AS (
        SELECT o_orderstatus,
               COUNT(*) AS n,
               SUM(p) AS s1,
               SUM(CAST(p AS DECIMAL(38,4)) * p) AS s2
        FROM t GROUP BY o_orderstatus
    ),
    z AS (
        SELECT t.o_orderstatus, t.p,
               (CAST(t.p AS DOUBLE) - CAST(g.s1 AS DOUBLE) / g.n)
                 / sqrt(CAST(g.s2 AS DOUBLE) / g.n
                        - (CAST(g.s1 AS DOUBLE) / g.n) * (CAST(g.s1 AS DOUBLE) / g.n))
                 AS zs
        FROM t JOIN g USING (o_orderstatus)
    )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN abs(zs) > 2.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           ROUND(MAX(abs(zs)), 6) AS max_abs_z
    FROM z GROUP BY o_orderstatus
    """,
)
def quality_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status z-score outlier counts over order totals.

    The group moments are EXACT: prices are 2-dp values, so summing
    them (and their squares) as decimals is associative and engine-
    independent — unlike stddev_samp/stddev_pop, whose double
    accumulation order differs across engines and partitionings and
    would flip counts for rows sitting exactly on the |z| = 2.5
    boundary. Shape: one grouped aggregate for the moments (map-side
    combinable), broadcast back onto the rows (a handful of status
    groups), one more grouped aggregate for the counts. No window
    function, so no per-group sort and a hot status value costs
    nothing extra.
    """
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    p = F.col("o_totalprice").cast("decimal(18,2)")
    t = orders.select("o_orderstatus", p.alias("p"))
    g = t.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum("p").alias("s1"),
        F.sum(F.col("p").cast("decimal(38,4)") * F.col("p")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    zs = (F.col("p").cast("double") - mean) / F.sqrt(var)
    return (
        t.join(F.broadcast(g), "o_orderstatus")
        .select("o_orderstatus", zs.alias("zs"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.abs("zs") > 2.5, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(F.abs("zs")), 6).alias("max_abs_z"),
        )
    )


@query(
    "feature_dim_stats",
    oracle="""
    SELECT dim,
           COUNT(*) AS n,
           ROUND(AVG(CAST(v AS DOUBLE)), 6) AS mean_v,
           ROUND(MIN(CAST(v AS DOUBLE)), 6) AS min_v,
           ROUND(MAX(CAST(v AS DOUBLE)), 6) AS max_v
    FROM (
        SELECT generate_subscripts(embedding, 1) AS dim,
               unnest(embedding) AS v
        FROM embeddings
    )
    GROUP BY dim
    """,
)
def feature_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature statistics over the embedding column —
    the profiling pass that feeds feature normalization (and catches
    dead or exploding dimensions) before training.

    posexplode keeps the dimension index JVM-side; the aggregate keys
    on the dense, bounded dim index so there are exactly ``d`` groups
    regardless of corpus size — map-side combine reduces each
    partition to d rows before the (tiny) shuffle. The mean is rounded
    at 6 dp: float-to-double promotion is exact, and at ~0.1-magnitude
    values the double-sum accumulation-order noise is ~1e-13, far
    inside the rounding guard. For stddev at scale use the same exact-
    sum trick as quality_outlier_zscore or accept sketched moments.
    """
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    exploded = emb.select(F.posexplode("embedding").alias("dim0", "v"))
    return (
        exploded.select((F.col("dim0") + 1).alias("dim"), F.col("v").cast("double"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("v"), 6).alias("mean_v"),
            F.round(F.min("v"), 6).alias("min_v"),
            F.round(F.max("v"), 6).alias("max_v"),
        )
    )


@query(
    "quality_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INTEGER) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT d,
           CAST(n AS BIGINT)                              AS n,
           ROUND(CAST(n AS DOUBLE) / total, 6)            AS observed_p,
           ROUND(log10(1.0 + 1.0 / d), 6)                 AS benford_p,
           ROUND(CAST(n AS DOUBLE) / total
                 - log10(1.0 + 1.0 / d), 6)               AS deviation
    FROM obs CROSS JOIN tot
    """,
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the forensic-accounting screen for
    fabricated numeric columns: the leading-digit distribution of
    order totals against Benford's law p(d) = log10(1 + 1/d), with
    per-digit deviations. Real multi-scale monetary data tracks
    Benford closely; synthetic or tampered columns (like this
    uniform-ish TPC-H price) deviate visibly — which is exactly what
    the audit exists to flag.

    Plan shape: leading digit via integer-string truncation (codegen)
    -> 9-row grouped count -> 1-row total broadcast.

    100 TB shape: output structurally bounded at 9 rows; map-side
    combinable; one scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = orders.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.agg(F.sum("n").alias("total"))
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    p = F.col("n").cast("double") / F.col("total")
    return obs.join(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(p, 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(p - benford, 6).alias("deviation"),
    )


@query(
    "quality_psi_drift",
    oracle="""
    WITH p AS (SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS INT), 9)
                        AS bin,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                        AS is_ref
               FROM orders WHERE o_orderstatus IN ('F', 'O')),
    c AS (SELECT bin,
                 CAST(SUM(is_ref) AS BIGINT)     AS ref_n,
                 CAST(SUM(1 - is_ref) AS BIGINT) AS cur_n
          FROM p GROUP BY bin),
    tot AS (SELECT SUM(ref_n) AS nr, SUM(cur_n) AS nc FROM c)
    SELECT c.bin,
           c.ref_n,
           c.cur_n,
           ROUND(c.ref_n / CAST(tot.nr AS DOUBLE), 6) AS ref_frac,
           ROUND(c.cur_n / CAST(tot.nc AS DOUBLE), 6) AS cur_frac,
           ROUND((c.cur_n / CAST(tot.nc AS DOUBLE)
                  - c.ref_n / CAST(tot.nr AS DOUBLE))
                 * LN((c.cur_n / CAST(tot.nc AS DOUBLE))
                      / (c.ref_n / CAST(tot.nr AS DOUBLE))), 6)
               AS psi_term
    FROM c, tot
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two order-population slices
    (finished vs open orders) over fixed 50k-wide price bins — the
    standard model-monitoring drift gate: PSI = sum over bins of
    (cur% - ref%) * ln(cur% / ref%); < 0.1 stable, > 0.25 action.
    Emitted per bin (the sum is one more fold away) so the drifting
    bins themselves are visible, which is what an operator actually
    needs from the alert.

    Bin edges are FIXED (not quantiles) deliberately: at 100 TB the
    whole computation is then a single hash aggregate on a bounded key
    (10 bins x 2 slices collapses map-side to 20 partial rows per
    task) followed by arithmetic on a 10-row frame — no sort, no
    second scan, no sampled quantile sketch whose bin edges drift
    between runs. Both fractions are exact integer ratios, so the
    only float op is the final ln, rounded at 6dp on both engines."""
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    p = orders.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.least(
            F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9)
        ).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_ref"),
    )
    c = p.groupBy("bin").agg(
        F.sum("is_ref").alias("ref_n"),
        F.sum(1 - F.col("is_ref")).alias("cur_n"),
    )
    tot = c.agg(
        F.sum("ref_n").alias("nr"), F.sum("cur_n").alias("nc")
    )
    ref_frac = F.col("ref_n") / F.col("nr").cast("double")
    cur_frac = F.col("cur_n") / F.col("nc").cast("double")
    return c.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_n",
        "cur_n",
        F.round(ref_frac, 6).alias("ref_frac"),
        F.round(cur_frac, 6).alias("cur_frac"),
        F.round((cur_frac - ref_frac) * F.log(cur_frac / ref_frac), 6).alias(
            "psi_term"
        ),
    )


@query(
    "quality_ks_two_sample",
    oracle="""
    WITH p AS (SELECT o_totalprice AS v,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                        AS is_ref
               FROM orders WHERE o_orderstatus IN ('F', 'O')),
    c AS (SELECT v,
                 SUM(is_ref)     AS r,
                 SUM(1 - is_ref) AS q
          FROM p GROUP BY v),
    w AS (SELECT SUM(r) OVER (ORDER BY v) AS cr,
                 SUM(q) OVER (ORDER BY v) AS cq
          FROM c),
    tot AS (SELECT SUM(r) AS nr, SUM(q) AS nq FROM c)
    SELECT ROUND(MAX(ABS(w.cr / CAST(tot.nr AS DOUBLE)
                         - w.cq / CAST(tot.nq AS DOUBLE))), 6) AS ks_stat,
           CAST(MAX(tot.nr) AS BIGINT) AS n_ref,
           CAST(MAX(tot.nq) AS BIGINT) AS n_cur
    FROM w, tot
    """,
)
def quality_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    finished- and open-order price distributions: D = max over x of
    |F_ref(x) - F_cur(x)| over the pooled support. The classic
    distribution-drift test where PSI's fixed bins are too coarse —
    D is binning-free and sensitive to any CDF separation.

    Distributed shape: (value -> per-slice counts) hash aggregate
    first — the pooled support, not the row count, is what gets
    ordered — then the running CDFs come from a DISTRIBUTED prefix sum
    (the corpus_pack_token_shards pattern): support values are
    range-bucketed, each bucket computes its local running totals in
    parallel, the per-bucket totals (one row per bucket) are
    prefix-summed on a single tiny partition, and the offsets are
    broadcast back — no one-partition global window anywhere. The
    max-abs-gap then folds map-side. Counts are exact integers; the
    two divisions and the abs-max are the only float ops, rounded at
    6dp on both engines. At 100 TB the ordered state is distinct
    values only (bounded for fixed-precision features) and stays
    bucket-parallel end to end; no driver collect anywhere."""
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    from pyspark.sql import Window

    p = orders.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_ref"),
    )
    c = p.groupBy("v").agg(
        F.sum("is_ref").alias("r"),
        F.sum(1 - F.col("is_ref")).alias("q"),
    ).withColumn(
        # fixed-width range buckets over the known price domain; at
        # scale these edges would come from an approx-quantile sketch
        "bucket",
        F.least(F.floor(F.col("v") / 50000).cast("int"), F.lit(9)),
    )
    local_w = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = c.select(
        "bucket",
        "v",
        F.sum("r").over(local_w).alias("lcr"),
        F.sum("q").over(local_w).alias("lcq"),
    )
    bucket_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offsets = (
        c.groupBy("bucket")
        .agg(F.sum("r").alias("br"), F.sum("q").alias("bq"))
        .select(
            "bucket",
            (F.sum("br").over(bucket_w) - F.col("br")).alias("or_"),
            (F.sum("bq").over(bucket_w) - F.col("bq")).alias("oq_"),
        )
    )
    w = local.join(F.broadcast(offsets), "bucket").select(
        (F.col("or_") + F.col("lcr")).alias("cr"),
        (F.col("oq_") + F.col("lcq")).alias("cq"),
    )
    tot = c.agg(F.sum("r").alias("nr"), F.sum("q").alias("nq"))
    return (
        w.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cr") / F.col("nr").cast("double")
                        - F.col("cq") / F.col("nq").cast("double")
                    )
                ),
                6,
            ).alias("ks_stat"),
            F.max("nr").cast("bigint").alias("n_ref"),
            F.max("nq").cast("bigint").alias("n_cur"),
        )
    )
