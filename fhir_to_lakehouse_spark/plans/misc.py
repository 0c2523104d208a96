"""Remaining breadth: window value functions, array family, extra
string/date scalars, positional explode, and the end-to-end pipeline
final-state query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "window_value_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate ASC, o_orderkey ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING)
                                          AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate ASC, o_orderkey ASC
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING)
                                          AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with full-partition frames."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


@query(
    "window_distribution_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist distribution window functions."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT)               AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() markers distinguishing rollup subtotal levels from
    genuine NULL group values."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
    ).select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n")


@query(
    "array_family",
    oracle=r"""
    WITH t AS (
      SELECT p_partkey, string_split(p_name, ' ') AS words FROM part
    )
    SELECT p_partkey,
           array_to_string(list_sort(words), ',')            AS sorted_words,
           array_to_string(list_reverse_sort(words), ',')    AS rsorted_words,
           CAST(list_position(words, 'widget') AS INT)       AS widget_pos,
           list_contains(words, 'bolt')                      AS has_bolt,
           array_to_string(flatten([words, ['x']]), ',')     AS appended,
           array_to_string(words[1:2], ',')                  AS first_two
    FROM t
    """,
)
def array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_sort / desc sort / array_position / array_contains /
    flatten-concat / slice. Array results serialize to CSV at the
    boundary (registry convention — the driver hasher can't hash
    list cells); the array ops themselves still run as arrays."""
    part = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    csv = lambda c: F.array_join(c, ",")  # noqa: E731
    return part.select(
        "p_partkey",
        csv(F.array_sort(words)).alias("sorted_words"),
        csv(F.reverse(F.array_sort(words))).alias("rsorted_words"),
        F.array_position(words, "widget").cast("int").alias("widget_pos"),
        F.array_contains(words, "bolt").alias("has_bolt"),
        csv(F.flatten(F.array(words, F.array(F.lit("x"))))).alias("appended"),
        csv(F.slice(words, 1, 2)).alias("first_two"),
    )


@query(
    "array_hof_family",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(list_filter(v, x -> x > 0)) AS INT)          AS n_pos,
           ROUND(list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
                             (acc, x) -> acc + x), 6)            AS l1_norm,
           list_transform(v, x -> x >= 0)[1]                     AS first_nonneg
    FROM t
    """,
)
def array_hof_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: filter / aggregate(fold) / transform —
    L1 norm and sign stats over embedding vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: F.abs(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("l1_norm"),
        F.element_at(F.transform(v, lambda x: x >= 0), 1).alias("first_nonneg"),
    )


@query(
    "posexplode_tokens",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, CAST(i AS INT) - 1 AS pos, toks[i] AS token
    FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token with its position (0-based like Spark)."""
    from fhir_to_lakehouse_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    )


@query(
    "string_pad_family",
    oracle="""
    SELECT s_suppkey,
           lpad(s_name, 20, '_')        AS padded_l,
           rpad(s_name, 20, '.')        AS padded_r,
           repeat(s_name, 2)            AS doubled,
           reverse(s_name)              AS reversed_name,
           left(s_name, 4)              AS head4,
           right(s_name, 3)             AS tail3
    FROM supplier
    """,
)
def string_pad_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad / rpad / repeat / reverse / left / right."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.lpad("s_name", 20, "_").alias("padded_l"),
        F.rpad("s_name", 20, ".").alias("padded_r"),
        F.repeat("s_name", 2).alias("doubled"),
        F.reverse(F.col("s_name")).alias("reversed_name"),
        F.substring("s_name", 1, 4).alias("head4"),
        F.substring(F.col("s_name"), -3, 3).alias("tail3"),
    )


@query(
    "date_boundaries_family",
    oracle="""
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE))                      AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
           CAST(date_trunc('week', o_orderdate) AS DATE)            AS week_start,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT)        AS dow,
           CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT)        AS doy
    FROM orders
    """,
)
def date_boundaries_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_day / add_months / week trunc / day-of-week / day-of-year.

    Note: DuckDB dayofweek is 0=Sunday while Spark dayofweek is
    1=Sunday; Spark side subtracts 1 to align."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus3mo"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        (F.dayofweek(d) - 1).alias("dow"),
        F.dayofyear(d).alias("doy"),
    )


@query(
    "pipeline_final_state",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY (event_id % 4) ASC, event_id DESC) AS rn
      FROM events
    )
    SELECT CAST(user_id AS VARCHAR) AS id,
           value > 50               AS active
    FROM latest
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def pipeline_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole ETL semantic end to end as one query: synthesize
    bundles -> parse -> explode -> W1 dedup -> drop keys whose final
    event is DELETE -> encode surviving PUT resources (from_json with
    the curated Patient schema). Equivalent to the table state the
    BundlePipeline sink would hold after one batch (J1 upsert + J2
    delete), expressed without the sink so the oracle can check it."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        encode_resources,
        latest_per_key,
        prepare_stream,
        split_by_method,
    )
    from fhir_to_lakehouse_spark.plans.pipeline_q import _bundle_events

    events = _bundle_events(spark, sf_dir)
    deduped = latest_per_key(prepare_stream(events), key="request_url")
    puts, _deletes = split_by_method(deduped)
    encoded = encode_resources(puts, "Patient")
    return encoded.select("id", "active")


@query(
    "linkage_blocked_scoring",
    oracle="""
    WITH clean AS (
      SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
             c_acctbal AS bal,
             substr(c_name, length(c_name) - 2, 3) AS blk
      FROM customer
    ),
    dirty AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey % 3 = 0
                  THEN replace(c_name, 'Customer', 'Custmoer')
                  ELSE c_name END AS name,
             c_nationkey
               + CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END AS nation,
             c_acctbal
               + CASE WHEN c_custkey % 5 = 0 THEN 0.3 ELSE 0 END AS bal,
             substr(c_name, length(c_name) - 2, 3) AS blk
      FROM customer
    ),
    scored AS (
      SELECT c.id AS id_c, d.id AS id_d,
             CASE WHEN levenshtein(c.name, d.name) = 0 THEN 3
                  WHEN levenshtein(c.name, d.name) <= 2 THEN 2
                  ELSE 0 END
             + CASE WHEN c.nation = d.nation THEN 1 ELSE 0 END
             + CASE WHEN ABS(c.bal - d.bal) < 0.01 THEN 1 ELSE 0 END
               AS score
      FROM clean c JOIN dirty d ON c.blk = d.blk
    )
    SELECT score,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(CASE WHEN id_c = id_d THEN 1 END) AS BIGINT)
             AS n_true,
           COUNT(CASE WHEN score >= 4 THEN 1 END) > 0 AS classified_match
    FROM scored
    GROUP BY score
    """,
)
def linkage_blocked_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage, Fellegi-Sunter shape — the master-patient-index
    primitive behind every healthcare data integration: a second
    registry is simulated by deterministic perturbations of the
    customer dimension (name transposition on every 3rd record,
    nation drift on every 11th, balance noise on every 5th), records
    pair only WITHIN blocks (last-3-digits blocking key — blocking is
    what makes linkage subquadratic), each pair gets an agreement
    score over three comparators (edit-distance-banded name, exact
    nation, toleranced balance), and the output is the score
    CALIBRATION TABLE: pair counts per score with ground-truth match
    counts — exactly what an analyst inspects to place the
    match/possible/non-match thresholds. The classified_match column
    marks the score band a >= 4 threshold accepts; the perturbation
    mix makes both false negatives (triple-perturbed records score 3)
    and the clean-pair score 5 visible.

    Plan shape: two projections of one scan -> equi-join on the
    blocking key (shuffle-hash, block-bounded fan-out) -> codegen'd
    comparator arithmetic -> |score values| grouped rows.

    100 TB shape: pair volume is sum over blocks of |c_blk| x |d_blk|,
    controlled entirely by the blocking key's selectivity (the
    production knob); comparators are pure codegen; ground truth
    rides the same row, so calibration costs nothing extra."""
    cust = load_table(spark, sf_dir, "customer")
    blk = F.substring(
        F.col("c_name"), F.length("c_name") - 2, 3
    ).alias("blk")
    clean = cust.select(
        F.col("c_custkey").alias("id_c"),
        F.col("c_name").alias("name_c"),
        F.col("c_nationkey").alias("nation_c"),
        F.col("c_acctbal").alias("bal_c"),
        blk,
    )
    k = F.col("c_custkey")
    dirty = cust.select(
        k.alias("id_d"),
        F.when(
            k % 3 == 0,
            F.regexp_replace("c_name", "Customer", "Custmoer"),
        )
        .otherwise(F.col("c_name"))
        .alias("name_d"),
        (
            F.col("c_nationkey")
            + F.when(k % 11 == 0, 1).otherwise(0)
        ).alias("nation_d"),
        (
            F.col("c_acctbal") + F.when(k % 5 == 0, 0.3).otherwise(0.0)
        ).alias("bal_d"),
        blk,
    )
    lev = F.levenshtein("name_c", "name_d")
    score = (
        F.when(lev == 0, 3).when(lev <= 2, 2).otherwise(0)
        + F.when(F.col("nation_c") == F.col("nation_d"), 1).otherwise(0)
        + F.when(
            F.abs(F.col("bal_c") - F.col("bal_d")) < 0.01, 1
        ).otherwise(0)
    )
    scored = clean.join(dirty, "blk").select(
        "id_c", "id_d", score.alias("score")
    )
    return scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.when(F.col("id_c") == F.col("id_d"), 1)).alias("n_true"),
        (
            F.count(F.when(F.col("score") >= 4, 1)) > 0
        ).alias("classified_match"),
    )
