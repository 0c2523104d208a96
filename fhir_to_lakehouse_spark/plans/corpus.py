"""Composed training-corpus operations: the end-to-end cleaning
pipeline a pretraining-data job actually runs, plus stratified
sampling, modality joins and histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

_DUCK_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"


@query(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
             0.4 * least(length(text) / 500.0, 1.0)
           + 0.3 * (1 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                        / greatest(length(text), 1))
           + 0.2 * (1 - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                        / greatest(length(text), 1))
           + 0.1 * least(
               (len(list_filter({_DUCK_TOKS},
                    x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x)))
                / greatest(len({_DUCK_TOKS}), 1)) * 5, 1.0) AS q
      FROM documents
    ), deduped AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
      FROM scored
      WHERE q >= 0.5 AND n_chars >= 100
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)  AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(q), 6)          AS avg_quality
    FROM deduped WHERE rn = 1
    GROUP BY lang
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus-cleaning composition in one plan: quality
    score -> threshold + length filter -> exact-dedup keep-canonical ->
    per-language corpus stats. One shuffle for the dedup window, one
    for the final aggregate; scoring is pure codegen over the scan."""
    from fhir_to_lakehouse_spark.functions.text import (
        fingerprint,
        quality_score_from_tokens,
        tokens,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    scored = (
        docs.select(
            "doc_id", "lang", "n_chars", "text", tokens("text").alias("_toks")
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            fingerprint("text").alias("fp"),
            quality_score_from_tokens("text", F.col("_toks")).alias("q"),
        )
        .filter((F.col("q") >= 0.5) & (F.col("n_chars") >= 100))
    )
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    kept = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
    )


@query(
    "sample_stratified_per_lang",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE (doc_id * 2654435761) % 10 < 3
    GROUP BY lang
    """,
)
def sample_stratified_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 30% sample: the hash-mod predicate is applied within
    every stratum identically, so strata keep their proportions and the
    sample is reproducible across engines and runs."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return (
        docs.filter((F.col("doc_id") * 2654435761) % 10 < 3)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@query(
    "join_documents_embeddings",
    oracle="""
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(sqrt(list_dot_product(
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(e.embedding, x -> CAST(x AS DOUBLE))))), 6)
             AS avg_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
)
def join_documents_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality join: text rows enriched with their embedding row
    (doc_id = vec_id), per-language vector-norm stats — the join shape
    of every multimodal training-data build (text ⋈ image ⋈ embedding
    on the sample key)."""
    from fhir_to_lakehouse_spark.functions.similarity import as_double, l2_norm

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    joined = docs.join(emb, docs.doc_id == emb.vec_id)
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(l2_norm(as_double(F.col("embedding")))), 6).alias("avg_norm"),
    )


@query(
    "histogram_order_values",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT)                      AS n,
           ROUND(MIN(o_totalprice), 2)                   AS lo,
           ROUND(MAX(o_totalprice), 2)                   AS hi
    FROM orders
    GROUP BY 1
    """,
)
def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-div bucketing (a single
    map-side-combinable aggregate; the building block for distribution
    profiling of any numeric column)."""
    orders = fan_out_small_scan(load_table(spark, sf_dir, "orders"))
    return (
        orders.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / 50000.0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "embedding_lang_centroid_distances",
    oracle="""
    WITH joined AS (
      SELECT d.lang, e.embedding
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    comps AS (
      SELECT lang, pos, ROUND(AVG(x), 9) AS c
      FROM (
        SELECT lang,
               UNNEST(embedding) AS x,
               UNNEST(range(1, len(embedding) + 1)) AS pos
        FROM joined
      )
      GROUP BY lang, pos
    ),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             SUM(a.c * b.c) AS dot,
             SQRT(SUM(a.c * a.c)) AS na,
             SQRT(SUM(b.c * b.c)) AS nb
      FROM comps a
      JOIN comps b ON a.pos = b.pos AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT lang_a, lang_b,
           ROUND(1 - dot / (na * nb), 6) AS cosine_distance
    FROM pairs
    """,
)
def embedding_lang_centroid_distances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding drift between corpus slices — the monitoring query a
    multilingual embedding pipeline runs per snapshot: the centroid
    vector of each language's embeddings and the pairwise cosine
    distance between centroids. A slice whose centroid drifts from
    its historical position (or toward another language's) signals an
    upstream encoder or language-ID regression. Components round at
    1e-9 BEFORE the cosine so per-component mean accumulation order
    (Spark partial aggregates vs DuckDB sequential) cannot leak into
    the distances.

    Plan shape: modality join on the sample key -> posexplode ->
    (lang, pos) mean (map-side combinable, |langs| x dim rows) ->
    pos-keyed pair join over the TINY centroid frame -> C(5,2) rows.

    100 TB shape: the corpus-sized work is one join + one aggregate
    whose output is |langs| x dim (hundreds of rows); everything
    downstream is centroid-table-sized."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "lang", F.posexplode("embedding").alias("pos0", "x")
    )
    comps = (
        joined.groupBy("lang", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg("x"), 9).alias("c"))
    )
    a, b = comps.alias("a"), comps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
            F.sqrt(F.sum(F.col("a.c") * F.col("a.c"))).alias("na"),
            F.sqrt(F.sum(F.col("b.c") * F.col("b.c"))).alias("nb"),
        )
    )
    return pairs.select(
        "lang_a",
        "lang_b",
        F.round(
            1 - F.col("dot") / (F.col("na") * F.col("nb")), 6
        ).alias("cosine_distance"),
    )
