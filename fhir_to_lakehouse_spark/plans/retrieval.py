"""Text-retrieval queries: BM25 scoring and inverted-index construction.

A training-data pipeline that feeds RAG systems needs the retrieval side
too: score documents against a term query (BM25, the Lucene/Elasticsearch
default ranking function) and build the inverted index (term -> postings)
that serves those queries. No reference analog (the reference stops at
ETL, src/bundle_processor.py); these extend SURVEY §2.10 per the north
star. Both are pure DataFrame aggregates — no UDFs, no collect.

Scale design (100 TB): both queries are explode -> two-level hash
aggregate, so the heavy per-(doc, term) counts collapse map-side before
any shuffle. Corpus-level scalars (N, avgdl) travel as a broadcast 1-row
join, and per-term document frequencies are derived FROM the tf
aggregate (no second corpus scan for them) and broadcast back. Postings
lists stay distributed until the final per-term agg; the output cap (20
doc ids per term) bounds driver/sink row width while df/total_tf remain
exact over the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.cache import (
    scoped_local_checkpoint,
    scoped_persist,
)

from fhir_to_lakehouse_spark.functions import text as TX
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

_DUCK_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"

# BM25 constants (Lucene defaults) and the fixed benchmark query terms.
_K1 = 1.2
_B = 0.75
_QUERY_TERMS = ("merge", "window", "spark")


@query(
    "search_bm25_topk",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, len({_DUCK_TOKS}) AS dl, {_DUCK_TOKS} AS toks
        FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
    e AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
    tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM e
        WHERE term IN ('merge', 'window', 'spark')
        GROUP BY doc_id, dl, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    s AS (
        SELECT tf.doc_id,
               ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_K1} + 1)
                 / (tf.tf + {_K1} * (1 - {_B} + {_B} * tf.dl / stats.avgdl)) AS sc
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats
    )
    SELECT doc_id, ROUND(SUM(sc), 6) AS bm25
    FROM s GROUP BY doc_id
    ORDER BY SUM(sc) DESC, doc_id LIMIT 20
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed 3-term query.

    Plan shape: ONE tokenizing scan produces per-(doc, term) tf counts
    with the doc length carried through the groupBy (dl is functionally
    dependent on doc_id, so adding it to the key is free); per-term df
    is derived from that tf aggregate — not from a second corpus scan —
    and at 3 rows is broadcast back, as is the 1-row (N, avgdl) corpus
    stats relation. The corpus-stats aggregate does re-scan the text
    column; at 100 TB that beats materializing a tokenized copy of the
    corpus just to count lengths. Ties at the top-k boundary break by
    doc_id so the result set is deterministic.
    """
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens("text")

    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        # referenced twice (df derivation + score join); without a
        # persist Spark recomputes the tokenizing scan for the df
        # branch — AQE exchange reuse does NOT fire here (different
        # grouping keys, verified in the executed plan). Cache cost is
        # O(matching (doc, term) rows · 24 B), tiny vs the corpus.
        # Lifecycle: functions/cache.py persist contract.
        .transform(scoped_persist)
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))

    joined = tf.join(F.broadcast(df), "term").crossJoin(F.broadcast(stats))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    return (
        joined.select("doc_id", score.alias("sc"))
        .groupBy("doc_id")
        .agg(F.sum("sc").alias("raw"))
        .orderBy(F.col("raw").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.round("raw", 6).alias("bm25"))
    )


@query(
    "search_inverted_postings",
    oracle=f"""
    WITH e AS (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT term, doc_id, COUNT(*) AS c FROM e GROUP BY term, doc_id)
    SELECT term,
           COUNT(*)                                   AS df,
           CAST(SUM(c) AS BIGINT)                     AS total_tf,
           array_to_string((array_agg(doc_id ORDER BY doc_id))[1:20], ',')
                                                      AS postings_head
    FROM tf GROUP BY term
    """,
)
def search_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, document frequency, total term
    frequency, and the head (first 20 doc ids) of the sorted postings
    list.

    Shape: explode -> (term, doc_id) hash aggregate (map-side
    combinable: a document's repeats of a term collapse locally) ->
    two term-keyed branches over the persisted tf relation:

    - exact stats: df / total_tf as a plain per-term hash aggregate;
    - postings head: rank-filter BEFORE collect. The original form —
      slice(sort_array(collect_list(doc_id)), 1, 20) — capped the
      OUTPUT but still buffered a term's ENTIRE postings list in one
      aggregation buffer: for a stopword-frequency term at 100 TB that
      buffer is the term's full document set on a single reducer, an
      OOM by construction (round-5 stress finding, SCALING.md). The
      row_number window + rank<=20 filter plans as WindowGroupLimit
      (asserted in tests/test_plan_audit.py), so each map task forwards
      at most 20 rows per term into the exchange and no aggregation
      buffer ever holds more than the head.

    Both branches end hash-partitioned on term, so the final join adds
    no exchange. For truly adversarial vocabulary skew the same
    two-level salting used by agg_two_level_skew_safe applies to the
    stats branch (the postings branch is already bounded per task).
    """
    from pyspark.sql import Window

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("c"))
        # both branches (stats aggregate, postings window) feed the
        # final shuffle join — independent map stages the scheduler
        # submits concurrently, so a lazy persist is the r10 cache
        # stampede (each re-runs tokenize+explode+agg cold); eager
        # checkpoint materializes tf once.
        # Lifecycle: functions/cache.py checkpoint contract.
        .transform(lambda d: scoped_local_checkpoint(d, eager=True))
    )
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("c").alias("total_tf")
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    head = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("term")
        # CSV, not ARRAY<BIGINT>: registry boundary convention — the
        # driver's row hasher can't hash list cells (r8 verdict #2)
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("doc_id")).cast("array<string>"),
                ",",
            ).alias("postings_head")
        )
    )
    return stats.join(head, "term").select(
        "term", "df", "total_tf", "postings_head"
    )


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_DUCK_TOKS}) AS t FROM documents
    ),
    v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
      FROM embeddings
    ),
    q AS (SELECT doc_id AS query_id, t FROM toks WHERE doc_id % 100 = 0),
    qv AS (SELECT vec_id AS query_id, x FROM v WHERE vec_id % 100 = 0),
    lex AS (
      SELECT q.query_id, d.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY len(list_intersect(q.t, d.t)) DESC, d.doc_id
             ) AS lex_rank
      FROM q JOIN toks d ON d.doc_id <> q.query_id
    ),
    sem AS (
      SELECT qv.query_id, d.vec_id AS doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY qv.query_id
               ORDER BY list_dot_product(qv.x, d.x) DESC, d.vec_id
             ) AS sem_rank
      FROM qv JOIN v d ON d.vec_id <> qv.query_id
    ),
    fused AS (
      SELECT query_id, doc_id, lex_rank, sem_rank,
             1.0 / (60 + lex_rank) + 1.0 / (60 + sem_rank) AS rrf
      FROM lex JOIN sem USING (query_id, doc_id)
    )
    SELECT query_id, doc_id,
           CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(sem_rank AS BIGINT) AS sem_rank,
           ROUND(rrf, 6)            AS rrf_score
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY rrf DESC, doc_id
             ) AS rn
      FROM fused
    )
    WHERE rn <= 10
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the standard
    RAG-stack ranker: a lexical ranking (distinct-token overlap with
    the query document) and a semantic ranking (embedding dot product)
    are computed independently per query, then fused as
    sum(1/(60+rank)) and the top-10 returned. RRF is rank-based, so
    the two modalities need no score calibration — exactly why
    production hybrid search (Elasticsearch, Vespa, pgvector recipes)
    defaults to it.

    Plan shape (union form): each modality generates its scored pairs
    from its own scan against a broadcast of the bounded query set
    (doc_id % 100 — at scale, the incoming query batch), exactly the
    work the two-relation form did — but the two pair sets then UNION
    into one relation instead of rank-joining. Both rank windows, the
    fusion aggregate, and the final top-10 window all share the
    query_id partitioning, so pair-sized data crosses the wire ONCE:
    the windows re-sort in place, and the (query, doc) fusion groupBy
    needs no exchange because hash-partitioning on query_id already
    clusters every (query, doc) group. The rank-join form paid three
    pair-sized exchanges for the same answer (and a full-outer
    corpus-zip variant benchmarked worse still — it pushed tokenized
    arrays through two extra shuffles and ran the corpus pipeline
    twice; see SCALING.md round-9).

    Rank semantics under modality-incomplete corpora (docs without
    embeddings and vice versa): each modality ranks its FULL
    population — a union row carries the OTHER modality's score as
    null, desc_nulls_last parks those rows after every real rank in
    the other window, and masked ranks + the fusion filter drop any
    doc missing a modality, exactly the rows the old inner rank-join
    dropped (pinned by tests/test_hybrid_rrf_incomplete.py).

    100 TB shape: two embarrassingly-parallel scored scans with
    broadcast probe sides; the only pair-sized movement is the single
    query_id exchange of (query, doc, score) rows. At production
    scale each modality would be served from its index (inverted
    postings / IVF buckets — both in this library) and RRF would fuse
    their top-k lists (k*|queries| rows), making the fusion
    driver-trivial; this entry keeps the exhaustive form so the
    oracle can verify every rank."""
    from fhir_to_lakehouse_spark.functions.similarity import as_double, dot

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    toks = docs.select(
        "doc_id", F.array_distinct(TX.tokens("text")).alias("t")
    )
    vecs = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("x")
    )
    q = toks.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("t").alias("qt")
    )
    qv = vecs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("x").alias("qx")
    )
    from pyspark.sql import Window

    lexp = toks.join(
        F.broadcast(q), F.col("doc_id") != F.col("query_id")
    ).select(
        "query_id",
        "doc_id",
        F.size(F.array_intersect("qt", "t")).alias("overlap"),
        F.lit(None).cast("double").alias("dot"),
    )
    semp = vecs.join(
        F.broadcast(qv), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.lit(None).cast("int").alias("overlap"),
        dot(F.col("qx"), F.col("x")).alias("dot"),
    )
    pairs = lexp.unionByName(semp)
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("overlap").desc_nulls_last(), F.col("doc_id")
    )
    w_sem = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc_nulls_last(), F.col("doc_id")
    )
    ranked = pairs.select(
        "query_id",
        "doc_id",
        # masked ranks: a row only OWNS the rank of its own modality;
        # in the other window it sorts after every real row (null
        # score, desc_nulls_last) so it shifts nothing
        F.when(
            F.col("overlap").isNotNull(), F.row_number().over(w_lex)
        ).alias("lex_rank"),
        F.when(
            F.col("dot").isNotNull(), F.row_number().over(w_sem)
        ).alias("sem_rank"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(60) + F.col("lex_rank"))
        + F.lit(1.0) / (F.lit(60) + F.col("sem_rank"))
    )
    fused = (
        # fusion = the old inner rank-join: query_id partitioning
        # already clusters (query, doc), so this aggregate is
        # exchange-free; docs missing a modality leave a null rank
        # and drop, exactly as the inner join dropped them
        ranked.groupBy("query_id", "doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("sem_rank").alias("sem_rank"),
        )
        .filter(
            F.col("lex_rank").isNotNull() & F.col("sem_rank").isNotNull()
        )
        .select(
            "query_id", "doc_id", "lex_rank", "sem_rank", rrf.alias("rrf")
        )
    )
    w_fin = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rn", F.row_number().over(w_fin))
        .filter(F.col("rn") <= 10)
        .select(
            "query_id",
            "doc_id",
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("sem_rank").cast("long").alias("sem_rank"),
            F.round("rrf", 6).alias("rrf_score"),
        )
    )
