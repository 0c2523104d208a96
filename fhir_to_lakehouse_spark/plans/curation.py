"""Corpus-curation queries a large-scale training-data pipeline needs
beyond dedup/similarity: repetition-based quality filtering (Gopher-style
signals), benchmark decontamination (n-gram overlap against a held-out
eval set), and token-budget shard packing (distributed prefix sum).

No reference analog (the reference pipeline stops at dedup + merge,
src/bundle_processor.py:114-128); these extend §2.10 per the north star.
Every oracle mirrors the Catalyst expression digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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

# DuckDB bigram list (non-distinct): pairs (toks[i], toks[i+1]), i = 1..n-1
_DUCK_BIGRAMS = (
    "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])"
)

# DuckDB distinct word-3-shingles (same fragment as text_shingle_stats)
_DUCK_SHINGLES3 = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),"
    " i -> array_to_string(toks[i:i+2], ' ')))"
)


@query(
    "text_repetition_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, unnest({_DUCK_BIGRAMS}) AS bg FROM t),
    c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM b GROUP BY doc_id, bg)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT)                         AS n_bigrams,
           COUNT(*)                                         AS n_distinct_bigrams,
           ROUND(1.0 - COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_bigram_frac,
           ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6)    AS top_bigram_frac
    FROM c
    GROUP BY doc_id
    """,
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    word bigrams that are duplicates, and the mass of the single most
    frequent bigram. High values flag boilerplate / spam for corpus
    filtering.

    Shape: explode bigrams -> two-level aggregation, so the heavy
    per-(doc, bigram) count is a map-side-combinable hash aggregate
    keyed by doc_id — partial aggregation collapses each document's
    bigrams locally before the shuffle, and the second agg reuses the
    doc_id partitioning (no extra Exchange). Per-row quadratic HOF
    scans are deliberately avoided. Docs with < 2 tokens have no
    bigrams and drop out (both engines)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # staged: the bigram expression references the token array three
    # times (size guard, sequence bound, transform); tokens in their
    # own projection are computed once (multi-use non-cheap aliases
    # survive CollapseProject)
    toks = F.col("_toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - 1)
    bigrams = F.when(
        n >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2))),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    per_bigram = (
        docs.select("doc_id", TX.tokens("text").alias("_toks"))
        .select("doc_id", bigrams.alias("bgs"))
        .select("doc_id", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
    )
    total = F.sum("cnt")
    return per_bigram.groupBy("doc_id").agg(
        total.alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
        F.round(1.0 - F.count("*") / total.cast("double"), 6).alias(
            "dup_bigram_frac"
        ),
        F.round(F.max("cnt") / total.cast("double"), 6).alias("top_bigram_frac"),
    )


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, {_DUCK_SHINGLES3} AS sh FROM t),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM s WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, unnest(sh) AS s FROM s WHERE doc_id % 50 <> 0)
    SELECT train.doc_id,
           COUNT(*)                                        AS n_shingles,
           COUNT(bench.s)                                  AS n_overlap,
           ROUND(COUNT(bench.s) / CAST(COUNT(*) AS DOUBLE), 6) AS overlap_frac,
           COUNT(bench.s) / CAST(COUNT(*) AS DOUBLE) >= 0.2    AS contaminated
    FROM train LEFT JOIN bench ON train.s = bench.s
    GROUP BY train.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    fraction of its distinct word-3-shingles that also appear in a
    held-out benchmark set (modeled as doc_id % 50 == 0); docs at or
    above 20% overlap are flagged contaminated.

    Scale shape: the benchmark side (an eval set — thousands of docs,
    not billions) collapses to a distinct shingle set and is
    BROADCAST, so the 100-TB training side never shuffles — each task
    probes the in-memory hash set and aggregates locally by doc_id.
    Shingles per doc are pre-deduped, so the left join cannot fan out
    rows. Docs with < 3 tokens have no shingles and drop out."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # staged materialization (see shingles_from_tokens docstring): the
    # convenience single-select form embeds the regex tokenizer 4x per
    # row; tokens in their own projection are computed once
    sh = docs.select("doc_id", TX.tokens("text").alias("_toks")).select(
        "doc_id", TX.shingles_from_tokens(F.col("_toks"), 3).alias("sh")
    )
    bench = (
        sh.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.explode("sh").alias("s")
    )
    joined = train.join(F.broadcast(bench), "s", "left")
    n_overlap = F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
    frac = n_overlap / F.count("*").cast("double")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        n_overlap.alias("n_overlap"),
        F.round(frac, 6).alias("overlap_frac"),
        (frac >= 0.2).alias("contaminated"),
    )


@query(
    "dedup_incremental_new_docs",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM documents),
    hist AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
    incoming AS (
      SELECT doc_id, fp,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM fp WHERE doc_id % 2 = 1)
    SELECT doc_id, fp
    FROM incoming
    WHERE rn = 1 AND fp NOT IN (SELECT fp FROM hist)
    """,
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus-growth dedup: admit only incoming documents
    (modeled as odd doc_ids) whose content fingerprint is neither in
    the already-ingested corpus (even doc_ids) nor earlier in the same
    batch — the daily-ingest path that avoids re-deduplicating the
    whole corpus.

    Scale shape: both the in-batch first-occurrence window and the
    anti join hash-partition on the md5 fingerprint — a uniformly
    distributed key, so no skew — and the historical side is an index
    of fingerprints (32 bytes/doc), not documents. At 100 TB the
    anti join is further pre-pruned by a runtime Bloom filter
    (verified in tests/test_scale.py); batch work stays O(batch ×
    log(index)), never O(corpus)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    fp = docs.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
    )
    hist = fp.filter(F.col("doc_id") % 2 == 0).select("fp").distinct()
    w = Window.partitionBy("fp").orderBy("doc_id")
    incoming_first = (
        fp.filter(F.col("doc_id") % 2 == 1)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return incoming_first.join(hist, "fp", "left_anti").select("doc_id", "fp")


@query(
    "sample_bottomk_mergeable",
    oracle="""
    SELECT lang, doc_id, CAST(rn AS INT) AS rn
    FROM (SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                             doc_id) AS rn
          FROM documents)
    WHERE rn <= 8
    """,
)
def sample_bottomk_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable uniform sampling: per language, keep the 8 docs with
    the lexicographically smallest md5(doc_id) — a bottom-k sketch.

    Because membership depends only on each doc's own hash rank,
    bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)): partitions
    sample independently and the driver merges k-sized sketches, so a
    100-TB uniform sample never shuffles full data — the same
    mergeability the HLL sketches (plans/approx.py) exploit. The
    window here computes the same result as a per-partition top-k +
    merge; partial TakeOrdered pushes the k-filter map-side."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
        .select("lang", "doc_id", "rn")
    )


@query(
    "sample_domain_mixing",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::UBIGINT / 4294967296.0 AS mix_u,
             (1 + CAST(substr(source, 4) AS INT) % 10) / 10.0 AS weight
      FROM documents)
    SELECT doc_id, source, mix_u, weight
    FROM t WHERE mix_u < weight
    """,
)
def sample_domain_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: accept each document with a
    per-source target rate (weight = (1 + src_num % 10)/10 models the
    up/down-weighting table of a real mixture spec), decided by a
    deterministic per-doc uniform draw u = md5('mix#'||doc_id)[:8] /
    2^32.

    Hash-derived acceptance needs no RNG state, is reproducible across
    retries/re-runs (a cluster requirement — tasks may re-execute),
    and filters map-side with zero shuffle. u and weight are exact
    doubles (a 32-bit integer and small-int ratios are both
    representable), so the oracle hash-matches without rounding."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mix#"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    weight = (1 + F.substring("source", 4, 10).cast("int") % 10) / F.lit(10.0)
    return (
        docs.select(
            "doc_id", "source", u.alias("mix_u"), weight.alias("weight")
        )
        .filter(F.col("mix_u") < F.col("weight"))
    )


@query(
    "corpus_pack_token_shards",
    oracle=f"""
    WITH t AS (SELECT doc_id, len({_DUCK_TOKS}) AS n_tokens FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM t)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(FLOOR((cum_tokens - n_tokens) / 10000.0) AS BIGINT) AS shard_id
    FROM c
    """,
)
def corpus_pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: assign documents (in doc_id order)
    to training shards of ~10k tokens by global prefix sum — the
    sequence-packing step before tokenized-example writing.

    Implemented as a DISTRIBUTED prefix sum, not a single global
    window (a global ORDER BY window is a one-partition bottleneck at
    100 TB): docs are range-bucketed on doc_id, each bucket computes
    its local running total in parallel, bucket totals (one row per
    bucket) are prefix-summed on a single tiny partition, and the
    per-bucket offsets are broadcast back. cum = bucket_offset +
    local_cum reproduces the exact global running sum."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        F.size(TX.tokens("text")).alias("n_tokens"),
        (F.col("doc_id") / 100).cast("long").alias("bucket"),
    )
    local_w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("local_cum", F.sum("n_tokens").over(local_w))
    bucket_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        t.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "offset", F.sum("bucket_total").over(bucket_w) - F.col("bucket_total")
        )
        .select("bucket", "offset")
    )
    cum = F.col("offset") + F.col("local_cum")
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            cum.alias("cum_tokens"),
            F.floor((cum - F.col("n_tokens")) / 10000.0).alias("shard_id"),
        )
    )


@query(
    "dedup_repeated_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(t[(i*5+1):(i*5+5)], ' ') AS chunk
      FROM toks, UNNEST(range(CAST(ceil(len(t)/5.0) AS BIGINT))) AS u(i)
      WHERE len(t) > 0
    ), freq AS (
      SELECT chunk, COUNT(*) AS c FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           COALESCE(string_agg(CASE WHEN f.c = 1 THEN c.chunk END,
                               ' ' ORDER BY c.pos), '') AS kept_text
    FROM chunks c JOIN freq f USING (chunk)
    GROUP BY c.doc_id
    """,
)
def dedup_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document duplicated-span removal: split every
    document into consecutive 5-token chunks, count each chunk's
    corpus-wide frequency, drop every occurrence of any chunk that
    appears more than once anywhere, and reassemble each document from
    its surviving chunks in position order (plus per-doc attrition
    stats).

    Scale shape: chunking is pure Catalyst (sequence/slice/posexplode,
    no Python); the frequency count is one map-side-combinable hash
    aggregate on the chunk string; the chunk<->frequency join shuffles
    on the chunk key (both sides already partitioned by it from the
    aggregate); reassembly is one groupBy(doc_id) with collect_list of
    only the KEPT chunks. Nothing is quadratic and no doc body is ever
    compared to another doc directly — the chunk hash table is the
    only corpus-wide state, exactly how C4's span dedup runs on a
    full web crawl.

    This is deliberately TWO passes over the corpus (pass 1 builds the
    duplicated-chunk set, pass 2 filters against it) rather than a
    count-over-window single pass: a window count colocates AND buffers
    every occurrence of a chunk in one window group, which OOMs on the
    heavy-tailed boilerplate chunks a real crawl has (a chunk repeated
    10M times); the aggregate's map-side combine collapses those
    occurrences per task, and the join streams them. At 100 TB you
    would persist the chunk-frequency table between the passes."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", TX.tokens("text").alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(5.0)).cast("int")
    # empty-doc guard lives INSIDE the projection (when/otherwise), not
    # in a Filter: a size(t)>0 Filter would be pushed below this
    # projection with the tokenizer re-substituted (the round-4
    # re-inlining trap); posexplode of the empty array drops the row
    # with identical semantics
    chunk_arr = F.when(
        F.size("t") > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(F.col("t"), i * 5 + 1, 5), " "),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    chunks = toks.select(
        "doc_id",
        F.posexplode(chunk_arr).alias("pos", "chunk"),
    )
    freq = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("c"))
    j = chunks.join(freq, "chunk")
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("c") == 1, F.struct(F.col("pos"), F.col("chunk")))
                )
            ),
            lambda s: s["chunk"],
        ),
        " ",
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        kept_text.alias("kept_text"),
    )


@query(
    "sample_weighted_es",
    oracle="""
    WITH t AS (
        SELECT doc_id, n_chars,
               pow(('0x' || substr(md5('es#' || CAST(doc_id AS VARCHAR)), 1, 8))
                     ::UBIGINT / 4294967296.0,
                   1.0 / n_chars) AS es_key
        FROM documents
    )
    SELECT doc_id, n_chars, ROUND(es_key, 6) AS es_key
    FROM t ORDER BY t.es_key DESC, doc_id LIMIT 50
    """,
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-Res): each document draws key = u^(1/w) with weight w = n_chars
    and a deterministic hash-derived uniform u; the k largest keys ARE
    a weight-proportional sample.

    Like sample_bottomk_mergeable, membership depends only on each
    row's own key, so per-partition top-k sketches merge exactly:
    Spark executes the ORDER BY ... LIMIT as TakeOrdered (partial
    top-k map-side, k-sized merge at the driver) — a 100-TB weighted
    sample with no full shuffle and no RNG state (hash u is stable
    across task retries). Keys of distinct docs are separated by far
    more than cross-engine pow() ulp error (u spreads 50k docs over
    ~1e-3 of key space), and ties break by doc_id."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("es#"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    key = F.pow(u, 1.0 / F.col("n_chars"))
    return (
        docs.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
        .select("doc_id", "n_chars", F.round("es_key", 6).alias("es_key"))
    )


@query(
    "sample_temperature_mixing",
    oracle="""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n) AS nn FROM counts),
    w AS (SELECT lang, n, pow(n / (SELECT nn FROM tot), 0.7) AS q_un FROM counts),
    z AS (SELECT SUM(q_un) AS zz FROM w),
    rates AS (
        SELECT lang,
               (q_un / (SELECT zz FROM z)) * (SELECT nn FROM tot) / n AS r
        FROM w
    ),
    final AS (SELECT lang, r / (SELECT MAX(r) FROM rates) AS accept FROM rates)
    SELECT d.doc_id, d.lang, ROUND(f.accept, 6) AS accept_rate
    FROM documents d JOIN final f USING (lang)
    WHERE ('0x' || substr(md5('temp#' || CAST(d.doc_id AS VARCHAR)), 1, 8))
            ::UBIGINT / 4294967296.0 < f.accept
    """,
)
def sample_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the mBERT/XLM-R
    multilingual sampling rule): target shares q_i proportional to
    p_i^T with T = 0.7, which up-samples rare languages and
    down-samples dominant ones; each document is then kept with
    probability proportional to q_i/p_i (normalized so the most
    up-weighted language keeps everything), decided by the same
    deterministic hash-uniform as sample_domain_mixing.

    Scale shape: per-language counts are one map-side-combinable
    aggregate collapsing to |langs| rows; the q/p/max-normalization
    chain runs over that tiny relation and broadcasts back onto the
    corpus, which filters map-side in a single scan — no shuffle of
    document rows, no RNG state across task retries."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("nn"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "nn",
        F.pow(F.col("n") / F.col("nn"), 0.7).alias("q_un"),
    )
    z = w.agg(F.sum("q_un").alias("zz"))
    rates = w.crossJoin(F.broadcast(z)).select(
        "lang", ((F.col("q_un") / F.col("zz")) * F.col("nn") / F.col("n")).alias("r")
    )
    mr = rates.agg(F.max("r").alias("mr"))
    final = rates.crossJoin(F.broadcast(mr)).select(
        "lang", (F.col("r") / F.col("mr")).alias("accept")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("temp#"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(final), "lang")
        .filter(u < F.col("accept"))
        .select("doc_id", "lang", F.round("accept", 6).alias("accept_rate"))
    )


_GOPHER_STOPS = "['the','and','of','to','a','in','is','it','that','for']"


@query(
    "quality_gopher_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS wc,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE list_sum(list_transform(toks, x -> CAST(len(x) AS DOUBLE)))
                         / len(toks) END AS mwl,
               len(list_filter(toks,
                   x -> list_contains({_GOPHER_STOPS}, x))) AS n_stop,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                         / CAST(len(toks) AS DOUBLE) END AS alpha_ratio
        FROM t
    )
    SELECT doc_id,
           CAST(wc AS BIGINT)        AS word_count,
           ROUND(mwl, 6)             AS mean_word_len,
           wc BETWEEN 50 AND 100000  AS ok_word_count,
           mwl BETWEEN 3 AND 10      AS ok_mean_word_len,
           n_stop >= 2               AS ok_stopwords,
           alpha_ratio >= 0.8        AS ok_alpha,
           (wc BETWEEN 50 AND 100000) AND (mwl BETWEEN 3 AND 10)
             AND n_stop >= 2 AND alpha_ratio >= 0.8 AS passes_all
    FROM m
    """,
)
def quality_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule-set document filter (Rae et al. 2021, the
    standard pre-training quality gate), adapted to this corpus's
    tokenization: word-count bounds [50, 100k], mean word length
    [3, 10], at least 2 stop-word hits, and >= 80% alphabetic words.
    Emits per-rule flags plus the conjunction, so downstream funnels
    can report per-rule attrition (corpus_curation_funnel pattern).

    One scan, all rules as Catalyst array expressions over a single
    materialized token array — adding a rule adds an expression, not a
    pass. Repetition-based Gopher signals (dup-bigram mass) live in
    text_repetition_quality; this query is the lexical rule family."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens("text")
    d = docs.select("doc_id", toks.alias("toks"))
    wc = F.size("toks")
    mwl = F.when(wc == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / wc
    )
    stops = F.array(*[F.lit(s) for s in
                      ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]])
    n_stop = F.size(F.filter("toks", lambda x: F.array_contains(stops, x)))
    alpha_ratio = F.when(wc == 0, F.lit(0.0)).otherwise(
        F.size(F.filter("toks", lambda x: x.rlike("[a-z]"))) / wc.cast("double")
    )
    m = d.select(
        "doc_id",
        wc.alias("wc"),
        mwl.alias("mwl"),
        n_stop.alias("n_stop"),
        alpha_ratio.alias("alpha_ratio"),
    )
    ok_wc = F.col("wc").between(50, 100000)
    ok_mwl = F.col("mwl").between(3, 10)
    ok_stop = F.col("n_stop") >= 2
    ok_alpha = F.col("alpha_ratio") >= 0.8
    return m.select(
        "doc_id",
        F.col("wc").alias("word_count"),
        F.round("mwl", 6).alias("mean_word_len"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_alpha.alias("ok_alpha"),
        (ok_wc & ok_mwl & ok_stop & ok_alpha).alias("passes_all"),
    )


@query(
    "decontaminate_bloom_prefilter",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, {_DUCK_SHINGLES3} AS sh FROM t),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM s WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, unnest(sh) AS s FROM s WHERE doc_id % 50 <> 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id),
    hits AS (SELECT train.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
             FROM train JOIN bench ON train.s = bench.s GROUP BY train.doc_id)
    SELECT tot.doc_id,
           tot.n_shingles,
           hits.n_overlap,
           ROUND(hits.n_overlap / CAST(tot.n_shingles AS DOUBLE), 6) AS overlap_frac
    FROM tot JOIN hits USING (doc_id)
    WHERE hits.n_overlap / CAST(tot.n_shingles AS DOUBLE) >= 0.2
    """,
)
def decontaminate_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via a hash prefilter + exact verify —
    the two-phase shape Spark's own runtime row-level filtering uses
    (``bloom_filter_agg`` + ``might_contain``): probe a compact 8-byte
    xxhash64 digest of the benchmark shingle set first, then remove
    hash collisions with an exact string match, so the result is
    EXACTLY the contaminated-document set (>= 20% shingle overlap),
    independent of the prefilter's false-positive rate.

    100 TB shape: the broadcast probe structure is 8 bytes per
    benchmark shingle (a 10M-shingle eval suite costs 80 MB, or ~12 MB
    as a real Bloom filter at 10 bits/key) instead of the multi-GB
    string set — the corpus-side scan stays one pass with a broadcast
    semi-join probe, and only the rare prefilter survivors reach the
    exact-string verify join. Both per-doc aggregates key on doc_id
    and are map-side combinable. Reference analog: none (the reference
    stops at exact dedup, src/bundle_processor.py:114-128)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # staged materialization (see shingles_from_tokens docstring): the
    # convenience single-select form embeds the regex tokenizer 4x per
    # row; tokens in their own projection are computed once
    sh = docs.select("doc_id", TX.tokens("text").alias("_toks")).select(
        "doc_id", TX.shingles_from_tokens(F.col("_toks"), 3).alias("sh")
    )
    bench = (
        sh.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
        # the benchmark shingle set is eval-suite-sized (small by
        # definition) and feeds BOTH broadcast probe structures — two
        # INDEPENDENT broadcast builds Spark materializes concurrently,
        # so a lazy persist is the r10 cache stampede (each build
        # re-runs the tokenize/shingle/distinct chain); eagerly
        # checkpointed instead.
        # Lifecycle: functions/cache.py checkpoint contract.
        .transform(lambda d: scoped_local_checkpoint(d, eager=True))
    )
    bench_h = bench.select(F.xxhash64("s").alias("h")).distinct()
    train = sh.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.explode("sh").alias("s")
    )
    # the per-doc denominator comes from an AGGREGATE over the exploded
    # frame, not from size(sh) in a projection: the final frac filter
    # makes InferFiltersFromConstraints derive isnotnull(n_shingles),
    # and a projection-born alias gets that filter pushed below it with
    # the full shingle expression re-substituted (measured 3.3 s of
    # re-tokenization at sf0.1); an aggregate is a pushdown barrier.
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # phase 1: cheap 8-byte prefilter (broadcast hash semi-join)
    cand = train.withColumn("h", F.xxhash64("s")).join(
        F.broadcast(bench_h), "h", "left_semi"
    )
    # phase 2: exact verify — removes any hash collision survivors
    hits = (
        cand.join(F.broadcast(bench), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    frac = F.col("n_overlap") / F.col("n_shingles").cast("double")
    return (
        tot.join(hits, "doc_id")
        .filter(frac >= 0.2)
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(frac, 6).alias("overlap_frac"),
        )
    )


@query(
    "quality_ccnet_buckets",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents),
    counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    total AS (SELECT SUM(n) AS total FROM counts),
    score AS (
      SELECT doc_id,
             ROUND(AVG(-ln(counts.n / (total.total * 1.0))), 6) AS avg_neg_logprob
      FROM tok JOIN counts USING (token), total
      GROUP BY doc_id)
    SELECT s.doc_id, d.lang, s.avg_neg_logprob,
           (['head', 'middle', 'tail'])[
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY s.avg_neg_logprob, s.doc_id)] AS bucket
    FROM score s JOIN documents d USING (doc_id)
    """,
)
def quality_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: score every document by
    its average unigram negative log-probability (perplexity proxy),
    then split each language into equal-size thirds — "head" = most
    fluent, "tail" = rare-token-heavy. Downstream pipelines keep head,
    sample middle, and drop or re-filter tail.

    The NTILE runs over a per-language window on the ROUNDED score
    (ties broken by doc_id), so bucket boundaries are identical across
    engines despite floating-point accumulation-order differences.

    100 TB shape: the scoring pass is the broadcast-vocab single scan
    of text_unigram_logprob_score. The per-lang NTILE sort is the one
    stage that concentrates a language into a task lineage; at corpus
    scale swap it for the real CCNet procedure — fixed per-lang
    perplexity cutoffs computed once on a sample (or one
    approx_percentile pass, broadcast back) — turning bucket
    assignment into a stateless comparison with no global sort. The
    window form here is the exact-rank reference semantics."""
    from fhir_to_lakehouse_spark.functions.text import tokens

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    # vocab-sized (bounded) cache: `counts` feeds both the corpus
    # total and the probability table — without it the corpus is
    # tokenized once per reference (3x total with the scoring branch)
    counts = scoped_persist(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    vocab = counts.crossJoin(F.broadcast(total)).select(
        "token", (F.col("n") / (F.col("total") * F.lit(1.0))).alias("p")
    )
    score = (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(F.round(F.avg(-F.log("p")), 6).alias("avg_neg_logprob"))
    )
    w = Window.partitionBy("lang").orderBy("avg_neg_logprob", "doc_id")
    labels = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    return (
        score.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("bucket", F.element_at(labels, F.ntile(3).over(w)))
        .select("doc_id", "lang", "avg_neg_logprob", "bucket")
    )


_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


@query(
    "corpus_chunk_sliding",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    starts AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), {_CHUNK_STRIDE})) AS start
      FROM t WHERE len(toks) > 0)
    SELECT doc_id,
           CAST(start // {_CHUNK_STRIDE} AS INT)                    AS chunk_idx,
           CAST(start AS INT)                                       AS start_token,
           CAST(len(toks[start + 1 : start + {_CHUNK_SIZE}]) AS INT) AS n_chunk_tokens,
           array_to_string(toks[start + 1 : start + {_CHUNK_SIZE}], ' ') AS chunk_text
    FROM starts
    WHERE start = 0 OR start - {_CHUNK_STRIDE} + {_CHUNK_SIZE} < len(toks)
    """,
)
def corpus_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/training-window chunking: split every document into
    overlapping token windows (size 64, stride 48 — 16 tokens of
    overlap so no boundary context is lost), one output row per chunk
    with its position and text. The trailing-chunk rule is
    deterministic: a start position is kept only if it is the first OR
    the previous window did not already reach the document's end, so
    no emitted chunk is a strict suffix of its predecessor.

    100 TB shape: pure Catalyst row amplification — sequence/explode/
    slice/concat_ws inside one whole-stage-codegen projection, no
    shuffle at all (chunking is embarrassingly parallel per document;
    amplification factor n/stride ~ 1.3x the token stream). Downstream
    embed/index stages partition on (doc_id, chunk_idx) which this
    layout already provides. Chunk boundaries depend only on the
    document itself, so the operator is replay-idempotent for
    incremental ingest."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", TX.tokens("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    n = F.size("toks")
    starts = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    ).filter(
        (F.col("start") == 0)
        | (F.col("start") - _CHUNK_STRIDE + _CHUNK_SIZE < F.size("toks"))
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, _CHUNK_SIZE)
    return starts.select(
        "doc_id",
        (F.col("start") / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start_token"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


@query(
    "corpus_domain_quality_filter",
    oracle=f"""
    WITH sc AS (
      SELECT doc_id, source,
             ROUND(
               0.4 * least(length(text) / 500.0, 1.0)
             + 0.3 * (1 - (length(text)
                           - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                          / greatest(length(text), 1))
             + 0.2 * (1 - (length(text)
                           - length(regexp_replace(text, '[0-9]', '', 'g')))
                          / greatest(length(text), 1))
             + 0.1 * least(
                 (len(list_filter({_DUCK_TOKS},
                      x -> list_contains(['the','and','of','to','a','in',
                                          'is','it','that','for'], x)))
                  / greatest(len({_DUCK_TOKS}), 1)) * 5, 1.0)
             , 6) AS quality
      FROM documents
    ),
    dom AS (
      SELECT source, AVG(quality) AS m, COUNT(*) AS n_docs
      FROM sc GROUP BY source
    )
    SELECT sc.doc_id, sc.source,
           ROUND(dom.m, 6)        AS source_mean,
           CAST(dom.n_docs AS BIGINT) AS source_docs
    FROM sc JOIN dom USING (source)
    WHERE dom.m >= 0.77
    """,
)
def corpus_domain_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality filtering — the C4/RefinedWeb curation
    step the per-document filters can't express: entire SOURCES
    (domains/hosts/crawl segments) are dropped when their MEAN
    document quality falls below a floor, because a low-quality
    domain's individually-passable pages are still usually SEO spam /
    template noise. Per-doc quality is the deterministic heuristic
    score (text_quality_score), averaged per source over the ROUNDED
    per-doc values so both engines aggregate identical inputs; the
    0.77 floor sits >=1.3e-3 from every source mean at all three
    test SFs, far beyond summation noise.

    100 TB shape: per-source stats are one map-side-combinable
    aggregate collapsing the corpus to |domains| rows (a dimension —
    web corpora have ~10^7 hosts, kilobyte rows), which then
    broadcast-joins back onto the corpus scan: the 100 TB side never
    shuffles, the only wide op is the domain-stats aggregate."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # the scored frame feeds both the domain stats and the final join —
    # persist so the quality heuristic runs once per doc, not twice
    sc = scoped_persist(
        docs.select(
            "doc_id",
            "source",
            F.round(TX.quality_score("text"), 6).alias("quality"),
        )
    )
    dom = sc.groupBy("source").agg(
        F.avg("quality").alias("m"), F.count(F.lit(1)).alias("n_docs")
    )
    return (
        sc.join(F.broadcast(dom), "source")
        .filter(F.col("m") >= 0.77)
        .select(
            "doc_id",
            "source",
            F.round("m", 6).alias("source_mean"),
            F.col("n_docs").cast("long").alias("source_docs"),
        )
    )
