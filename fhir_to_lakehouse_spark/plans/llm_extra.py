"""Remaining named north-star operators: embedding-cosine near-dup,
winnowing (rolling-hash) document fingerprints, BPE-ish token counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.cache import (
    scoped_local_checkpoint,
    scoped_persist,
)

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH c AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v)
                 / greatest(sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v)), 1e-12), 6)
             AS cos_sim
    FROM c a JOIN c b ON a.vec_id < b.vec_id AND a.label = b.label
    WHERE list_dot_product(a.v, b.v)
          / greatest(sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v)), 1e-12) >= 0.28
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: block by label (the
    cheap cluster id — at scale this is the IVF cell / LSH bucket), so
    the self-join compares within blocks only, then keep pairs with
    cosine >= 0.28 (the synthetic clusters are loose; the threshold
    sits at the top ~1% of within-label pairs). Norms are staged per
    row so the pair comparison is one dot product + one division."""
    from fhir_to_lakehouse_spark.functions.similarity import as_double, dot

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    base = (
        emb.select("vec_id", "label", as_double(F.col("embedding")).alias("v"))
        .withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
        # both sides of the self-join consume this CONCURRENTLY — a
        # lazy persist is the r10 cache stampede (each join side
        # recomputes the norm projection before either fills the
        # cache); eager checkpoint materializes it once.
        # Lifecycle: functions/cache.py checkpoint contract.
        .transform(lambda d: scoped_local_checkpoint(d, eager=True))
    )
    a, b = base.alias("a"), base.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / F.greatest(
        F.col("a.nrm") * F.col("b.nrm"), F.lit(1e-12)
    )
    paired = a.join(
        b, (F.col("a.vec_id") < F.col("b.vec_id")) & (F.col("a.label") == F.col("b.label"))
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        cos.alias("cos_sim"),
    )
    return paired.filter(F.col("cos_sim") >= 0.28).select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    )


_DUCK_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"
_WINNOW_W = 4  # window size over consecutive shingle hashes


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), hashes AS (
      -- ordered rolling k-gram hash stream (k=3 word-grams, md5 as the
      -- portable hash)
      SELECT doc_id,
             list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                            i -> md5(array_to_string(toks[i:i+2], ' '))) AS hs
      FROM t
    )
    SELECT doc_id,
           CAST(len(list_distinct(
             list_transform(range(1, greatest(len(hs) - {_WINNOW_W - 1}, 0) + 1),
                            i -> list_aggregate(hs[i:i+{_WINNOW_W - 1}], 'min'))
           )) AS INT) AS n_fingerprints
    FROM hashes
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): the rolling
    stream of k-gram hashes, min per sliding window of w, distinct mins
    = the fingerprint set. Output is the fingerprint-set size per doc
    (the set itself is what near-dup search would index). All Catalyst
    HOFs over the ordered (non-distinct) shingle-hash stream."""
    from fhir_to_lakehouse_spark.functions.text import tokens

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    staged = docs.select("doc_id", tokens("text").alias("toks"))
    n = F.size(F.col("toks"))
    hash_stream = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, 3))),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    hashed = staged.select("doc_id", hash_stream.alias("hs"))
    m = F.size(F.col("hs"))
    mins = F.when(
        m >= _WINNOW_W,
        F.transform(
            F.sequence(F.lit(1), m - (_WINNOW_W - 1)),
            lambda i: F.array_min(F.slice(F.col("hs"), i, _WINNOW_W)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return hashed.select(
        "doc_id", F.size(F.array_distinct(mins)).alias("n_fingerprints")
    )


# GPT-2-style pre-tokenizer regex, simplified to the portable subset
# (both engines use RE2/PCRE-compatible classes here)
_BPE_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


@query(
    "text_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKS}) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))
                AS INT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish
    pre-tokenizer regex (letter runs / digit runs / punctuation runs
    with leading-space affinity, GPT-2 style) — the cheap proxy for
    'how many LLM tokens is this corpus'."""
    from fhir_to_lakehouse_spark.functions.text import tokens

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("n_bpe_tokens"),
    )


@query(
    "eval_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             length(text)  AS n_chars,
             strlen(text)  AS n_bytes,
             len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))
               AS n_toks
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                    AS n_docs,
           CAST(SUM(n_toks) AS BIGINT)                 AS n_tokens,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_toks), 6)
             AS chars_per_token,
           ROUND(CAST(SUM(n_bytes) AS DOUBLE) / SUM(n_toks), 6)
             AS bytes_per_token
    FROM per_doc
    GROUP BY lang
    """,
)
def eval_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — the compression-rate eval
    every multilingual tokenizer paper reports: characters and UTF-8
    bytes per (BPE-ish) token, per language. A tokenizer that spends
    3x the tokens per byte on one language triples that language's
    effective training and inference cost, so this table gates
    tokenizer choice for a corpus mix. Ratios are corpus-level
    (sum/sum, not mean-of-ratios) — stable under short docs and
    immune to per-doc zero-token division.

    Plan shape: one scan, three codegen'd per-row lengths, one
    map-side-combinable aggregate into |langs| rows. No shuffle
    beyond the |langs|-row final combine.

    100 TB shape: scan-bound by construction; the regex token count
    is the only nontrivial per-row cost and stays in the JVM."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    per_doc = docs.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.octet_length("text").alias("n_bytes"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias(
            "n_toks"
        ),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_toks"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("n_toks"), 6
        ).alias("bytes_per_token"),
    )


@query(
    "text_chunk_windows",
    oracle="""
    WITH starts AS (
      SELECT doc_id, n_chars, UNNEST(generate_series(0, GREATEST(n_chars - 1, 0), 150))
               AS chunk_start
      FROM documents
    )
    SELECT doc_id,
           CAST(chunk_start AS BIGINT)                   AS chunk_start,
           SUBSTR(text, chunk_start + 1, 200)            AS chunk_text,
           CAST(LEAST(200, n_chars - chunk_start) AS BIGINT) AS chunk_len
    FROM starts JOIN documents USING (doc_id, n_chars)
    WHERE n_chars > 0
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking for training pipelines: split each
    document into 200-char windows with 50-char overlap (stride 150) —
    pure Catalyst ``sequence``/``explode``/``substring``, no Python in
    the path, so chunking 100 TB is scan-bound. Start offsets come from
    a generated per-row sequence (no join, no shuffle)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    return (
        docs.select(
            "doc_id",
            "text",
            "n_chars",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("n_chars") - 1, F.lit(0)),
                    F.lit(150),
                )
            ).alias("chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.substring(
                F.col("text"), F.col("chunk_start").cast("int") + 1, 200
            ).alias("chunk_text"),
            F.least(F.lit(200), F.col("n_chars") - F.col("chunk_start"))
            .cast("long")
            .alias("chunk_len"),
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
      FROM embeddings
    ), s AS (
      SELECT vec_id, label, x,
             list_max(list_transform(x, e -> abs(e))) / 127.0 AS scale
      FROM v
    ), q AS (
      SELECT vec_id, label, x, scale,
             list_transform(x, e -> round(e / scale)) AS qv
      FROM s
    ), e AS (
      SELECT vec_id, label, scale, qv,
             list_transform(list_zip(x, qv), p -> p[1] - p[2] * scale) AS err
      FROM q
    )
    SELECT vec_id, label,
           CAST(len(qv) AS BIGINT)  AS n_dims,
           ROUND(scale, 6)          AS scale,
           CAST(list_sum(list_transform(qv, e -> CAST(abs(e) AS BIGINT)))
                AS BIGINT)          AS q_l1,
           ROUND(list_dot_product(err, err), 6) AS sq_err
    FROM e
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the compression step before shipping an ANN index or a trained
    embedding table: scale = max|x|/127, q_i = round(x_i/scale), plus
    per-vector reconstruction error (sum of squared error of q*scale
    vs x) and the integer L1 mass of the quantized vector.

    All arithmetic is double-precision Catalyst higher-order functions
    (transform/zip_with/aggregate) evaluated element-at-a-time in the
    same left-to-right order DuckDB's list functions use, so the
    oracle matches digit-for-digit; per-vector outputs avoid any
    cross-row float accumulation. Embarrassingly parallel — zero
    shuffles, scan-bound at 100 TB."""
    from fhir_to_lakehouse_spark.functions.similarity import as_double, dot

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    x = emb.select("vec_id", "label", as_double(F.col("embedding")).alias("x"))
    s = x.select(
        "*",
        (F.array_max(F.transform("x", F.abs)) / F.lit(127.0)).alias("scale"),
    )
    q = s.select(
        "*", F.transform("x", lambda e: F.round(e / F.col("scale"))).alias("qv")
    )
    e = q.select(
        "vec_id",
        "label",
        "scale",
        "qv",
        F.zip_with("x", "qv", lambda a, b: a - b * F.col("scale")).alias("err"),
    )
    return e.select(
        "vec_id",
        "label",
        F.size("qv").cast("long").alias("n_dims"),
        F.round("scale", 6).alias("scale"),
        F.aggregate(
            "qv", F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v).cast("long")
        ).alias("q_l1"),
        F.round(dot(F.col("err"), F.col("err")), 6).alias("sq_err"),
    )


@query(
    "corpus_epoch_shuffle",
    oracle="""
    WITH perm AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (
               ORDER BY md5('epoch-7:' || CAST(doc_id AS VARCHAR)), doc_id
             ) - 1 AS pos
      FROM documents
    )
    SELECT doc_id,
           CAST(pos // 64 AS BIGINT) AS shard,
           CAST(pos % 64 AS BIGINT)  AS pos_in_shard
    FROM perm
    """,
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-reproducible corpus shuffle: every document gets a
    deterministic pseudo-random position from md5(seed, doc_id), then a
    (shard, pos_in_shard) assignment at 64 docs/shard. Re-running with
    the same seed reproduces the exact epoch order on any cluster size
    — rand() cannot (task retries and partition counts change it);
    changing the seed string re-keys the whole epoch.

    100 TB shape: the global permutation index is a DISTRIBUTED rank,
    not a single global ROW_NUMBER window (one-partition bottleneck).
    The md5 rank's first two hex chars ARE 256 uniform, lexicographic
    hash-space ranges — a free range-bucketing with no sampling pass:
    each bucket ranks locally in parallel, the 256 bucket counts
    prefix-sum on one tiny partition, and offset + local rank
    reproduces the exact global position (bucket prefix order ==
    rank order).
    """
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    rank = F.md5(F.concat(F.lit("epoch-7:"), F.col("doc_id").cast("string")))
    t = docs.select(
        "doc_id", rank.alias("rk"), F.substring(rank, 1, 2).alias("bucket")
    )
    local_w = Window.partitionBy("bucket").orderBy("rk", "doc_id")
    local = t.withColumn("local_rn", F.row_number().over(local_w))
    bucket_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        t.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("offset", F.sum("n").over(bucket_w) - F.col("n"))
        .select("bucket", "offset")
    )
    pos = F.col("offset") + F.col("local_rn") - F.lit(1)
    return local.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        F.floor(pos / 64).cast("long").alias("shard"),
        (pos % 64).cast("long").alias("pos_in_shard"),
    )


@query(
    "corpus_leakproof_split",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    ), assigned AS (
      SELECT doc_id, fp,
             CASE WHEN substr(md5('split-1:' || fp), 1, 2) < 'cd' THEN 'train'
                  WHEN substr(md5('split-1:' || fp), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM fp
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints
    FROM assigned GROUP BY split
    """,
)
def corpus_leakproof_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/val/test split (~80/10/10): the split is a
    deterministic function of the CONTENT FINGERPRINT, not the doc id,
    so exact duplicates land in the same split by construction — the
    train/test contamination that doc-id or random splits silently
    admit is structurally impossible. Seeded ('split-1:') so re-keying
    the split is a string change, and reproducible on any cluster size
    (rand() is neither). Thresholds are lexicographic on the first md5
    hex byte: < 'cd' (205/256 ~ 80.1%) train, < 'e6' (~9.8%) val,
    rest test.

    Shape: one scan, two md5s per row, one map-side-combinable
    aggregate (the distinct-fp count shuffles 16-byte fingerprints
    keyed by split). Assignment itself is embarrassingly parallel —
    the aggregate here is the reporting layer."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    fp = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    b = F.substring(F.md5(F.concat(F.lit("split-1:"), F.col("fp"))), 1, 2)
    assigned = docs.select("doc_id", fp.alias("fp")).select(
        "doc_id",
        "fp",
        F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test").alias(
            "split"
        ),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_fingerprints"),
    )


@query(
    "similarity_quantized_recall",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
      FROM embeddings
    ), s AS (
      SELECT vec_id, x,
             list_max(list_transform(x, e -> abs(e))) / 127.0 AS scale
      FROM v
    ), q AS (
      SELECT vec_id, x, scale,
             list_transform(x, e -> CAST(round(e / scale) AS BIGINT)) AS qv
      FROM s
    ),
    pairs AS (
      SELECT qs.vec_id AS query_id, d.vec_id AS doc_id,
             list_dot_product(qs.x, d.x) AS exact_score,
             (qs.scale * d.scale)
               * list_sum(list_transform(list_zip(qs.qv, d.qv),
                                         p -> p[1] * p[2])) AS quant_score
      FROM q qs JOIN q d ON d.vec_id <> qs.vec_id
      WHERE qs.vec_id % 100 = 0
    ),
    ranked AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY exact_score DESC, doc_id) AS rn_e,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY quant_score DESC, doc_id) AS rn_q
      FROM pairs
    )
    SELECT query_id,
           CAST(COUNT(CASE WHEN rn_e <= 10 AND rn_q <= 10 THEN 1 END)
                AS BIGINT)                                   AS hits,
           ROUND(COUNT(CASE WHEN rn_e <= 10 AND rn_q <= 10 THEN 1 END)
                 / 10.0, 6)                                  AS recall_at_10
    FROM ranked
    GROUP BY query_id
    """,
)
def similarity_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality measurement for the int8 path: recall@10 of
    top-k retrieval under symmetric per-vector int8 quantization
    (embedding_quantize_int8's exact arithmetic) against the fp32
    exact ranking, per query — the acceptance gate a production ANN
    rollout runs before swapping a compressed index in. Quantization
    is DETERMINISTIC arithmetic (unlike IVF/LSH probe behavior), so
    the oracle reproduces both rankings digit-for-digit: the integer
    dot product is exact, and the fp32 side uses the same
    left-to-right HOF accumulation as list_dot_product.

    100 TB shape: queries are the bounded side (vec_id % 100 — at
    scale, the labeled eval set) and broadcast against the corpus;
    both rankings come off ONE scan of the pair frame, and the two
    row_number windows run per-query (bounded partitions). The
    integer dot product ships 1 byte/dim instead of 4 — the point of
    the measurement."""
    from fhir_to_lakehouse_spark.functions.similarity import as_double, dot

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    x = emb.select("vec_id", as_double(F.col("embedding")).alias("x"))
    s = x.select(
        "*",
        (F.array_max(F.transform("x", F.abs)) / F.lit(127.0)).alias("scale"),
    )
    q = s.select(
        "*",
        F.transform(
            "x", lambda e: F.round(e / F.col("scale")).cast("long")
        ).alias("qv"),
    )
    queries = q.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("x").alias("qx"),
        F.col("scale").alias("qscale"),
        F.col("qv").alias("qqv"),
    )
    pairs = q.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        dot(F.col("qx"), F.col("x")).alias("exact_score"),
        (
            (F.col("qscale") * F.col("scale"))
            * F.aggregate(
                F.zip_with("qqv", "qv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        ).alias("quant_score"),
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("exact_score").desc(), F.col("doc_id")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("quant_score").desc(), F.col("doc_id")
    )
    ranked = pairs.select(
        "query_id",
        "doc_id",
        F.row_number().over(we).alias("rn_e"),
        F.row_number().over(wq).alias("rn_q"),
    )
    hits = F.count(
        F.when((F.col("rn_e") <= 10) & (F.col("rn_q") <= 10), 1)
    )
    return ranked.groupBy("query_id").agg(
        hits.alias("hits"),
        F.round(hits / F.lit(10.0), 6).alias("recall_at_10"),
    )


@query(
    "corpus_dsir_selection",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_DUCK_TOKS}) AS token FROM documents
    ),
    stats AS (
      SELECT token,
             COUNT(*)                                   AS n_raw,
             COUNT(*) FILTER (WHERE lang = 'en')        AS n_tgt
      FROM toks GROUP BY token
    ),
    totals AS (
      SELECT SUM(n_raw)  AS big_n_raw,
             SUM(n_tgt)  AS big_n_tgt,
             COUNT(*)    AS v
      FROM stats
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(ln(((s.n_tgt + 0.5) / (tt.big_n_tgt + 0.5 * tt.v))
                      / ((s.n_raw + 0.5) / (tt.big_n_raw + 0.5 * tt.v)))),
                 6)                 AS dsir_score
    FROM toks t
    JOIN stats s USING (token), totals tt
    GROUP BY t.doc_id
    """,
)
def corpus_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by the mean
    log importance ratio of its token occurrences between a TARGET
    distribution (here: the corpus's English slice — at scale, a
    trusted high-quality corpus like Wikipedia) and the RAW
    distribution (the whole crawl), both add-k smoothed over the
    shared vocabulary. High scores mark documents whose token mix
    resembles the target — the published recipe for carving a
    target-like pretraining subset out of a web crawl, and a
    different operator from self-perplexity scoring
    (text_unigram_logprob_score scores under ONE distribution; DSIR
    is the RATIO of two).

    Plan shape: one conditional grouped aggregate builds BOTH count
    tables at once (count + count-if-target per token — no second
    pass over the corpus for the target counts); the three corpus
    scalars broadcast from one row; scoring re-joins the token stream
    to the stats on the token key and one per-doc aggregate emits the
    scores.

    100 TB shape: the token-stats table is vocabulary-sized (tens of
    millions of rows, kilobytes each — a dimension), built by a
    map-side-combinable aggregate over the token stream; the scoring
    join shuffles on the token key with both sides partitioned by it.
    The real DSIR hashes n-grams into a fixed 10k-bucket table, which
    would make the stats side broadcastable outright — the plan here
    is the general (unhashed) case."""
    from fhir_to_lakehouse_spark.functions.text import tokens

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # The token stream feeds the stats aggregate AND the scoring
    # join's probe side — independent shuffle-map stages submitted
    # concurrently, so a lazy persist here is the r10 cache stampede.
    # But the relation is corpus x tokens sized and one explode away
    # from the scan, so MATERIALIZING it (persist or checkpoint) costs
    # more than deriving it twice: measured at the 10x synthetic,
    # recompute 2.5-3.1 s vs eager checkpoint 2.9-3.3 s steady-state
    # (SCALING.md round-11 study 4), and at 100 TB the write
    # amplification of a token-stream materialization is the wrong
    # plan outright. Each consumer builds its OWN stream expression —
    # two cheap codegen scans, no shared subtree, no stampede.
    def _toks() -> DataFrame:
        return docs.select(
            "doc_id", "lang", F.explode(tokens("text")).alias("token")
        )

    toks = _toks()
    stats = _toks().groupBy("token").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_tgt"),
    )
    totals = stats.agg(
        F.sum("n_raw").alias("big_n_raw"),
        F.sum("n_tgt").alias("big_n_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    p_tgt = (F.col("n_tgt") + 0.5) / (
        F.col("big_n_tgt") + 0.5 * F.col("v")
    )
    p_raw = (F.col("n_raw") + 0.5) / (
        F.col("big_n_raw") + 0.5 * F.col("v")
    )
    return (
        toks.join(stats, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(p_tgt / p_raw)), 6).alias("dsir_score"),
        )
    )
