"""Corpus scrubbing + vocabulary-budget queries — the cleaning half of
a training-data pipeline (PII redaction, charset hygiene, bag-of-words
dedup, length-band filtering, vocabulary coverage).

No reference analog (the reference stops at dedup + merge); these
extend §2.10 alongside plans/curation.py. The synthetic documents
table contains no PII / non-ASCII, so the PII and charset queries
deterministically synthesize their hazard (same expression on both
engines) — the operator under test is the redaction/measurement
expression itself, which then runs unchanged on real corpora.

Every oracle mirrors the Catalyst expression digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions import text as TX
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

_DUCK_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+[0-9]{2}-[0-9]{3}-[0-9]{4,}"


@query(
    "scrub_pii_redact",
    oracle=f"""
    WITH withpii AS (
      SELECT doc_id,
             text || ' contact ' || source || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                  || '@example.com or +49-030-' || lpad(CAST(doc_id AS VARCHAR), 6, '0')
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g'))       AS redacted_md5
    FROM withpii
    """,
)
def scrub_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count + redact email addresses and phone numbers
    with vectorized regexp (no UDF). The synthetic corpus carries no
    PII, so a deterministic contact line is appended first — identical
    construction in the oracle, so the regex engines' agreement on the
    extraction AND the replacement is what's verified.

    Scale shape: pure per-row narrow expressions, whole-stage codegen,
    no shuffle at all — the ideal cleaning-pass form."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    withpii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact "),
            F.col("source"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
            F.lit("@example.com or +49-030-"),
            F.lpad(F.col("doc_id").cast("string"), 6, "0"),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    return withpii.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


@query(
    "scrub_charset_stats",
    oracle="""
    WITH noisy AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(text, 'a', chr(228)) || chr(65533)
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars,
           CAST(length(text) - length(regexp_replace(text, '[^ -~]', '', 'g')) AS INT)
             AS n_non_printable_ascii,
           ROUND(length(regexp_replace(text, '[^ -~]', '', 'g'))
                 / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS ascii_ratio,
           CASE WHEN position(chr(65533) IN text) > 0 THEN TRUE ELSE FALSE END
             AS has_replacement_char
    FROM noisy
    """,
)
def scrub_charset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset hygiene: printable-ASCII ratio and U+FFFD (replacement
    char) detection — the standard mojibake / binary-contamination
    signals for corpus filtering. Non-ASCII is injected into every
    third doc (same expression in the oracle) since the synthetic
    corpus is pure ASCII.

    Scale shape: per-row expressions only, no shuffle."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    noisy = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.replace(F.col("text"), F.lit("a"), F.lit("ä")),
                F.lit("�"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    stripped_len = F.length(F.regexp_replace("text", "[^ -~]", ""))
    return noisy.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        (F.length("text") - stripped_len).alias("n_non_printable_ascii"),
        F.round(
            stripped_len / F.greatest(F.length("text"), F.lit(1)).cast("double"),
            6,
        ).alias("ascii_ratio"),
        F.col("text").contains("�").alias("has_replacement_char"),
    )


@query(
    "dedup_bag_of_words",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             md5(array_to_string(list_sort({_DUCK_TOKS}), ' ')) AS bow_sig
      FROM documents
    ),
    grp AS (
      SELECT bow_sig, COUNT(*) AS group_size, MIN(doc_id) AS canonical
      FROM sig GROUP BY bow_sig
    )
    SELECT CAST(group_size AS BIGINT)      AS group_size,
           CAST(COUNT(*) AS BIGINT)        AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_docs,
           CAST(MIN(canonical) AS BIGINT)  AS min_canonical_doc_id
    FROM grp
    GROUP BY group_size
    """,
)
def dedup_bag_of_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-multiset dedup: documents whose SORTED token sequence
    hashes identically are duplicates even when word order differs —
    catches shuffled/templated boilerplate that exact-hash dedup
    misses and MinHash only scores probabilistically. Reported as a
    group-size histogram (size 1 = unique docs), so the result is
    non-trivial at every scale factor; shuffled-duplicate detection
    itself is unit-tested in tests/test_text_functions.py.

    Scale shape: one narrow projection to a 16-byte signature, then
    two map-side-combinable hash aggregates. The doc body never
    shuffles."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    sig = docs.select(
        "doc_id", TX.bag_of_words_signature("text").alias("bow_sig")
    )
    grp = sig.groupBy("bow_sig").agg(
        F.count("*").alias("group_size"),
        F.min("doc_id").alias("canonical"),
    )
    return grp.groupBy("group_size").agg(
        F.count("*").alias("n_groups"),
        F.sum("group_size").alias("n_docs"),
        F.min("canonical").alias("min_canonical_doc_id"),
    )


@query(
    "corpus_length_band_filter",
    oracle=f"""
    WITH n AS (SELECT doc_id, lang, len({_DUCK_TOKS}) AS n_tokens FROM documents),
    b AS (SELECT quantile_cont(n_tokens, 0.10) AS lo,
                 quantile_cont(n_tokens, 0.90) AS hi FROM n)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)   AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
    FROM n, b
    WHERE n.n_tokens >= b.lo AND n.n_tokens <= b.hi
    GROUP BY lang
    """,
)
def corpus_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-band filtering: drop documents outside the [p10, p90]
    token-count band (the standard too-short/too-long cut), reporting
    survivors per language.

    Scale shape: exact percentiles come from ONE global aggregate on a
    pre-projected integer column (never the text), broadcast back as a
    1-row frame via crossJoin — the corpus scans once, no sort. At
    100 TB swap `percentile` for `approx_percentile` (same plan
    shape, sketch-mergeable across partitions)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    n = docs.select(
        "doc_id", "lang", F.size(TX.tokens("text")).alias("n_tokens")
    )
    bounds = n.agg(
        F.expr("percentile(n_tokens, 0.10)").alias("lo"),
        F.expr("percentile(n_tokens, 0.90)").alias("hi"),
    )
    return (
        n.crossJoin(F.broadcast(bounds))
        .filter((F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
    )


@query(
    "corpus_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_DUCK_TOKS}) AS term FROM documents),
    cnt AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT SUM(c) AS total FROM cnt),
    ranked AS (
      SELECT term, c,
             SUM(c) OVER (ORDER BY c DESC, term) AS running,
             ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk
      FROM cnt
    )
    SELECT CAST(MIN(rk) AS BIGINT)                       AS vocab_size_90,
           CAST((SELECT COUNT(*) FROM cnt) AS BIGINT)    AS n_distinct_terms,
           CAST((SELECT total FROM tot) AS BIGINT)       AS total_tokens
    FROM ranked, tot
    WHERE running >= 0.9 * total
    """,
)
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary budget: the smallest frequency-ranked vocabulary
    covering >= 90% of the corpus token mass (tokenizer sizing /
    OOV-rate planning).

    Scale shape: explode -> map-side-combinable term counts; the
    running sum then operates on the DISTINCT-TERM frame (orders of
    magnitude smaller than the corpus). The single-partition window
    over terms is the honest cost of an exact global ranking; at
    100 TB the same query runs on the term-count table, which is
    bounded by vocabulary (~millions), not corpus size."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select(F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("term"))
    ranked = cnt.select(
        "term",
        "c",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "running"
        ),
        F.row_number().over(w).alias("rk"),
    )
    totals = cnt.agg(
        F.sum("c").alias("total_tokens"),
        F.count("*").alias("n_distinct_terms"),
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .filter(F.col("running") >= 0.9 * F.col("total_tokens"))
        .agg(
            F.min("rk").alias("vocab_size_90"),
            F.first("n_distinct_terms").alias("n_distinct_terms"),
            F.first("total_tokens").alias("total_tokens"),
        )
    )


_SW = "['the','and','of','to','a','in','is','it','that','for']"


@query(
    "quality_linear_filter",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             len({_DUCK_TOKS}) AS n_tokens,
             (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
               / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_r,
             (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
               / CAST(greatest(length(text), 1) AS DOUBLE) AS digit_r,
             len(list_filter({_DUCK_TOKS}, x -> list_contains({_SW}, x)))
               / CAST(greatest(len({_DUCK_TOKS}), 1) AS DOUBLE) AS stop_r,
             list_aggregate(list_transform({_DUCK_TOKS}, x -> length(x)), 'sum')
               / CAST(greatest(len({_DUCK_TOKS}), 1) AS DOUBLE) AS mean_len
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             1.0 / (1.0 + exp(-(-1.2
               + 0.004 * least(n_tokens, 500)
               + 2.5 * stop_r
               - 3.0 * punct_r
               - 2.0 * digit_r
               + 0.15 * mean_len))) AS score
      FROM feats
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           ROUND(AVG(score), 6) AS avg_score
    FROM scored
    GROUP BY lang
    """,
)
def quality_linear_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier filtering, fastText-shaped: a fixed-weight
    linear model over interpretable features (token count, punctuation /
    digit noise, stopword rate, mean token length) squashed through a
    sigmoid; docs scoring < 0.5 are dropped. The weights are arbitrary
    but FIXED, so the whole classifier is oracle-checkable — the
    deterministic stand-in for a learned quality model, with the exact
    plan shape a real one has (per-row featurize -> score -> filter ->
    per-stratum report).

    Scale shape: per-row expressions + one map-side-combinable
    aggregate on lang. The text column never shuffles."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # staged token array: the inline form evaluated the tokenizer 5x
    # per row across the feature expressions (plan-audit sweep)
    staged = docs.select("lang", "text", TX.tokens("text").alias("_toks"))
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    mean_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
    ) / F.greatest(n_tokens, F.lit(1)).cast("double")
    z = (
        F.lit(-1.2)
        + 0.004 * F.least(n_tokens, F.lit(500))
        + 2.5 * TX.stopword_ratio_from_tokens(toks)
        - 3.0 * TX.punct_ratio("text")
        - 2.0 * TX.digit_ratio("text")
        + 0.15 * mean_len
    )
    scored = staged.select(
        "lang", (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score")
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("score") >= 0.5).cast("bigint")).alias("n_kept"),
        F.round(F.avg("score"), 6).alias("avg_score"),
    )


@query(
    "dedup_semantic_ivf",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cen AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8
    ), asg AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, cen.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, cen.cv)
                   / greatest(sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(cen.cv, cen.cv)), 1e-12)
                 DESC, cen.cell ASC) AS rn
        FROM e CROSS JOIN cen
      ) WHERE rn = 1
    ), pairs AS (
      SELECT a.cell,
             ROUND(list_dot_product(a.v, b.v)
                   / greatest(sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v)), 1e-12), 6)
               AS cos_sim
      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT c.cell,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN p.cos_sim >= 0.35 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_candidates,
           ROUND(MAX(p.cos_sim), 6) AS max_cos
    FROM pairs p JOIN (SELECT DISTINCT cell FROM asg) c ON p.cell = c.cell
    GROUP BY c.cell
    """,
)
def dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup: embeddings are blocked into IVF
    cells (deterministic coarse centroids), pairwise cosine runs WITHIN
    cells only, and pairs above threshold are duplicate candidates.
    Reported per cell (pair counts, candidates, max similarity). The
    all-pairs comparison never happens — the self-join is equi-keyed on
    the cell id, so at scale each partition compares only its own cell.

    Complements dedup_embedding_cosine (blocked by the label metadata
    column): here the blocking key is derived from the DATA, the shape
    a corpus without trustworthy metadata needs."""
    from fhir_to_lakehouse_spark.functions.similarity import (
        as_double,
        ivf_assign,
    )

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    asg = ivf_assign(emb, centroids).select(
        "vec_id", "cell", as_double(F.col("embedding")).alias("v")
    )

    # Within-cell pairwise cosine as a per-cell numpy Gram computation
    # (applyInPandas): one Arrow batch per cell, normalized rows, the
    # upper triangle of X_norm @ X_norm.T in BLAS. Replaces the earlier
    # equi-keyed self-join + Catalyst HOF cosine, which materialized
    # every pair row and burned 5.5 s at sf0.1 (156M 64-dim folds);
    # this path is ~0.6 s for identical output. Blockwise over rows so
    # per-task memory is O(block x cell), not O(cell^2); the oracle's
    # values match because both sides round half-away-from-zero at 6 dp
    # before thresholding (np.round would bankers-round — avoided).
    import pandas as pd  # noqa: F401 (schema side of applyInPandas)

    def _cell_pairs(key, pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                columns=["cell", "n_pairs", "n_dup_candidates", "max_cos"]
            )
        X = np.vstack(pdf["v"].to_numpy())
        norms = np.linalg.norm(X, axis=1)
        n_pairs = 0
        n_dup = 0
        max_cos = -np.inf
        block = 2048
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            # rows i0..i1 vs all columns j > row index (upper triangle)
            dots = X[i0:i1] @ X[i0:].T
            denom = np.maximum(np.outer(norms[i0:i1], norms[i0:]), 1e-12)
            cos = dots / denom
            rows, cols = np.indices(cos.shape)
            vals = cos[cols > rows]  # j - i0 > i - i0  <=>  j > i
            if vals.size == 0:
                continue
            # half-away-from-zero at 6 dp (Spark/DuckDB ROUND semantics)
            vals = np.sign(vals) * np.floor(np.abs(vals) * 1e6 + 0.5) / 1e6
            n_pairs += int(vals.size)
            n_dup += int((vals >= 0.35).sum())
            max_cos = max(max_cos, float(vals.max()))
        return pd.DataFrame(
            {
                "cell": [int(key[0])],
                "n_pairs": [n_pairs],
                "n_dup_candidates": [n_dup],
                "max_cos": [max_cos],
            }
        )

    return asg.groupBy("cell").applyInPandas(
        _cell_pairs,
        "cell long, n_pairs long, n_dup_candidates long, max_cos double",
    )


@query(
    "decontaminate_exact_substring",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, array_to_string({_DUCK_TOKS}, ' ') AS norm FROM documents
    ), evals AS (
      SELECT doc_id AS eval_id,
             array_to_string(({_DUCK_TOKS})[1:3], ' ') AS needle
      FROM documents WHERE doc_id % 97 = 0 AND len({_DUCK_TOKS}) >= 3
    )
    SELECT e.eval_id,
           CAST(SUM(CASE WHEN t.doc_id <> e.eval_id
                          AND position(e.needle IN t.norm) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM evals e CROSS JOIN t
    GROUP BY e.eval_id
    """,
)
def decontaminate_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination (the complement of the n-gram
    OVERLAP variant in plans/curation.py): each held-out eval prompt
    (deterministically sampled: every 97th doc's leading 3 tokens, on
    normalized text) is searched verbatim in every other document —
    the strictest leakage test, catching training docs that quote an
    eval prompt verbatim inside unrelated text.

    Scale shape: the eval set is tiny and broadcast; the corpus scans
    ONCE against all needles (training side never shuffles), then one
    aggregate per eval id — the same broadcast-probe shape the n-gram
    decontamination uses, with substring match instead of shingle
    intersection."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens("text")
    t = docs.select(
        "doc_id", F.concat_ws(" ", toks).alias("norm")
    )
    evals = docs.filter(
        (F.col("doc_id") % 97 == 0) & (F.size(toks) >= 3)
    ).select(
        F.col("doc_id").alias("eval_id"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("needle"),
    )
    return (
        t.crossJoin(F.broadcast(evals))
        .groupBy("eval_id")
        .agg(
            F.sum(
                (
                    (F.col("doc_id") != F.col("eval_id"))
                    & (F.instr(F.col("norm"), F.col("needle")) > 0)
                ).cast("bigint")
            ).alias("n_contaminated")
        )
    )


_DUCK_Q = f"""0.4 * least(length(text) / 500.0, 1.0)
           + 0.3 * (1 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                        / greatest(length(text), 1))
           + 0.2 * (1 - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                        / greatest(length(text), 1))
           + 0.1 * least(
               (len(list_filter({_DUCK_TOKS},
                    x -> list_contains({_SW}, x)))
                / greatest(len({_DUCK_TOKS}), 1)) * 5, 1.0)"""


@query(
    "corpus_curation_funnel",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             len({_DUCK_TOKS}) AS n_tokens,
             ({_DUCK_Q}) >= 0.5 AS q_pass,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
             md5(array_to_string(list_sort({_DUCK_TOKS}), ' ')) AS bow
      FROM documents
    ), f1 AS (
      SELECT *, q_pass AND ROW_NUMBER() OVER (
               PARTITION BY fp ORDER BY q_pass DESC, doc_id ASC) = 1
               AS exact_can
      FROM base
    ), f2 AS (
      SELECT *, exact_can AND ROW_NUMBER() OVER (
               PARTITION BY bow ORDER BY exact_can DESC, doc_id ASC) = 1
               AS bow_can
      FROM f1
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(n_tokens) AS BIGINT) AS t0,
             CAST(SUM(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN q_pass THEN n_tokens ELSE 0 END) AS BIGINT) AS t1,
             CAST(SUM(CASE WHEN exact_can THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN exact_can THEN n_tokens ELSE 0 END) AS BIGINT) AS t2,
             CAST(SUM(CASE WHEN bow_can THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN bow_can THEN n_tokens ELSE 0 END) AS BIGINT) AS t3
      FROM f2
    )
    SELECT 0 AS stage, 'raw' AS stage_name, n0 AS n_docs, t0 AS total_tokens FROM agg
    UNION ALL
    SELECT 1, 'quality', n1, t1 FROM agg
    UNION ALL
    SELECT 2, 'exact_dedup', n2, t2 FROM agg
    UNION ALL
    SELECT 3, 'bow_dedup', n3, t3 FROM agg
    """,
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition report for the curation pipeline (the number
    a production corpus job actually monitors): raw -> quality filter
    -> exact-dedup canonical -> bag-of-words-dedup canonical, each
    stage reporting surviving docs and token mass.

    Single-pass design: stage membership is computed as cumulative
    FLAGS over one scan — canonical-of-stage-k is "first stage-k
    survivor in its duplicate group" via a window ordered by
    (survivor DESC, doc_id) — then ONE aggregate produces all four
    stage rows (unpivoted driver-side from a 1-row frame). One scan +
    two window shuffles + one agg, versus the naive 4 scans; at 100 TB
    the corpus is read once."""
    from fhir_to_lakehouse_spark.functions.text import (
        bag_of_words_signature,
        fingerprint,
        quality_score,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", "text", TX.tokens("text").alias("_toks")
    ).select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        (TX.quality_score_from_tokens("text", F.col("_toks")) >= 0.5).alias(
            "q_pass"
        ),
        fingerprint("text").alias("fp"),
        TX.bag_of_words_from_tokens(F.col("_toks")).alias("bow"),
    )
    w_fp = Window.partitionBy("fp").orderBy(
        F.col("q_pass").desc(), F.col("doc_id").asc()
    )
    f1 = base.withColumn(
        "exact_can", F.col("q_pass") & (F.row_number().over(w_fp) == 1)
    )
    w_bow = Window.partitionBy("bow").orderBy(
        F.col("exact_can").desc(), F.col("doc_id").asc()
    )
    f2 = f1.withColumn(
        "bow_can", F.col("exact_can") & (F.row_number().over(w_bow) == 1)
    )
    agg = f2.agg(
        F.count("*").alias("n0"),
        F.sum("n_tokens").alias("t0"),
        F.sum(F.col("q_pass").cast("bigint")).alias("n1"),
        F.sum(F.when(F.col("q_pass"), F.col("n_tokens")).otherwise(0)).alias("t1"),
        F.sum(F.col("exact_can").cast("bigint")).alias("n2"),
        F.sum(F.when(F.col("exact_can"), F.col("n_tokens")).otherwise(0)).alias(
            "t2"
        ),
        F.sum(F.col("bow_can").cast("bigint")).alias("n3"),
        F.sum(F.when(F.col("bow_can"), F.col("n_tokens")).otherwise(0)).alias(
            "t3"
        ),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(nm).alias("stage_name"),
                F.col(f"n{i}").alias("n_docs"),
                F.col(f"t{i}").alias("total_tokens"),
            )
            for i, nm in enumerate(
                ["raw", "quality", "exact_dedup", "bow_dedup"]
            )
        ]
    )
    return agg.select(F.inline(stages))


@query(
    "similarity_incremental_index",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cen AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8
    ), asg AS (
      SELECT vec_id, cell,
             vec_id % 5 = 4 AS is_new
      FROM (
        SELECT e.vec_id, cen.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, cen.cv)
                   / greatest(sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(cen.cv, cen.cv)), 1e-12)
                 DESC, cen.cell ASC) AS rn
        FROM e CROSS JOIN cen
      ) WHERE rn = 1
    )
    SELECT cell,
           CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
             AS n_indexed,
           CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
             AS n_appended,
           CAST(MIN(CASE WHEN is_new THEN vec_id END) AS BIGINT)
             AS first_new_vec_id
    FROM asg
    GROUP BY cell
    """,
)
def similarity_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN-index maintenance: newly arrived embeddings
    (modeled as vec_id % 5 == 4) are assigned to the EXISTING coarse
    centroids and appended to their cells — the daily-refresh path
    that avoids rebuilding the whole IVF index. Reported per cell:
    already-indexed count, appended count, first appended id.

    Scale shape: at scale only the delta runs nearest-centroid
    assignment against broadcast centroids (O(delta × C)) — the
    historical rows' cells are read back from the stored index's
    partition column, and the per-cell counts come from its partition
    statistics. THIS self-contained query has no stored index table
    (the testdata parquet carries no cell column), so it derives the
    historical side's cells by running the same assignment over the
    full table; the split it reports (n_indexed vs n_appended) is the
    production contract, the full-scan is the test-harness stand-in.
    Cell skew (a hot centroid) surfaces here as an uneven n_appended
    histogram — the monitoring signal to re-train centroids."""
    from fhir_to_lakehouse_spark.functions.similarity import ivf_assign

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    asg = ivf_assign(emb, centroids).withColumn(
        "is_new", F.col("vec_id") % 5 == 4
    )
    return asg.groupBy("cell").agg(
        F.sum((~F.col("is_new")).cast("bigint")).alias("n_indexed"),
        F.sum(F.col("is_new").cast("bigint")).alias("n_appended"),
        F.min(F.when(F.col("is_new"), F.col("vec_id"))).alias(
            "first_new_vec_id"
        ),
    )
