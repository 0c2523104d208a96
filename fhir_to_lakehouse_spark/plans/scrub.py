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
from fhir_to_lakehouse_spark.sources.tables import load_table

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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
