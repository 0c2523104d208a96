"""Text-function goldens on crafted inputs (the synthetic corpus can't
exercise these edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions import text as TX


def one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("x")).collect()[0]["x"]


def test_fingerprint_invariant_to_case_and_whitespace(spark):
    a = one(spark, "Hello   World\tfoo", TX.fingerprint("text"))
    b = one(spark, "hello world foo", TX.fingerprint("text"))
    c = one(spark, "hello world bar", TX.fingerprint("text"))
    assert a == b != c


def test_token_count_edges(spark):
    assert one(spark, "", TX.token_count("text")) == 0
    assert one(spark, "   \t  ", TX.token_count("text")) == 0
    assert one(spark, "one", TX.token_count("text")) == 1
    assert one(spark, "a  b\tc\nd", TX.token_count("text")) == 4


def test_shingles_short_docs_empty(spark):
    assert one(spark, "a b", TX.shingles("text", 3)) == []
    assert one(spark, "a b c", TX.shingles("text", 3)) == ["a b c"]
    assert sorted(one(spark, "a b c d", TX.shingles("text", 3))) == [
        "a b c",
        "b c d",
    ]


def test_lang_scores_pick_marker_language(spark):
    scores = TX.lang_scores("text")
    df = spark.createDataFrame(
        [("der hund und die katze ist das",)], "text string"
    )
    row = df.select(
        *[scores[lang].alias(lang) for lang in sorted(TX.LANG_MARKERS)]
    ).collect()[0]
    assert row["de"] > row["en"]
    assert row["de"] > row["fr"]


def test_punct_and_digit_ratios(spark):
    assert abs(one(spark, "ab,.", TX.punct_ratio("text")) - 0.5) < 1e-12
    assert abs(one(spark, "a1b2", TX.digit_ratio("text")) - 0.5) < 1e-12
    assert one(spark, "", TX.punct_ratio("text")) == 0.0


def test_bag_of_words_signature_detects_shuffled_duplicates(spark):
    """Reordered token sequences share a signature; different multisets
    (even same set, different multiplicities) do not."""
    from fhir_to_lakehouse_spark.functions.text import bag_of_words_signature

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "fox brown THE quick"),      # permutation (case-folded) -> dup
            (2, "the the quick brown fox"),  # extra multiplicity -> distinct
            (3, "the  quick\tbrown fox"),    # whitespace runs ignored -> dup
        ],
        "doc_id int, text string",
    )
    sigs = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", bag_of_words_signature("text").alias("s")
        ).collect()
    }
    assert sigs[0] == sigs[1] == sigs[3]
    assert sigs[2] != sigs[0]


def test_bpe_pair_counts_conservation(spark, sf_dir):
    """Every word of length L contributes exactly L-1 pairs (0 for
    single chars): sum of pair counts == sum over words of
    freq * (len - 1). Catches off-by-one in the sequence bounds and the
    descending-sequence guard for single-char words."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.functions import text as TX
    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.sources.tables import load_table

    total_pairs = (
        QUERIES["text_bpe_pair_counts"](spark, sf_dir)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    docs = load_table(spark, sf_dir, "documents")
    expected = (
        docs.select(F.explode(TX.tokens("text")).alias("w"))
        .agg(F.sum(F.greatest(F.length("w") - 1, F.lit(0))))
        .collect()[0][0]
    )
    assert total_pairs == expected


def test_trigram_lm_counts_conservation(spark, sf_dir):
    """Sum of trigram counts == sum over docs of max(n_tokens - 2, 0);
    and every context's ctx_continuations equals its distinct-next
    count by construction (each (ctx, nxt) row is unique)."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.functions import text as TX
    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.sources.tables import load_table

    out = QUERIES["text_trigram_lm_counts"](spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    docs = load_table(spark, sf_dir, "documents")
    expected = (
        docs.select(F.size(TX.tokens("text")).alias("k"))
        .agg(F.sum(F.greatest(F.col("k") - 2, F.lit(0))))
        .collect()[0][0]
    )
    assert total == expected
    # (ctx, nxt) rows are unique, so no duplicate inflation of the
    # continuation window
    assert out.count() == out.select("ctx", "nxt").distinct().count()
