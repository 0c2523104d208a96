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


# --- iterative BPE training golden (round 5) --------------------------


def _bpe_reference(word_freqs: dict[str, int], n_merges: int):
    """Independent pure-Python Sennrich-style BPE: per round, count
    adjacent symbol pairs weighted by word freq, pick (count desc,
    left asc, right asc), fuse non-overlapping left-to-right."""
    vocab = {w: [c for c in w] for w in word_freqs}
    rules = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, left, right, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return rules


def test_learn_bpe_merges_matches_reference_implementation(spark):
    from fhir_to_lakehouse_spark.functions.text import learn_bpe_merges

    freqs = {
        "lower": 6,
        "lowest": 3,
        "newer": 8,
        "newest": 5,
        "wider": 2,
        "low": 9,
        "new": 4,
        "a": 7,          # single char: contributes no pairs
        "aaaa": 3,       # overlapping-run case: (a,a) fuses to aa aa
    }
    words = spark.createDataFrame(
        list(freqs.items()), "word string, freq long"
    )
    got = learn_bpe_merges(words, n_merges=10)
    want = _bpe_reference(freqs, 10)
    assert got == want, f"\nspark: {got}\nref:   {want}"
    # sanity on the shape: ranks are 1..k, counts non-increasing is NOT
    # required by BPE (later merges can beat earlier residual counts),
    # but every count must be positive
    assert [r[0] for r in got] == list(range(1, len(got) + 1))
    assert all(r[3] > 0 for r in got)


def test_learn_bpe_merges_run_fusion_is_left_to_right(spark):
    """'aaaa' under rule (a,a) must become ['aa','aa'], and the next
    round's top pair is then (aa,aa) — the non-overlapping greedy fold,
    exactly like the reference algorithm."""
    from fhir_to_lakehouse_spark.functions.text import learn_bpe_merges

    words = spark.createDataFrame([("aaaa", 5)], "word string, freq long")
    got = learn_bpe_merges(words, n_merges=2)
    assert got == [(1, "a", "a", 15), (2, "aa", "aa", 5)]


def test_learn_bpe_merges_stops_when_no_pairs_remain(spark):
    from fhir_to_lakehouse_spark.functions.text import learn_bpe_merges

    words = spark.createDataFrame(
        [("ab", 1), ("c", 4)], "word string, freq long"
    )
    got = learn_bpe_merges(words, n_merges=5)
    assert got == [(1, "a", "b", 1)]  # after 'ab' fuses, nothing pairs


# --- Misra-Gries heavy-hitter candidates (round 5) --------------------


def test_mg_candidates_superset_of_true_heavy_hitters(spark):
    """Adversarial layout: the heavy token is spread thin across many
    partitions, light tokens are dense locally. The candidate union
    must still contain every token with global freq > N/k."""
    from fhir_to_lakehouse_spark.functions.text import misra_gries_candidates

    rows = []
    # 'hot' appears 400x globally; 200 distinct noise tokens 2x each
    for i in range(400):
        rows.append(("hot",))
    for i in range(200):
        rows += [(f"noise{i}",), (f"noise{i}",)]
    df = spark.createDataFrame(rows, "token string").repartition(16)
    k = 3  # threshold N/k = 800/3 ≈ 267 — only 'hot' qualifies
    cands = {
        r["token"] for r in misra_gries_candidates(df, k=k).distinct().collect()
    }
    assert "hot" in cands
    # per-partition cap held: at most k candidates per partition
    assert len(cands) <= 16 * k


def test_mg_candidates_rejects_bad_k(spark):
    import pytest as _pytest

    from fhir_to_lakehouse_spark.functions.text import misra_gries_candidates

    df = spark.createDataFrame([("a",)], "token string")
    with _pytest.raises(ValueError, match="k must be"):
        misra_gries_candidates(df, k=0)


def test_heavy_hitters_query_equals_plain_group_by(spark, sf_dir):
    """The sketch must be invisible: the registry entry's result equals
    the naive exact plan computed without any candidate pruning."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.functions.text import tokens
    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.sources.tables import load_table

    got = {
        (r["token"], r["cnt"], r["share"])
        for r in QUERIES["text_heavy_hitters_exact"](spark, sf_dir).collect()
    }
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("token")
    )
    n = tok.count()
    want = {
        (r["token"], r["cnt"], round(r["cnt"] / n, 6))
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > n / 50.0)
        .collect()
    }
    assert got == want and len(got) > 0


def test_mg_partition_counts_use_dedicated_marker_not_null_sentinel(spark):
    """ADVICE r5 (text.py): the per-partition total rides in a
    dedicated is_total marker column — genuine null input tokens are
    counted into N AND can surface as candidates, instead of being
    silently dropped and indistinguishable from the sentinel."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.functions.text import misra_gries_candidates

    rows = [("a",)] * 6 + [(None,)] * 5 + [("b",)] * 1
    df = spark.createDataFrame(rows, "token string").coalesce(1)
    mg = misra_gries_candidates(df, k=3, emit_partition_counts=True)
    out = mg.collect()
    totals = [r for r in out if r["is_total"]]
    cands = [r for r in out if not r["is_total"]]
    # N counts null tokens too: 12 rows, one partition
    assert sum(r["n"] for r in totals) == 12
    # the null token is globally heavy (5/12 > 12/3 rows? freq 5 > N/k=4)
    # and must appear as a CANDIDATE row, distinguishable via the marker
    assert any(r["token"] is None for r in cands)
    # filtering on the marker (never the token column) keeps it
    assert (
        mg.filter(~F.col("is_total")).filter(F.col("token").isNull()).count()
        == 1
    )


def _bpe_apply_reference(word: str, rules) -> list[str]:
    """Independent pure-Python BPE ENCODER: replay learned merge rules
    in rank order, fusing non-overlapping left-to-right per pass."""
    syms = [c for c in word]
    for _, left, right, *_ in rules:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_words_matches_reference_encoder(spark):
    """Every distinct word's EXACT symbol sequence equals the
    independent encoder's — including overlapping-run fusion ('aaaa'
    with (a,a) -> ['aa','aa'], then (aa,aa) -> ['aaaa'])."""
    from fhir_to_lakehouse_spark.functions.text import (
        bpe_encode_words,
        learn_bpe_merges,
    )

    freqs = {
        "lower": 6, "lowest": 3, "newer": 8, "newest": 5, "wider": 2,
        "low": 9, "new": 4, "aaaa": 7, "banana": 3,
    }
    words = spark.createDataFrame(
        [(w, f) for w, f in freqs.items()], "word string, freq long"
    )
    rules = learn_bpe_merges(words, n_merges=6)
    got = {
        r["word"]: list(r["bpe_syms"])
        for r in bpe_encode_words(words.select("word"), rules).collect()
    }
    for w in freqs:
        assert got[w] == _bpe_apply_reference(w, rules), (w, got[w])


def test_bpe_encode_stats_match_reference_tokenizer(spark):
    """The registered rows-only query's per-doc counts equal the
    independent tokenizer applied end-to-end (learn on the corpus
    vocab, encode each doc's tokens, count)."""
    import tempfile

    from fhir_to_lakehouse_spark.plans import QUERIES

    docs = [
        (0, "new lower newer low low"),
        (1, "newest wider lowest new banana"),
        (2, "aaaa aaaa new low"),
        (3, ""),  # empty doc: no tokens, must produce no row
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        rows = {
            r["doc_id"]: r
            for r in QUERIES["text_bpe_encode_stats"](spark, d).collect()
        }

    # independent end-to-end: freqs -> rules -> encode -> count
    freqs: dict[str, int] = {}
    for _, text in docs:
        for w in text.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    rules = _bpe_reference(freqs, 8)
    assert 3 not in rows  # empty doc
    for doc_id, text in docs:
        toks = text.lower().split()
        if not toks:
            continue
        want_syms = sum(len(_bpe_apply_reference(w, rules)) for w in toks)
        r = rows[doc_id]
        assert r["n_words"] == len(toks)
        assert r["n_bpe_tokens"] == want_syms, (doc_id, r, want_syms)
        assert r["n_word_chars"] == sum(len(w) for w in toks)


# --- DuckDB oracle twin of the merge fold (round 12 promotion) --------


def test_duck_fuse_truth_table_matches_engine_fold(spark):
    """plans/text.py::_duck_fuse (the closed-form alternation used by
    the promoted BPE oracles) must agree with the engine's sequential
    fold functions/text.py::_fuse_adjacent on every fuse shape:
    overlapping runs (odd/even lengths), interleaved matches,
    multi-char symbols whose concatenation could false-match, and
    no-op cases."""
    import duckdb

    from fhir_to_lakehouse_spark.functions.text import _fuse_adjacent
    from fhir_to_lakehouse_spark.plans.text import _duck_fuse

    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["a", "b", "b", "a", "b"], "a", "b"),
        (["b", "a", "a", "a", "b"], "a", "a"),
        (["ab", "c"], "b", "c"),  # suffix/prefix must NOT match
        (["ab", "a", "b"], "a", "b"),
        (["x"], "a", "b"),
        (["a", "b"], "b", "a"),  # reversed rule: no merge
        (["es", "t", "es", "t"], "es", "t"),  # multi-char symbols
        (["e", "r", "e", "r", "e"], "e", "r"),
    ]
    con = duckdb.connect()
    for syms, left, right in cases:
        engine = (
            spark.createDataFrame([(syms,)], "sym array<string>")
            .select(_fuse_adjacent(F.col("sym"), left, right).alias("f"))
            .collect()[0]["f"]
        )
        duck = con.execute(
            f"SELECT {_duck_fuse('s', 'l', 'r')} "
            "FROM (SELECT ? AS s, ? AS l, ? AS r)",
            [syms, left, right],
        ).fetchone()[0]
        assert duck == engine, (syms, left, right, duck, engine)
