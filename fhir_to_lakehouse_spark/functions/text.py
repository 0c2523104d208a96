"""Text analysis primitives: tokenization, quality scoring, language ID,
fingerprinting.

All pure Catalyst column expressions (no Python UDFs): at 100 TB these
run inside WholeStageCodegen and vectorize over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword marker lists for the heuristic language ID.
# Deliberately tiny and deterministic so the oracle SQL can mirror them.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
    "zh": ["de", "shi", "le", "wo", "bu"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["in", "is", "it", "that", "for"]

PUNCT_CLASS = "[.,!?;:]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text -> array<string>.

    ``F.split`` on ``\\s+`` after trim; empty string yields [''] which we
    filter out so empty docs count 0 tokens.
    """
    toks = F.split(F.trim(F.lower(F.col(col) if isinstance(col, str) else col)), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bag_of_words_signature(col: Column | str) -> Column:
    """16-byte signature of the token MULTISET (sorted token sequence):
    equal for any word-order permutation of the same tokens, so it
    catches shuffled/templated boilerplate exact-hash dedup misses.
    DuckDB twin: md5(array_to_string(list_sort(toks), ' '))."""
    return bag_of_words_from_tokens(tokens(col))


def bag_of_words_from_tokens(toks: Column) -> Column:
    """bag_of_words_signature from an existing token-array column."""
    return F.md5(F.concat_ws(" ", F.sort_array(toks)).cast("binary"))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_digit = F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))
    return n_digit / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    return stopword_ratio_from_tokens(tokens(col), stopwords)


def stopword_ratio_from_tokens(
    toks: Column, stopwords: list[str] | None = None
) -> Column:
    """stopword_ratio from an existing token-array column (the
    convenience form evaluates the tokenizer twice: filter + size)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: longer docs with low punctuation /
    digit noise and a plausible stopword rate score higher. The exact
    formula is arbitrary but fixed — the oracle mirrors it digit for
    digit."""
    c = F.col(col) if isinstance(col, str) else col
    return quality_score_from_tokens(c, tokens(c))


def quality_score_from_tokens(col: Column | str, toks: Column) -> Column:
    """quality_score with the token array supplied as a staged column
    (the convenience form re-tokenizes inside the stopword term)."""
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    return (
        0.4 * length_term
        + 0.3 * (1 - punct_ratio(c))
        + 0.2 * (1 - digit_ratio(c))
        + 0.1 * F.least(stopword_ratio_from_tokens(toks) * 5, F.lit(1.0))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (the n-gram-heuristic language ID:
    word-unigram variant so the oracle stays expressible).

    Convenience form — embeds the tokenizer in EVERY language's score
    expression; in multi-stage pipelines stage the token array once
    and use :func:`lang_scores_from_tokens`."""
    return lang_scores_from_tokens(tokens(col))


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    """Per-language marker-hit counts from an existing token-array
    column (stage tokens in their own projection first — a plan-level
    audit found the convenience form evaluating the regex tokenizer
    35x per row across the score/argmax expressions)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))
    return out


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    md5 (not xxhash64) so external engines can reproduce it."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(normalized)


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles (distinct) from an existing token-array column.

    Prefer this over :func:`shingles` in multi-stage pipelines:
    materialize the token array once (withColumn/select) and build
    shingles from the column reference — the convenience form embeds
    the tokenizer expression 4× (guard, size, sequence, transform).

    Docs with fewer than k tokens yield an empty array: Spark's
    ``sequence(1, stop)`` runs DESCENDING when stop < 1 (producing an
    illegal slice start of 0), so the short-doc case must be guarded
    explicitly."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as array<string> (distinct) — convenience form
    tokenizing inline; see shingles_from_tokens for the staged form."""
    return shingles_from_tokens(tokens(col), k)


def shingle_hashes_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-shingles as xxhash64 values (array<long>) — skips the
    string concatenation entirely (xxhash64 hashes the k token columns
    directly). Set cardinalities match the string form (collisions are
    ~2^-64), so Jaccard computed on hashes equals Jaccard on strings;
    use for set-overlap math, not where shingle text is needed."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.element_at(toks, i + j) for j in range(k)]
                ),
            )
        ),
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))


def _fuse_adjacent(syms: Column, left: str, right: str) -> Column:
    """One BPE merge applied to a symbol array: fuse every adjacent
    (left, right) occurrence non-overlapping left-to-right — exactly
    the reference algorithm's pass ('aaa' + (a,a) -> ['aa','a']): a
    freshly merged symbol never re-matches as the left side within the
    same pass, because the fold checks the ACCUMULATOR's tail (already
    merged) against the incoming raw symbol."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode_words(words, rules, word_col: str = "word"):
    """Tokenizer APPLICATION — the inference-side counterpart of
    :func:`learn_bpe_merges`: encode each distinct word into its BPE
    symbol sequence by replaying the learned merge rules in rank
    order. ``rules`` accepts the learner's ``(rank, left, right,
    count)`` tuples or bare ``(left, right)`` pairs. Returns ``words``
    with a ``bpe_syms array<string>`` column appended.

    Deliberately operates on the VOCABULARY, not the corpus: encoding
    cost is paid once per DISTINCT word (bounded by vocab size), and a
    consumer maps corpus tokens through this frame with a join —
    broadcast when the vocab fits (typical: a 50k-entry tokenizer
    vocab is a few MB), shuffle otherwise. The per-word encode itself
    is a chain of n_rules JVM-side higher-order folds (one
    :func:`_fuse_adjacent` per rule — no Python UDF, no shuffle), so
    the whole encode is a narrow projection over the vocab frame."""
    chars = F.filter(F.split(F.col(word_col), ""), lambda x: x != "")
    sym = chars
    for rule in rules:
        left, right = (rule[1], rule[2]) if len(rule) >= 3 else rule
        sym = _fuse_adjacent(sym, left, right)
    return words.withColumn("bpe_syms", sym)


def learn_bpe_merges(
    words,  # DataFrame (word string, freq long) — the corpus vocabulary
    n_merges: int = 8,
):
    """Greedy BPE vocabulary induction (Sennrich et al. 2016), the
    iterative continuation of the single-step pair count
    (plans/text.py::text_bpe_pair_counts): learn ``n_merges`` merge
    rules, each round picking the most frequent adjacent symbol pair
    (weighted by word frequency; ties broken left-asc, right-asc for
    engine determinism) and fusing it non-overlapping left-to-right in
    every word. Returns the learned rules as a list of
    ``(rank, left, right, pair_count)`` tuples.

    Distribution discipline (the production-trainer shape):

    - State is the VOCABULARY (distinct word -> symbol array, freq),
      bounded by vocab size, never the corpus — the corpus collapsed
      to word counts before this function.
    - Each round is ONE map-side-combinable pair aggregate + a 1-row
      argmax collect (the merge rule is a scalar by definition) + one
      narrow per-row fold that applies the merge. No shuffle grows
      with iteration count.
    - The symbol frame is localCheckpoint-ed per round: the fold's
      lineage would otherwise nest n_merges deep (same measured
      planning cliff as functions/graph.py::pagerank).
    - The left-to-right fold handles overlapping occurrences exactly
      like the reference algorithm ('aaa' + (a,a) -> ['aa','a']):
      a freshly merged symbol never re-matches as the left side within
      the same pass.
    """
    from fhir_to_lakehouse_spark.functions.cache import release_checkpoint

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != "")
    sym = words.select(chars.alias("sym"), "freq").localCheckpoint(eager=True)

    pair_struct = F.expr(
        "transform(sequence(1, size(sym) - 1),"
        " i -> struct(element_at(sym, i) AS l, element_at(sym, i + 1) AS r))"
    )
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            sym.filter(F.size("sym") >= 2)
            .select(F.col("freq"), F.explode(pair_struct).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # no adjacent pairs left anywhere
        left, right, n = top[0]["p"]["l"], top[0]["p"]["r"], top[0]["n"]
        rules.append((rank, left, right, int(n)))
        fused = _fuse_adjacent(F.col("sym"), left, right)
        prev = sym
        sym = sym.select(fused.alias("sym"), "freq").localCheckpoint(
            eager=True
        )
        release_checkpoint(prev)
    release_checkpoint(sym)  # rules are plain tuples; no frame escapes
    return rules


def misra_gries_candidates(
    tokens_df,
    token_col: str = "token",
    k: int = 50,
    emit_partition_counts: bool = False,
):
    """Per-partition Misra-Gries heavy-hitter CANDIDATE generation:
    each partition emits at most ``k`` tokens, and the union is
    guaranteed to contain every token with global frequency > N/k
    (pigeonhole: a globally heavy token must be locally heavy in at
    least one partition, and batched MG's cumulative decrement is
    bounded by N_p/(k+1) < N_p/k, so a locally heavy token's counter
    ends positive). Output is (token) rows — candidates only, counts
    discarded because MG counts are underestimates; the caller's exact
    second pass recounts.

    This is the scale pattern that makes exact heavy hitters cheap at
    100 TB: pass 1 reduces the shuffle from |vocab| rows to at most
    k x partitions candidate rows + one semi-join, while the final
    answer stays EXACTLY equal to GROUP BY ... HAVING count > N/k
    (which is why the registry entry carries a plain SQL oracle
    despite the sketch in the middle).

    Batched MG reduction: merge a batch's value_counts into the
    counter dict; while more than k counters remain, subtract the
    (m-k)-th smallest count from all and drop non-positives — each
    such subtraction of t removes >= t*(k+1) total mass, preserving
    the classic decrement bound.

    ``emit_partition_counts=True`` adds two columns — ``n`` and the
    ``is_total`` marker — and yields one (is_total=true,
    n=<partition row count>) row per partition, letting the caller
    derive the corpus total N from the SAME scan instead of a second
    pass — the heavy-hitters query needs exactly (candidates, N,
    recount), and this keeps it at two corpus scans total
    (code-review finding: the separate count() was a third full
    tokenize+explode). The marker is a DEDICATED column rather than a
    token-IS-NULL sentinel (ADVICE r5): a corpus that genuinely
    contains null tokens counts them into N AND can surface null as a
    candidate — filter candidates with ``NOT is_total``, never on the
    token column.
    """
    import pandas as pd  # noqa: F811 — vectorized per-batch counts
    from pyspark.sql import types as T

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    fields = [T.StructField(token_col, T.StringType())]
    if emit_partition_counts:
        fields.append(T.StructField("n", T.LongType()))
        fields.append(T.StructField("is_total", T.BooleanType()))
    out_schema = T.StructType(fields)

    def per_partition(batches):
        counters: dict[str | None, int] = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            # dropna=False: null input tokens are counted like any
            # other value (they contribute to N, so they must be able
            # to surface as candidates too)
            for tok, c in pdf[token_col].value_counts(dropna=False).items():
                key = None if pd.isna(tok) else tok
                counters[key] = counters.get(key, 0) + int(c)
            m = len(counters)
            if m > k:
                counts = sorted(counters.values())
                t = counts[m - k - 1]  # (m-k)-th smallest
                counters = {
                    tok: c - t for tok, c in counters.items() if c - t > 0
                }
        if emit_partition_counts:
            yield pd.DataFrame(
                {
                    token_col: list(counters) + [None],
                    "n": [None] * len(counters) + [seen],
                    "is_total": [False] * len(counters) + [True],
                }
            )
        else:
            yield pd.DataFrame({token_col: list(counters)})

    return tokens_df.select(token_col).mapInPandas(
        per_partition, schema=out_schema
    )
