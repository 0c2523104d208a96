"""Text-analysis queries over the documents table (north-star extension:
token stats, quality scoring, language ID, term frequency, fingerprints).

Every oracle mirrors the Catalyst expression digit-for-digit (same
operation order, same rounding) — see functions/text.py for the
primitives.
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

# DuckDB equivalent of TX.tokens()
_DUCK_TOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKS}) AS INT)                 AS n_tokens,
           CAST(len(list_distinct({_DUCK_TOKS})) AS INT)  AS n_distinct_tokens,
           CAST(length(text) AS INT)                      AS n_chars_actual
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer): total + distinct tokens."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           ROUND(
             0.4 * least(length(text) / 500.0, 1.0)
           + 0.3 * (1 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                        / greatest(length(text), 1))
           + 0.2 * (1 - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                        / greatest(length(text), 1))
           + 0.1 * least(
               (len(list_filter({_DUCK_TOKS},
                    x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x)))
                / greatest(len({_DUCK_TOKS}), 1)) * 5, 1.0)
           , 6) AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, punctuation/digit noise,
    stopword plausibility."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", F.round(TX.quality_score("text"), 6).alias("quality")
    )


_LANGS = sorted(TX.LANG_MARKERS)  # deterministic check order


def _duck_score(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in TX.LANG_MARKERS[lang])
    return f"len(list_filter({_DUCK_TOKS}, x -> list_contains([{markers}], x)))"


_LANG_ORACLE = f"""
    SELECT doc_id,
           {', '.join(f'CAST({_duck_score(l)} AS INT) AS score_{l}' for l in _LANGS)},
           CASE {' '.join(f"WHEN {_duck_score(l)} = greatest({', '.join(_duck_score(m) for m in _LANGS)}) THEN '{l}'" for l in _LANGS)}
           END AS predicted_lang
    FROM documents
"""


@query("text_lang_id", oracle=_LANG_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language hit counts + argmax with a
    fixed alphabetical tie-break (the synthetic corpus is English-ish
    word salad; determinism is what's under test, not accuracy)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # two staged projections: tokens once, then each language's score
    # once — the convenience form evaluated the tokenizer 35x per row
    # across the score/greatest/argmax expressions (plan-audit sweep)
    staged = docs.select("doc_id", TX.tokens("text").alias("_toks"))
    scores = TX.lang_scores_from_tokens(F.col("_toks"))
    scored = staged.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in _LANGS],
    )
    cols = {lang: F.col(f"score_{lang}") for lang in _LANGS}
    best = F.greatest(*[cols[lang] for lang in _LANGS])
    pred = None
    for lang in _LANGS:
        cond = cols[lang] == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.select(
        "doc_id",
        *[f"score_{lang}" for lang in _LANGS],
        pred.alias("predicted_lang"),
    )


@query(
    "text_term_frequency",
    oracle=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency: explode tokens -> count -> top 50.
    The explode→groupBy is map-side combinable; top-k is TakeOrdered."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )


@query(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 document fingerprint (exact-dedup key)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", TX.fingerprint("text").alias("fp"))


@query(
    "text_shingle_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_distinct(
             list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                            i -> array_to_string(toks[i:i+2], ' '))
           )) AS INT) AS n_shingles
    FROM t
    """,
)
def text_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-3-shingle count per document (the MinHash input)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", TX.tokens("text").alias("_toks")).select(
        "doc_id",
        F.size(TX.shingles_from_tokens(F.col("_toks"), 3)).alias("n_shingles"),
    )


def _duck_fuse(s: str, l: str, r: str) -> str:
    """DuckDB list-lambda twin of functions/text.py::_fuse_adjacent —
    one BPE merge pass fusing every adjacent (l, r) occurrence
    non-overlapping LEFT-TO-RIGHT.

    The engine's sequential fold has a closed form: a position i is a
    MERGE CANDIDATE iff (s[i], s[i+1]) == (l, r), and within each
    maximal run of consecutive candidate positions the fold picks
    every SECOND one starting at the run head (a fresh merge l||r can
    never re-match as the left side because l||r == l would need an
    empty r). So picked(i) := candidate(i) AND (i - run_start(i)) is
    even, where run_start derives from the nearest non-candidate
    position below i — all expressible as nested list lambdas, no
    recursion. Truth-tabled against the engine fold in
    tests/test_text_functions.py (runs, overlaps, multi-char symbols).
    """
    cand = lambda i: f"({s}[{i}] = {l} AND {s}[{i}+1] = {r})"  # noqa: E731
    picked = (
        lambda i: f"""({i} < len({s}) AND {cand(i)}
           AND ({i} - coalesce(list_max(list_filter(range(0, {i}),
                 j -> j = 0 OR NOT ({s}[j] = {l} AND {s}[j+1] = {r}))), 0)) % 2 = 1)"""
    )  # noqa: E731
    return f"""
list_filter(
  list_transform(range(1, len({s}) + 1), i ->
    CASE
      WHEN {picked("i")} THEN {s}[i] || {s}[i+1]
      WHEN i > 1 AND {picked("(i-1)")} THEN NULL
      ELSE {s}[i]
    END),
  x -> x IS NOT NULL)"""


# Shared recursive-CTE twin of functions/text.py::learn_bpe_merges
# (8 greedy merge rounds over the corpus vocabulary). DuckDB evaluates
# the recursive term against the WORKING TABLE (previous round only),
# so each round is: one scalar-subquery argmax over the pair counts of
# the current symbol state (ties n DESC, l ASC, r ASC — binary
# collation on both engines) + one per-word fuse. The UNION of all
# rounds keeps each round's learned rule on its rows, which is where
# the learn oracle reads them back from.
_DUCK_BPE_CTE = f"""
WITH RECURSIVE vocab AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_DUCK_TOKS}) AS word FROM documents)
  GROUP BY word
),
bpe AS (
  SELECT 0 AS it, word,
         list_filter(string_split(word, ''), x -> x <> '') AS sym,
         freq, CAST(NULL AS VARCHAR) AS l, CAST(NULL AS VARCHAR) AS r,
         CAST(NULL AS BIGINT) AS n
  FROM vocab
  UNION ALL
  SELECT b.it + 1, b.word,
         {_duck_fuse('b.sym', '(b.best).l', '(b.best).r')} AS sym,
         b.freq, (b.best).l, (b.best).r, (b.best).n
  FROM (
    SELECT s.*, (
      SELECT {{'l': t.pl, 'r': t.pr, 'n': t.n}}
      FROM (
        SELECT (p).l AS pl, (p).r AS pr, CAST(SUM(f) AS BIGINT) AS n
        FROM (
          SELECT unnest(list_transform(range(1, len(sym)),
                   i -> {{'l': sym[i], 'r': sym[i+1]}})) AS p, freq AS f
          FROM bpe
        )
        GROUP BY 1, 2
      ) t
      ORDER BY t.n DESC, t.pl ASC, t.pr ASC
      LIMIT 1
    ) AS best
    FROM bpe s
  ) b
  WHERE b.it < 8 AND b.best IS NOT NULL
)
"""


@query(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH toks AS (SELECT unnest({_DUCK_TOKS}) AS word FROM documents),
    words AS (SELECT word, COUNT(*) AS freq FROM toks GROUP BY word),
    idx AS (SELECT word, freq, unnest(range(1, length(word))) AS i FROM words)
    SELECT substring(word, i, 2) AS pair, CAST(SUM(freq) AS BIGINT) AS n
    FROM idx
    GROUP BY pair
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One iteration of distributed BPE vocabulary induction: count
    adjacent character-pair frequencies across the corpus, weighted by
    word frequency (the argmax pair is the next BPE merge).

    100 TB shape: the corpus FIRST collapses to its vocabulary via a
    map-side-combinable word count (tokens ship as partial (word, n)
    pairs, not raw text), then the pair explosion runs over the
    VOCABULARY — bounded by distinct words, not corpus size. This
    vocab-first structure is how production BPE trainers distribute the
    count step; the alternative (explode pairs straight off every
    token occurrence) shuffles the whole corpus per iteration.
    """
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    words = (
        docs.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # guard: Spark's sequence(1, L-1) runs DESCENDING for L < 2 —
    # single-char words must yield no pairs, not a reversed range
    pairs = F.when(
        F.length("word") >= 2,
        F.expr(
            "transform(sequence(1, length(word) - 1),"
            " i -> substring(word, i, 2))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


@query(
    "text_trigram_lm_counts",
    oracle=f"""
    WITH toks AS (SELECT {_DUCK_TOKS} AS t FROM documents),
    f AS (SELECT t FROM toks WHERE len(t) >= 3),
    idx AS (SELECT t, unnest(range(1, len(t) - 1)) AS i FROM f),
    g AS (SELECT t[i] || ' ' || t[i + 1] AS ctx, t[i + 2] AS nxt FROM idx),
    c AS (SELECT ctx, nxt, COUNT(*) AS n FROM g GROUP BY ctx, nxt)
    SELECT ctx, nxt, CAST(n AS BIGINT) AS n,
           CAST(COUNT(*) OVER (PARTITION BY ctx) AS BIGINT)
               AS ctx_continuations
    FROM c
    """,
)
def text_trigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-trigram LM count table: (context bigram, next word, count)
    plus the context's distinct-continuation count (the Kneser-Ney
    continuation statistic).

    100 TB shape: trigram explosion (3x token stream) feeds a
    map-side-combinable two-key aggregate; the continuation window then
    runs over the ALREADY-AGGREGATED (ctx, nxt) rows — bounded by
    distinct n-grams, partitioned by ctx (vocabulary-scale groups, no
    single-partition window).
    """
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select(TX.tokens("text").alias("t")).filter(F.size("t") >= 3)
    grams = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2), i -> struct("
                " concat_ws(' ', element_at(t, i), element_at(t, i + 1)) AS ctx,"
                " element_at(t, i + 2) AS nxt))"
            )
        ).alias("g")
    )
    counted = grams.groupBy("g.ctx", "g.nxt").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("ctx")
    return counted.select(
        "ctx",
        "nxt",
        "n",
        F.count(F.lit(1)).over(w).alias("ctx_continuations"),
    )


@query(
    "text_unigram_logprob_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents),
    counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    total AS (SELECT SUM(n) AS total FROM counts)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)                          AS n_tokens,
           ROUND(AVG(-ln(counts.n / (total.total * 1.0))), 6) AS avg_neg_logprob
    FROM tok JOIN counts USING (token), total
    GROUP BY doc_id
    """,
)
def text_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-probability document scoring — the perplexity-proxy
    quality signal (CCNet-style): score each document by the average
    negative log-probability of its tokens under the corpus's own
    unigram distribution. High scores = rare-token-heavy documents
    (gibberish, OCR noise, exotic boilerplate); low = commonplace text.

    100 TB shape: the corpus collapses to its vocabulary via one
    map-side-combinable count, the (token, p) table broadcasts (vocab
    sizes fit executors; at web scale, frequency-floor the tail), and
    the scoring pass is a single corpus scan + broadcast hash join +
    per-doc aggregate — no corpus-sized shuffle beyond the doc_id agg.
    The real CCNet filter swaps the unigram table for a KenLM sketch;
    the plan shape is identical.
    """
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
    p = (F.col("n") / (F.col("total") * F.lit(1.0))).alias("p")
    vocab = counts.crossJoin(F.broadcast(total)).select("token", p)
    return (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log("p")), 6).alias("avg_neg_logprob"),
        )
    )


@query(
    "text_hapax_spectrum",
    oracle=f"""
    WITH tok AS (SELECT unnest({_DUCK_TOKS}) AS token FROM documents),
    counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token)
    SELECT n AS token_freq,
           COUNT(*) AS n_types,
           CAST(SUM(n) AS BIGINT) AS token_mass
    FROM counts GROUP BY n
    """,
)
def text_hapax_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency-of-frequencies spectrum (Zipf / Good-Turing
    view): for each occurrence count f, how many vocabulary types
    occur exactly f times and how much token mass they carry. The f=1
    row is the hapax legomena count — the standard corpus-health
    signal (a bloated hapax tail flags OCR noise / tokenizer damage),
    and the spectrum is the direct input to Good-Turing smoothing.

    Shape: two stacked hash aggregates, both map-side combinable; the
    second keys on the tiny frequency domain (~hundreds of distinct
    counts), so the final shuffle is near-zero bytes. No windows, no
    joins — survives any corpus size the vocab aggregate survives."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(TX.tokens("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy(F.col("n").alias("token_freq")).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("n").alias("token_mass"),
    )


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t),
    e AS (SELECT doc_id, unnest(sh) AS s FROM s),
    df AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM e GROUP BY s)
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT)                       AS n_shingles,
           CAST(COUNT(*) FILTER (df.df = 1) AS BIGINT)    AS n_unique,
           ROUND(COUNT(*) FILTER (df.df = 1)
                 / CAST(COUNT(*) AS DOUBLE), 6)           AS novelty_frac
    FROM e JOIN df USING (s)
    GROUP BY e.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word-3-shingles that appear in NO other document
    (corpus-wide document frequency 1). Low novelty = boilerplate /
    template text repeated across the corpus (drop or downweight);
    and the inverse signal bounds verbatim-memorization risk when the
    corpus feeds model training.

    100 TB shape: one tokenizing scan feeds a (shingle -> df) hash
    aggregate — map-side combinable, shuffle key is the shingle
    fingerprint (uniform) — and the per-doc rollup joins the exploded
    frame with the df table on the same shingle partitioning before
    re-keying on doc_id. No broadcast of the (corpus-sized) shingle
    vocabulary, no windows; both aggregates survive any corpus the
    vocabulary aggregate survives. At scale the df table would be
    frequency-floored like the unigram table (SCALING.md)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", TX.tokens("text").alias("_toks")).select(
        "doc_id", TX.shingles_from_tokens(F.col("_toks"), 3).alias("sh")
    )
    e = sh.select("doc_id", F.explode("sh").alias("s"))
    dfreq = e.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    uniq = F.sum((F.col("df") == 1).cast("long"))
    return (
        e.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            uniq.alias("n_unique"),
            F.round(uniq / F.count(F.lit(1)).cast("double"), 6).alias(
                "novelty_frac"
            ),
        )
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                FROM documents),
    c AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
          FROM ch GROUP BY doc_id, ch)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT)                       AS n_chars_counted,
           COUNT(*)                                     AS n_distinct_chars,
           ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS char_entropy
    FROM c GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    encoding-damage / OCR-garbage / key-mash detector: natural text
    sits in a narrow entropy band, binary-in-text and repeated-char
    spam fall outside it. Computed as H = ln(n) - sum(c*ln c)/n so a
    single aggregate pass needs no second traversal for the total.

    Shape: explode chars -> (doc, char) count -> per-doc rollup; both
    aggregates are map-side combinable and the first collapses each
    document's characters to its alphabet locally before any shuffle
    (a 1 MB document becomes <=|alphabet| rows). The second agg reuses
    the doc_id-compatible partitioning. No joins, no windows."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    ch = docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
    counts = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    s2 = F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
    return counts.groupBy("doc_id").agg(
        n.cast("long").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(F.log(n.cast("double")) - s2 / n.cast("double"), 6).alias(
            "char_entropy"
        ),
    )


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> array_to_string(toks[i:i+2], ' '))) AS sh
          FROM t),
    e AS (SELECT doc_id, unnest(sh) AS s FROM s),
    df AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df,
                  MIN(doc_id) AS example_doc_id
           FROM e GROUP BY s)
    SELECT s AS shingle, df, example_doc_id
    FROM df
    ORDER BY df DESC, s ASC
    LIMIT 20
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: the 20 word-3-shingles shared by the most
    documents, each with an example doc — the phrases a cleaning
    pipeline turns into strip rules (cookie banners, license headers,
    navigation chrome). The complement of text_ngram_novelty: that
    scores documents by their unique tail, this surfaces the shared
    head itself.

    Shape: one tokenizing scan -> (shingle -> df, min doc) hash
    aggregate -> TakeOrdered top-20 (per-partition partial top-k, no
    global sort). Scales exactly as far as the df aggregate does."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", TX.tokens("text").alias("_toks")).select(
        "doc_id", TX.shingles_from_tokens(F.col("_toks"), 3).alias("sh")
    )
    e = sh.select("doc_id", F.explode("sh").alias("s"))
    return (
        e.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .select(F.col("s").alias("shingle"), "df", "example_doc_id")
        .orderBy(F.col("df").desc(), F.col("shingle").asc())
        .limit(20)
    )


@query(
    "text_bpe_learn_merges",
    oracle=_DUCK_BPE_CTE
    + """
    SELECT DISTINCT CAST(it AS INT) AS merge_rank, l AS "left",
           r AS "right", n AS pair_count
    FROM bpe WHERE it >= 1 ORDER BY merge_rank
    """,
)
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full iterative BPE training (8 merge rules) over the corpus
    vocabulary — the tokenizer-training op itself, extending the
    single-step text_bpe_pair_counts. Long rows-only (iterative greedy
    argmax), promoted to a full value oracle in round 12: DuckDB's
    recursive CTE may aggregate over the working table, so each round
    is a scalar-subquery argmax over the previous round's pair counts,
    and the sequential merge fold has a closed form (_duck_fuse).
    tests/test_text_functions.py additionally value-locks the ENTIRE
    merge sequence against an independent pure-Python reference
    implementation of Sennrich-style BPE on the same word counts
    (exact rule-by-rule equality including tie-breaks and pair
    counts).

    Scale shape: see functions/text.py::learn_bpe_merges — state is
    the vocabulary, each round is one map-side-combinable aggregate +
    a 1-row collect + a narrow fold, lineage checkpointed per round."""
    from fhir_to_lakehouse_spark.functions.text import learn_bpe_merges

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    words = (
        docs.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    rules = learn_bpe_merges(words, n_merges=8)
    return spark.createDataFrame(
        rules, "merge_rank int, left string, right string, pair_count long"
    )


@query(
    "text_heavy_hitters_exact",
    oracle=f"""
    WITH e AS (
      SELECT unnest({_DUCK_TOKS}) AS token FROM documents
    ), t AS (SELECT COUNT(*) AS n FROM e)
    SELECT token,
           CAST(COUNT(*) AS BIGINT)                      AS cnt,
           ROUND(COUNT(*) / (SELECT n FROM t), 6)        AS share
    FROM e GROUP BY token
    HAVING COUNT(*) > (SELECT n FROM t) / 50.0
    """,
)
def text_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (tokens with global frequency > N/k, k=50)
    via the two-pass sketch-pruned pattern: per-partition Misra-Gries
    candidate generation (functions/text.py::misra_gries_candidates —
    at most k candidate tokens leave each partition) followed by an
    exact recount restricted to the candidate set. The MG guarantee
    makes the candidate union a superset of the true answer, so the
    result is EXACTLY `GROUP BY token HAVING count > N/k` — the plain
    SQL is the oracle, the sketch is invisible in the output.

    At 100 TB the win is the shuffle: the naive exact plan shuffles
    one row per distinct (vocab-sized); this plan shuffles at most
    k x partitions candidate rows plus the semi-joined recount. N
    comes from per-partition counts emitted by the SAME candidate
    scan (not a third corpus pass) and travels as a 1-row broadcast
    (bm25-stats class) — two corpus scans total: candidates+N, then
    the exact recount."""
    from fhir_to_lakehouse_spark.functions.text import misra_gries_candidates

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(TX.tokens("text")).alias("token"))
    # ONE scan yields both the candidates and the per-partition row
    # counts (N = their sum); both derivations (`cand` and `total`)
    # are INDEPENDENT broadcast builds, which Spark materializes
    # concurrently — a lazy persist here is the r10 cache stampede
    # (each build re-runs the full corpus tokenize+MG pass before
    # either writes the cache entry). Eagerly checkpointed instead:
    # the relation is at most k x partitions + partitions rows.
    # Lifecycle: functions/cache.py checkpoint contract.
    mg = scoped_local_checkpoint(
        misra_gries_candidates(tok, k=50, emit_partition_counts=True),
        eager=True,
    )
    # candidates are the NOT-is_total rows (dedicated marker — a
    # token-IS-NULL filter would misclassify genuine null tokens)
    cand = mg.filter(~F.col("is_total")).select("token").distinct()
    total = mg.agg(F.sum("n").alias("n"))
    counted = (
        # candidate semi-join — null-SAFE equality so a genuinely
        # heavy NULL token (which the MG contract now surfaces as a
        # candidate) survives the recount; SQL GROUP BY groups NULLs
        # on both engines, so the oracle agrees
        tok.join(F.broadcast(cand), tok["token"].eqNullSafe(cand["token"]))
        .select(tok["token"])
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n") / F.lit(50.0))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("n"), 6).alias("share"),
        )
    )


@query(
    "text_vocab_growth",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ), firsts AS (
      SELECT token, MIN(doc_id) AS first_doc FROM e GROUP BY token
    ), prefixes AS (
      SELECT unnest([1,2,4,8,16,32,64,128,256,512]) AS prefix_docs
    )
    SELECT prefix_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
            WHERE first_doc < prefix_docs) AS vocab_size
    FROM prefixes ORDER BY prefix_docs
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law diagnostic) at log-spaced
    corpus prefixes (first 1, 2, 4, ... 512 docs in doc_id order):
    distinct token types seen so far — the curve that tells a
    pretraining pipeline whether more of the same source still buys
    vocabulary (flattening) or the corpus is still fresh.

    The naive formulation is one full distinct aggregation per prefix;
    the single-pass form here is exact and linear: a token enters
    every prefix's count iff its FIRST occurrence lies inside, so
    min(doc_id) per token (one map-side-combinable aggregate over the
    exploded corpus) followed by ten conditional counts in ONE 1-row
    aggregate reproduces all ten distinct counts. The explode of the
    prefix array runs over that single row."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    e = docs.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
    firsts = e.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    prefixes = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    counts = firsts.agg(
        *[
            F.count(F.when(F.col("first_doc") < k, 1)).alias(f"_v{k}")
            for k in prefixes
        ]
    )
    curve = F.array(
        *[
            F.struct(
                F.lit(k).alias("prefix_docs"),
                F.col(f"_v{k}").alias("vocab_size"),
            )
            for k in prefixes
        ]
    )
    return (
        counts.select(F.explode(curve).alias("p"))
        .select("p.prefix_docs", "p.vocab_size")
        .orderBy("prefix_docs")
    )



@query(
    "text_bpe_encode_stats",
    oracle=_DUCK_BPE_CTE
    + f""",
    enc AS (
      SELECT word, len(sym) AS n_syms, length(word) AS n_chars
      FROM bpe WHERE it = (SELECT MAX(it) FROM bpe)
    ),
    tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS word FROM documents)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_word_chars
    FROM tok JOIN enc USING (word)
    GROUP BY doc_id
    """,
)
def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION at corpus scale — the round-7
    completion of the BPE story (pair counts -> merge learning ->
    ENCODING): learn 8 merge rules from the corpus vocabulary
    (functions/text.py::learn_bpe_merges), encode the vocabulary once
    with functions/text.py::bpe_encode_words, then map every document
    through the encoded vocab and report per-doc tokenization stats
    (whitespace words, BPE symbols, characters — the compression the
    tokenizer achieves).

    Promoted from rows-only to a full value oracle in round 12: the
    shared recursive-CTE twin (_DUCK_BPE_CTE) re-learns the rules in
    DuckDB, and its final-round symbol state IS the encoded
    vocabulary (replaying rules 1..8 on chars(word) performs the
    identical fuse sequence the learner performed). tests/
    test_text_functions.py::test_bpe_encode_stats_match_reference_tokenizer
    additionally value-locks the per-document symbol counts AND the
    exact per-word symbol sequences against an independent
    pure-Python Sennrich-style encoder.

    100 TB shape: encoding cost is per DISTINCT word (the vocab frame,
    ~50k rows for a production tokenizer), not per corpus token; the
    corpus then takes one broadcast hash join token->bpe_syms and one
    map-side-combinable per-doc aggregate. No Python UDF anywhere —
    the encode is a chain of JVM higher-order folds."""
    from fhir_to_lakehouse_spark.functions.text import (
        bpe_encode_words,
        learn_bpe_merges,
    )

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(TX.tokens("text")).alias("word")
    )
    words = tok.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    rules = learn_bpe_merges(words, n_merges=8)
    encoded = bpe_encode_words(words.select("word"), rules).select(
        "word",
        F.size("bpe_syms").alias("n_syms"),
        F.length("word").alias("n_chars"),
    )
    return (
        tok.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
            F.sum("n_chars").alias("n_word_chars"),
        )
    )


@query(
    "text_trigram_perplexity",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    f AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM f),
    g AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS ctx, t[i + 2] AS nxt
          FROM idx),
    cn AS (SELECT ctx, nxt, COUNT(*) AS n FROM g GROUP BY ctx, nxt),
    cc AS (SELECT ctx, SUM(n) AS n_ctx FROM cn GROUP BY ctx),
    vocab AS (SELECT COUNT(DISTINCT x.token) AS v FROM (
        SELECT unnest({_DUCK_TOKS}) AS token FROM documents) x)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(AVG(-ln((cn.n + 0.5) / (cc.n_ctx + 0.5 * vocab.v))), 6)
               AS avg_neg_logprob
    FROM g
    JOIN cn USING (ctx, nxt)
    JOIN cc USING (ctx), vocab
    GROUP BY doc_id
    """,
)
def text_trigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-LM perplexity document scoring — the full CCNet-style
    quality filter (the unigram twin is text_unigram_logprob_score):
    each document's trigrams are scored under the corpus's own
    add-k-smoothed trigram model, p(nxt|ctx) = (n(ctx,nxt) + k) /
    (n(ctx) + k*V) with k=0.5 and V the corpus vocabulary size, and
    the document gets the mean negative log-probability (monotone in
    perplexity). High = improbable word sequences (shuffled text,
    boilerplate soup, OCR damage) even when every individual token is
    common — exactly what the unigram score cannot see.

    100 TB shape: the trigram count table is a map-side-combinable
    two-key aggregate over the 3x-amplified token stream; the context
    totals re-aggregate THAT (already n-gram-sized) table, and V is
    one scalar broadcast. Scoring is the same trigram stream joined
    to the count tables on (ctx, nxt) — a shuffle join keyed on the
    n-gram, no corpus-sized state on any single node, then one
    per-doc aggregate. The real CCNet swaps in a pruned KenLM; plan
    shape identical."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", TX.tokens("text").alias("t")
    ).filter(F.size("t") >= 3)
    # The trigram stream feeds the count aggregate AND the scoring
    # join's probe side — independent shuffle-map stages submitted
    # concurrently, so a lazy persist here is the r10 cache stampede.
    # But like corpus_dsir_selection's token stream, the relation is
    # corpus-sized and one explode away from the scan: materializing
    # it (persist or checkpoint) costs more than deriving it twice
    # (measured at the 10x synthetic: recompute ~3.9 s vs eager
    # checkpoint ~4.7 s steady-state, SCALING.md round-11 study 4),
    # and at 100 TB a trigram-stream materialization is pure write
    # amplification. Each consumer builds its own stream — two cheap
    # codegen scans, no shared subtree, no stampede.
    def _grams() -> DataFrame:
        return t.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), i -> struct("
                    " concat_ws(' ', element_at(t, i), element_at(t, i + 1))"
                    "   AS ctx,"
                    " element_at(t, i + 2) AS nxt))"
                )
            ).alias("g"),
        ).select("doc_id", "g.ctx", "g.nxt")

    grams = _grams()
    cn = _grams().groupBy("ctx", "nxt").agg(F.count(F.lit(1)).alias("n"))
    cc = cn.groupBy("ctx").agg(F.sum("n").alias("n_ctx"))
    vocab = (
        docs.select(F.explode(TX.tokens("text")).alias("token"))
        .agg(F.countDistinct("token").alias("v"))
    )
    scored = (
        grams.join(cn, ["ctx", "nxt"])
        .join(cc, "ctx")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(
            F.avg(
                -F.log(
                    (F.col("n") + F.lit(0.5))
                    / (F.col("n_ctx") + F.lit(0.5) * F.col("v"))
                )
            ),
            6,
        ).alias("avg_neg_logprob"),
    )


@query(
    "eval_langid_confusion",
    oracle=f"""
    WITH pred AS ({_LANG_ORACLE}),
    labeled AS (
      SELECT d.lang AS true_lang, p.predicted_lang
      FROM documents d JOIN pred p USING (doc_id)
    ),
    cm AS (
      SELECT true_lang, predicted_lang, COUNT(*) AS n
      FROM labeled GROUP BY true_lang, predicted_lang
    ),
    per_true AS (
      SELECT true_lang, SUM(n) AS n_true FROM cm GROUP BY true_lang
    )
    SELECT cm.true_lang, cm.predicted_lang,
           CAST(cm.n AS BIGINT)           AS n,
           ROUND(cm.n * 1.0 / pt.n_true, 6) AS frac_of_true
    FROM cm JOIN per_true pt USING (true_lang)
    """,
)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation for the language-ID heuristic: the
    confusion matrix of predicted vs LABELED language, with each
    cell's share of its true-language row — the validation a pipeline
    runs against a labeled sample before trusting a cheap classifier
    to route a 100 TB crawl (fastText's published lang-id evals are
    exactly this table). Reuses text_lang_id's scoring verbatim, so
    the matrix grades the operator actually deployed, not a
    re-implementation.

    Plan shape: the scored projection joins the labels it came from
    (same scan — Catalyst collapses it), then two tiny aggregates:
    |langs|^2 cells and |langs| row totals, both map-side combinable
    and broadcast-sized.

    100 TB shape: at scale the labeled side is a small golden sample
    joined broadcast against predictions; the aggregate output is
    |langs|^2 rows regardless of corpus size."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    pred = text_lang_id(spark, sf_dir).select("doc_id", "predicted_lang")
    labeled = docs.select(
        "doc_id", F.col("lang").alias("true_lang")
    ).join(pred, "doc_id")
    cm = labeled.groupBy("true_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_true = cm.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    return (
        cm.join(F.broadcast(per_true), "true_lang")
        .select(
            "true_lang",
            "predicted_lang",
            "n",
            F.round(F.col("n") / F.col("n_true"), 6).alias("frac_of_true"),
        )
    )
