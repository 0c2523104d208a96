"""Curation-operator tests: hand-computed repetition fractions,
decontamination flagging on planted overlap, and the distributed
prefix-sum's equivalence to a naive global running sum."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from fhir_to_lakehouse_spark.plans.curation import (
    corpus_pack_token_shards,
    decontaminate_ngram_overlap,
    text_repetition_quality,
)
from fhir_to_lakehouse_spark.sources.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_repetition_fractions_hand_computed(spark, tmp_path):
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] -> 5 total, 2
    # distinct, dup frac 3/5, top ("a b" x3) 3/5.
    d = _docs(
        spark,
        [
            (1, "a b a b a b", "en", "t", 11),
            (2, "w x y z", "en", "t", 7),  # 3 bigrams, all unique
            (3, "solo", "en", "t", 4),  # <2 tokens: no row
        ],
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in text_repetition_quality(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 5
    assert out[1]["n_distinct_bigrams"] == 2
    assert out[1]["dup_bigram_frac"] == 0.6
    assert out[1]["top_bigram_frac"] == 0.6
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == round(1 / 3, 6)


def test_decontamination_flags_planted_copy(spark, tmp_path):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs(
        spark,
        [
            (0, bench_text, "en", "t", len(bench_text)),  # benchmark (id%50==0)
            (1, bench_text, "en", "t", len(bench_text)),  # verbatim leak
            (2, "one two three four five six seven eight", "en", "t", 39),
        ],
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in decontaminate_ngram_overlap(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2}  # benchmark doc itself excluded
    assert out[1]["overlap_frac"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]


def test_pack_shards_matches_global_window(spark, sf_dir):
    out = corpus_pack_token_shards(spark, sf_dir)
    naive = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"))
        .withColumn(
            "cum",
            F.sum("n").over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    got = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    want = {r["doc_id"]: r["cum"] for r in naive.collect()}
    assert got == want
    # shards are contiguous in doc order and each starts under the budget
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    shards = [r["shard_id"] for r in rows]
    assert shards == sorted(shards)
    for r in rows:
        assert (r["cum_tokens"] - r["n_tokens"]) // 10000 == r["shard_id"]


def test_incremental_dedup_drops_historical_and_batch_dups(spark, tmp_path):
    from fhir_to_lakehouse_spark.plans.curation import dedup_incremental_new_docs

    d = _docs(
        spark,
        [
            (0, "historical doc one", "en", "t", 18),   # historical (even)
            (2, "historical doc two", "en", "t", 18),
            (1, "Historical  DOC one ", "en", "t", 20),  # dup of 0 after normalize
            (3, "a brand new document", "en", "t", 20),  # genuinely new
            (5, "repeated incoming text", "en", "t", 22),  # first in batch
            (7, "repeated incoming text", "en", "t", 22),  # in-batch dup of 5
        ],
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    kept = {r["doc_id"] for r in dedup_incremental_new_docs(spark, str(tmp_path)).collect()}
    assert kept == {3, 5}


def test_bottomk_sample_is_mergeable(spark, sf_dir):
    # bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)): the
    # property that lets partitions sample independently at 100 TB.
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    w = Window.partitionBy("lang").orderBy("h", "doc_id")

    def bottomk(df, k=8):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    direct = {tuple(r) for r in bottomk(docs).collect()}
    merged = {tuple(r) for r in bottomk(bottomk(half_a).union(bottomk(half_b))).collect()}
    assert direct == merged and len(direct) > 0


def test_domain_mixing_rates_track_weights(spark, sf_dir):
    from fhir_to_lakehouse_spark.plans.curation import sample_domain_mixing

    kept = sample_domain_mixing(spark, sf_dir)
    # deterministic: two runs produce the identical set
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in sample_domain_mixing(spark, sf_dir).collect()}
    assert a == b
    # every kept row satisfies its own acceptance predicate
    assert kept.filter(F.col("mix_u") >= F.col("weight")).count() == 0
    # weight 1.0 sources (src9, src19, ...) keep every document
    total = load_table(spark, sf_dir, "documents").filter(
        F.substring("source", 4, 10).cast("int") % 10 == 9
    )
    kept9 = kept.filter(F.substring("source", 4, 10).cast("int") % 10 == 9)
    assert total.count() == kept9.count()


def test_decontamination_plan_broadcasts_benchmark(spark, sf_dir):
    plan = decontaminate_ngram_overlap(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_repeated_chunks_hand_computed(spark, tmp_path):
    # 5-token chunks; "a b c d e" appears in docs 1 and 2 -> dropped
    # from both; every other chunk is unique and survives.
    d = _docs(
        spark,
        [
            (1, "a b c d e f g h i j", "en", "t", 19),
            (2, "a b c d e x y z w v", "en", "t", 19),
            (3, "p q r", "en", "t", 5),  # single partial chunk, unique
        ],
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from fhir_to_lakehouse_spark.plans.curation import dedup_repeated_chunks

    out = {
        r["doc_id"]: r for r in dedup_repeated_chunks(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 1
    assert out[1]["kept_text"] == "f g h i j"
    assert out[2]["kept_text"] == "x y z w v"
    assert out[3]["n_dup_chunks"] == 0 and out[3]["kept_text"] == "p q r"


def test_quantize_int8_error_bound(spark, sf_dir):
    # Symmetric round-to-nearest: per-element error <= scale/2, so
    # sq_err <= n_dims * (scale/2)^2; quantized magnitudes cap at 127.
    from fhir_to_lakehouse_spark.plans.llm_extra import embedding_quantize_int8

    rows = embedding_quantize_int8(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["scale"] > 0
        assert r["q_l1"] <= 127 * r["n_dims"]
        bound = r["n_dims"] * (r["scale"] / 2) ** 2
        assert r["sq_err"] <= bound * 1.001 + 1e-9


def test_epoch_shuffle_is_exact_permutation(spark, sf_dir):
    """(shard, pos_in_shard) must linearize to exactly 0..N-1 — a
    dropped or duplicated position corrupts the training epoch. Also
    pins seed-determinism across independent plan executions."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.plans import QUERIES

    out = QUERIES["corpus_epoch_shuffle"](spark, sf_dir)
    n = out.count()
    positions = out.select(
        (F.col("shard") * 64 + F.col("pos_in_shard")).alias("pos")
    )
    stats = positions.agg(
        F.countDistinct("pos").alias("distinct"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
    ).collect()[0]
    assert (stats["distinct"], stats["lo"], stats["hi"]) == (n, 0, n - 1)
    # deterministic: a second independent execution is identical
    again = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"])
        for r in QUERIES["corpus_epoch_shuffle"](spark, sf_dir).collect()
    }
    first = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in out.collect()}
    assert first == again


def test_temperature_mixing_upsamples_rare_languages(spark, sf_dir):
    """T=0.7 must give rare languages a strictly higher per-doc keep
    rate than dominant ones, rates live in (0, 1], and the most
    up-weighted language keeps everything (rate exactly 1)."""
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.sources.tables import load_table

    out = QUERIES["sample_temperature_mixing"](spark, sf_dir)
    rates = {
        r.lang: r.accept_rate
        for r in out.select("lang", "accept_rate").distinct().collect()
    }
    counts = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(0 < v <= 1 for v in rates.values())
    assert max(rates.values()) == 1.0
    # monotone: bigger language -> smaller (or equal) keep rate
    ordered = sorted(rates, key=lambda k: counts[k])
    for small, big in zip(ordered, ordered[1:]):
        if counts[small] < counts[big]:
            assert rates[small] >= rates[big]


def test_bloom_prefilter_agrees_with_exact_decontamination(spark, sf_dir):
    """Cross-query consistency: the two-phase hash-prefilter path must
    flag EXACTLY the docs the single-pass exact overlap query flags as
    contaminated, with identical shingle/overlap counts — the
    prefilter is an execution strategy, not a semantics change."""
    from fhir_to_lakehouse_spark.plans import QUERIES

    exact = {
        (r["doc_id"], r["n_shingles"], r["n_overlap"])
        for r in QUERIES["decontaminate_ngram_overlap"](spark, sf_dir)
        .filter("contaminated")
        .collect()
    }
    bloom = {
        (r["doc_id"], r["n_shingles"], r["n_overlap"])
        for r in QUERIES["decontaminate_bloom_prefilter"](
            spark, sf_dir
        ).collect()
    }
    assert bloom == exact
    assert bloom, "fixture should contain at least one contaminated doc"


def test_survivor_pick_policy(spark, sf_dir):
    """Survivorship policy: one survivor per fingerprint group, and the
    survivor is the longest member (smallest doc_id on ties), checked
    against a pandas recomputation from the raw table."""
    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.sources.tables import load_table

    got = {
        r["fp"]: (r["survivor_doc_id"], r["survivor_n_chars"], r["group_size"])
        for r in QUERIES["dedup_survivor_pick"](spark, sf_dir).collect()
    }
    import hashlib
    import re

    groups: dict[str, list[tuple[int, int]]] = {}
    for r in load_table(spark, sf_dir, "documents").collect():
        norm = re.sub(r"\s+", " ", r["text"].strip().lower())
        fp = hashlib.md5(norm.encode()).hexdigest()
        groups.setdefault(fp, []).append((r["doc_id"], r["n_chars"]))
    want = {
        fp: (
            min(members, key=lambda m: (-m[1], m[0]))[0],
            max(m[1] for m in members),
            len(members),
        )
        for fp, members in groups.items()
    }
    assert got == want


def test_sliding_chunks_truth_table(spark, tmp_path):
    """corpus_chunk_sliding edge cases, hand-computed at size 64 /
    stride 48: an empty document emits no chunks; a doc shorter than
    one window emits exactly one chunk covering it; a doc longer than
    one window but whose second start position would only re-emit a
    suffix of chunk 0 keeps that second chunk ONLY if chunk 0 did not
    already reach the end (the deterministic trailing-chunk rule)."""
    from fhir_to_lakehouse_spark.plans.curation import corpus_chunk_sliding

    short = " ".join(f"w{i}" for i in range(10))        # 10 toks -> 1 chunk
    exact = " ".join(f"x{i}" for i in range(64))        # 64 toks -> 1 chunk
    # 70 tokens: start 48 would give toks[49:70] (22 toks) — but chunk 0
    # already covers 1..64 < 70, so the trailing chunk IS kept
    long = " ".join(f"y{i}" for i in range(70))
    # 112 tokens: starts 0, 48, 96; chunk at 48 covers 49..112 = end,
    # so start 96 (a strict suffix of it) must be dropped
    longer = " ".join(f"z{i}" for i in range(112))
    df = spark.createDataFrame(
        [
            (1, "", "en", "t", 0),
            (2, short, "en", "t", len(short)),
            (3, exact, "en", "t", len(exact)),
            (4, long, "en", "t", len(long)),
            (5, longer, "en", "t", len(longer)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = corpus_chunk_sliding(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc
    assert [ (r.chunk_idx, r.n_chunk_tokens) for r in by_doc[2] ] == [(0, 10)]
    assert [ (r.chunk_idx, r.n_chunk_tokens) for r in by_doc[3] ] == [(0, 64)]
    assert sorted((r.chunk_idx, r.start_token, r.n_chunk_tokens) for r in by_doc[4]) == [
        (0, 0, 64),
        (1, 48, 22),
    ]
    assert sorted((r.chunk_idx, r.start_token, r.n_chunk_tokens) for r in by_doc[5]) == [
        (0, 0, 64),
        (1, 48, 64),
    ]
    # overlap property: consecutive chunks share exactly size-stride
    # tokens when both are full windows
    c0 = by_doc[5][0].chunk_text.split(" ") if by_doc[5][0].chunk_idx == 0 else by_doc[5][1].chunk_text.split(" ")
    c1 = by_doc[5][1].chunk_text.split(" ") if by_doc[5][1].chunk_idx == 1 else by_doc[5][0].chunk_text.split(" ")
    assert c0[48:] == c1[:16]
