"""Extension-operator tests: dedup invariants, similarity equivalence,
multimodal determinism — the properties the DuckDB oracle can't check
(xxhash64 paths, approximate ops, stub decoders)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions import dedup as DD
from fhir_to_lakehouse_spark.functions import multimodal as MM
from fhir_to_lakehouse_spark.functions import similarity as SIM
from fhir_to_lakehouse_spark.functions import text as TX
from fhir_to_lakehouse_spark.sources.tables import load_table


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_identical_text_identical_minhash_and_simhash(spark):
    d = docs_df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "the quick brown fox jumps over the lazy dog", "en"),
            (3, "a completely different sentence with other words entirely", "en"),
        ],
    )
    out = DD.with_simhash(
        d.select(
            "doc_id",
            "text",
            DD.minhash_signature(TX.shingles("text", 3), 8).alias("mh"),
            DD.sig_xxhash(TX.shingles("text", 3), 8).alias("xh"),
        ),
        TX.tokens("text"),
        "sh",
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["mh"] == by_id[2]["mh"]
    assert by_id[1]["xh"] == by_id[2]["xh"]
    assert by_id[1]["sh"] == by_id[2]["sh"]
    assert by_id[1]["mh"] != by_id[3]["mh"]


def test_simhash_hamming_small_for_near_identical(spark):
    d = docs_df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda", "en"),
        ],
    )
    sh = DD.with_simhash(d, TX.tokens("text"), "s").collect()
    a, b = (r["s"] for r in sorted(sh, key=lambda r: r["doc_id"]))
    dist = bin((a ^ b) & (2**64 - 1)).count("1")
    assert dist <= 16  # 1 of 10 tokens changed -> few bit flips


def test_jaccard_exact_values(spark):
    d = spark.createDataFrame(
        [(1, ["a", "b", "c"], ["a", "b", "d"])], "id long, x array<string>, y array<string>"
    )
    out = d.select(DD.jaccard(F.col("x"), F.col("y")).alias("j")).collect()[0]["j"]
    assert abs(out - 0.5) < 1e-12  # |{a,b}| / |{a,b,c,d}|


def test_matmul_topk_matches_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = SIM.brute_force_topk(emb, queries, k=5)
    qrows = [(int(r["query_id"]), list(r["embedding"])) for r in queries.collect()]
    fast = SIM.matmul_topk_pandas(emb, qrows, k=5)
    b = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"]) for r in brute.collect()}
    f = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"]) for r in fast.collect()}
    assert set(b) == set(f)
    for k in b:
        assert b[k][0] == f[k][0]
        assert abs(b[k][1] - f[k][1]) < 1e-9


def test_hyperplane_lsh_recall_and_determinism(spark, sf_dir):
    from fhir_to_lakehouse_spark.plans.similarity import (
        similarity_brute_topk,
        similarity_hyperplane_lsh_topk,
    )

    brute = {
        (r["query_id"], r["vec_id"])
        for r in similarity_brute_topk(spark, sf_dir).collect()
    }
    lsh1 = {
        (r["query_id"], r["vec_id"])
        for r in similarity_hyperplane_lsh_topk(spark, sf_dir).collect()
    }
    lsh2 = {
        (r["query_id"], r["vec_id"])
        for r in similarity_hyperplane_lsh_topk(spark, sf_dir).collect()
    }
    assert lsh1 == lsh2  # deterministic planes -> stable result
    recall = len(brute & lsh1) / len(brute)
    assert recall >= 0.2, f"hyperplane LSH recall too low: {recall}"


def test_media_resize_and_frames_deterministic(spark, sf_dir):
    from fhir_to_lakehouse_spark.functions import multimodal as MM2
    from fhir_to_lakehouse_spark.sources.tables import load_table as lt

    media = MM2.documents_as_media(lt(spark, sf_dir, "documents").limit(10))
    r1 = {r["media_id"]: r["pixels"] for r in MM2.resize_images(media).collect()}
    r2 = {r["media_id"]: r["pixels"] for r in MM2.resize_images(media).collect()}
    assert r1 == r2
    assert all(len(v) == 16 for v in r1.values())
    frames = MM2.sample_frames(media, frame_bytes=32, every_k=2).collect()
    assert all(len(f["frame"]) == 32 for f in frames)
    assert all(f["frame_idx"] % 2 == 0 for f in frames)


def test_ivf_recall_reasonable(spark, sf_dir):
    """IVF with 2-of-8 probes should recover a decent share of the true
    top-5 (synthetic clustered embeddings)."""
    from fhir_to_lakehouse_spark.plans.similarity import (
        similarity_brute_topk,
        similarity_ivf_topk,
    )

    brute = {
        (r["query_id"], r["vec_id"])
        for r in similarity_brute_topk(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity_ivf_topk(spark, sf_dir).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.4, f"IVF recall too low: {recall}"


def test_media_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = MM.documents_as_media(docs)
    f1 = {r["media_id"]: r["feature"] for r in MM.extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in MM.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())


def test_exact_dedup_finds_planted_duplicates(spark):
    d = docs_df(
        spark,
        [
            (1, "same   Text here", "en"),
            (2, "same text HERE", "en"),  # differs only in case/whitespace
            (3, "unique content", "en"),
        ],
    )
    groups = DD.exact_dedup_groups(d)
    dup = groups.filter(F.col("n_docs") > 1).collect()
    assert len(dup) == 1
    assert dup[0]["canonical_id"] == 1 and dup[0]["n_docs"] == 2


def test_hll_union_estimate_within_bounds(spark, sf_dir):
    """Merged per-nation HLL sketches must estimate the global distinct
    customer count within 5% of exact (rows-only query contract)."""
    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.sources.tables import load_table

    row = QUERIES["approx_distinct_hll_union"](spark, sf_dir).first()
    exact = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .distinct()
        .count()
    )
    assert row["exact_customers"] == exact
    assert row["union_within_5pct"] == 1
    # independent re-derivation of the merged estimate (the registry
    # output now carries the verdict; the raw estimate is re-built here
    # so the bound is still asserted on values)
    cust = load_table(spark, sf_dir, "customer")
    est = (
        cust.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    assert abs(est - exact) / exact < 0.05
