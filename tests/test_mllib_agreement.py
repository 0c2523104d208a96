"""Value-level verification for the two MLlib rows-only registry
entries (VERDICT r3 item 7): their hash buckets aren't reproducible in
DuckDB SQL, so the driver's oracle records `no_oracle` forever. These
tests supply the missing value assertions — recomputing the math the
queries compose (Jaccard distance, the MLlib IDF formula, max-weight
extraction) from the hashed feature sets, independently of the MLlib
estimators under test.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _bucket_sets(spark, sf_dir):
    """doc_id -> set of HashingTF bucket indices (binary=True), via the
    same helper the queries use. HashingTF itself is a library
    primitive we trust; what we verify is everything composed on top."""
    from fhir_to_lakehouse_spark.plans.mllib_ops import _token_vectors

    rows = _token_vectors(spark, sf_dir).select("doc_id", "features").collect()
    return {r["doc_id"]: set(r["features"].indices.tolist()) for r in rows}


@pytest.fixture(scope="module")
def buckets(spark, sf_dir):
    return _bucket_sets(spark, sf_dir)


def test_vectorizer_drops_empty_tokens(spark):
    """ADVICE r10: consecutive whitespace must not become a "" token
    (Tokenizer's split on single \\s did; HashingTF then hashed it
    into a real feature the DuckDB oracles' t <> '' filter excludes).
    Pinned structurally: doubled/mixed whitespace tokenizes to exactly
    the non-empty words, so the hashed vector of "a  b" equals that of
    "a b"."""
    from fhir_to_lakehouse_spark.plans.mllib_ops import _vectorize_docs

    docs = spark.createDataFrame(
        [(0, "alpha  beta"), (1, "alpha beta"), (2, " alpha\t\tbeta \n")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in _vectorize_docs(docs).collect()}
    assert rows[0]["tokens"] == ["alpha", "beta"]
    assert rows[2]["tokens"] == ["alpha", "beta"]
    f0, f1, f2 = (set(rows[i]["features"].indices.tolist()) for i in range(3))
    assert f0 == f1 == f2 and len(f0) == 2


def _jaccard_dist(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return 1.0 - inter / (len(a) + len(b) - inter)


def test_mllib_minhash_pairs_have_exact_distances_and_recall(
    spark, sf_dir, buckets
):
    """Every pair dedup_mllib_minhash_lsh emits must carry the EXACT
    Jaccard distance over the hashed token sets (approxSimilarityJoin
    post-filters candidates by true distance), and the LSH candidate
    stage must recover the large majority of true pairs under the
    threshold. Deterministic: seed=42, fixed sample."""
    from fhir_to_lakehouse_spark.plans.mllib_ops import dedup_mllib_minhash_lsh

    got = {
        (r["id_a"], r["id_b"]): r["jaccard_dist"]
        for r in dedup_mllib_minhash_lsh(spark, sf_dir).collect()
    }
    assert got, "sample produced no similar pairs — fixture drifted"

    # the same deterministic 4% sample the query takes, minus empties
    sample = {
        d: s for d, s in buckets.items() if d % 25 == 0 and s
    }
    # 1) soundness: every emitted pair is a true pair, with the true distance
    for (a, b), dist in got.items():
        assert a < b
        assert a in sample and b in sample
        true = _jaccard_dist(sample[a], sample[b])
        assert dist == pytest.approx(true, abs=1e-6)
        assert true <= 0.3 + 1e-9

    # 2) recall: of all true pairs at distance <= 0.3, the 8-table LSH
    # must find >= 90% (measured 100% at seed 42 at every test SF —
    # which is what lets the registry entry carry a full brute-force
    # oracle; the floor leaves room for legitimate LSH misses, not for
    # logic regressions)
    ids = sorted(sample)
    true_pairs = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _jaccard_dist(sample[a], sample[b]) <= 0.3
    }
    assert true_pairs, "no true pairs under threshold — fixture drifted"
    recall = len(true_pairs & set(got)) / len(true_pairs)
    assert recall >= 0.9


def test_mllib_tfidf_max_weight_matches_idf_formula(spark, sf_dir, buckets):
    """text_mllib_tfidf's max_tfidf_weight recomputed from first
    principles: binary TF means weight(bucket) = IDF(bucket) =
    ln((m+1)/(df+1)) (the documented MLlib smoothing), so the max
    weight per doc is the max IDF over its buckets. Verifies the IDF
    fit, the transform, and the vector_to_array/array_max extraction."""
    from fhir_to_lakehouse_spark.plans.mllib_ops import text_mllib_tfidf

    got = {
        r["doc_id"]: r["max_tfidf_weight"]
        for r in text_mllib_tfidf(spark, sf_dir).collect()
    }
    assert len(got) == len(buckets)

    m = len(buckets)
    df_counts: dict[int, int] = {}
    for s in buckets.values():
        for b in s:
            df_counts[b] = df_counts.get(b, 0) + 1
    for doc_id, s in buckets.items():
        want = max(
            (math.log((m + 1) / (df_counts[b] + 1)) for b in s), default=None
        )
        if want is None:
            # empty token set -> empty vector -> array_max yields null
            assert got[doc_id] is None
        else:
            assert got[doc_id] == pytest.approx(want, abs=1e-6)


def test_kmeans_partitions_corpus_and_reduces_variance(spark, sf_dir):
    """Value assertions for the rows-only cluster_kmeans_mllib entry:
    clusters partition the corpus exactly, ids live in [0, k), and the
    mean within-cluster squared distance is strictly below the global
    variance (clustering beats the trivial one-cluster baseline)."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.plans.mllib_ops import _embedding_vectors
    from fhir_to_lakehouse_spark.sources.tables import load_table

    out = QUERIES["cluster_kmeans_mllib"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert len(out) == 1
    row = out[0]
    assert row.n_points == n_total
    assert row.k_used_in_range == 1
    assert row.all_assigned == 1
    assert row.inertia_le_global == 1

    vecs = _embedding_vectors(spark, sf_dir)
    model = KMeans(k=8, seed=42, maxIter=20, featuresCol="features").fit(vecs)
    pred = model.transform(vecs)
    X = np.array(
        [r.features.toArray() for r in pred.select("features").collect()]
    )
    labels = np.array([r.prediction for r in pred.select("prediction").collect()])
    # pinned-seed regression facts, deliberately SHARPER than the
    # driver oracle's data-derivable bounds (ADVICE r10): at the test
    # SFs the seeded run fills all 8 clusters and beats the
    # single-cluster baseline STRICTLY — adjudicable here, where a
    # seed/scale change is visible, not in the driver gate
    assert len(set(labels.tolist())) == 8
    centers = np.array(model.clusterCenters())
    within = float(np.mean(np.sum((X - centers[labels]) ** 2, axis=1)))
    global_var = float(np.mean(np.sum((X - X.mean(axis=0)) ** 2, axis=1)))
    assert within < global_var


def test_pca_variances_ordered_and_loadings_orthonormal(spark, sf_dir):
    """Value assertions for the rows-only embedding_pca_mllib entry."""
    import numpy as np
    from pyspark.ml.feature import PCA

    from fhir_to_lakehouse_spark.plans import QUERIES
    from fhir_to_lakehouse_spark.plans.mllib_ops import _embedding_vectors

    rows = sorted(
        QUERIES["embedding_pca_mllib"](spark, sf_dir).collect(),
        key=lambda r: r.component,
    )
    assert [r.component for r in rows] == list(range(8))
    assert all(r.unit_norm == 1 for r in rows)
    assert all(r.var_nonincreasing == 1 for r in rows)

    vecs = _embedding_vectors(spark, sf_dir)
    assert all(r.n == vecs.count() for r in rows)
    model = PCA(k=8, inputCol="features", outputCol="pc").fit(vecs)
    W = model.pc.toArray()  # d x k loading matrix
    gram = W.T @ W
    assert np.allclose(gram, np.eye(8), atol=1e-8)
    assert sum(model.explainedVariance) <= 1.0 + 1e-9
    # the raw projected variances (no longer in the registry output):
    # recompute and pin ordering + positivity independently
    X = np.array(
        [r.features.toArray() for r in vecs.select("features").collect()]
    )
    proj = X @ W
    variances = proj.var(axis=0, ddof=1)
    assert all(a >= b - 1e-12 for a, b in zip(variances, variances[1:]))
    assert all(v > 0 for v in variances)
