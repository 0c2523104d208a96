"""The bounded-collect contracts are executable (VERDICT r4 item 2):
documented bounds on driver-side collects now raise instead of
trusting the caller."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.similarity import (
    CentroidCollectError,
    ivf_assign,
    matmul_topk_pandas,
)


def _vecs(spark, n, dim=4):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.col("id") % 7 + i).cast("float"),
        ).alias("embedding"),
    )


def test_ivf_assign_raises_above_max_centroids(spark):
    corpus = _vecs(spark, 10)
    centroids = _vecs(spark, 6).select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    with pytest.raises(CentroidCollectError, match="max_centroids"):
        ivf_assign(corpus, centroids, max_centroids=5)


def test_ivf_assign_accepts_exactly_max_centroids(spark):
    corpus = _vecs(spark, 10)
    centroids = _vecs(spark, 5).select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    out = ivf_assign(corpus, centroids, max_centroids=5)
    assert out.count() == 10
    assert set(out.columns) == {"vec_id", "cell", "embedding"}


def test_matmul_topk_raises_above_max_query_rows(spark):
    corpus = _vecs(spark, 10)
    qrows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(4)]
    with pytest.raises(ValueError, match="max_query_rows"):
        matmul_topk_pandas(corpus, qrows, max_query_rows=3)
    # at the bound it still works
    assert matmul_topk_pandas(corpus, qrows, max_query_rows=4).count() > 0


def test_ivf_probes_matches_window_formulation(spark):
    """ivf_probes (in-row sorted-array top-n, r12) returns exactly the
    probes the former cross-join + row_number() formulation chose —
    same cells, same tie-breaks (cosine DESC, cell ASC)."""
    from pyspark.sql import Window

    from fhir_to_lakehouse_spark.functions.similarity import (
        as_double,
        cosine,
        ivf_probes,
        l2_norm,
    )

    queries = _vecs(spark, 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = _vecs(spark, 5).select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    got = {
        (r["query_id"], r["cell"])
        for r in ivf_probes(queries, centroids, n_probe=2).collect()
    }
    qd = queries.select(
        "query_id", as_double(F.col("embedding")).alias("qv")
    )
    cen = centroids.select("cell", as_double(F.col("embedding")).alias("cv"))
    want = {
        (r["query_id"], r["cell"])
        for r in qd.join(F.broadcast(cen))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("rn") <= 2)
        .collect()
    }
    assert got == want
    # q_nrm rides along for the downstream scoring expression
    row = ivf_probes(queries, centroids, n_probe=2).first()
    qn = qd.withColumn("n", l2_norm(F.col("qv"))).filter(
        F.col("query_id") == row["query_id"]
    ).first()["n"]
    assert row["q_nrm"] == qn


def test_ivf_probes_raises_above_max_centroids(spark):
    queries = _vecs(spark, 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = _vecs(spark, 6).select(
        F.col("vec_id").alias("cell"), "embedding"
    )
    from fhir_to_lakehouse_spark.functions.similarity import ivf_probes

    with pytest.raises(CentroidCollectError, match="max_centroids"):
        ivf_probes(queries, centroids, max_centroids=5)


def test_ivf_with_empty_centroid_set_returns_empty_frames(spark):
    """Zero centroids must analyze cleanly (ADVICE r12): the literal
    array formulations have no struct fields to reference, so both
    functions early-return an empty frame with the schema the former
    cross-join formulations produced."""
    from fhir_to_lakehouse_spark.functions.similarity import ivf_probes

    queries = _vecs(spark, 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probes = ivf_probes(queries, [], n_probe=2)
    assert probes.count() == 0
    assert probes.columns == ["query_id", "qv", "q_nrm", "cell"]
    assert dict(probes.dtypes)["cell"] == "bigint"

    assigned = ivf_assign(_vecs(spark, 4), [])
    assert assigned.count() == 0
    assert assigned.columns == ["vec_id", "cell", "embedding"]
    assert dict(assigned.dtypes)["cell"] == "bigint"
