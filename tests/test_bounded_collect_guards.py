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
