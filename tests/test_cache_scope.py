"""Persist lifecycle contract (functions/cache.py): builders persist
load-bearing intermediates; persist_scope() releases them on exit so a
long-lived caller composing queries does not accumulate orphaned cache
entries (the 2-4x bench inflation bench.py measured before it started
clearing the cache between entries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.cache import persist_scope, scoped_persist
from fhir_to_lakehouse_spark.plans import QUERIES


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_scope_releases_builder_caches(spark, sf_dir):
    spark.catalog.clearCache()
    assert _cache_empty(spark)
    with persist_scope():
        # both builders persist intermediates (tf aggregate / distinct-set
        # groups); consume the results inside the scope
        QUERIES["search_bm25_topk"](spark, sf_dir).collect()
        QUERIES["dedup_prefix_filter_join"](spark, sf_dir).collect()
        assert not _cache_empty(spark), "builders should cache inside scope"
    assert _cache_empty(spark), "persist_scope exit must release every cache"


def test_no_scope_means_plain_persist(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["search_bm25_topk"](spark, sf_dir)
    df.collect()
    # without a scope the documented default holds: the cache entry
    # survives (one-shot harnesses clearCache between queries)
    assert not _cache_empty(spark)
    spark.catalog.clearCache()


def test_scopes_nest_and_release_own_caches_only(spark, sf_dir):
    spark.catalog.clearCache()
    outer_df = None
    with persist_scope():
        outer_df = scoped_persist(
            spark.range(10).withColumn("x", F.col("id") * 2)
        )
        outer_df.count()
        with persist_scope():
            inner = scoped_persist(spark.range(5))
            inner.count()
        # inner scope closed: inner cache gone, outer still cached
        assert outer_df.storageLevel.useMemory
        assert not inner.storageLevel.useMemory
    assert not outer_df.storageLevel.useMemory
    assert _cache_empty(spark)


def test_results_identical_with_and_without_scope(spark, sf_dir):
    with persist_scope():
        scoped = sorted(
            map(tuple, QUERIES["search_bm25_topk"](spark, sf_dir).collect())
        )
    spark.catalog.clearCache()
    plain = sorted(
        map(tuple, QUERIES["search_bm25_topk"](spark, sf_dir).collect())
    )
    spark.catalog.clearCache()
    assert scoped == plain
