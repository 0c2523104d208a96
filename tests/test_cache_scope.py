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


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_iterative_functions_release_checkpoint_blocks(spark, sf_dir):
    """localCheckpoint blocks are invisible to clearCache (BlockManager,
    not the SQL cache) — before round 5 each pagerank call leaked +3
    persistent RDDs for the session lifetime. In-function hygiene must
    bound live checkpoint RDDs to the returned frame(s) only."""
    from fhir_to_lakehouse_spark.functions.cache import (
        release_all_persistent_rdds,
        release_checkpoint,
    )
    from fhir_to_lakehouse_spark.plans import QUERIES

    release_all_persistent_rdds(spark)
    spark.catalog.clearCache()
    base = _n_persistent_rdds(spark)
    counts = []
    for _ in range(3):
        QUERIES["graph_pagerank_trade"](spark, sf_dir).collect()
        spark.catalog.clearCache()
        counts.append(_n_persistent_rdds(spark))
    # each run may keep its OWN returned rank vector alive transiently
    # (python GC timing) but must not grow linearly with runs
    assert counts[2] - counts[0] <= 2, (base, counts)
    released = release_all_persistent_rdds(spark)
    assert _n_persistent_rdds(spark) == 0, released


def test_bpe_trainer_leaves_no_persistent_rdds(spark):
    from pyspark.sql import functions as F

    from fhir_to_lakehouse_spark.functions.cache import (
        release_all_persistent_rdds,
    )
    from fhir_to_lakehouse_spark.functions.text import learn_bpe_merges

    release_all_persistent_rdds(spark)
    words = spark.createDataFrame(
        [("lower", 5), ("newest", 3)], "word string, freq long"
    )
    learn_bpe_merges(words, n_merges=4)
    assert _n_persistent_rdds(spark) == 0


def test_scoped_local_checkpoint_released_on_scope_exit(spark):
    from fhir_to_lakehouse_spark.functions.cache import (
        persist_scope,
        scoped_local_checkpoint,
    )

    with persist_scope():
        df = scoped_local_checkpoint(spark.range(10))
        df.count()
        assert _n_persistent_rdds(spark) >= 1
    assert _n_persistent_rdds(spark) == 0


def test_scoped_persist_of_checkpointed_frame_survives_scope_exit(spark):
    """ADVICE r5 (cache.py): scope exit must NOT release_checkpoint a
    frame registered via scoped_persist, even when its plan root is a
    LogicalRDD — a plain unpersist leaves the checkpoint blocks intact
    so re-reading the frame works instead of raising
    block-not-found."""
    from fhir_to_lakehouse_spark.functions.cache import (
        release_checkpoint,
    )

    with persist_scope():
        ck = scoped_persist(spark.range(20).localCheckpoint(eager=True))
        assert ck.count() == 20
    # cache entry is gone, but the frame must remain readable: its
    # truncated plan recomputes from the (still live) checkpoint RDD
    assert not ck.storageLevel.useMemory
    assert ck.count() == 20
    release_checkpoint(ck)  # cleanup
