"""Persist lifecycle contract for library query builders.

Several builders persist() a small derived relation that the plan they
return consumes more than once (minhash signatures, the bm25/tf-idf
(doc, term) aggregate, vocab counts, the decontamination benchmark
shingle set, the prefix join's distinct-set groups). The persist is
load-bearing — without it Spark re-executes the expensive subtree per
reference, and AQE exchange reuse does not fire across differently
keyed aggregates — but Spark's CacheManager does NOT release the entry
when the Python DataFrame goes out of scope, so a caller composing
many builders in one long-lived session accumulates orphaned cache
entries (bench.py measured 2-4x wall-time inflation before it started
clearing the cache between entries).

The contract:

- One-shot runs (the driver harness, bench.py, the oracle checker)
  simply ``spark.catalog.clearCache()`` between queries — blunt and
  correct when nothing else shares the session.
- Long-lived callers wrap each composition in :func:`persist_scope`;
  every cache a builder creates inside the scope is registered and
  unpersisted on exit, after the caller has consumed the results:

      with persist_scope():
          pairs = prefix_filter_pairs(shingled).collect()
      # all builder-created cache entries are released here

Builders opt in by calling :func:`scoped_persist` instead of
``df.persist()`` — outside any scope it degrades to a plain persist,
so the default driver path is unchanged.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar

from pyspark.sql import DataFrame

_ACTIVE: ContextVar[list | None] = ContextVar("persist_scope", default=None)
# localCheckpoint registrations are tracked SEPARATELY from persists:
# scope exit must call release_checkpoint only on frames that were
# actually checkpointed. Calling it on a merely-persisted frame whose
# plan root happens to be a LogicalRDD (e.g. a frame derived from a
# checkpointed round) would destroy blocks the frame cannot recompute —
# re-reading it then raises block-not-found instead of recomputing
# (ADVICE r5, cache.py item).
_ACTIVE_CKPT: ContextVar[list | None] = ContextVar(
    "persist_scope_ckpt", default=None
)


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() ``df`` and register it with the innermost active
    :func:`persist_scope`, so the scope's exit releases the cache
    entry deterministically. With no active scope this is a plain
    ``df.persist()`` (the documented default for one-shot runs that
    clear the whole cache between queries)."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    reg = _ACTIVE.get()
    if reg is not None:
        reg.append(df)
    return df


@contextmanager
def persist_scope(blocking: bool = False):
    """Release every :func:`scoped_persist` cache and
    :func:`scoped_local_checkpoint` block created inside the block on
    exit. Scopes nest: an inner scope owns (and releases) only its own
    caches. Yields the registry list so a caller can append DataFrames
    it persisted itself. Unpersisting a frame twice is a Spark no-op,
    so builders that also release internally are safe to register.

    Frames registered via :func:`scoped_persist` (or appended to the
    yielded list by the caller) get a plain ``unpersist`` — safe even
    when their plan root is a LogicalRDD, because the checkpoint blocks
    such a frame reads stay untouched. Only frames registered via
    :func:`scoped_local_checkpoint` additionally get their
    block-manager storage released."""
    reg: list[DataFrame] = []
    ckpts: list[DataFrame] = []
    token = _ACTIVE.set(reg)
    ctoken = _ACTIVE_CKPT.set(ckpts)
    try:
        yield reg
    finally:
        _ACTIVE.reset(token)
        _ACTIVE_CKPT.reset(ctoken)
        for df in reg:
            try:
                df.unpersist(blocking)
            except Exception:
                pass
        for df in ckpts:
            try:
                df.unpersist(blocking)
            except Exception:
                pass
            release_checkpoint(df, blocking)


# --- localCheckpoint lifecycle -------------------------------------------
#
# localCheckpoint has the SAME leak shape as persist, one layer lower:
# the checkpointed blocks live in the BlockManager keyed by an RDD that
# stays registered in sc.persistentRdds until explicitly unpersisted —
# spark.catalog.clearCache() does NOT touch them (it clears only the
# SQL CacheManager), and the ContextCleaner frees them only when the
# JVM-side RDD object is garbage collected, which py4j reference
# lifetimes make effectively unbounded. Measured: each
# graph_pagerank_trade run left +3 persistent RDDs alive across
# clearCache() — the round-5 explanation for full-session bench
# inflation surviving the round-4 cache clearing.


def checkpoint_rdd(df: DataFrame):
    """The JVM RDD backing a localCheckpoint-ed DataFrame, or None if
    the frame's plan is not a LogicalRDD (i.e. it was never
    checkpointed)."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() == "LogicalRDD":
        return plan.rdd()
    return None


def release_checkpoint(df: DataFrame, blocking: bool = False) -> None:
    """Free the block-manager storage behind a localCheckpoint-ed
    DataFrame. Safe on any frame (no-op when not checkpointed) and
    idempotent. Call on an INTERMEDIATE round's frame once the next
    round has materialized — never on a frame you still intend to
    read: its data is gone and the truncated plan cannot recompute
    it."""
    try:
        r = checkpoint_rdd(df)
        if r is not None:
            r.unpersist(blocking)
    except Exception:
        pass


def scoped_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + register the result with the innermost active
    :func:`persist_scope`, so the scope's exit frees the blocks. With
    no active scope this is a plain localCheckpoint (harnesses call
    :func:`release_all_persistent_rdds` between entries instead)."""
    out = df.localCheckpoint(eager=eager)
    reg = _ACTIVE_CKPT.get()
    if reg is not None:
        reg.append(out)
    return out


def release_all_persistent_rdds(spark, blocking: bool = False) -> int:
    """Blunt session-level reset: unpersist EVERY registered RDD
    (localCheckpoint blocks included). For harness use between
    independent entries — bench.py pairs it with clearCache() — when
    nothing from the previous entry is retained. Returns the number of
    RDDs released."""
    jsc = spark.sparkContext._jsc.sc()
    ids = jsc.getPersistentRDDs().keys().toList()
    n = 0
    for i in range(ids.size()):
        opt = jsc.getPersistentRDDs().get(ids.apply(i))
        if opt.isDefined():
            opt.get().unpersist(blocking)
            n += 1
    return n
