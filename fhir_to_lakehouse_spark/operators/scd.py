"""Slowly-changing-dimension Type 2: history-keeping upserts.

The reference's MERGE (J1, /root/reference/src/bundle_processor.py:256-262)
is SCD Type 1 — update-in-place, history lost. A training-data /
analytics lakehouse usually also needs Type 2: every change closes the
previous version (``valid_to``) and opens a new one (``valid_from``,
``is_current``), so point-in-time queries (``AS OF``) stay answerable.

``apply_scd2`` is a pure DataFrame→DataFrame transform (stream/batch
agnostic like the rest of the engine core): it merges the table's
*current* rows with a batch of keyed, timestamped records, drops
no-change rows (same tracked attributes as the previous version), and
recomputes validity intervals with one window pass.

Scale posture: the window shuffles on ``key`` only over current rows ∪
batch — closed history is untouched and unioned back unchanged. On a
Delta backend this is two MERGEs (close + insert) that data-skip to the
files holding the affected keys; the parquet fallback rewrites, as
documented in sinks/keyed_table.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCD2_COLS = ["valid_from", "valid_to", "is_current"]


def apply_scd2(
    existing: DataFrame | None,
    batch: DataFrame,
    key: str,
    ts_col: str,
    tracked: list[str],
) -> DataFrame:
    """Return the new full SCD2 table state.

    ``existing`` is the current table (with SCD2_COLS) or None on first
    load; ``batch`` has ``key``, ``tracked`` attribute columns and an
    event-time column ``ts_col``. Within a batch, multiple versions per
    key are chained in ``ts_col`` order; consecutive versions with
    identical tracked attributes collapse (no spurious versions).

    Ordering contract (standard CDC assumption): batches must arrive in
    per-key event-time order. A record older than a key's *current*
    ``valid_from`` still chains correctly (the window re-sorts current ∪
    batch), but one that lands inside an already-CLOSED interval cannot
    reopen it — and a record collapsed as a no-change dup is gone, so a
    later batch filling the gap between it and its predecessor would
    diverge from a one-shot rebuild. Feed time-ordered batches (Kafka
    per-partition order, availableNow backfills of time-bucketed files).
    """
    incoming = batch.select(
        key, *tracked, F.col(ts_col).alias("valid_from")
    )
    if existing is None:
        hist = None
        live = incoming
    else:
        hist = existing.filter(~F.col("is_current"))
        current = existing.filter(F.col("is_current")).select(
            key, *tracked, "valid_from"
        )
        live = current.unionByName(incoming)

    w_order = Window.partitionBy(key).orderBy("valid_from")
    fingerprint = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in tracked])
    changed = (
        live.withColumn("_fp", fingerprint)
        .withColumn("_prev_fp", F.lag("_fp").over(w_order))
        .filter(F.col("_prev_fp").isNull() | (F.col("_fp") != F.col("_prev_fp")))
        .drop("_fp", "_prev_fp")
    )
    versioned = changed.withColumn(
        "valid_to", F.lead("valid_from").over(w_order)
    ).withColumn("is_current", F.col("valid_to").isNull())
    if hist is not None:
        versioned = hist.unionByName(versioned)
    return versioned


def current_of(scd2_table: DataFrame) -> DataFrame:
    """Project the SCD Type 1 view (latest version per key)."""
    return scd2_table.filter(F.col("is_current")).drop(*SCD2_COLS)


def as_of(scd2_table: DataFrame, ts) -> DataFrame:
    """Point-in-time view: versions valid at ``ts`` (AS OF semantics)."""
    t = F.lit(ts).cast("timestamp")
    return scd2_table.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop(*SCD2_COLS)
