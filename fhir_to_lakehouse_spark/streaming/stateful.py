"""Arbitrary keyed state via transformWithStateInPandas (Spark 4 API).

The reference's only cross-batch state is MERGE idempotency (SURVEY
§2.8: no stateful operators). This module adds the engine's custom
stateful face using the Spark 4 StatefulProcessor API — successor to
``applyInPandasWithState`` (streaming/windows.py::running_user_totals)
with named per-key state variables on the RocksDB state store.

Operator: streaming SCD2 changelog. State per key = the current
tracked value + its valid_from (two fields — bounded, RocksDB-backed,
shuffle key = the dimension key). Each change emits one changelog row
closing the previous version; downstream, ``KeyedTable.merge_scd2``
or a plain append materializes the versioned dimension — the streaming
twin of operators/scd.py.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SCD2_CHANGE_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("prev_type", T.StringType()),
        T.StructField("prev_from", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_value", T.StringType()),
        T.StructField("cur_from", T.TimestampType()),
    ]
)


class Scd2ChangeProcessor(StatefulProcessor):
    """Emit one row per change of ``event_type`` per key, carrying the
    closed previous version (None for the first)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._current = handle.getValueState("current", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        # event-time order within the batch; ties broken by event_id for
        # determinism (same contract as operators/scd.py)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        state = self._current.get() if self._current.exists() else None
        cur_value, cur_from = state if state else (None, None)
        out: dict[str, list] = {c: [] for c in SCD2_CHANGE_OUTPUT.names}
        for value, ts in zip(batch["event_type"], batch["ts"]):
            if cur_value is not None and value == cur_value:
                continue
            out["user_id"].append(key[0])
            out["event_type"].append(value)
            out["valid_from"].append(ts)
            out["prev_type"].append(cur_value)
            out["prev_from"].append(cur_from)
            cur_value, cur_from = value, ts
        self._current.update((cur_value, cur_from))
        if out["user_id"]:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)


class SessionTimeoutProcessor(StatefulProcessor):
    """Inactivity-closed sessions via EVENT-TIME TIMERS — the part of
    the transformWithState API the built-in session_window cannot
    express when the close action is more than an aggregate: per key,
    accumulate (start, last-seen, count); (re-)arm one timer at
    last-seen + gap; when the WATERMARK passes it, emit the closed
    session and clear state. Exactly-once by construction: the timer
    registry and the value state live in the same versioned store as
    the offsets.

    State per key is three scalars + one timer — bounded regardless of
    session length, the property that lets 100 TB clickstreams keep
    billions of concurrent sessions in RocksDB."""

    def __init__(self, gap_seconds: int):
        self._gap_ms = gap_seconds * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", _SESSION_STATE)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        lo, hi, n = batch["ts"].min(), batch["ts"].max(), len(batch)
        if self._sess.exists():
            start, last, seen = self._sess.get()
            start, last, n = min(start, lo), max(last, hi), seen + n
        else:
            start, last = lo, hi
        self._sess.update((start, last, n))
        # one live timer per key: re-arm at the new inactivity deadline
        deadline = int(pd.Timestamp(last).value // 1_000_000) + self._gap_ms
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(deadline)
        return iter(())

    def handleExpiredTimer(
        self, key: Any, timerValues: Any, expiredTimerInfo: Any
    ) -> Iterator[pd.DataFrame]:
        if not self._sess.exists():  # pragma: no cover - defensive
            return
        start, last, n = self._sess.get()
        self._sess.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [start],
                "session_end": [last],
                "n_events": [n],
            }
        )

    def close(self) -> None:
        pass


def session_timeouts(stream: DataFrame, gap_seconds: int = 60) -> DataFrame:
    """Sessions closed by event-time inactivity over an events stream
    (``user_id``, ``ts`` columns; the stream must carry a watermark on
    ``ts`` — timers fire when the watermark passes last-seen + gap)."""
    _require_rocksdb(stream)
    return stream.groupBy("user_id").transformWithStateInPandas(
        SessionTimeoutProcessor(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        outputMode="append",
        timeMode="EventTime",
    )


def scd2_changelog(stream: DataFrame) -> DataFrame:
    """Streaming SCD2 changelog over an events stream (``user_id``,
    ``event_type``, ``ts``, ``event_id`` columns). Requires the RocksDB
    state store provider (set by session.py); TimeMode None = state
    lives until explicitly cleared, matching a dimension whose keys
    never expire."""
    _require_rocksdb(stream)
    return stream.groupBy("user_id").transformWithStateInPandas(
        Scd2ChangeProcessor(),
        outputStructType=SCD2_CHANGE_OUTPUT,
        outputMode="append",
        timeMode="None",
    )


TRANSITION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_LAST_EVENT_STATE = T.StructType(
    [
        T.StructField("last_type", T.StringType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("last_id", T.LongType()),
    ]
)


class TransitionPairProcessor(StatefulProcessor):
    """Emit one (from_type, to_type) row per CONSECUTIVE event pair
    inside a user's stream — the streaming twin of the LEAD pairing in
    plans/events.py::events_markov_transitions; a downstream
    groupBy(from, to).count() maintains the live transition matrix.

    Cross-batch ordering contract: a key's events must arrive in
    micro-batches whose event times never regress past the stored last
    event (the guarantee a user-keyed Kafka topic gives via
    per-partition ordering). Events that DO arrive later than the
    stored frontier are dropped, not mis-chained — the same late-data
    policy every watermarked operator applies — so the emitted pairs
    are exactly the batch LEAD pairs over the accepted events. The
    stored (last_ts, last_id) IS the frontier that enforces this;
    within a batch, rows are sorted by (ts, event_id), the LEAD
    window's ORDER BY.

    State per key = the last event seen (type, ts, id) — three
    scalars, bounded regardless of stream length, so 100 TB
    clickstreams keep one tiny record per user in RocksDB.

    Frontier drops are OBSERVABLE (ADVICE r9): pass a Spark
    accumulator as ``dropped_acc`` and every late row discarded behind
    a key's frontier adds to it — a misconfigured non-key-partitioned
    source then shows up as a climbing counter in the Spark UI instead
    of silently vanishing transitions."""

    def __init__(self, dropped_acc: Any = None) -> None:
        self._dropped_acc = dropped_acc

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState("last", _LAST_EVENT_STATE)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        prev = self._last.get() if self._last.exists() else None
        prev_type = prev[0] if prev else None
        out: dict[str, list] = {c: [] for c in TRANSITION_OUTPUT.names}
        last_ts, last_id = (prev[1], prev[2]) if prev else (None, None)
        n_dropped = 0
        for etype, ts, eid in zip(
            batch["event_type"], batch["ts"], batch["event_id"]
        ):
            if last_ts is not None and (ts, eid) <= (last_ts, last_id):
                # late arrival behind the frontier: chaining it would
                # invert the pair the batch LEAD would emit — drop it
                # (counted, so the loss is operationally visible)
                n_dropped += 1
                continue
            if prev_type is not None:
                out["user_id"].append(key[0])
                out["from_type"].append(prev_type)
                out["to_type"].append(etype)
                out["ts"].append(ts)
            prev_type, last_ts, last_id = etype, ts, int(eid)
        if n_dropped and self._dropped_acc is not None:
            self._dropped_acc.add(n_dropped)
        if last_ts is not None:
            self._last.update((prev_type, last_ts, last_id))
        if out["user_id"]:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def _require_rocksdb(stream: DataFrame) -> None:
    """transformWithState needs the RocksDB state store (the default
    HDFS-backed provider lacks column families); runtime conf, read at
    query start."""
    stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def transition_pairs(stream: DataFrame, dropped_acc: Any = None) -> DataFrame:
    """Consecutive event-type pairs per user over an events stream
    (``user_id``, ``event_type``, ``ts``, ``event_id`` columns).
    TimeMode None: the last-event record lives until the key is next
    seen — a user's pair chain must survive arbitrarily long gaps.

    ``dropped_acc``: optional Spark accumulator
    (``sc.accumulator(0)``) incremented for every late row dropped
    behind a key's frontier — wire it in production so out-of-order
    ingestion is a visible counter, not silent loss (ADVICE r9)."""
    _require_rocksdb(stream)
    return stream.groupBy("user_id").transformWithStateInPandas(
        TransitionPairProcessor(dropped_acc),
        outputStructType=TRANSITION_OUTPUT,
        outputMode="append",
        timeMode="None",
    )
