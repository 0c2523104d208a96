"""transformWithStateInPandas operator: streaming SCD2 changelog must
match the batch rebuild (plans/scd.py) on the same events data.

The runtime gate: Spark's transformWithState protocol needs the
``protobuf`` package (pyspark/sql/streaming/proto/StateMessage_pb2);
absent it, the driver-side Python worker cannot start, so the whole
module is skipped rather than stubbed — the processor logic itself is
pure pandas and additionally covered protobuf-free below.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.sources.tables import load_table
from fhir_to_lakehouse_spark.streaming.stateful import (
    Scd2ChangeProcessor,
    scd2_changelog,
)

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAS_PROTOBUF = False


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


def test_processor_logic_without_spark_state_server():
    """Drive handleInputRows directly with a fake ValueState: the
    per-key chaining logic must match operators/scd.py semantics."""
    p = Scd2ChangeProcessor()
    p._current = _FakeValueState()
    t = pd.Timestamp
    batch1 = pd.DataFrame(
        {
            "event_type": ["a", "a", "b"],
            "ts": [t("2024-01-01"), t("2024-01-02"), t("2024-01-03")],
            "event_id": [1, 2, 3],
        }
    )
    out1 = pd.concat(list(p.handleInputRows((7,), iter([batch1]), None)))
    assert list(out1["event_type"]) == ["a", "b"]  # duplicate 'a' collapsed
    assert out1["prev_type"].iloc[0] is None
    assert out1["prev_type"].iloc[1] == "a"
    # state carries across batches: same value again -> no output
    batch2 = pd.DataFrame(
        {"event_type": ["b"], "ts": [t("2024-01-04")], "event_id": [4]}
    )
    assert list(p.handleInputRows((7,), iter([batch2]), None)) == []
    batch3 = pd.DataFrame(
        {"event_type": ["c"], "ts": [t("2024-01-05")], "event_id": [5]}
    )
    out3 = pd.concat(list(p.handleInputRows((7,), iter([batch3]), None)))
    assert list(out3["prev_type"]) == ["b"]
    assert out3["prev_from"].iloc[0] == t("2024-01-03")


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState needs protobuf (absent in this container)",
)
def test_scd2_changelog_stream_matches_batch_rebuild(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    ev_dir = str(tmp_path / "events")
    # two files -> at least two distinct input splits through the stream
    ev.repartition(2).write.mode("overwrite").parquet(ev_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    q = (
        scd2_changelog(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("scd2_changes")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM scd2_changes")

    # batch ground truth: changes of event_type per user in (ts, event_id) order
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    assert got.count() == want.count()
    # first version per user carries no previous version
    n_users = ev.select("user_id").distinct().count()
    assert got.filter("prev_type IS NULL").count() == n_users
    # spot-check one user's chain: contiguous (prev = preceding version)
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()["user_id"]
    chain = (
        got.filter(F.col("user_id") == uid).orderBy("valid_from").collect()
    )
    for prev_row, row in zip(chain, chain[1:]):
        assert row["prev_type"] == prev_row["event_type"]
        assert row["prev_from"] == prev_row["valid_from"]
        assert row["event_type"] != row["prev_type"]


class _FakeTimerHandle:
    """listTimers/deleteTimer/registerTimer recorder for the
    protobuf-free logic tests."""

    def __init__(self):
        self.timers: list[int] = []

    def listTimers(self):  # noqa: N802 - Spark API casing
        return list(self.timers)

    def deleteTimer(self, t):  # noqa: N802
        self.timers.remove(t)

    def registerTimer(self, t):  # noqa: N802
        self.timers.append(t)


def test_session_timeout_processor_logic_without_state_server():
    """Drive the timer processor directly with fakes: accumulation
    across batches, single re-armed timer at last-seen + gap, and the
    expiry emit + state clear."""
    from fhir_to_lakehouse_spark.streaming.stateful import (
        SessionTimeoutProcessor,
    )

    p = SessionTimeoutProcessor(gap_seconds=60)
    p._handle = _FakeTimerHandle()
    p._sess = _FakeValueState()
    t = pd.Timestamp
    b1 = pd.DataFrame({"ts": [t("2024-01-01 12:00:00"), t("2024-01-01 12:00:10")]})
    assert list(p.handleInputRows((1,), iter([b1]), None)) == []
    assert p._sess.get() == (t("2024-01-01 12:00:00"), t("2024-01-01 12:00:10"), 2)
    deadline1 = p._handle.timers[0]
    # second batch re-arms the ONE timer at the new deadline
    b2 = pd.DataFrame({"ts": [t("2024-01-01 12:00:30")]})
    list(p.handleInputRows((1,), iter([b2]), None))
    assert len(p._handle.timers) == 1
    assert p._handle.timers[0] == deadline1 + 20_000
    assert p._sess.get()[2] == 3
    # expiry emits the closed session and clears state
    out = pd.concat(list(p.handleExpiredTimer((1,), None, None)))
    assert out.iloc[0]["n_events"] == 3
    assert out.iloc[0]["session_start"] == t("2024-01-01 12:00:00")
    assert out.iloc[0]["session_end"] == t("2024-01-01 12:00:30")
    assert not p._sess.exists()


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState needs protobuf (absent in this container)",
)
def test_session_timeouts_fire_on_watermark(spark, tmp_path):
    """Event-time timers end-to-end: sessions close ONLY when the
    watermark passes last-seen + gap. Three single-file batches: users
    1/2 get events around t0; a far-future batch advances the
    watermark past their 60 s inactivity deadlines; a final batch runs
    with that watermark so the timers fire. User 3 (the far-future
    events) stays open — no premature emit."""
    import datetime as dt

    from fhir_to_lakehouse_spark.streaming.stateful import session_timeouts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    far = t0 + dt.timedelta(minutes=10)
    src = tmp_path / "in"
    src.mkdir()
    schema = "user_id long, ts timestamp"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # batch 1: two users near t0
    write_file("f1", [(1, t0), (1, t0 + dt.timedelta(seconds=10)), (2, t0)])
    # batch 2: far-future events advance max event time
    write_file("f2", [(3, far)])
    # batch 3: one more event so a batch EXECUTES with the advanced
    # watermark (watermark lags one batch behind max event time)
    write_file("f3", [(3, far + dt.timedelta(seconds=1))])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withWatermark("ts", "5 seconds")
    )
    q = (
        session_timeouts(stream, gap_seconds=60)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("session_timeouts_e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r.user_id: r
        for r in spark.sql("SELECT * FROM session_timeouts_e2e").collect()
    }
    assert set(rows) == {1, 2}, rows  # user 3's session is still open
    assert rows[1].n_events == 2
    assert rows[1].session_start == t0
    assert rows[1].session_end == t0 + dt.timedelta(seconds=10)
    assert rows[2].n_events == 1
    assert rows[2].session_start == rows[2].session_end == t0


def test_transition_pair_processor_logic_without_state_server():
    """Chaining across batches and intra-batch event-time ordering:
    the pair stream must equal the batch LEAD pairing."""
    from fhir_to_lakehouse_spark.streaming.stateful import (
        TransitionPairProcessor,
    )

    class _FakeAcc:
        value = 0

        def add(self, n):
            self.value += n

    acc = _FakeAcc()
    p = TransitionPairProcessor(dropped_acc=acc)
    p._last = _FakeValueState()
    t = pd.Timestamp
    # deliberately unsorted batch: processor must order by (ts, event_id)
    batch1 = pd.DataFrame(
        {
            "event_type": ["b", "a", "c"],
            "ts": [t("2024-01-02"), t("2024-01-01"), t("2024-01-03")],
            "event_id": [2, 1, 3],
        }
    )
    out1 = pd.concat(list(p.handleInputRows((7,), iter([batch1]), None)))
    assert list(zip(out1["from_type"], out1["to_type"])) == [
        ("a", "b"),
        ("b", "c"),
    ]
    # next batch chains from the stored last event ('c'), no pair skipped
    batch2 = pd.DataFrame(
        {"event_type": ["a"], "ts": [t("2024-01-04")], "event_id": [4]}
    )
    out2 = pd.concat(list(p.handleInputRows((7,), iter([batch2]), None)))
    assert list(zip(out2["from_type"], out2["to_type"])) == [("c", "a")]
    # ts tie broken by event_id: id 5 precedes id 6
    batch3 = pd.DataFrame(
        {
            "event_type": ["y", "x"],
            "ts": [t("2024-01-05"), t("2024-01-05")],
            "event_id": [6, 5],
        }
    )
    out3 = pd.concat(list(p.handleInputRows((7,), iter([batch3]), None)))
    assert list(zip(out3["from_type"], out3["to_type"])) == [
        ("a", "x"),
        ("x", "y"),
    ]
    # late arrival BEHIND the stored frontier (ts before batch3's tail)
    # is dropped, never mis-chained; in-order rows in the same batch
    # still chain from the frontier ('y')
    batch4 = pd.DataFrame(
        {
            "event_type": ["late", "z"],
            "ts": [t("2024-01-02"), t("2024-01-06")],
            "event_id": [99, 100],
        }
    )
    out4 = pd.concat(list(p.handleInputRows((7,), iter([batch4]), None)))
    assert list(zip(out4["from_type"], out4["to_type"])) == [("y", "z")]
    # the frontier drop is counted, not silent (ADVICE r9)
    assert acc.value == 1
    # an all-late batch emits nothing and leaves the frontier intact
    batch5 = pd.DataFrame(
        {"event_type": ["old"], "ts": [t("2024-01-01")], "event_id": [0]}
    )
    assert list(p.handleInputRows((7,), iter([batch5]), None)) == []
    assert p._last.get()[0] == "z"
    assert acc.value == 2


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState protocol needs protobuf (absent in container)",
)
def test_transition_pairs_stream_matches_batch_lead(spark, sf_dir, tmp_path):
    from fhir_to_lakehouse_spark.streaming.stateful import transition_pairs

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    ev_dir = str(tmp_path / "events")
    # split into micro-batches ALONG EVENT TIME (every key's batch-2
    # events are later than its batch-1 events) so the processor's
    # cross-batch ordering contract holds and LEAD equality is exact;
    # a round-robin split would interleave each user's history across
    # batches and the late rows would (correctly) be dropped. The
    # early file is written FIRST: FileStreamSource feeds files oldest
    # mod-time first under latestFirst=false.
    mid = ev.selectExpr("percentile(unix_timestamp(ts), 0.5)").first()[0]
    early = ev.filter(F.unix_timestamp("ts") <= mid)
    late = ev.filter(F.unix_timestamp("ts") > mid)
    early.coalesce(1).write.mode("overwrite").parquet(ev_dir)
    import time as _time

    _time.sleep(1.1)
    late.coalesce(1).write.mode("append").parquet(ev_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(ev_dir)
    )
    q = (
        transition_pairs(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("transitions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT * FROM transitions")
        .groupBy("from_type", "to_type")
        .count()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .count()
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
