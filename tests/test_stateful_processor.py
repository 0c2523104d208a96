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
