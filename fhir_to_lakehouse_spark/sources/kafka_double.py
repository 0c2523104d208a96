"""Kafka semantics test double — a Python DataSource that honors the
REAL Kafka source's options so the S1/S2 wiring is executable without
the spark-sql-kafka connector jar (absent in this container; a
documented search of local ivy/maven caches found none).

``kafka_reader(spark, cfg, fmt="kafka_double")`` builds the exact same
option set the production reader sends to the real connector
(/root/reference/src/main.py:125-136), and the double interprets them
with Kafka's semantics:

- ``kafka.bootstrap.servers`` — reinterpreted as the broker DIRECTORY:
  ``<dir>/<topic>/<partition>.jsonl``, one JSON record per line, the
  line number being the record's offset;
- ``subscribe`` — comma-separated topic list;
- ``startingOffsets`` — ``earliest`` | ``latest`` | per-partition JSON
  (``{"topic": {"0": 5}}``), exactly the connector's grammar;
- ``maxOffsetsPerTrigger`` — total records per micro-batch, spread
  across topic-partitions proportionally to backlog (the connector's
  rate-limit behavior);
- ``includeHeaders`` — adds the connector's headers column
  (array<struct<key string, value binary>>);
- ``failOnDataLoss`` — raise vs. skip when a checkpointed offset
  points past a truncated partition file.

Output schema matches the connector: key/value binary, topic,
partition, offset, timestamp, timestampType (+ headers). The engine's
first step casts value to string, identical on both sources.

The checkpoint offset is the connector's own shape
({"topic": {"partition": nextOffset}}), so the metrics listener's
per-topic/partition gauge parsing is exercised by the same payloads.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BASE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)
HEADERS_FIELD = "headers array<struct<key: string, value: binary>>"


def produce(
    broker_dir: str,
    topic: str,
    records: list[dict],
    partition: int = 0,
) -> None:
    """Test-side producer: append records (dicts with value and optional
    key/timestamp/headers) to a topic-partition log."""
    tdir = os.path.join(broker_dir, topic)
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, f"{partition}.jsonl"), "a", encoding="utf-8") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")


def _partitions_of(broker_dir: str, topic: str) -> list[int]:
    tdir = os.path.join(broker_dir, topic)
    if not os.path.isdir(tdir):
        return []
    return sorted(
        int(name.removesuffix(".jsonl"))
        for name in os.listdir(tdir)
        if name.endswith(".jsonl")
    )

def _log_path(broker_dir: str, topic: str, partition: int) -> str:
    return os.path.join(broker_dir, topic, f"{partition}.jsonl")


def _end_offsets(broker_dir: str, topics: list[str]) -> dict:
    out: dict = {}
    for t in topics:
        for p in _partitions_of(broker_dir, t):
            with open(_log_path(broker_dir, t, p), encoding="utf-8") as f:
                n = sum(1 for line in f if line.strip())
            out.setdefault(t, {})[str(p)] = n
    return out


def _read_log(
    broker_dir: str,
    topic: str,
    partition: int,
    start: int,
    end: int,
    include_headers: bool,
    fail_on_data_loss: bool,
):
    """Rows [start, end) of one partition log, connector-shaped."""
    path = _log_path(broker_dir, topic, partition)
    rows = []
    try:
        with open(path, encoding="utf-8") as f:
            lines = [line for line in f if line.strip()]
    except FileNotFoundError:
        lines = []
    if start > len(lines):
        if fail_on_data_loss:
            raise RuntimeError(
                f"data loss: {topic}-{partition} offset {start} > "
                f"log end {len(lines)} (failOnDataLoss=true)"
            )
        start = len(lines)
    for offset in range(start, min(end, len(lines))):
        rec = json.loads(lines[offset])
        ts = rec.get("timestamp")
        ts = (
            dt.datetime.fromtimestamp(ts, tz=dt.timezone.utc).replace(tzinfo=None)
            if isinstance(ts, (int, float))
            else dt.datetime(1970, 1, 1)
        )
        key = rec.get("key")
        value = rec.get("value", "")
        row = [
            key.encode() if isinstance(key, str) else key,
            value.encode() if isinstance(value, str) else value,
            topic,
            partition,
            offset,
            ts,
            0,  # timestampType: CREATE_TIME
        ]
        if include_headers:
            headers = rec.get("headers") or {}
            row.append(
                [(k, str(v).encode()) for k, v in headers.items()] or None
            )
        rows.append(tuple(row))
    return rows


@dataclass
class _Options:
    broker_dir: str
    topics: list[str]
    starting_offsets: str
    max_offsets_per_trigger: int | None
    include_headers: bool
    fail_on_data_loss: bool

    @classmethod
    def parse(cls, options: dict) -> "_Options":
        servers = options.get("kafka.bootstrap.servers")
        if not servers:
            raise ValueError(
                "kafka_double requires kafka.bootstrap.servers "
                "(the broker directory)"
            )
        subscribe = options.get("subscribe")
        if not subscribe:
            raise ValueError("kafka_double requires subscribe")
        rate = options.get("maxoffsetspertrigger") or options.get(
            "maxOffsetsPerTrigger"
        )
        return cls(
            broker_dir=servers,
            topics=[t.strip() for t in subscribe.split(",") if t.strip()],
            starting_offsets=options.get("startingoffsets")
            or options.get("startingOffsets")
            or "latest",
            max_offsets_per_trigger=int(rate) if rate else None,
            include_headers=str(
                options.get("includeheaders")
                or options.get("includeHeaders")
                or "false"
            ).lower()
            == "true",
            fail_on_data_loss=str(
                options.get("failondataloss")
                or options.get("failOnDataLoss")
                or "true"
            ).lower()
            == "true",
        )

    def start_offsets(self) -> dict:
        if self.starting_offsets == "earliest":
            return {
                t: {str(p): 0 for p in _partitions_of(self.broker_dir, t)}
                for t in self.topics
            }
        if self.starting_offsets == "latest":
            return _end_offsets(self.broker_dir, self.topics)
        return json.loads(self.starting_offsets)


@dataclass
class _TopicPartition(InputPartition):
    topic: str
    partition: int
    start: int
    end: int


class KafkaDoubleBatchReader(DataSourceReader):
    """Batch read = everything from startingOffsets to current end
    (the connector's batch mode)."""

    def __init__(self, options: dict):
        self.opts = _Options.parse(options)

    def partitions(self):
        start = (
            self.opts.start_offsets()
            if self.opts.starting_offsets != "latest"
            else {
                t: {str(p): 0 for p in _partitions_of(self.opts.broker_dir, t)}
                for t in self.opts.topics
            }
        )
        end = _end_offsets(self.opts.broker_dir, self.opts.topics)
        return [
            _TopicPartition(t, int(p), start.get(t, {}).get(p, 0), n)
            for t, parts in end.items()
            for p, n in parts.items()
        ]

    def read(self, part: _TopicPartition):
        yield from _read_log(
            self.opts.broker_dir,
            part.topic,
            part.partition,
            part.start,
            part.end,
            self.opts.include_headers,
            self.opts.fail_on_data_loss,
        )


class KafkaDoubleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch read with the connector's rate limiting: each poll
    advances every topic-partition toward its log end, but the TOTAL
    advance is capped at maxOffsetsPerTrigger, spread proportionally to
    each partition's backlog (largest backlogs get the larger share,
    like the real source's rateLimit)."""

    def __init__(self, options: dict):
        self.opts = _Options.parse(options)

    def initialOffset(self) -> dict:  # noqa: N802
        return self.opts.start_offsets()

    def _plan(self, start: dict) -> dict:
        """end offsets for one micro-batch from ``start``."""
        latest = _end_offsets(self.opts.broker_dir, self.opts.topics)
        backlog = {
            (t, p): max(0, n - int(start.get(t, {}).get(p, 0)))
            for t, parts in latest.items()
            for p, n in parts.items()
        }
        total = sum(backlog.values())
        cap = self.opts.max_offsets_per_trigger
        if cap is None or total <= cap:
            return latest
        # proportional split, remainder to the largest backlogs —
        # mirrors Kafka source admission control
        shares = {
            tp: (b * cap) // total if total else 0 for tp, b in backlog.items()
        }
        leftover = cap - sum(shares.values())
        for tp in sorted(backlog, key=backlog.get, reverse=True):
            if leftover <= 0:
                break
            if shares[tp] < backlog[tp]:
                shares[tp] += 1
                leftover -= 1
        end: dict = {}
        for (t, p), share in shares.items():
            base = int(start.get(t, {}).get(p, 0))
            end.setdefault(t, {})[p] = base + min(share, backlog[(t, p)])
        return end

    def read(self, start: dict):
        end = self._plan(start)
        rows = []
        for t, parts in end.items():
            for p, stop in parts.items():
                rows.extend(
                    _read_log(
                        self.opts.broker_dir,
                        t,
                        int(p),
                        int(start.get(t, {}).get(p, 0)),
                        int(stop),
                        self.opts.include_headers,
                        self.opts.fail_on_data_loss,
                    )
                )
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        rows = []
        for t, parts in end.items():
            for p, stop in parts.items():
                rows.extend(
                    _read_log(
                        self.opts.broker_dir,
                        t,
                        int(p),
                        int(start.get(t, {}).get(p, 0)),
                        int(stop),
                        self.opts.include_headers,
                        self.opts.fail_on_data_loss,
                    )
                )
        return iter(rows)


class KafkaDoubleDataSource(DataSource):
    """format name: kafka_double (batch + streaming reads)."""

    @classmethod
    def name(cls) -> str:
        return "kafka_double"

    def schema(self) -> str:
        opts = {k.lower(): v for k, v in self.options.items()}
        if str(opts.get("includeheaders", "false")).lower() == "true":
            return f"{BASE_SCHEMA}, {HEADERS_FIELD}"
        return BASE_SCHEMA

    def reader(self, schema) -> KafkaDoubleBatchReader:
        return KafkaDoubleBatchReader(self.options)

    def simpleStreamReader(self, schema) -> KafkaDoubleStreamReader:  # noqa: N802
        return KafkaDoubleStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KafkaDoubleDataSource)
