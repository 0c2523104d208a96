"""Custom Python DataSource (Spark 4 DataSource API): read NDJSON files
of FHIR transaction Bundles as Kafka-shaped records.

``spark.read.format("fhir_bundles").load(dir)`` emits the same
(key, value, timestamp, partition, offset, topic) rows the Kafka source
produces, so the whole pipeline (prepare_stream -> W1 -> merge) runs
unchanged over files — the batch twin of the reference's Synthea
NDJSON corpus ingestion (reference data/bundles.ndjson is produced and
fed through Kafka; here it is a first-class source).

Partitioning: one InputPartition per file; within a file, ``offset`` is
the line number and ``partition`` a stable hash of the file name — so
W1's (partition ASC, offset DESC) ordering is file-order, matching
Kafka's per-partition offset order. Scale: files are read fully
parallel, no driver-side I/O; at 100 TB the file listing itself should
come from a manifest table, which the `paths` option supports.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
from dataclasses import dataclass

import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA_DDL = (
    "key string, value string, timestamp timestamp, "
    "partition int, offset long, topic string"
)


@dataclass
class _FilePartition(InputPartition):
    path: str
    partition_id: int


def _list_bundle_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".ndjson", ".json", ".jsonl"))
    )


class FhirBundleReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fhir_bundles source requires a path")
        self.topic = options.get("topic", "fhir.file")

    def partitions(self):
        return [
            _FilePartition(
                p,
                int.from_bytes(
                    hashlib.md5(os.path.basename(p).encode()).digest()[:2], "big"
                ),
            )
            for p in _list_bundle_files(self.path)
        ]

    def read(self, partition: _FilePartition):
        mtime = dt.datetime.fromtimestamp(
            os.path.getmtime(partition.path), tz=dt.timezone.utc
        ).replace(tzinfo=None)
        with open(partition.path, encoding="utf-8") as f:
            for offset, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                yield (
                    None,  # key (producer key unavailable for files)
                    line,
                    mtime,
                    partition.partition_id,
                    offset,
                    self.topic,
                )


class FhirBundleStreamReader(SimpleDataSourceStreamReader):
    """Incremental micro-batch reader: the stream offset is the sorted
    list of files already consumed; each poll reads files that appeared
    since. Files are immutable-once-written (the standard landing-zone
    contract), so replays from a checkpointed offset are deterministic.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fhir_bundles source requires a path")
        self.topic = options.get("topic", "fhir.file")

    def initialOffset(self) -> dict:  # noqa: N802
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        files = _list_bundle_files(self.path)
        new = [f for f in files if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        # the simple-reader API prefetches on the driver and pickles the
        # result for executors: it must be an ITERATOR (next() is called)
        # that is also PICKLABLE — a list_iterator is both; a generator
        # pickles not at all and a bare list is not an iterator
        return iter(list(self._rows(new))), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # deterministic replay for recovery: the delta between offsets
        new = [f for f in end.get("seen", []) if f not in set(start.get("seen", []))]
        return iter(list(self._rows(new)))

    def _rows(self, files: list[str]):
        batch_reader = FhirBundleReader({"path": self.path, "topic": self.topic})
        for f in files:
            pid = int.from_bytes(
                hashlib.md5(os.path.basename(f).encode()).digest()[:2], "big"
            )
            yield from batch_reader.read(_FilePartition(f, pid))


@dataclass
class _WroteFile(WriterCommitMessage):
    tmp_path: str
    final_path: str
    n_rows: int


class FhirBundleWriter(DataSourceWriter):
    """Executor-side writer: each partition streams its ``value`` column
    (one bundle JSON per row) into a temp NDJSON file; the driver's
    commit renames temp files into place (write-then-rename = readers
    never observe partial files, and an aborted job leaves no visible
    output). The export twin of the reader: a keyed table serialized
    back into the landing-zone format."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fhir_bundles sink requires a path")

    def write(self, iterator) -> _WroteFile:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.ndjson"
        tmp = os.path.join(self.path, f".{name}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(row["value"])
                f.write("\n")
                n += 1
        return _WroteFile(tmp, os.path.join(self.path, name), n)

    def commit(self, messages) -> None:
        for m in messages:
            if m.n_rows > 0:
                os.rename(m.tmp_path, m.final_path)
            else:
                os.remove(m.tmp_path)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class FhirBundleDataSource(DataSource):
    """format name: fhir_bundles (batch + streaming reads, batch write)"""

    @classmethod
    def name(cls) -> str:
        return "fhir_bundles"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> FhirBundleReader:
        return FhirBundleReader(self.options)

    def simpleStreamReader(self, schema) -> FhirBundleStreamReader:  # noqa: N802
        return FhirBundleStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> FhirBundleWriter:
        if overwrite:
            raise ValueError("fhir_bundles sink is append-only")
        return FhirBundleWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(FhirBundleDataSource)
