"""Custom Python DataSource (Spark 4 DataSource API): read NDJSON files
of FHIR transaction Bundles as Kafka-shaped records.

``spark.read.format("fhir_bundles").load(dir)`` emits the same
(key, value, timestamp, partition, offset, topic) rows the Kafka source
produces, so the whole pipeline (prepare_stream -> W1 -> merge) runs
unchanged over files — the batch twin of the reference's Synthea
NDJSON corpus ingestion (reference data/bundles.ndjson is produced and
fed through Kafka; here it is a first-class source).

Offset semantics (chosen so W1's ``partition ASC, offset DESC``
ordering is *correct recency*, exactly as it is on Kafka):

- the whole directory is ONE logical partition (``partition`` = 0), so
  a resource key always lives in "its" partition like a Kafka key does;
- ``offset`` is a single monotone long: ``file_seq << 32 | line``,
  where ``file_seq`` is the file's position in the recency order —
  lexicographic filename order for batch reads (landing zones name
  files monotonically: timestamps, ULIDs), arrival order for streaming
  reads (checkpointed, stable across replays).

So a key that spans files resolves to the newest file's newest line —
deterministic and collision-free. (The earlier design hashed the file
NAME into a 16-bit partition id: two files could collide at ~300 files
and the winner was decided by hash order, not recency.)

The ``partition`` COLUMN being constant does not serialize the read:
physical parallelism comes from one InputPartition per file, and
downstream W1 shuffles on ``request_url``, not on ``partition``.

Scale: files are read fully parallel, no driver-side I/O; at 100 TB
the file listing itself should come from a manifest table, which the
`paths` option supports.
"""

from __future__ import annotations

import datetime as dt
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

# offset = file_seq << FILE_SEQ_SHIFT | line_number
FILE_SEQ_SHIFT = 32


def file_seq_of(offset: int) -> int:
    """Recover the file sequence number from a composite offset."""
    return offset >> FILE_SEQ_SHIFT


def line_of(offset: int) -> int:
    """Recover the line number from a composite offset."""
    return offset & ((1 << FILE_SEQ_SHIFT) - 1)


@dataclass
class _FilePartition(InputPartition):
    path: str
    file_seq: int


def _list_bundle_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".ndjson", ".json", ".jsonl"))
    )


def _read_file(path: str, file_seq: int, topic: str):
    """Yield Kafka-shaped rows for one file; offset encodes (file, line)."""
    mtime = dt.datetime.fromtimestamp(
        os.path.getmtime(path), tz=dt.timezone.utc
    ).replace(tzinfo=None)
    base = file_seq << FILE_SEQ_SHIFT
    with open(path, encoding="utf-8") as f:
        for line_no, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            yield (
                None,  # key (producer key unavailable for files)
                line,
                mtime,
                0,  # single logical partition — see module docstring
                base | line_no,
                topic,
            )


class FhirBundleReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fhir_bundles source requires a path")
        self.topic = options.get("topic", "fhir.file")

    def partitions(self):
        # file_seq = index in the sorted listing: collision-free, and
        # lexicographically-later files win W1 ties (recency contract)
        return [
            _FilePartition(p, seq)
            for seq, p in enumerate(_list_bundle_files(self.path))
        ]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.path, partition.file_seq, self.topic)


class FhirBundleStreamReader(SimpleDataSourceStreamReader):
    """Incremental micro-batch reader with a BOUNDED checkpoint offset.

    The offset is ``{"base": n_compacted, "watermark": mtime,
    "files": [arrival-ordered names not yet compacted]}``. A file's
    sequence number is ``base + index`` — stable across replays because
    the arrival order itself is what the checkpoint records.

    Compaction keeps the offset O(recent files) instead of O(all files
    ever seen): once the tracked list exceeds ``compact_threshold``,
    the prefix of files older than ``max(mtime) - lateness_margin`` is
    dropped and the watermark advances; files older than the watermark
    are treated as already-consumed without being listed.

    Contract (the standard landing-zone one): files are immutable once
    written, and a NEW file never arrives with an mtime more than
    ``lateness_margin`` seconds behind the newest file already present
    (default 10 min — covers copy/clock skew). Replays only span recent
    offsets, which compaction never touches.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fhir_bundles source requires a path")
        self.topic = options.get("topic", "fhir.file")
        self.compact_threshold = int(options.get("compactThreshold", 1000))
        self.lateness_margin = float(options.get("latenessMargin", 600.0))

    def initialOffset(self) -> dict:  # noqa: N802
        return {"base": 0, "watermark": 0.0, "files": []}

    def read(self, start: dict):
        base = int(start.get("base", 0))
        watermark = float(start.get("watermark", 0.0))
        tracked = list(start.get("files", []))
        seen = set(tracked)
        # watermark is inclusive-consumed: every compacted file has
        # mtime <= watermark, so only strictly-newer unseen files are new
        new = [
            f
            for f in _list_bundle_files(self.path)
            if f not in seen and os.path.getmtime(f) > watermark
        ]
        rows = []
        for j, f in enumerate(new):
            rows.extend(_read_file(f, base + len(tracked) + j, self.topic))
        files = tracked + new
        # compact: drop the oldest arrival-prefix that is safely older
        # than everything still arriving; base += k keeps every retained
        # file's seq (= base + index) unchanged. NEVER drop past the
        # tracked prefix: files first read in THIS batch must stay in
        # the end offset, because crash recovery replays this batch via
        # readBetweenOffsets over end.files — compacting a new file out
        # would silently lose its rows on restart. tracked files were
        # all consumed by earlier batches whose own end offsets (already
        # in the offset log) still list them, so replay of those spans
        # is unaffected.
        if len(files) > self.compact_threshold:
            mtimes = [os.path.getmtime(f) for f in files]
            cut = max(mtimes) - self.lateness_margin
            k = 0
            while k < len(tracked) and mtimes[k] < cut:
                k += 1
            if k:
                watermark = max(watermark, max(mtimes[:k]))
                base += k
                files = files[k:]
        end = {"base": base, "watermark": watermark, "files": files}
        # the simple-reader API prefetches on the driver and pickles the
        # result for executors: it must be an ITERATOR (next() is called)
        # that is also PICKLABLE — a list_iterator is both; a generator
        # pickles not at all and a bare list is not an iterator
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # deterministic replay for recovery: files whose seq falls in
        # [start's next seq, end's last seq] — no mtime consultation, the
        # checkpointed arrival order alone decides
        next_seq = int(start.get("base", 0)) + len(start.get("files", []))
        end_base = int(end.get("base", 0))
        rows = []
        for i, f in enumerate(end.get("files", [])):
            seq = end_base + i
            if seq >= next_seq:
                rows.extend(_read_file(f, seq, self.topic))
        return iter(rows)


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
