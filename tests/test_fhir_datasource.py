"""Custom Python DataSource: NDJSON bundle files -> Kafka-shaped rows
-> the unchanged pipeline."""

from __future__ import annotations

from fhir_to_lakehouse_spark.sources.fhir_datasource import register
from fhir_to_lakehouse_spark.streaming.pipeline import BundlePipeline, PipelineConfig
from tests.fixtures import delete_bundle, put_bundle


def test_fhir_bundles_source_reads_ndjson(spark, tmp_path):
    register(spark)
    src = tmp_path / "bundles"
    src.mkdir()
    (src / "a.ndjson").write_text(
        put_bundle("Patient", "f1", active=True)
        + "\n"
        + put_bundle("Patient", "f2", active=False)
        + "\n"
    )
    (src / "b.ndjson").write_text(put_bundle("Condition", "fc1") + "\n")

    df = spark.read.format("fhir_bundles").load(str(src))
    rows = df.collect()
    assert len(rows) == 3
    # one logical partition; offset = file_seq << 32 | line, file_seq
    # from the sorted listing (a.ndjson=0, b.ndjson=1)
    assert all(r["partition"] == 0 for r in rows)
    assert {r["offset"] for r in rows} == {0, 1, 1 << 32}
    assert all(r["topic"] == "fhir.file" for r in rows)


def test_fhir_bundles_cross_file_last_writer_wins(spark, tmp_path):
    """A key that spans files resolves to the lexicographically-later
    file under W1's (partition ASC, offset DESC) — recency by file
    order, not by a hash of the file name."""
    from fhir_to_lakehouse_spark.operators.bundles import (
        latest_per_key,
        prepare_stream,
    )

    register(spark)
    src = tmp_path / "bundles"
    src.mkdir()
    (src / "2024-01-01.ndjson").write_text(
        put_bundle("Patient", "x", active=True) + "\n"
    )
    (src / "2024-01-02.ndjson").write_text(
        put_bundle("Patient", "x", active=False) + "\n"
    )
    df = spark.read.format("fhir_bundles").load(str(src))
    [winner] = latest_per_key(prepare_stream(df)).collect()
    assert '"active": false' in winner["resource"].replace(
        '"active":false', '"active": false'
    )


def test_fhir_bundles_streaming_incremental(spark, tmp_path):
    """Streaming read: files appearing between micro-batches are picked
    up incrementally; the full pipeline consumes the stream."""
    register(spark)
    src = tmp_path / "stream_bundles"
    src.mkdir()
    (src / "0001.ndjson").write_text(put_bundle("Patient", "s1", active=True) + "\n")

    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )
    pipe = BundlePipeline(spark, cfg)
    stream = spark.readStream.format("fhir_bundles").load(str(src))
    q = pipe.start_stream(stream, query_name="ds_stream")
    try:
        q.processAllAvailable()
        assert pipe.table("Patient").to_df().count() == 1
        # second file arrives mid-stream
        (src / "0002.ndjson").write_text(
            put_bundle("Patient", "s2", active=False)
            + "\n"
            + delete_bundle("Patient", "s1")
            + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        r["id"] for r in pipe.table("Patient").to_df().collect()
    ) == ["s2"]


def test_fhir_bundles_writer_roundtrip(spark, tmp_path):
    """Export a table back to bundle NDJSON through the writer, then
    re-read it through the reader: lossless round-trip."""
    from pyspark.sql import functions as F

    register(spark)
    out = tmp_path / "export"
    # build PUT bundles from rows, write via the custom sink
    rows = spark.createDataFrame(
        [("p%d" % i, i % 2 == 0) for i in range(20)], "id string, active boolean"
    )
    bundles = rows.select(
        F.to_json(
            F.struct(
                F.lit("Bundle").alias("resourceType"),
                F.lit("transaction").alias("type"),
                F.array(
                    F.struct(
                        F.to_json(
                            F.struct(
                                F.lit("Patient").alias("resourceType"),
                                F.col("id"),
                                F.col("active"),
                            )
                        ).alias("resource"),
                        F.struct(
                            F.lit("PUT").alias("method"),
                            F.concat(F.lit("Patient/"), F.col("id")).alias("url"),
                        ).alias("request"),
                    )
                ).alias("entry"),
            )
        ).alias("value")
    )
    bundles.write.format("fhir_bundles").mode("append").save(str(out))

    back = spark.read.format("fhir_bundles").load(str(out))
    assert back.count() == 20
    from fhir_to_lakehouse_spark.operators.bundles import prepare_stream

    ids = sorted(
        r["request_resource_id"] for r in prepare_stream(back).collect()
    )
    assert ids == sorted("p%d" % i for i in range(20))
    # no stray temp files after commit
    assert not [f for f in out.iterdir() if f.name.startswith(".")]


def test_fhir_bundles_source_through_pipeline(spark, tmp_path):
    register(spark)
    src = tmp_path / "bundles"
    src.mkdir()
    (src / "batch.ndjson").write_text(
        "\n".join(
            [
                put_bundle("Patient", "p1", active=True),
                put_bundle("Patient", "p2", active=True),
                delete_bundle("Patient", "p1"),
            ]
        )
        + "\n"
    )
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ck")
    )
    pipe = BundlePipeline(spark, cfg)
    batch = spark.read.format("fhir_bundles").load(str(src))
    pipe.process_batch(batch, 1)
    assert sorted(
        r["id"] for r in pipe.table("Patient").to_df().collect()
    ) == ["p2"]


def test_stream_offset_compaction_stays_bounded(tmp_path):
    """The checkpointed offset must not grow O(total files ever seen):
    old files compact away behind the watermark, sequence numbers stay
    stable, and replay between offsets never re-reads compacted files."""
    import os

    from fhir_to_lakehouse_spark.sources.fhir_datasource import (
        FhirBundleStreamReader,
        file_seq_of,
    )

    src = tmp_path / "landing"
    src.mkdir()
    reader = FhirBundleStreamReader(
        {"path": str(src), "compactThreshold": "4", "latenessMargin": "5"}
    )
    offset = reader.initialOffset()
    seen_seqs = []
    # 12 files arriving over "time" (mtimes spaced 10s apart, well past
    # the 5s lateness margin, so compaction is allowed to advance)
    t0 = 1_700_000_000
    for i in range(12):
        f = src / f"f{i:04d}.ndjson"
        f.write_text(put_bundle("Patient", f"p{i}", active=True) + "\n")
        os.utime(f, (t0 + 10 * i, t0 + 10 * i))
        rows, offset = reader.read(offset)
        rows = list(rows)
        assert len(rows) == 1
        seen_seqs.append(file_seq_of(rows[0][4]))
        # bounded: tracked list never exceeds the threshold + one batch
        assert len(offset["files"]) <= 5
    # sequence numbers are the arrival order, never reused or shifted
    assert seen_seqs == list(range(12))
    # no file is ever re-read after compaction
    rows, offset2 = reader.read(offset)
    assert list(rows) == []
    assert offset2["files"] == offset["files"]


def test_stream_replay_between_offsets_is_deterministic(tmp_path):
    import os

    from fhir_to_lakehouse_spark.sources.fhir_datasource import (
        FhirBundleStreamReader,
    )

    src = tmp_path / "landing"
    src.mkdir()
    reader = FhirBundleStreamReader({"path": str(src)})
    start = reader.initialOffset()
    (src / "a.ndjson").write_text(put_bundle("Patient", "r1", active=True) + "\n")
    rows1, mid = reader.read(start)
    (src / "b.ndjson").write_text(put_bundle("Patient", "r2", active=True) + "\n")
    rows2, end = reader.read(mid)
    # replay of the second delta returns exactly the second batch's rows
    replay = list(reader.readBetweenOffsets(mid, end))
    assert [r[1] for r in replay] == [r[1] for r in list(rows2)]
    assert [r[4] for r in replay] == [1 << 32]


def test_compaction_never_drops_current_batch_files(tmp_path):
    """Crash-recovery invariant: every file FIRST read in a batch must
    survive in that batch's end offset, because readBetweenOffsets over
    end.files is how Spark replays the batch after a crash before
    commit. A backfill of many old files (all older than the lateness
    cut) must therefore replay completely, however aggressive the
    compaction settings."""
    import os

    from fhir_to_lakehouse_spark.sources.fhir_datasource import (
        FhirBundleStreamReader,
    )

    src = tmp_path / "landing"
    src.mkdir()
    t0 = 1_700_000_000
    for i in range(10):
        f = src / f"f{i:03d}.ndjson"
        f.write_text(put_bundle("Patient", f"p{i}", active=True) + "\n")
        os.utime(f, (t0 + 100 * i, t0 + 100 * i))
    reader = FhirBundleStreamReader(
        {"path": str(src), "compactThreshold": "4", "latenessMargin": "5"}
    )
    start = reader.initialOffset()
    rows, end = reader.read(start)
    assert len(list(rows)) == 10
    # the uncommitted batch's replay must see every row
    replay = list(reader.readBetweenOffsets(start, end))
    assert len(replay) == 10
    # compaction may only advance once these files are in the tracked
    # prefix of a LATER batch
    _, end2 = reader.read(end)
    assert len(end2["files"]) <= 4
