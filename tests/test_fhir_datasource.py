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
    assert {r["offset"] for r in rows} == {0, 1}
    assert all(r["topic"] == "fhir.file" for r in rows)
    # per-file stable partition ids; two files -> two ids
    assert len({r["partition"] for r in rows}) == 2


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
