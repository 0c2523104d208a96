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
