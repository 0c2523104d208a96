"""Multimodal-column queries: binary payloads + typed metadata, decode /
feature-extract through the Arrow (mapInPandas) plumbing.

The payload here is UTF-8 document text standing in for image/audio
bytes (no codec libs in the container — functions/multimodal.py marks
the decode stub); the Spark-side schema, batch shape and partitioning
are the real thing, and the checksum path is oracle-checked end to end
through mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions import multimodal as MM
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           'application/octet-stream'                 AS mime,
           CAST(n_chars % 1024 AS INT)                AS width,
           CAST(n_chars % 768 AS INT)                 AS height
    FROM documents
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary columns (struct access on the
    media schema; byte length is computed on the binary payload)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    return media.select(
        "media_id",
        F.length("payload").cast("long").alias("payload_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@query(
    "media_checksums",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text)                               AS sha256
    FROM documents
    """,
)
def media_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode plumbing, oracle-checked: payload bytes flow
    through Arrow into Python (mapInPandas), sha256 computed per row in
    the batch loop — proving the batch shape and binary fidelity."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    return MM.extract_features(media).select("media_id", "n_bytes", "sha256")


@query(
    "media_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
      FROM documents
    ), idx AS (
      SELECT media_id, unnest(range(0, CAST(n_bytes // 64 AS BIGINT), 4)) AS frame_idx
      FROM m
    )
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(64 AS INT) AS frame_len
    FROM idx
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video plumbing): payload split into 64-byte
    'frames', every 4th emitted as a row — a 1:N mapInPandas explode.
    The oracle derives the expected (media_id, frame_idx) set from byte
    lengths; frame content is covered by the determinism test."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    frames = MM.sample_frames(media, frame_bytes=64, every_k=4)
    return frames.select(
        "media_id", "frame_idx", F.length("frame").cast("int").alias("frame_len")
    )


@query(
    "media_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(4 AS INT)  AS out_w,
           CAST(4 AS INT)  AS out_h,
           CAST(octet_length(encode(text)) AS BIGINT) AS src_bytes,
           CAST(16 AS INT) AS n_pixels
    FROM documents
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (STUB decode — deterministic byte-buffer
    downsample standing in for PIL resize): 4x4 'thumbnail' per media
    row, flowing through the real mapInPandas Arrow path. The oracle
    checks the full row shape (id, dims, source byte count threaded
    through the UDF, pixel-buffer length); pixel VALUES are covered by
    the determinism test in tests/test_extensions.py."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    resized = MM.resize_images(media, 4, 4)
    return resized.select(
        "media_id",
        "out_w",
        "out_h",
        "src_bytes",
        F.size("pixels").alias("n_pixels"),
    )


@query("media_features")
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction with the STUB decoder (deterministic fake —
    see functions/multimodal.py::_fake_decode): media_id + 8-dim float
    vector. Rows-only check; determinism asserted in pytest."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.documents_as_media(docs)
    feats = MM.extract_features(media)
    return feats.select(
        "media_id", F.round(F.element_at("feature", 1), 6).alias("f0"), "feature"
    )
