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
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)


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
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
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
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
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
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
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
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    media = MM.documents_as_media(docs)
    resized = MM.resize_images(media, 4, 4)
    return resized.select(
        "media_id",
        "out_w",
        "out_h",
        "src_bytes",
        F.size("pixels").alias("n_pixels"),
    )


def _duck_feature(k: int) -> str:
    """DuckDB expression replicating _fake_decode's k-th feature: the
    k-th little-endian uint32 of sha256(payload), mod 1000, / 1000."""
    pairs = " + ".join(
        f"('0x' || substr(hx, {k * 8 + 1 + 2 * b}, 2))::BIGINT * {256 ** b}"
        for b in range(4)
    )
    return f"ROUND((({pairs}) % 1000) / 1000.0, 6) AS f{k}"


@query(
    "media_features",
    oracle=f"""
    WITH d AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents)
    SELECT media_id, {", ".join(_duck_feature(k) for k in range(8))}
    FROM d
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction with the STUB decoder (deterministic fake —
    see functions/multimodal.py::_fake_decode): media_id + 8-dim float
    vector through the real mapInPandas Arrow path.

    Oracle-checked: the stub derives each feature from the payload's
    sha256 digest (8 little-endian uint32 words, mod 1000, / 1000),
    which DuckDB reproduces from hex-pair arithmetic over sha256(text)
    — the UTF-8 payload bytes equal the text's UTF-8 encoding. A real
    model-feature deployment swaps the stub and drops the oracle back
    to rows-only (documented trade)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    media = MM.documents_as_media(docs)
    feats = MM.extract_features(media)
    return feats.select(
        "media_id",
        # cast BEFORE round: rounding a float32 keeps float32 (0.618
        # stores as 0.617999971); widening first makes round(…, 6)
        # land on the exact 3-decimal value the stub produced
        *[
            F.round(F.element_at("feature", k + 1).cast("double"), 6).alias(
                f"f{k}"
            )
            for k in range(8)
        ],
    )
