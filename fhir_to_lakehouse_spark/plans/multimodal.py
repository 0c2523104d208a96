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
