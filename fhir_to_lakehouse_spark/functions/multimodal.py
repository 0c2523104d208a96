"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub — but everything Spark-side is real
and tested: the binary column schema, the metadata struct, the Arrow
batch shape through mapInPandas, and the partitioning of feature
extraction. Swapping ``_fake_decode`` for PIL/librosa is a one-function
change that leaves every plan identical.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: payload = UTF-8
    bytes of the text (stands in for image bytes), metadata derived
    deterministically. Column shapes match MEDIA_SCHEMA."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 1024).cast("int").alias("width"),
            (F.col("n_chars") % 768).cast("int").alias("height"),
            F.col("n_chars").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB decoder (no codec libs in container): a real deployment
    replaces this with PIL.Image.open / soundfile.read + model features.
    Deterministic: derive `dim` floats from the sha256 of the payload.
    """
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow ships the binary column in columnar batches; each batch is
    decoded in Python (the only place Python touches data), output is a
    fixed-width float vector per row. At scale this is
    embarrassingly parallel: no shuffle, partition count = scan tasks.
    """

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": payloads.map(lambda b: _fake_decode(b, dim).tolist()),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )
