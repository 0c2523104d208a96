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
    # explicit little-endian: the DuckDB oracle for media_features does
    # LE hex-pair arithmetic, so native byte order would break on BE hosts
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
    return (raw % 1000).astype(np.float32) / 1000.0


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("src_bytes", T.LongType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Image resize plumbing via mapInPandas.

    STUB decode (no codec libs): the payload bytes stand in for the
    pixel buffer; 'resize' is a deterministic area-average downsample
    of the byte stream reshaped to out_h×out_w. A real deployment
    swaps the inner numpy block for PIL.Image.resize — the Arrow batch
    shape, schema and partitioning stay identical.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
                cells = np.array_split(buf, out_w * out_h) if len(buf) else []
                pixels = [float(c.mean()) if len(c) else 0.0 for c in cells]
                pixels += [0.0] * (out_w * out_h - len(pixels))
                out_rows.append((media_id, out_w, out_h, len(buf), pixels))
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "out_w", "out_h", "src_bytes", "pixels"],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_k: int = 4
) -> DataFrame:
    """Video frame-sampling plumbing: the payload is treated as a
    concatenation of fixed-size frames; emit every k-th frame as its
    own row (1:N explode through mapInPandas — output rows ≠ input
    rows, which plain pandas_udf can't express). Real codecs replace
    the byte-slicing with pyav/ffmpeg iteration."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, every_k):
                    rows.append(
                        (
                            media_id,
                            i,
                            payload[i * frame_bytes : (i + 1) * frame_bytes],
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


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
