"""Multimodal column plumbing.

Images/audio/video ride through the pipeline as opaque ``binary`` columns
with typed metadata. The Spark-side plumbing (schema, Arrow batch shape,
partitioning, UDF signatures) is real and tested; the actual media decode is
STUBBED — the decode libraries are not in this environment — behind
:func:`decode_media`, which raises ``NotImplementedError`` unless the
deterministic fake decoder is requested (used by tests and the oracle).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA_FIELDS = [
    StructField("media_type", StringType()),   # image | audio | video
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
    StructField("payload_sha", StringType()),
]


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Treat the utf-8 bytes of `text` as an opaque media payload (the
    synthetic stand-in for real image/audio bytes) + typed metadata."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.octet_length("text").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload into a feature array.

    Real decoding (PIL/ffmpeg/torchaudio) is unavailable in this container —
    STUB. The deterministic fake derives 4 float features from the payload
    md5 so the downstream plumbing (batching, schema, joins) is exercised
    end-to-end with stable values.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint16).astype(np.float32) / 65535.0


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction — the batch shape a real decoder would
    use (one Arrow batch of payloads in, one batch of fixed-width feature
    vectors out)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(bytes(p), mt, fake=fake_decode).tolist()
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pdf[["doc_id", "media_type", "n_bytes", "payload_sha"]].copy()
            out["features"] = feats
            yield out

    return media.mapInPandas(fn, FEATURES_SCHEMA)
