"""Multimodal column support (SURVEY §2 B12): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas`` — the one place Python touches row data, batched through
Arrow rather than row-at-a-time.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features, or ``NotImplementedError`` in strict mode)
— but everything Spark-side is real and tested: the binary schema, the
Arrow batch shape, partition-preserving UDF plumbing, and metadata
extraction that doesn't require decoding.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),  # opaque encoded bytes
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic binary payload derived from text (UTF-8 bytes) +
    typed metadata — a stand-in for real encoded media that exercises the
    exact same column types and plumbing."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.lower(F.sha2(payload, 256)).alias("sha256"),
    )


FEATURE_DIM = 8
_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake 'decoder': sha256-seeded feature vector.

    REAL DECODE IS STUBBED — in production this is where PIL/librosa/ffmpeg
    would run (per Arrow batch, vectorized); the container has no codecs.
    """
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media_df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    ``strict=True`` raises ``NotImplementedError`` — the honest mode that
    marks real decoding as unavailable in this environment.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "media decoding requires image/audio codecs not present in "
                "this container; use strict=False for deterministic fake features"
            )
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        _fake_decode_features(bytes(p)) for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media_df.mapInPandas(batches, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Metadata-only 'frame sampling' plan: which offsets a video decoder
    would sample, computed without decoding (JVM-side arithmetic over
    byte_len as a duration stand-in)."""
    offsets = F.expr(f"sequence(0, greatest(byte_len - 1, 0), {every_n})")
    return media_df.filter(F.col("media_type") == "video").select(
        "media_id",
        offsets.alias("sample_offsets"),
        F.size(offsets).cast("long").alias("n_samples"),
    )
