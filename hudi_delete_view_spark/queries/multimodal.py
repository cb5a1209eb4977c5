"""Multimodal-column queries (B12): binary payload metadata (oracled) and
the Arrow-batched feature-extraction plumbing (rows-only; decode stubbed —
no codecs in this container)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_fake_media, extract_features, frame_sample_plan
from ._tables import _t
from . import query

_MEDIA_TYPE_SQL = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"


@query(
    "mm_media_metadata",
    oracle=f"""
SELECT doc_id AS media_id,
  {_MEDIA_TYPE_SQL} AS media_type,
  octet_length(encode(text)) AS byte_len,
  sha256(text) AS sha256
FROM documents
""",
)
def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed binary columns + metadata extracted without decoding —
    byte length and content hash straight off the payload column."""
    docs = _t(spark, sf_dir, "documents")
    return attach_fake_media(docs, "doc_id", "text").drop("payload")


@query("mm_extract_features")  # mapInPandas path: rows-only driver check
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas (decode itself
    is a deterministic stub — see operators/multimodal.py)."""
    docs = _t(spark, sf_dir, "documents").filter("doc_id < 100")
    media = attach_fake_media(docs, "doc_id", "text")
    feats = extract_features(media, strict=False)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.round(F.expr("aggregate(transform(feature, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v)"), 6).alias("feature_sum"),
    )


@query(
    "mm_frame_plan",
    oracle=f"""
SELECT doc_id AS media_id,
  FLOOR(GREATEST(octet_length(encode(text)) - 1, 0) / 10) + 1 AS n_samples
FROM documents WHERE {_MEDIA_TYPE_SQL} = 'video'
""",
)
def mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only frame-sampling plan for the video subset."""
    docs = _t(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "doc_id", "text")
    return frame_sample_plan(media, every_n=10).select("media_id", "n_samples")
