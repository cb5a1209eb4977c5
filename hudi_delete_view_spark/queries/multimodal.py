"""Multimodal-column queries (B12): binary payload metadata (oracled),
REAL codec-free decode of WAV/PPM payloads (header fields oracled — they
are deterministic functions of the id), and the Arrow-batched
feature-extraction plumbing. Only formats that need absent codecs
(JPEG/MP3/MP4) take the documented fake-feature fallback."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_fake_media,
    attach_synthetic_media,
    extract_features,
    frame_sample_plan,
)
from ._tables import _t
from . import query

_MEDIA_TYPE_SQL = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"


@query(
    "mm_media_metadata",
    late=True,  # typed-metadata sibling of the windowed mm_decode_headers
    # (both green r02); slot rebudgeted to the curation stage
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


@query("mm_extract_features", late=True)  # rows-only; decode pytest-verified on hand-built payloads
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas: WAV and PPM
    payloads decode for REAL (raw PCM / RGB features); the video payloads
    take the documented fake-feature fallback (fmt='unknown')."""
    docs = _t(spark, sf_dir, "documents").filter("doc_id < 100")
    media = attach_synthetic_media(docs, "doc_id")
    feats = extract_features(media, strict=False)
    return feats.select(
        "media_id",
        "media_type",
        "fmt",
        "n_bytes",
        F.round(F.expr("aggregate(transform(feature, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v)"), 6).alias("feature_sum"),
    )


@query(
    "mm_decode_headers",
    # WAV/PPM header fields parsed from the real payload bytes; the
    # synthesizer derives them deterministically from the id, so the parse
    # result is SQL-predictable: audio (id%3=1) -> 8 kHz 16-bit mono WAV;
    # image (id%3=0) -> PPM with width 8+(id%8), height 6+(id%6); video ->
    # opaque bytes, fmt='unknown'. Duration = n_samples/rate, n = 64+id%64.
    oracle="""
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 1 THEN 'wav' WHEN 0 THEN 'ppm' ELSE 'unknown' END AS fmt,
  CASE WHEN doc_id % 3 = 1 THEN 8000 END AS sample_rate,
  CASE WHEN doc_id % 3 = 1 THEN 1 END AS channels,
  CASE WHEN doc_id % 3 = 1 THEN 16 END AS bit_depth,
  CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 8 END AS width,
  CASE WHEN doc_id % 3 = 0 THEN 6 + doc_id % 6 END AS height,
  CASE WHEN doc_id % 3 = 1 THEN ROUND((64 + doc_id % 64) / 8000.0, 6) END AS duration_s
FROM documents WHERE doc_id < 200
""",
)
def mm_decode_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header metadata decoded from real WAV/PPM bytes, checked field-by-
    field against the closed-form oracle."""
    docs = _t(spark, sf_dir, "documents").filter("doc_id < 200")
    feats = extract_features(attach_synthetic_media(docs, "doc_id"))
    return feats.select(
        "media_id",
        "fmt",
        "sample_rate",
        "channels",
        "bit_depth",
        "width",
        "height",
        F.when(
            F.col("fmt") == "wav",
            F.round(F.element_at("feature", 1).cast("double"), 6),
        ).alias("duration_s"),
    )


@query(
    "mm_frame_plan",
    # CAST to BIGINT: DuckDB FLOOR yields DOUBLE while the Spark side emits
    # long — dtype-level divergence the driver's hash is sensitive to
    oracle=f"""
SELECT doc_id AS media_id,
  CAST(FLOOR(GREATEST(octet_length(encode(text)) - 1, 0) / 10) + 1 AS BIGINT) AS n_samples
FROM documents WHERE {_MEDIA_TYPE_SQL} = 'video'
""",
)
def mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only frame-sampling plan for the video subset."""
    docs = _t(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "doc_id", "text")
    return frame_sample_plan(media, every_n=10).select("media_id", "n_samples")


@query(
    "mm_audio_windows",
    late=True,  # planning sibling of the windowed mm_frame_plan
    # closed-form oracle: audio ids (doc_id % 3 = 1) synthesize to 8 kHz
    # WAVs with n = 64 + doc_id % 64 samples; window 32, hop 16 ->
    # n_windows = floor((n - 32) / 16) + 1 (n >= 64 >= window always here)
    oracle="""
WITH a AS (
  SELECT doc_id AS media_id, 64 + doc_id % 64 AS n
  FROM documents WHERE doc_id < 200 AND doc_id % 3 = 1
)
SELECT media_id, CAST(n AS BIGINT) AS n_samples,
  CAST((n - 32) // 16 + 1 AS BIGINT) AS n_windows,
  list_transform(generate_series(0, (n - 32) // 16), i -> CAST(i * 16 AS BIGINT))
    AS window_offsets
FROM a
""",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing plan from decoded WAV headers (window 32 samples,
    hop 16): the planning pass that lets the expensive decode run only on
    the windows a downstream extractor needs."""
    from ..operators.multimodal import audio_window_plan

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 200")
    decoded = extract_features(attach_synthetic_media(docs, "doc_id")).withColumn(
        "duration_s", F.element_at("feature", 1).cast("double")
    )
    return audio_window_plan(decoded, window=32, hop=16)
