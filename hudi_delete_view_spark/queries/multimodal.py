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


_EXTRACT_FEATURES_SQL = """
WITH ids AS (SELECT doc_id AS m FROM documents WHERE doc_id < 100),
-- audio (m % 3 = 1): integer-exact PCM aggregates -> fixed IEEE chains
ap AS (
  SELECT m, 64 + m % 64 AS n,
    list_transform(generate_series(0, 63 + m % 64),
                   i -> ((m*31 + i*997) % 20001) - 10000) AS s
  FROM ids WHERE m % 3 = 1
),
aagg AS (
  SELECT m, n, s,
    greatest(list_max(list_transform(s, x -> abs(x))), 1) AS peak,
    list_sum(list_transform(s, x -> x*x)) AS ssq,
    list_sum(s) AS ssum,
    n // 3 + CASE WHEN n % 3 >= 1 THEN 1 ELSE 0 END AS l1,
    n // 3 + CASE WHEN n % 3 >= 2 THEN 1 ELSE 0 END AS l2,
    n // 3 AS l3
  FROM ap
),
at AS (
  SELECT *,
    list_slice(s, 1, l1) AS s1, list_slice(s, l1+1, l1+l2) AS s2,
    list_slice(s, l1+l2+1, n) AS s3,
    list_transform(s, x -> CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END) AS sg
  FROM aagg
),
audio AS (
  SELECT m AS media_id, 'audio' AS media_type, 'wav' AS fmt,
    CAST(44 + 2*n AS BIGINT) AS n_bytes,
    CAST(n AS DOUBLE)/8000
    + sqrt((CAST(ssq AS DOUBLE)/CAST(peak*peak AS DOUBLE))/n)
    + (CAST(ssum AS DOUBLE)/peak)/n
    + CAST(list_sum(list_transform(generate_series(2, n),
        i -> CASE WHEN sg[i] != sg[i-1] THEN 1 ELSE 0 END)) AS DOUBLE)/(n-1)
    + sqrt((CAST(list_sum(list_transform(s1, x->x*x)) AS DOUBLE)/CAST(peak*peak AS DOUBLE))/l1)
    + sqrt((CAST(list_sum(list_transform(s2, x->x*x)) AS DOUBLE)/CAST(peak*peak AS DOUBLE))/l2)
    + sqrt((CAST(list_sum(list_transform(s3, x->x*x)) AS DOUBLE)/CAST(peak*peak AS DOUBLE))/l3)
    + CAST(peak AS DOUBLE) AS fsum
  FROM at
),
-- image (m % 3 = 0): per-channel exact sums; std via E[x^2] - E[x]^2
ipx AS (
  SELECT m, 8 + m % 8 AS w, 6 + m % 6 AS h, k.c AS c,
    flatten(list_transform(generate_series(0, 5 + m % 6), y ->
      list_transform(generate_series(0, 7 + m % 8), x -> (m + x*k.k + y*(k.k+1)) % 256))) AS v
  FROM ids CROSS JOIN (VALUES (0, 3), (1, 5), (2, 7)) AS k(c, k)
  WHERE m % 3 = 0
),
iagg AS (
  SELECT m, w, h, c, list_sum(v) AS s,
    list_sum(list_transform(v, q -> q*q)) AS ssq, len(v) AS n
  FROM ipx GROUP BY ALL
),
ich AS (
  SELECT m, w, h,
    SUM(CASE WHEN c = 0 THEN (CAST(s AS DOUBLE)/n)/255.0 END) AS m0,
    SUM(CASE WHEN c = 1 THEN (CAST(s AS DOUBLE)/n)/255.0 END) AS m1,
    SUM(CASE WHEN c = 2 THEN (CAST(s AS DOUBLE)/n)/255.0 END) AS m2,
    SUM(CASE WHEN c = 0 THEN sqrt(CAST(ssq AS DOUBLE)/n - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))/255.0 END) AS d0,
    SUM(CASE WHEN c = 1 THEN sqrt(CAST(ssq AS DOUBLE)/n - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))/255.0 END) AS d1,
    SUM(CASE WHEN c = 2 THEN sqrt(CAST(ssq AS DOUBLE)/n - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))/255.0 END) AS d2,
    (CAST(SUM(s) AS DOUBLE)/SUM(n))/255.0 AS mall
  FROM iagg GROUP BY m, w, h
),
image AS (
  SELECT m AS media_id, 'image' AS media_type, 'ppm' AS fmt,
    CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3*w*h AS BIGINT) AS n_bytes,
    m0 + m1 + m2 + d0 + d1 + d2 + mall + CAST(w AS DOUBLE)/h AS fsum
  FROM ich
),
-- video (m % 3 = 2): sha-seeded fake features, seed = hex(payload)
video AS (
  SELECT m AS media_id, 'video' AS media_type, 'unknown' AS fmt,
    CAST(41 AS BIGINT) AS n_bytes,
    CAST(CONCAT('0x', substring(h2, 1, 8)) AS BIGINT) / 4294967296.0 + CAST(CONCAT('0x', substring(h2, 9, 8)) AS BIGINT) / 4294967296.0 + CAST(CONCAT('0x', substring(h2, 17, 8)) AS BIGINT) / 4294967296.0 + CAST(CONCAT('0x', substring(h2, 25, 8)) AS BIGINT) / 4294967296.0 + CAST(CONCAT('0x', substring(h2, 33, 8)) AS BIGINT) / 4294967296.0 + CAST(CONCAT('0x', substring(h2, 41, 8)) AS BIGINT) / 4294967296.0 + CAST(CONCAT('0x', substring(h2, 49, 8)) AS BIGINT) / 4294967296.0 + CAST(CONCAT('0x', substring(h2, 57, 8)) AS BIGINT) / 4294967296.0 AS fsum
  FROM (SELECT m, sha256(lower(hex(CAST('FAKEVIDEO' AS BLOB)
        || unhex(sha256(CAST(m AS VARCHAR)))))) AS h2
        FROM ids WHERE m % 3 = 2)
)
SELECT media_id, media_type, fmt, n_bytes, ROUND(fsum, 6) AS feature_sum
FROM (SELECT * FROM audio UNION ALL SELECT * FROM image UNION ALL SELECT * FROM video)
"""


@query("mm_extract_features", late=True, oracle=_EXTRACT_FEATURES_SQL)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas: WAV and PPM
    payloads decode for REAL (raw PCM / RGB features); the video payloads
    take the documented fake-feature fallback (fmt='unknown'). Fully
    hash-verified since round 4: every feature accumulation is
    integer-exact with fixed IEEE chains (the oracle contract in
    operators/multimodal.py), so the DuckDB mirror regenerates the
    synthetic payloads' sample/pixel streams in SQL and reproduces each
    branch's feature sum bit-for-bit."""
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
  array_to_string(list_transform(generate_series(0, (n - 32) // 16),
                                 i -> CAST(i * 16 AS BIGINT)), ',')
    AS window_offsets
FROM a
""",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing plan from decoded WAV headers (window 32 samples,
    hop 16): the planning pass that lets the expensive decode run only on
    the windows a downstream extractor needs. Offsets serialize to a CSV
    string in the query output (raw array columns break generic
    sort-then-hash harnesses — the r07 driver err class)."""
    from ..operators.multimodal import audio_window_plan

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 200")
    decoded = extract_features(attach_synthetic_media(docs, "doc_id")).withColumn(
        "duration_s", F.element_at("feature", 1).cast("double")
    )
    out = audio_window_plan(decoded, window=32, hop=16)
    return out.withColumn(
        "window_offsets",
        F.concat_ws(",", F.col("window_offsets").cast("array<string>")),
    )
