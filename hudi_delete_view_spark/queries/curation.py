"""Corpus-curation queries (decontamination / packing / mixture sampling)
over ``documents`` — the post-dedup stages of a pretraining data pipeline,
each mirrored exactly in DuckDB SQL.

The benchmark/test split is synthetic but deterministic: every 17th doc
(``doc_id % 17 = 0``) plays the held-out benchmark suite, the rest are the
training corpus.  That keeps the oracle self-contained on the one
``documents`` table while exercising the real plan shapes (broadcast gram
join, per-shard packing window, rate-quantized sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._tables import _t
from . import query

# DuckDB mirrors of the Spark-side expressions --------------------------------
_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"
# 60-bit md5 prefix — identical to Spark's conv(substring(md5(..),1,15),16,10)
_H = "CAST(CONCAT('0x', substring(md5({0}), 1, 15)) AS BIGINT)"

_GRAM8 = _H.format("array_to_string(list_slice(t, i, i + 7), ' ')")

_DECON_CTES = f"""toks AS (
  SELECT doc_id, source, n_chars, {_TOKS} AS t FROM documents
),
grams AS (
  SELECT doc_id, source, n_chars,
    list_transform(generate_series(1, greatest(len(t) - 7, 0)),
                   i -> {_GRAM8}) AS g
  FROM toks
),
test_grams AS (
  SELECT DISTINCT unnest(g) AS gh FROM grams WHERE doc_id % 17 = 0
),
contaminated AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % 17 != 0
    AND EXISTS (SELECT 1 FROM test_grams tg
                WHERE list_contains(grams.g, tg.gh))
)"""


@query(
    "curate_decontaminate",
    oracle=f"""
WITH {_DECON_CTES}
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id % 17 != 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
""",
)
def curate_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 recipe): drop training docs that
    share any 8-token n-gram with the held-out set (doc_id % 17 = 0).
    Test-side grams broadcast; the corpus side never shuffles."""
    from ..operators.curation import decontaminate

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 17 != 0)
    test = docs.filter(F.col("doc_id") % 17 == 0)
    clean, _ = decontaminate(train, test, n=8)
    return clean.select("doc_id", "source", "n_chars")


@query(
    "curate_contamination_report",
    late=True,  # diagnostic inverse of curate_decontaminate (windowed)
    oracle=f"""
WITH {_DECON_CTES}
SELECT c.doc_id, d.source, d.n_chars
FROM contaminated c JOIN documents d USING (doc_id)
""",
)
def curate_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dropped side of the decontamination pass: which training docs
    collided with the benchmark suite (audit trail a real pipeline keeps)."""
    from ..operators.curation import decontaminate

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 17 != 0)
    test = docs.filter(F.col("doc_id") % 17 == 0)
    _, hit_ids = decontaminate(train, test, n=8)
    return hit_ids.join(docs, "doc_id").select("doc_id", "source", "n_chars")


@query(
    "curate_pack_sequences",
    oracle=f"""
WITH n AS (
  SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents
),
packed AS (
  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS start_offset
  FROM n
  WINDOW w AS (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, source, n_tokens, start_offset,
  CAST(FLOOR(start_offset / 512.0) AS BIGINT) AS first_chunk,
  CAST(CASE WHEN n_tokens > 0
       THEN FLOOR((start_offset + n_tokens - 1) / 512.0)
       ELSE FLOOR(start_offset / 512.0) END AS BIGINT) AS last_chunk,
  CAST(CASE WHEN n_tokens > 0
       THEN FLOOR((start_offset + n_tokens - 1) / 512.0)
            - FLOOR(start_offset / 512.0) + 1
       ELSE 0 END AS BIGINT) AS n_chunks
FROM packed
""",
)
def curate_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation-packing plan at context_len=512: per-source shards,
    docs laid end-to-end in doc_id order, window indices each doc spans.
    One shuffle (shard partition), one window pass."""
    from ..operators.curation import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, context_len=512).select(
        "doc_id", "source", "n_tokens", "start_offset",
        "first_chunk", "last_chunk", "n_chunks",
    )


@query(
    "curate_contamination_provenance",
    late=True,  # audit companion of the windowed curate_decontaminate
    oracle=f"""
WITH {_DECON_CTES},
tg AS (
  SELECT DISTINCT doc_id AS test_id, unnest(g) AS gh
  FROM grams WHERE doc_id % 17 = 0
),
trg AS (
  SELECT DISTINCT doc_id AS train_id, unnest(g) AS gh
  FROM grams WHERE doc_id % 17 != 0
)
SELECT trg.train_id, tg.test_id, COUNT(*) AS n_shared_grams
FROM trg JOIN tg USING (gh)
GROUP BY trg.train_id, tg.test_id
""",
)
def curate_contamination_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination audit trail: (train doc, benchmark doc, shared-gram
    count) pairs — which held-out doc each dropped training doc leaks."""
    from ..operators.curation import contamination_provenance

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 17 != 0)
    test = docs.filter(F.col("doc_id") % 17 == 0)
    return contamination_provenance(train, test, n=8)


@query(
    "curate_chunk_manifest",
    late=True,  # packing family already windowed via curate_pack_sequences
    oracle="""
WITH n AS (
  SELECT doc_id, source,
    len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER w - n_tokens AS start_offset
  FROM n
  WINDOW w AS (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
seg AS (
  SELECT source, doc_id, start_offset, n_tokens,
    unnest(generate_series(CAST(FLOOR(start_offset / 512.0) AS BIGINT),
                           CAST(FLOOR((start_offset + n_tokens - 1) / 512.0) AS BIGINT))) AS chunk
  FROM packed WHERE n_tokens > 0
)
SELECT source, CAST(chunk AS BIGINT) AS chunk, doc_id,
  CAST(GREATEST(start_offset, chunk * 512) - start_offset AS BIGINT) AS doc_tok_from,
  CAST(LEAST(start_offset + n_tokens, (chunk + 1) * 512) - start_offset AS BIGINT) AS doc_tok_to,
  CAST(LEAST(start_offset + n_tokens, (chunk + 1) * 512)
       - GREATEST(start_offset, chunk * 512) AS BIGINT) AS n_span_tokens
FROM seg
""",
)
def curate_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(chunk, doc-segment) manifest at context_len=512 — what a data
    loader consumes to fill each training window."""
    from ..operators.curation import chunk_manifest

    docs = _t(spark, sf_dir, "documents")
    return chunk_manifest(docs, context_len=512)


@query(
    "curate_shuffle_shards",
    oracle="""
WITH h AS (
  SELECT doc_id, source,
    CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM documents
)
SELECT doc_id, source,
  CAST(hv % 8 AS INT) AS shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos
FROM h
""",
)
def curate_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards (hash -> shard,
    hash-order within shard): one window shuffle, reshuffle-stable."""
    from ..operators.curation import shuffle_shards

    docs = _t(spark, sf_dir, "documents")
    return shuffle_shards(docs, n_shards=8).select("doc_id", "source", "shard", "pos")


# target mixture: sources get weight (i % 4 + 1), normalized — a skewed but
# deterministic target that exercises both clamped and fractional rates
_MIX_WEIGHTS = {f"src{i}": float(i % 4 + 1) for i in range(20)}
_MIX_ROWS = ", ".join(f"('{s}', CAST({w} AS DOUBLE))" for s, w in sorted(_MIX_WEIGHTS.items()))


@query(
    "curate_mixture_sample",
    oracle=f"""
WITH w AS (SELECT * FROM (VALUES {_MIX_ROWS}) AS t(source, wt)),
stats AS (
  SELECT d.source, COUNT(*) AS n, ANY_VALUE(w.wt) AS wt
  FROM documents d JOIN w USING (source) GROUP BY d.source
),
rates AS (
  SELECT source,
    CASE WHEN n / wt = (SELECT MIN(n / wt) FROM stats) THEN 1.0
         ELSE FLOOR(wt * (SELECT MIN(n / wt) FROM stats) / n * 1000000.0) / 1000000.0
    END AS rate
  FROM stats
)
SELECT d.doc_id, d.source, d.lang, d.n_chars
FROM documents d JOIN rates r USING (source)
WHERE CAST(CONCAT('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 < r.rate
""",
)
def curate_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture sampling toward skewed target weights
    (w_i ∝ i%4+1): per-source keep-rates from a 20-row broadcast aggregate,
    keep decision a pure hash of doc_id — reshuffle-stable, no RNG."""
    from ..operators.curation import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    return mixture_sample(docs, _MIX_WEIGHTS).select(
        "doc_id", "source", "lang", "n_chars"
    )


@query(
    "curate_length_histogram",
    late=True,  # planning diagnostic; the packing path itself is windowed
    oracle="""
WITH t AS (
  SELECT source,
    len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS n
  FROM documents
)
SELECT source,
  CAST(CASE WHEN n >= 128 THEN 128 ELSE (n // 16) * 16 END AS BIGINT) AS bucket_lo,
  COUNT(*) AS n_docs,
  CAST(SUM(n) AS BIGINT) AS total_tokens
FROM t GROUP BY source, bucket_lo
""",
)
def curate_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram per source (16-token buckets, clamped at
    128+): the planning input for packing/truncation budgets — one
    partial-agged groupBy over a narrow projection, no Python, no joins."""
    from ..operators.text import token_count

    docs = _t(spark, sf_dir, "documents")
    n = token_count("text")
    bucket = F.when(n >= 128, F.lit(128)).otherwise((n / 16).cast("long") * 16)
    return (
        docs.select("source", n.alias("__n"), bucket.cast("long").alias("bucket_lo"))
        .groupBy("source", "bucket_lo")
        .agg(F.count("*").alias("n_docs"), F.sum("__n").cast("long").alias("total_tokens"))
    )


@query(
    "curate_split_assignment",
    late=True,  # split semantics verified per-row; family windowed via 4 slots
    oracle="""
WITH f AS (
  SELECT doc_id, source,
    CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 AS fr
  FROM documents
)
SELECT doc_id, source,
  CASE WHEN fr < 0.9 THEN 'train' WHEN fr < 0.95 THEN 'val' ELSE 'test' END AS split
FROM f
""",
)
def curate_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5): cumulative
    half-open md5-fraction intervals — disjoint, exhaustive,
    reshuffle-stable, no RNG (operators/curation.py ``assign_split``)."""
    from ..operators.curation import assign_split

    docs = _t(spark, sf_dir, "documents")
    return assign_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "source", "split")


def _training_corpus_sql() -> str:
    """The full training-corpus pipeline as ONE DuckDB query: quality
    cascade -> MinHash near-dup removal (funnel over the quality-passed
    pool) -> benchmark decontamination -> deterministic split -> per
    (split, source) counts. Every stage reuses the exact CTE mirror its
    standalone query is verified by."""
    from .dedup import _minhash_funnel_ctes
    from .text import _TOKS, QF_PASS_SQL

    # the SAME rule set (including the repetition rule) the standalone
    # text_quality_filter oracle verifies — one source of truth
    quality = QF_PASS_SQL
    return f"""
WITH dq AS (
  SELECT * FROM documents WHERE doc_id % 17 != 0 AND {quality}
),
{_minhash_funnel_ctes(min_collisions=2, source_sql="dq")},
dd AS (
  SELECT * FROM dq WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM verified)
),
dtoks AS (SELECT doc_id, source, {_TOKS} AS t FROM dd),
dgrams AS (
  SELECT doc_id, source, len(t) AS n_toks,
    list_transform(generate_series(1, greatest(len(t) - 7, 0)),
      i -> {_GRAM8}) AS g
  FROM dtoks
),
tg AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
      i -> {_GRAM8})) AS gh
  FROM (SELECT {_TOKS} AS t FROM documents WHERE doc_id % 17 = 0)
),
clean AS (
  SELECT doc_id, source, n_toks FROM dgrams
  WHERE NOT EXISTS (SELECT 1 FROM tg WHERE list_contains(dgrams.g, tg.gh))
),
assigned AS (
  SELECT source, n_toks,
    CASE WHEN fr < 0.9 THEN 'train' WHEN fr < 0.95 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT *, CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        / 4294967296.0 AS fr FROM clean)
)
SELECT split, source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS total_tokens
FROM assigned GROUP BY split, source
"""


@query("pipeline_training_corpus", oracle=_training_corpus_sql())
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline, hash-verified end to end in ONE
    query: Gopher/C4 quality cascade -> MinHash-LSH near-dup removal over
    the quality-passed pool -> benchmark decontamination (8-token grams
    vs the held-out set) -> deterministic train/val/test split -> per
    (split, source) doc/token budgets. Four operator families composed;
    each stage is the same code path its standalone windowed query
    verifies, so a hash match here proves the COMPOSITION, not just the
    parts."""
    from ..operators.curation import assign_split, decontaminate
    from ..operators.dedup import minhash_dedup
    from ..operators.text import quality_filter_flags, token_count

    docs = _t(spark, sf_dir, "documents")
    test = docs.filter(F.col("doc_id") % 17 == 0)
    pool = docs.filter(F.col("doc_id") % 17 != 0)
    qpool = quality_filter_flags(pool, "text").filter("qf_pass").select(*docs.columns)
    dd = minhash_dedup(qpool, "doc_id", "text", threshold=0.8)
    clean, _ = decontaminate(dd, test, n=8)
    out = assign_split(clean, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    return (
        out.withColumn("__nt", token_count("text"))
        .groupBy("split", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("__nt").cast("long").alias("total_tokens"))
    )


@query(
    "curate_domain_cap",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
SELECT doc_id, source, n_chars FROM ranked WHERE rk <= 10
""",
)
def curate_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (C4/RefinedWeb over-representation guard): each
    source contributes at most its 10 longest documents (n_chars desc,
    doc_id tiebreak — deterministic survivors). One rank window hashed
    on source; Spark's WindowGroupLimit turns rank <= cap into a
    partition-level top-k, so a hot domain never sorts its full tail."""
    from ..operators.curation import domain_cap

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return domain_cap(docs, "source", cap=10)
