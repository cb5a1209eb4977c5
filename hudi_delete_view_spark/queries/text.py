"""Text-analysis queries (B11) over ``documents`` — every operator mirrored
in DuckDB SQL (same tokenization, same formulas, same rounding)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    char_count,
    fingerprint,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_token_count,
)
from ._tables import _t
from . import query

# SQL mirrors of the operator expressions (DuckDB dialect) ------------------
_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"
_TOKS_L = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
_SW = "['the','a','and','of','to','in','is','it','that','for']"
_N_PUNCT = "length(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))"
_PUNCT_RATIO = f"ROUND(CASE WHEN length(text) > 0 THEN CAST({_N_PUNCT} AS DOUBLE) / length(text) ELSE 0.0 END, 6)"
_SW_RATIO = (
    f"ROUND(CASE WHEN len({_TOKS_L}) > 0 THEN "
    f"CAST(len(list_filter({_TOKS_L}, t -> list_contains({_SW}, t))) AS DOUBLE) / len({_TOKS_L}) "
    f"ELSE 0.0 END, 6)"
)
_MEAN_TOK_LEN = (
    f"ROUND(CASE WHEN len({_TOKS}) > 0 THEN "
    f"CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE) / len({_TOKS}) "
    f"ELSE 0.0 END, 6)"
)
_QUALITY = (
    f"ROUND(0.4 * least(CAST(len({_TOKS}) AS DOUBLE) / 50.0, 1.0) "
    f"+ 0.3 * least({_SW_RATIO} * 4, 1.0) "
    f"+ 0.3 * (1.0 - least({_PUNCT_RATIO} * 5, 1.0)), 6)"
)
_FP = "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))"

_LANG_SW = {
    "de": "['der','die','und','das','ist']",
    "en": "['the','and','of','to','is']",
    "es": "['el','la','de','que','los']",
    "fr": "['le','la','et','les','des']",
}


def _lang_sql() -> str:
    """Chained strict-greater argmax in fixed language order (de,en,es,fr) —
    the exact mirror of operators.text.lang_id."""
    hits = {
        lang: f"len(list_filter({_TOKS_L}, t -> list_contains({arr}, t)))"
        for lang, arr in _LANG_SW.items()
    }
    result, best = "'und'", "0"
    for lang in sorted(_LANG_SW):
        cond = f"{hits[lang]} > {best}"
        result = f"CASE WHEN {cond} THEN '{lang}' ELSE {result} END"
        best = f"CASE WHEN {cond} THEN {hits[lang]} ELSE {best} END"
    return (
        f"CASE WHEN length(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) > 0 "
        f"THEN 'zh' ELSE {result} END"
    )


@query(
    "text_stats",
    oracle=f"""
SELECT doc_id,
  len({_TOKS}) AS n_tokens,
  length(text) AS n_chars_computed,
  length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish,
  {_PUNCT_RATIO} AS punct_ratio,
  {_SW_RATIO} AS stopword_ratio,
  {_MEAN_TOK_LEN} AS mean_token_len,
  {_QUALITY} AS quality
FROM documents
""",
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        char_count("text").alias("n_chars_computed"),
        word_token_count("text").alias("n_bpeish"),
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text").alias("stopword_ratio"),
        mean_token_len("text").alias("mean_token_len"),
        quality_score("text").alias("quality"),
    )


@query(
    "text_lang_id",
    oracle=f"""
SELECT lang, {_lang_sql()} AS lang_pred, COUNT(*) AS n
FROM documents GROUP BY lang, lang_pred
""",
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_fingerprint_groups",
    late=True,  # exact-dup grouping redundant with dedup_exact_docs + text_stats fingerprint
    oracle=f"""
SELECT {_FP} AS fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
FROM documents GROUP BY fingerprint HAVING COUNT(*) >= 1
""",
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@query(
    "text_source_profile",
    late=True,  # per-source profile agg; the text family keeps six windowed
    # rows (stats/lang/fingerprint/tfidf/chunks/pii) — this one funds the
    # round-4 partition-evolution slot and stays in the full local gate
    # avg via an exact integer-micro sum: a plain AVG of doubles depends on
    # summation order (Spark partial aggs vs DuckDB), which round-2 showed
    # can flip the driver's bit-level hash at unlucky seeds
    oracle=f"""
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
  ROUND(CAST(SUM(CAST(ROUND({_QUALITY} * 1000000, 0) AS BIGINT)) AS DOUBLE)
        / COUNT(*) / 1000000.0, 6) AS avg_quality,
  MAX(length(text)) AS max_chars
FROM documents GROUP BY source
""",
)
def text_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile — the group-by rollup a data pipeline
    uses to triage ingestion sources."""
    docs = _t(spark, sf_dir, "documents")
    q_micro = F.round(quality_score("text") * 1000000, 0).cast("long")
    return (
        docs.select("source", token_count("text").alias("__tok"), q_micro.alias("__q6"), F.length("text").alias("__len"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tok").alias("total_tokens"),
            F.round(F.sum("__q6").cast("double") / F.count("*") / 1000000.0, 6).alias("avg_quality"),
            F.max("__len").cast("long").alias("max_chars"),
        )
    )


@query(
    "text_winnowing",
    late=True,  # oracled; window budget holds the newer curation stage
    # exact mirror: same 60-bit md5 rolling 8-gram hashes, same width-4
    # min-window, same distinct count. greatest(.., 1) (not 0) on both
    # sides: sub-length docs keep one clamped partial gram in each engine.
    oracle="""
WITH gh AS (
  SELECT doc_id,
    list_transform(generate_series(1, greatest(length(text) - 7, 1)),
      i -> CAST(CONCAT('0x', substring(md5(substring(text, i, 8)), 1, 15)) AS BIGINT)) AS h
  FROM documents
)
SELECT doc_id,
  CAST(len(list_distinct(
    list_transform(generate_series(1, greatest(len(h) - 3, 1)),
                   w -> list_min(list_slice(h, w, w + 3))))) AS BIGINT) AS n_fingerprints
FROM gh
""",
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets (min rolling k-gram hash per window)."""
    from ..operators.text import gram_hashes, winnowing_from_hashes
    from ..operators.util import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", gram_hashes("text").alias("__gh")).select(
        "doc_id",
        F.size(winnowing_from_hashes("__gh")).cast("long").alias("n_fingerprints"),
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_L}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
    ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
FROM scored QUALIFY rank <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (corpus-level document-frequency
    join, broadcast; per-doc window ranking)."""
    from ..operators.text import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", top_k=3)


_CHUNKS_CTE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 200
),
chunks AS (
  SELECT doc_id,
    CAST(s // 24 AS BIGINT) AS chunk_idx,
    array_to_string(list_slice(t, s + 1, s + 32), ' ') AS chunk_text,
    CAST(least(greatest(len(t) - s, 0), 32) AS BIGINT) AS n_chunk_tokens
  FROM (SELECT doc_id, t, unnest(generate_series(0, greatest(len(t) - 1, 0), 24)) AS s FROM toks)
)
"""


@query(
    "text_chunks",
    # mirror: same tokenization, same stride arithmetic; DuckDB's
    # list_slice is 1-based-inclusive like Spark's slice(start, length)
    # shifted to an end offset
    oracle=_CHUNKS_CTE + "SELECT doc_id, chunk_idx, chunk_text, n_chunk_tokens FROM chunks",
)
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token windows, 8-token
    overlap) — the pre-embedding split of a RAG/training pipeline."""
    from ..operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 200")
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8)


# deterministic synthetic PII, appended so the redactor provably fires on
# every row (the synthetic corpus contains no natural emails/URLs/phones)
_PII_AUG_SPARK = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), "
    "'@example.com via https://site.example/', CAST(doc_id AS STRING), "
    "' or 555-123-4567')"
)
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com via https://site.example/' || CAST(doc_id AS VARCHAR) || "
    "' or 555-123-4567'"
)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^\s]+"
_PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


@query(
    "text_pii_redact",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
SELECT doc_id,
  length(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
  length(regexp_extract_all(t, '{_PII_URL}')) AS n_url,
  length(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(t,
      '{_PII_EMAIL}', '<EMAIL>', 'g'),
      '{_PII_URL}', '<URL>', 'g'),
      '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
FROM aug
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training corpora: count + replace emails/URLs/phone
    numbers with typed placeholders. Patterns restricted to the Java-regex
    intersection with RE2 (no lookaround/backrefs) so the DuckDB oracle
    runs the same expressions; fixed replace order so redactions can't
    re-match each other's output."""
    from ..operators.text import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents").withColumn("__t", F.expr(_PII_AUG_SPARK))
    counts = pii_counts("__t")
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["url"].alias("n_url"),
        counts["phone"].alias("n_phone"),
        redact_pii("__t").alias("redacted"),
    )


@query(
    "docs_stratified_sample",
    late=True,  # md5-fraction sampling family also windowed via curate_mixture_sample
    # language-balanced downsampling: keep every non-English doc, keep a
    # deterministic ~25% of English ones. The sampling key is a pure
    # function of the row (md5 hex prefix compare) — identical on both
    # engines, reshuffle-stable, and resumable at any scale (no RNG state).
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE lang != 'en' OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
""",
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling (downsample the
    over-represented language) — scan-only, no shuffle, no RNG."""
    docs = _t(spark, sf_dir, "documents")
    keep = (F.col("lang") != "en") | (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < "4000"
    )
    return docs.filter(keep).select("doc_id", "lang", "source", "n_chars")


@query(
    "text_repetition",
    late=True,  # oracle-checked locally; driver window is budgeted to 50
    oracle=f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
grams AS (
  SELECT doc_id, t,
    list_transform(generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g
  FROM toks
)
SELECT doc_id,
  CASE WHEN len(t) >= 3
       THEN ROUND(1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / (len(t) - 2), 6)
       ELSE 0.0 END AS rep3_ratio
FROM grams
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicate-3-gram fraction (Gopher-style repetition
    gate). Token array materializes before the gram lambda (HOF
    re-inlining discipline)."""
    from ..operators.text import repetition_ratio_from_tokens, tokens

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tokens("text").alias("__t")).select(
        "doc_id", repetition_ratio_from_tokens("__t").alias("rep3_ratio")
    )


@query(
    "pipeline_chunk_dedup",
    late=True,  # oracle-checked locally; driver window is budgeted to 50
    # chunk -> fingerprint -> cross-document chunk dedup (min (doc_id,
    # chunk_idx) wins) -> per-doc retention stats. The shape every RAG /
    # training-prep pipeline runs to strip shared boilerplate chunks.
    # Shares _CHUNKS_CTE with text_chunks so the chunk arithmetic can
    # never diverge between the two oracles.
    oracle=_CHUNKS_CTE + """
, ranked AS (
  SELECT *, md5(chunk_text) AS fp,
    ROW_NUMBER() OVER (PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
)
SELECT doc_id,
  COUNT(*) AS n_chunks,
  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN rn = 1 THEN n_chunk_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
FROM ranked GROUP BY doc_id
""",
)
def pipeline_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup across documents: identical 32-token windows keep
    one canonical copy corpus-wide (deterministic winner = smallest
    (doc_id, chunk_idx)); per-doc retention stats out. One window shuffle
    on the fingerprint — the md5 is 16 bytes however long the chunk is."""
    from pyspark.sql import Window

    from ..operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 200")
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8)
    w = Window.partitionBy(F.md5("chunk_text")).orderBy("doc_id", "chunk_idx")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    keep = (F.col("rn") == 1).cast("long")
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(keep).alias("n_kept"),
        F.sum(keep * F.col("n_chunk_tokens")).alias("kept_tokens"),
    )


@query(
    "pipeline_corpus_curation",
    late=True,  # superseded in-window by the four-family pipeline_training_corpus
    # The end-to-end training-data curation pass: score -> filter (quality
    # + language) -> fingerprint dedup (keep lowest doc_id) -> per-source
    # token budget. Quality averages go through exact integer micro-units
    # (sum of round(q*1e6) as BIGINT) so both engines aggregate identically
    # regardless of float summation order.
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source, {_QUALITY} AS q, ({_lang_sql()}) AS lang, {_FP} AS fp,
         len({_TOKS}) AS n_toks
  FROM documents
),
kept AS (
  SELECT * FROM scored WHERE q >= 0.5 AND lang = 'en'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
  ROUND(CAST(SUM(CAST(ROUND(q * 1000000, 0) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS avg_quality
FROM kept GROUP BY source
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed LLM-corpus curation pipeline: quality + language gates,
    near-dup normalization via whitespace/case fingerprint dedup, then the
    per-source token budget a sampling stage would consume. One shuffle
    per stage boundary (dedup window on fingerprint, final groupBy);
    everything JVM-side."""
    from ..operators.dedup import exact_dedup
    from ..operators.text import fingerprint, lang_id, quality_score, token_count

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        quality_score("text").alias("q"),
        lang_id("text").alias("lang"),
        fingerprint("text").alias("fp"),
        token_count("text").alias("n_toks"),
    )
    kept = exact_dedup(
        scored.filter((F.col("q") >= 0.5) & (F.col("lang") == "en")),
        keys=["fp"],
        order_by=["doc_id"],
    )
    q_micro = F.round(F.col("q") * 1000000, 0).cast("long")
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.round(
            F.sum(q_micro).cast("double") / F.count("*") / 1000000.0, 6
        ).alias("avg_quality"),
    )


# Quality-filter cascade (Gopher/C4-style) — per-rule flags + verdict.
_QF_SW_HITS = f"len(list_filter({_TOKS_L}, t -> list_contains({_SW}, t)))"
# duplicate 3-gram occurrence fraction (Gopher repetition signal); the
# empty-guard mirrors the Spark side's IF(size < 3, [], ...) contract
_QF_G3 = (
    f"CASE WHEN len({_TOKS}) < 3 THEN CAST([] AS VARCHAR[]) ELSE "
    f"list_transform(generate_series(1, len({_TOKS}) - 2), "
    f"i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' ')) END"
)
_QF_DUP3 = (
    f"ROUND(CASE WHEN len({_QF_G3}) = 0 THEN 0.0 ELSE "
    f"1.0 - CAST(len(list_distinct({_QF_G3})) AS DOUBLE) / len({_QF_G3}) END, 6)"
)
# per-rule SQL, single source of truth: the cascade oracle lists the
# rules individually AND the composed pipeline reuses the same AND
QF_RULES_SQL: dict[str, str] = {
    "r_word_count": f"(len({_TOKS}) >= 20 AND len({_TOKS}) <= 90)",
    "r_mean_word_len": f"({_MEAN_TOK_LEN} >= 3.0 AND {_MEAN_TOK_LEN} <= 4.75)",
    "r_symbol_ratio": f"({_PUNCT_RATIO} <= 0.1)",
    "r_stopwords": f"({_QF_SW_HITS} >= 1)",
    "r_blacklist": "(NOT contains(lower(text), 'lorem ipsum'))",
    "r_repetition": f"({_QF_DUP3} <= 0.3)",
}
QF_PASS_SQL = " AND ".join(QF_RULES_SQL.values())


@query(
    "text_quality_filter",
    oracle=f"""
SELECT doc_id, source,
  len({_TOKS}) AS qf_n_words,
  {_MEAN_TOK_LEN} AS qf_mean_word_len,
  {_PUNCT_RATIO} AS qf_symbol_ratio,
  {_QF_DUP3} AS qf_dup3_ratio,
  {QF_RULES_SQL["r_word_count"]} AS r_word_count,
  {QF_RULES_SQL["r_mean_word_len"]} AS r_mean_word_len,
  {QF_RULES_SQL["r_symbol_ratio"]} AS r_symbol_ratio,
  {QF_RULES_SQL["r_stopwords"]} AS r_stopwords,
  {QF_RULES_SQL["r_blacklist"]} AS r_blacklist,
  {QF_RULES_SQL["r_repetition"]} AS r_repetition,
  ({QF_PASS_SQL}) AS qf_pass
FROM documents
""",
)
def text_quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality-filter cascade (Gopher/C4 shape): per-rule boolean
    flags plus the AND verdict, one narrow JVM projection per document —
    the pre-training corpus gate that runs before dedup/curation."""
    from ..operators.text import quality_filter_flags

    docs = _t(spark, sf_dir, "documents")
    return quality_filter_flags(docs, "text").select(
        "doc_id", "source", "qf_n_words", "qf_mean_word_len", "qf_symbol_ratio",
        "qf_dup3_ratio", "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_stopwords", "r_blacklist", "r_repetition", "qf_pass",
    )


@query(
    "text_perplexity",
    late=True,  # text family windowed via the stream/text slots
    oracle="""
WITH d AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w != '') AS arr
  FROM documents
),
toks AS (SELECT doc_id, unnest(arr) AS w FROM d),
uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM uni),
bge AS (
  SELECT doc_id, b[1] AS w1, b[2] AS w2 FROM (
    SELECT doc_id, unnest(list_zip(array_pop_back(arr), array_pop_front(arr))) AS b
    FROM d WHERE len(arr) >= 2
  )
),
bic AS (SELECT w1, w2, COUNT(*) AS c12 FROM bge GROUP BY 1, 2),
scored AS (
  SELECT doc_id,
         CAST(ROUND(-LN(0.7 * bic.c12 / u1.c
                        + 0.3 * (u2.c + 1) / (tot.n + tot.v)) * 1000000)
              AS BIGINT) AS xm
  FROM bge
  JOIN bic USING (w1, w2)
  JOIN uni u1 ON u1.w = bge.w1
  JOIN uni u2 ON u2.w = bge.w2, tot
)
SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(xm) AS BIGINT) AS xent_micro
FROM scored GROUP BY doc_id
""",
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scores (round 7): corpus-trained
    interpolated bigram LM, per-document cross-entropy in
    summation-order-free micro-nat integers — the CCNet/Gopher
    perplexity-filter signal without an external LM dependency.
    Oracle rebuilds the identical LM and scoring in DuckDB."""
    from ..operators.text import ngram_lm_cross_entropy

    docs = _t(spark, sf_dir, "documents")
    return ngram_lm_cross_entropy(docs, "doc_id", "text", lam=0.7)
