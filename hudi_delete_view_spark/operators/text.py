"""Text-analysis operators (SURVEY §2 B11): token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything is built-in-function composition (split/filter/size/regexp/md5)
— JVM-side, codegen-friendly, linear scans with no shuffle except the
final aggregations. Each operator has an exact DuckDB-SQL mirror so the
whole module is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# languages scored by tiny stopword lists (deterministic heuristic)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]


def tokens(text_col: str) -> Column:
    """Whitespace tokens with empties dropped."""
    return F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x != '')")


def token_count(text_col: str) -> Column:
    return F.size(tokens(text_col)).cast("long")


def word_token_count(text_col: str) -> Column:
    """BPE-ish token estimate: count of letter-runs, digit-runs, and
    individual punctuation marks (a cheap stand-in for subword counts)."""
    return F.regexp_count(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    ).cast("long")


def char_count(text_col: str) -> Column:
    return F.length(text_col).cast("long")


def punct_ratio(text_col: str) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"))
    return F.round(
        F.when(F.length(text_col) > 0, n_punct.cast("double") / F.length(text_col)).otherwise(0.0),
        6,
    )


def stopword_ratio(text_col: str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    arr = "array(" + ",".join(f"'{w}'" for w in sw) + ")"
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    hits = F.expr(f"size(filter({toks}, t -> array_contains({arr}, t)))")
    total = F.expr(f"size({toks})")
    return F.round(
        F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(0.0), 6
    )


def mean_token_len(text_col: str) -> Column:
    t = f"filter(split({text_col}, '\\\\s+'), x -> x != '')"
    return F.round(
        F.when(
            F.expr(f"size({t})") > 0,
            F.expr(f"aggregate({t}, 0L, (acc, x) -> acc + length(x))").cast("double")
            / F.expr(f"size({t})"),
        ).otherwise(0.0),
        6,
    )


def quality_score(text_col: str) -> Column:
    """Deterministic [0, 1] quality heuristic: rewards stopword presence and
    moderate token length, penalizes punctuation soup and tiny docs.

    score = 0.4 * min(tokens/50, 1) + 0.3 * stopword_ratio_capped
          + 0.3 * (1 - punct_ratio_capped)
    """
    tok = token_count(text_col).cast("double")
    len_term = F.least(tok / F.lit(50.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(text_col) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text_col) * 5, F.lit(1.0))
    return F.round(0.4 * len_term + 0.3 * sw_term + 0.3 * punct_term, 6)


def lang_id(text_col: str) -> Column:
    """n-gram/stopword language guess: the language whose stopword list
    hits the most tokens; CJK characters short-circuit to 'zh'; ties and
    zero hits fall back to 'und'."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    scores = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
        scores[lang] = F.expr(f"size(filter({toks}, t -> array_contains({arr}, t)))")
    best = None
    # deterministic argmax: strictly-greater chain in fixed language order
    result = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_STOPWORDS):  # de, en, es, fr
        cond = scores[lang] > best_score
        result = F.when(cond, F.lit(lang)).otherwise(result)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    has_cjk = F.regexp_count(F.col(text_col), F.lit(r"[一-鿿]")) > 0
    return F.when(has_cjk, F.lit("zh")).otherwise(result)


def fingerprint(text_col: str) -> Column:
    """Canonical document fingerprint: md5 of lowercase,
    whitespace-collapsed text — identical bytes => identical fingerprint,
    robust to spacing/case differences."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return F.md5(normalized)


def gram_hashes(text_col: str, k: int = 8) -> Column:
    """Rolling k-gram hash array (60-bit md5 prefix — reproducible in
    DuckDB, see operators/dedup.py shingle_hashes) — materialize as its own
    column before windowing (a lambda that references this expression would
    re-evaluate the full gram scan per window position; HOFs are
    interpreted)."""
    from .util import md5_prefix60_sql

    return F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> {md5_prefix60_sql(f'substring({text_col}, i, {k})')})"
    )


def winnowing_from_hashes(hash_col: str, window: int = 4) -> Column:
    """Winnowing over a precomputed gram-hash column: min hash per sliding
    window of ``window`` consecutive k-gram hashes, deduplicated. Standard
    local document fingerprinting for near-dup detection."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size({hash_col}) - {window - 1}, 1)),"
        f" w -> array_min(slice({hash_col}, w, {window}))))"
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-embedding step of a RAG/training pipeline. One row per chunk with
    ``chunk_idx`` (0-based window index), ``chunk_text``, ``n_chunk_tokens``.

    Pure built-ins: tokenize once, explode a stride sequence, slice the
    materialized token array per start offset. The token array is a real
    column before the explode (not re-split per chunk — see the HOF
    re-inlining pitfall), so cost is O(doc_len + n_chunks), embarrassingly
    parallel, no shuffle at all.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = df.withColumn("__toks", tokens(text_col)).withColumn(
        "__n", F.size("__toks")
    )
    starts = F.expr(f"sequence(0, greatest(__n - 1, 0), {step})")
    exploded = toks.withColumn("__start", F.explode(starts))
    return exploded.select(
        F.col(id_col),
        (F.col("__start") / step).cast("long").alias("chunk_idx"),
        F.expr(f"array_join(slice(__toks, __start + 1, {chunk_tokens}), ' ')").alias(
            "chunk_text"
        ),
        F.least(
            F.greatest(F.col("__n") - F.col("__start"), F.lit(0)),
            F.lit(chunk_tokens),
        ).cast("long").alias("n_chunk_tokens"),
    )


def repetition_ratio_from_tokens(tok_col: str, n: int = 3) -> Column:
    """Fraction of duplicated word n-grams within a document (a
    Gopher-style quality gate: boilerplate and generated spam repeat
    themselves). 0 = all n-grams unique, -> 1 as the doc degenerates.

    ``tok_col`` must be a MATERIALIZED token-array column (select
    ``tokens(text)`` into a column first) — referencing the tokenizer
    expression from inside the transform lambda would re-evaluate the full
    split per gram per position (the HOF re-inlining pitfall, O(T^2))."""
    grams = (
        f"transform(sequence(1, size({tok_col}) - {n - 1}), "
        + "i -> concat_ws(' ', "
        + ", ".join(f"element_at({tok_col}, i + {j})" for j in range(n))
        + "))"
    )
    return F.expr(
        f"CASE WHEN size({tok_col}) >= {n} THEN "
        f"round(1.0 - cast(size(array_distinct({grams})) as double) "
        f"/ (size({tok_col}) - {n - 1}), 6) "
        f"ELSE 0.0 END"
    )


# PII patterns chosen to be portable between Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround, ASCII word boundaries only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}


def pii_counts(text_col: str) -> dict[str, Column]:
    """Per-category PII match counts (vectorized regexp_count)."""
    return {
        name: F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(text_col: str) -> Column:
    """Replace every PII match with a typed placeholder. Applied in a fixed
    category order (email before phone, so an email's digits can't be
    re-matched) — a single linear chain of JVM regexp_replace calls."""
    out = F.col(text_col)
    for name in ("email", "url", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full per-document stat set."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_chars_computed", char_count(text_col))
        .withColumn("n_bpeish", word_token_count(text_col))
        .withColumn("punct_ratio", punct_ratio(text_col))
        .withColumn("stopword_ratio", stopword_ratio(text_col))
        .withColumn("mean_token_len", mean_token_len(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", top_k: int = 3
) -> DataFrame:
    """Per-document top-k TF-IDF terms (B11 'tf-idf-style aggregates').

    tf = term count in doc; idf = ln(N / df). Two shuffles: term explode ->
    (doc, term) counts, then a broadcast join of the tiny df table back.
    At 100 TB the document-frequency table is vocabulary-sized (MB), so it
    broadcasts; the per-doc ranking is one window partitioned by doc id.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("__did"),
        F.explode(
            F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')")
        ).alias("term"),
    )
    tf = toks.groupBy("__did", "term").agg(F.count("*").alias("tf"))
    # N rides along as a broadcast single-row crossJoin so the whole
    # operator stays ONE lazy plan — a driver-side collect here would force
    # an extra eager job per call
    n_docs = df.agg(F.countDistinct(id_col).cast("double").alias("__n_docs"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("__did").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("__did").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .select(
            F.col("__did").alias(id_col), "term", "tf", "df", "tfidf",
            F.col("__rn").alias("rank"),
        )
    )


# --------------------------------------------------------------------------
# Quality-filter cascade (Gopher / C4-style heuristic document filters)
# --------------------------------------------------------------------------
# Thresholds are constructor-level knobs of the cascade; the defaults are
# tuned so each rule is non-trivial on the synthetic documents corpus while
# keeping the published Gopher/C4 shape (word-count band, mean-word-length
# band, symbol ratio, stopword evidence, blacklist phrase).
QF_MIN_WORDS = 20
QF_MAX_WORDS = 90
QF_MIN_MEAN_WORD_LEN = 3.0
QF_MAX_MEAN_WORD_LEN = 4.75
QF_MAX_SYMBOL_RATIO = 0.1
QF_MIN_STOPWORD_HITS = 1
QF_BLACKLIST = ["lorem ipsum"]
# Gopher repetition rule: fraction of duplicate 3-gram OCCURRENCES
# (1 - distinct/total). Boilerplate/spam pages repeat phrases heavily
# (a pure "spam spam spam" page scores ~1.0); clean prose sits near 0
# (corpus max 0.071 at sf0.01, so the gate answer is threshold-stable).
QF_MAX_DUP3_RATIO = 0.3


def quality_filter_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach one boolean column per heuristic quality rule plus the
    cascade verdict ``qf_pass`` (AND of all rules).

    The rule set is the published Gopher/C4 heuristic-filter shape
    (word-count band, mean-word-length band, symbol-to-char ratio,
    stopword evidence, blacklisted phrases) re-expressed as pure JVM
    expressions — every rule is a regexp/HOF over the text column, so the
    whole cascade is one narrow projection inside WholeStageCodegen: no
    shuffle, no Python, trivially linear at 100 TB and prunable to the
    text column at the scan. Rules are kept as separate columns (not
    pre-ANDed) so downstream curation can report per-rule rejection rates
    with one aggregation over the same pass.
    """
    toks_arr = f"filter(split({text_col}, '\\\\s+'), x -> x != '')"
    n_words = F.expr(f"size({toks_arr})").cast("long")
    sw_hits = F.expr(
        "size(filter("
        + f"filter(split(lower({text_col}), '\\\\s+'), x -> x != ''), "
        + "t -> array_contains(array("
        + ",".join(f"'{w}'" for w in EN_STOPWORDS)
        + "), t)))"
    )
    lower_txt = F.lower(F.col(text_col))
    # start from lit(False) so an emptied QF_BLACKLIST (a documented
    # tunable) yields r_blacklist = true instead of a TypeError on ~None
    blacklist_hit = F.lit(False)
    for phrase in QF_BLACKLIST:
        blacklist_hit = blacklist_hit | lower_txt.contains(phrase)
    # Gopher repetition signal: duplicate 3-gram occurrence fraction.
    # 1 - distinct/total over the stride-1 3-gram list; < 3 tokens -> 0.0.
    # Same integer counts + one double division + round(6) in DuckDB.
    # empty-guard: Spark's sequence(1, 0) is DESCENDING [1, 0] (not empty
    # like DuckDB's generate_series) — same contract as word_shingles
    g3 = (
        f"IF(size({toks_arr}) < 3, cast(array() as array<string>), "
        f"transform(sequence(1, size({toks_arr}) - 2), "
        f"i -> concat_ws(' ', slice({toks_arr}, i, 3))))"
    )
    dup3 = F.expr(
        f"round(IF(size({g3}) = 0, 0.0, "
        f"1.0 - cast(size(array_distinct({g3})) as double) / size({g3})), 6)"
    )
    out = (
        df.withColumn("qf_n_words", n_words)
        .withColumn("qf_mean_word_len", mean_token_len(text_col))
        .withColumn("qf_symbol_ratio", punct_ratio(text_col))
        .withColumn(
            "r_word_count",
            (F.col("qf_n_words") >= QF_MIN_WORDS)
            & (F.col("qf_n_words") <= QF_MAX_WORDS),
        )
        .withColumn(
            "r_mean_word_len",
            (F.col("qf_mean_word_len") >= QF_MIN_MEAN_WORD_LEN)
            & (F.col("qf_mean_word_len") <= QF_MAX_MEAN_WORD_LEN),
        )
        .withColumn("r_symbol_ratio", F.col("qf_symbol_ratio") <= QF_MAX_SYMBOL_RATIO)
        .withColumn("r_stopwords", sw_hits >= QF_MIN_STOPWORD_HITS)
        .withColumn("r_blacklist", ~blacklist_hit)
        .withColumn("qf_dup3_ratio", dup3)
        .withColumn("r_repetition", dup3 <= QF_MAX_DUP3_RATIO)
    )
    rules = [
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_stopwords", "r_blacklist", "r_repetition",
    ]
    verdict = None
    for r in rules:
        verdict = F.col(r) if verdict is None else (verdict & F.col(r))
    return out.withColumn("qf_pass", verdict)


def ngram_lm_cross_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Corpus-trained bigram-LM cross-entropy per document — the
    perplexity-based quality signal training-data pipelines use (the
    CCNet / Gopher "perplexity filter" family, here with the corpus as
    its own LM instead of an external KenLM, so the operator is
    self-contained and exactly reproducible).

    Model: interpolated bigram with add-one-smoothed unigram backoff,
      p(w2 | w1) = lam * c(w1,w2)/c(w1) + (1-lam) * (c(w2)+1)/(N+V).
    Per-token costs ride as ROUND(-ln p * 1e6) BIGINT micro-nats, so
    the per-document SUM is summation-order-free and hash-comparable
    across engines (the rel_scalar_math precedent); consumers divide
    ``xent_micro / n_bigrams`` for the mean and threshold on it.

    Scale shape: two token-level aggregations build the LM (vocabulary-
    sized outputs, tiny next to the corpus), one bigram-count join +
    two vocabulary joins score every token — all JVM expressions, no
    Python in the hot path; docs with fewer than two tokens carry no
    bigram and are not scored.

    Returns (id_col, n_bigrams, xent_micro)."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: w != F.lit("")
    )
    d = docs.select(F.col(id_col), arr.alias("__arr"))
    uni = (
        d.select(F.explode("__arr").alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    tot = uni.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    bge = (
        d.filter(F.size("__arr") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(slice(__arr, 1, size(__arr) - 1), "
                    "(w, i) -> struct(w AS w1, element_at(__arr, i + 2) AS w2))"
                )
            ).alias("__b"),
        )
        .select(F.col(id_col), F.col("__b.w1").alias("__w1"),
                F.col("__b.w2").alias("__w2"))
    )
    bic = bge.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).alias("__c12"))
    u1 = uni.select(F.col("__w").alias("__w1"), F.col("__c").alias("__c1"))
    u2 = uni.select(F.col("__w").alias("__w2"), F.col("__c").alias("__c2"))
    p = (
        F.lit(lam) * F.col("__c12") / F.col("__c1")
        + F.lit(1 - lam) * (F.col("__c2") + 1) / (F.col("__n") + F.col("__v"))
    )
    return (
        bge.join(bic, ["__w1", "__w2"])
        .join(u1, "__w1")
        .join(u2, "__w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__xm",
            F.round(-F.log(p) * 1000000, 0).cast("long"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__xm").alias("xent_micro"),
        )
    )
