"""Training-corpus curation operators: benchmark decontamination,
sequence packing, and mixture (source-weighted) sampling.

These are the stages a pretraining data pipeline runs AFTER dedup/quality
filtering (operators.dedup / operators.text) and before tokenized shards
are written.  Everything is built-in-function composition — JVM-side,
codegen-friendly — and every hash is the engine-portable 60-bit md5
prefix (see operators.dedup.shingle_hashes) so each operator carries an
exact DuckDB-SQL oracle.

Scale notes (the 100 TB shapes):
- decontamination joins the full corpus against the n-gram set of a
  BENCHMARK suite — megabytes against terabytes — so the gram set is
  broadcast and the corpus side never shuffles (scan -> generate ->
  broadcast-semi-join -> anti-join on the tiny hit list).
- sequence packing is a per-shard running sum: one shuffle to co-locate a
  shard (here: ``source``), then a single window pass.  Real pipelines
  pack per output shard precisely because a global order would serialize;
  the group column IS the parallelism unit.
- mixture sampling is scan-only: per-source keep-rates derive from a
  20-row aggregate (broadcast back), and the keep decision is a pure
  deterministic function of the row key — reshuffle-stable, resumable,
  no RNG state to coordinate across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import md5_frac32_sql, md5_prefix60_sql


def token_ngram_hashes(tokens_col: str, n: int = 8) -> Column:
    """Hashes of the space-joined token ``n``-grams of a MATERIALIZED
    token-array column.  Docs shorter than ``n`` tokens yield an empty
    array (they cannot be contaminated / cannot contaminate).

    The token array must be a real column, not an inline sub-expression:
    HOF lambdas are interpreted, so referencing the tokenizer here would
    re-split the text once per gram (the O(n)->O(n^2) re-inlining pitfall
    documented at operators/dedup.py shingle_hashes)."""
    gram = f"concat_ws(' ', slice({tokens_col}, i, {n}))"
    # explicit empty-guard: Spark's sequence(1, 0) is the DESCENDING [1, 0],
    # not empty, so the greatest(.., 0) idiom would feed slice() a 0 start
    return F.expr(
        f"IF(size({tokens_col}) < {n}, cast(array() as array<bigint>), "
        f"transform(sequence(1, size({tokens_col}) - {n - 1}), "
        f"i -> {md5_prefix60_sql(gram)}))"
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Benchmark decontamination: drop every training doc sharing at least
    one ``n``-token n-gram with any test/benchmark doc (the GPT-3/PaLM
    recipe: exact sub-sequence collision at n=8..13 word grams).

    Returns ``(clean, contaminated_ids)`` where ``clean`` preserves the
    training schema and ``contaminated_ids`` is one ``id_col`` row per
    dropped doc.

    Plan shape: the test-side gram set is distinct-ed and BROADCAST (a
    benchmark suite is megabytes; 100 TB lives on the train side), the
    train side streams scan->generate->broadcast-hash-join with no
    shuffle, and only the (tiny) contaminated id list is distinct-ed
    before the final broadcast anti-join back onto the full rows."""
    from ..operators.text import tokens

    test_grams = (
        test.select(tokens(text_col).alias("__t"))
        .select(F.explode(token_ngram_hashes("__t", n)).alias("__g"))
        .distinct()
    )
    hit_ids = (
        train.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(F.col(id_col), F.explode(token_ngram_hashes("__t", n)).alias("__g"))
        .join(F.broadcast(test_grams), "__g", "left_semi")
        .select(id_col)
        .distinct()
    )
    clean = train.join(F.broadcast(hit_ids), id_col, "left_anti")
    return clean, hit_ids


def contamination_provenance(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The audit companion to ``decontaminate``: WHICH benchmark doc each
    contaminated training doc collided with — (train_id, test_id, n_shared
    grams) pairs. A release review needs the provenance, not just the drop
    list.

    Same broadcast shape: the test side (id, gram) pairs are still
    benchmark-suite-sized; the corpus side streams through one broadcast
    hash join and aggregates the collision counts."""
    from ..operators.text import tokens

    # (id, gram) duplicates can only arise WITHIN one doc's gram array, so
    # array_distinct before the explode dedups them locally — a global
    # .distinct() here would be a corpus-sized shuffle on the train side,
    # exactly the cost this plan shape exists to avoid
    t_grams = test.select(
        F.col(id_col).alias("test_id"), tokens(text_col).alias("__t")
    ).select(
        "test_id",
        F.explode(F.array_distinct(token_ngram_hashes("__t", n))).alias("__g"),
    )
    tr_grams = train.select(
        F.col(id_col).alias("train_id"), tokens(text_col).alias("__t")
    ).select(
        "train_id",
        F.explode(F.array_distinct(token_ngram_hashes("__t", n))).alias("__g"),
    )
    return (
        tr_grams.join(F.broadcast(t_grams), "__g")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def pack_sequences(
    df: DataFrame,
    context_len: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    n_tokens_col: Column | None = None,
) -> DataFrame:
    """Concatenation-style sequence packing plan: within each ``group_col``
    shard, documents are laid end-to-end in ``order_col`` order and cut
    into fixed ``context_len``-token windows (the standard pretraining
    pack: no padding, docs may span window boundaries).

    Emits one row per doc with its byte-exact placement:
    ``n_tokens``, ``start_offset`` (tokens before it in the shard),
    ``first_chunk`` / ``last_chunk`` (0-based window indices the doc
    touches), ``n_chunks``.  Empty docs get n_chunks=0 and
    last_chunk=first_chunk.

    One shuffle (partition by shard), one window pass; shards are the
    parallelism unit exactly as a real tokenizer-shard writer would run.

    ``n_tokens_col`` is a token-COUNT column (long), not a token array —
    defaults to whitespace ``token_count("text")``.
    """
    from ..operators.text import token_count

    n_tok = n_tokens_col if n_tokens_col is not None else token_count("text")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", n_tok).withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    first = F.floor(F.col("start_offset") / context_len)
    last = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / context_len),
    ).otherwise(first)
    return (
        out.withColumn("first_chunk", first)
        .withColumn("last_chunk", last)
        .withColumn(
            "n_chunks",
            F.when(F.col("n_tokens") > 0, F.col("last_chunk") - F.col("first_chunk") + 1)
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def chunk_manifest(
    df: DataFrame,
    context_len: int,
    group_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """The trainer-facing inverse of ``pack_sequences``: one row per
    (chunk, doc-segment), telling a data loader exactly which token span
    of which document fills each fixed-size training window.

    Columns: ``chunk`` (0-based window index within the shard),
    ``doc_tok_from`` / ``doc_tok_to`` (within-doc token span, end
    exclusive), ``n_span_tokens``.  Concatenating spans of a chunk in
    ``order_col`` order reconstructs exactly ``context_len`` tokens
    (except the shard's final partial chunk).

    Pure plan composition: the packing window then one ``explode`` over
    each doc's chunk range — no extra shuffle beyond packing's."""
    packed = pack_sequences(df, context_len, group_col, order_col)
    L = context_len
    out = packed.filter(F.col("n_tokens") > 0).select(
        group_col,
        order_col,
        "start_offset",
        "n_tokens",
        F.explode(F.expr("sequence(first_chunk, last_chunk)")).alias("chunk"),
    )
    g_from = F.greatest(F.col("start_offset"), F.col("chunk") * L)
    g_to = F.least(F.col("start_offset") + F.col("n_tokens"), (F.col("chunk") + 1) * L)
    return out.select(
        group_col,
        F.col("chunk").cast("long"),
        order_col,
        (g_from - F.col("start_offset")).cast("long").alias("doc_tok_from"),
        (g_to - F.col("start_offset")).cast("long").alias("doc_tok_to"),
        (g_to - g_from).cast("long").alias("n_span_tokens"),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global corpus shuffle into ``n_shards`` training
    shards: a pseudorandom permutation realized as (hash -> shard,
    hash-order within shard) — the standard pre-tokenization shuffle that
    breaks source/time locality so every shard is an unbiased sample.

    Emits ``shard`` (0-based) and ``pos`` (0-based dense position within
    the shard).  Both are pure functions of the row key: re-running on any
    partitioning, or resuming after failure, yields the identical
    permutation — no RNG state, no driver coordination.

    Scale shape: exactly one shuffle (the window's hash partition on
    ``shard``); within-shard ordering sorts each shard independently.
    Shard count is the write parallelism — 1000 executors want >= 1000
    shards, and the hash balances them to within sampling noise."""
    h = F.expr(md5_prefix60_sql(f"cast({key_col} as string)"))
    out = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(key_col))
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture sampling: downsample each source so the kept
    corpus matches the target ``weights`` proportions exactly (up to the
    largest total the data admits — the binding source keeps 100%).

    T = min_s(n_s / w_s) is the largest total size whose mixture is
    feasible without upsampling; each source keeps rate_s = w_s * T / n_s
    of its rows.  The keep decision hashes the row key (md5 prefix -> a
    uniform fraction in [0,1)) against the rate — a pure row function, so
    the sample is identical under any partitioning/retry and is exactly
    reproducible by the SQL oracle.

    Rates are quantized with floor(x * 1e6) / 1e6: floor is
    rounding-mode-agnostic across engines, unlike round() (half-up in SQL
    engines vs half-even in numpy/pandas).

    The per-source stats are a ``len(weights)``-row aggregate, broadcast
    back onto the scan — the 100 TB side is touched exactly once."""
    from .util import register_cache

    spark = df.sparkSession
    weights_df = spark.createDataFrame(
        sorted(weights.items()), schema=f"{group_col} string, __w double"
    )
    # pin the per-source counts: the aggregate's subtree is referenced
    # twice below (T and the rates), and without the cache the one-touch
    # contract would depend on ReuseExchange deduping the corpus scan
    stats = register_cache(
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(F.broadcast(weights_df), group_col)
    )
    t_df = stats.agg(F.min(F.col("__n") / F.col("__w")).alias("__T"))
    # the binding (argmin) source's true rate is exactly 1.0, but the
    # round trip w * (n/w) / n can land at 0.999999... and the 1e-6 floor
    # quantization would then silently drop ~1e-6 of its rows — identify
    # binding sources by n/w == T (the min is one of the operands, so the
    # double compares equal) and pin their rate to exactly 1.0; mirrored
    # verbatim in the SQL oracle
    rates = (
        stats.crossJoin(F.broadcast(t_df))
        .withColumn(
            "__rate",
            F.when(F.col("__n") / F.col("__w") == F.col("__T"), F.lit(1.0)).otherwise(
                F.floor(F.col("__w") * F.col("__T") / F.col("__n") * 1000000.0)
                / 1000000.0
            ),
        )
        .select(group_col, "__rate")
    )
    frac = F.expr(md5_frac32_sql(f"cast({key_col} as string)"))
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(frac < F.col("__rate"))
        .drop("__rate")
    )


def assign_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 fraction of the id
    buckets each row into exactly one split (disjoint and exhaustive by
    construction — cumulative half-open intervals over [0, 1)). Pure
    function of the row: reshuffle-stable, resumable, identical on any
    cluster size, no RNG state — the only split semantics that survive a
    100 TB re-run. Fractions must sum to 1 (the last split absorbs the
    remainder exactly)."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    # 32-bit md5-prefix fraction in [0, 1) — same contract as mixture_sample
    frac = (
        F.expr(
            f"cast(conv(substring(md5(cast({id_col} as string)), 1, 8), 16, 10) as bigint)"
        )
        / F.lit(4294967296.0)
    )
    names = list(fractions)
    cum = 0.0
    conds = []
    for n in names[:-1]:
        cum += fractions[n]
        conds.append((n, cum))
    # first matching cumulative bound wins; the LAST split is the
    # unconditional fallback so float residue can never drop a row
    expr = F.lit(names[-1])
    for n, bound in reversed(conds):
        expr = F.when(frac < F.lit(bound), F.lit(n)).otherwise(expr)
    return df.withColumn("split", expr)


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Per-domain document cap — the over-representation guard of
    C4/RefinedWeb-style pipelines: no single domain (site, source feed,
    crawl host) may contribute more than ``cap`` documents to the
    corpus, and WHICH documents survive is deterministic (``order_by``,
    default quality-proxy ``n_chars`` desc with ``doc_id`` as the
    total-order tiebreak) so reruns and the SQL oracle agree exactly.

    Scale shape: one rank window partitioned by the domain — a single
    hash shuffle on the domain key, no collects. A pathologically hot
    domain makes one big partition, but the window only needs the top
    ``cap`` rows per partition, so Spark's WindowGroupLimit pushes the
    rank filter below the sort at the partition level (rank <= cap is
    recognized as a group limit); AQE skew handling covers the rest."""
    order = order_by or [F.col("n_chars").desc(), F.col("doc_id").asc()]
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
