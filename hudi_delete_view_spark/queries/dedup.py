"""Dedup queries (B8/B9) over the ``documents`` / ``embeddings`` tables.

EVERY query here is fully DuckDB-oracled — including MinHash-LSH and
SimHash: the portable 60-bit md5 hash contract lets the oracles replay
the funnel bit-for-bit (seeded permutation family as SQL literals, band
collisions, estimate prune, exact verify — see ``_minhash_funnel_ctes``),
and SimHash mirrors the sign-sum bit packing exactly. Property tests in
tests/test_dedup.py additionally pin recall against the exact-Jaccard
ground truth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import assign_components
from ..operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from ._tables import _t
from . import query


@query(
    "dedup_exact_docs",
    oracle="""
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN (SELECT text, MIN(doc_id) AS keep FROM documents GROUP BY text) t
  ON d.doc_id = t.keep
""",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup, deterministic winner = min doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, keys=["text"], order_by=["doc_id"]).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "dedup_exact_count",
    late=True,  # COUNT variant of the windowed dedup_exact_docs (green r02)
    oracle="SELECT COUNT(DISTINCT text) AS n_unique, COUNT(*) AS n_total FROM documents",
)
def dedup_exact_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.countDistinct("text").alias("n_unique"), F.count("*").alias("n_total")
    )


@query(
    "dedup_ngram_jaccard",
    late=True,  # exact-verify kernel already in-window inside the funnel queries
    oracle="""
WITH sh AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, greatest(length(text) - 4, 0)),
                  i -> substr(text, i, 5))) AS grams
  FROM documents WHERE doc_id < 40
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        / len(list_distinct(a.grams || b.grams)), 6) >= 0.2
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-5-gram Jaccard on a bounded id range (the all-pairs form
    is the verification baseline; LSH prunes the pair space at scale)."""
    docs = _t(spark, sf_dir, "documents").filter("doc_id < 40")
    return ngram_jaccard_pairs(docs, "doc_id", "text", pairs=None, threshold=0.2)


@query(
    "dedup_clusters",
    # oracle: recursive-CTE transitive closure (min reachable id = the
    # component root the large-star/small-star contraction converges to)
    oracle="""
WITH RECURSIVE
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, greatest(length(text) - 4, 0)),
                  i -> substr(text, i, 5))) AS grams
  FROM documents WHERE doc_id < 40
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(a.grams || b.grams)), 6) >= 0.2
),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS cluster_id
  FROM (SELECT doc_id FROM documents WHERE doc_id < 40) d
  LEFT JOIN reach r ON r.u = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       (doc_id = cluster_id) AS is_canonical
FROM comp
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-to-cluster resolution: near-dup pairs are only half the dedup
    story — transitively-linked docs must collapse to ONE canonical copy.
    Edges = exact 5-gram Jaccard pairs (the oracle-able baseline); clusters
    via distributed large-star/small-star connected components."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 40")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", pairs=None, threshold=0.2
    ).select("id_a", "id_b")
    out = assign_components(docs.select("doc_id"), "doc_id", pairs)
    w = Window.partitionBy("cluster_id")
    return out.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def _minhash_funnel_ctes(min_collisions: int = 2, source_sql: str = "documents") -> str:
    """Shared DuckDB CTE chain mirroring the MinHash-LSH funnel
    (shingles -> md5 hashes -> seeded permutation minima -> band slices ->
    collision candidates -> signature-estimate prune -> exact verify).

    Expressible because every stage is deterministic integer arithmetic
    shared with the Spark side: the shingle hash is a 60-bit md5 prefix
    (identical in both engines), the permutation family (a_i, b_i) comes
    from the same seeded generator, bands compare raw signature slices
    (the Spark side hashes slices, but equal slices <=> equal hashes up
    to a 2^-64 collision), and the estimate/verify thresholds sit between
    representable k/64 grid points so float comparison order is moot."""
    from ..operators.dedup import _MERSENNE_P, _perm_family

    a, b = _perm_family(64)
    perm_rows = ", ".join(f"({i}, {ai}, {bi})" for i, (ai, bi) in enumerate(zip(a, b)))
    p = _MERSENNE_P
    return f"""sh AS (
  SELECT doc_id, source, n_chars,
    list_distinct(list_transform(generate_series(1, greatest(length(text) - 4, 0)),
                  i -> substr(text, i, 5))) AS grams
  FROM {source_sql}
),
hs AS (
  SELECT doc_id,
    list_transform(grams, s ->
      CAST(CONCAT('0x', substring(md5(s), 1, 15)) AS BIGINT) % {p}) AS h
  FROM sh WHERE len(grams) > 0
),
perms AS (SELECT * FROM (VALUES {perm_rows}) AS t(i, a, b)),
sigrow AS (
  SELECT doc_id, i, list_min(list_transform(h, x -> (a * x + b) % {p})) AS m
  FROM hs CROSS JOIN perms
),
sig AS (SELECT doc_id, list(m ORDER BY i) AS s FROM sigrow GROUP BY doc_id),
bands AS (
  SELECT doc_id, j, list_slice(s, j * 4 + 1, j * 4 + 4) AS band
  FROM sig CROSS JOIN generate_series(0, 15) AS g(j)
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_collisions}
),
est AS (
  SELECT id_a, id_b FROM cand
  JOIN sig sa ON sa.doc_id = cand.id_a
  JOIN sig sb ON sb.doc_id = cand.id_b
  WHERE CAST(list_sum(list_transform(generate_series(1, 64),
        k -> CASE WHEN sa.s[k] = sb.s[k] THEN 1 ELSE 0 END)) AS DOUBLE) / 64 >= 0.65
),
verified AS (
  SELECT id_a, id_b FROM est
  JOIN sh ga ON ga.doc_id = est.id_a
  JOIN sh gb ON gb.doc_id = est.id_b
  WHERE ROUND(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
        / len(list_distinct(ga.grams || gb.grams)), 6) >= 0.8
)"""


def _minhash_clusters_sql() -> str:
    """Funnel CTEs + recursive transitive closure: every doc in a verified
    pair reaches the component minimum, mirroring what the large-star/
    small-star contraction converges to."""
    return f"""
WITH RECURSIVE {_minhash_funnel_ctes(min_collisions=2)},
edges AS (SELECT id_a AS u, id_b AS v FROM verified
          UNION SELECT id_b, id_a FROM verified),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
)
SELECT comp.cluster_id,
  COUNT(*) AS cluster_size,
  MIN(comp.doc_id) AS canonical_doc,
  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM comp JOIN documents d ON d.doc_id = comp.doc_id
GROUP BY comp.cluster_id HAVING COUNT(*) > 1
"""


@query("dedup_minhash_clusters", late=True, oracle=_minhash_clusters_sql())
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-scale funnel: MinHash-LSH candidates ->
    estimate-pruned exact-Jaccard verify (>=0.8) -> connected components ->
    per-cluster stats. One row per duplicate cluster with >1 member
    (singletons are the survivors)."""
    from ..operators.dedup import minhash_verified_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_verified_pairs(docs, "doc_id", "text", threshold=0.8).select(
        "id_a", "id_b"
    )
    clustered = assign_components(docs.select("doc_id", "n_chars"), "doc_id", pairs)
    return (
        clustered.groupBy("cluster_id")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("canonical_doc"),
            F.sum("n_chars").alias("total_chars"),
        )
        .filter("cluster_size > 1")
    )


@query(
    "dedup_minhash_survivors",
    oracle=f"""
WITH {_minhash_funnel_ctes(min_collisions=2)}
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM verified)
""",
)
def dedup_minhash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup removal (64 hashes, 16 bands, Jaccard>=0.8
    verify); survivors keep the smallest doc_id of each duplicate cluster."""
    docs = _t(spark, sf_dir, "documents")
    return (
        minhash_dedup(docs, "doc_id", "text", threshold=0.8)
        .select("doc_id", "source", "n_chars")
    )


@query(
    "dedup_lsh_candidates",
    late=True,  # oracled, but stays out of the driver's 50-slot window
    oracle=f"""
WITH {_minhash_funnel_ctes(min_collisions=1)}
SELECT id_a, id_b FROM cand
""",
)
def dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw LSH band-collision candidate pairs (pre-verification)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidate_pairs(docs, "doc_id", "text")


@query(
    "dedup_simhash_pairs",
    late=True,  # oracled; window budget holds the newer curation stage
    # full bit-exact SimHash mirror: same 60-bit md5 token hashes, same
    # sign-sum bit packing, same 12-bit prefix buckets, same Hamming gate
    oracle="""
WITH toks AS (
  SELECT doc_id,
    list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x != ''),
                   t -> CAST(CONCAT('0x', substring(md5(t), 1, 15)) AS BIGINT)) AS h
  FROM documents
),
sims AS (
  SELECT doc_id,
    COALESCE(list_sum(list_transform(generate_series(0, 59), b ->
      CASE WHEN COALESCE(list_sum(list_transform(h, x ->
                CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)), 0) AS sim
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
FROM sims a JOIN sims b
  ON (a.sim >> 48) = (b.sim >> 48) AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 10
""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (12-bit prefix buckets, Hamming <= 10).

    ``bucket_cap`` resolves through the active profile: under
    ``SPARK_GRAFT_PROFILE=scale`` the occupancy guard is ARMED
    (cap=1000), and the oracle stays bit-exact because no gate-corpus
    bucket approaches the cap — the profile changes plans, not answers
    (proven by running the full gate with the profile active)."""
    from ..profile import PROFILE_DEFAULT

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=10, bucket_cap=PROFILE_DEFAULT
    )


@query(
    "dedup_embedding_neardup",
    late=True,  # exact all-pairs baseline; the scale path (dedup_embedding_lsh)
    # holds the driver-window slot (both green r02)
    # embeddings cast to DOUBLE[] so DuckDB matches Spark's double-precision
    # arithmetic (list_cosine_similarity on FLOAT[] computes in float32).
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 300)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
""",
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs on a bounded id range (0.35 is
    above the 99.99th pct of this corpus's cosine distribution — a
    non-trivial result set without synthetic duplicates).

    Exact all-pairs by design: this is the documented correctness baseline
    for the sign-LSH scale path registered alongside (dedup_embedding_lsh),
    bounded to 300 ids so the crossJoin stays trivially small."""
    emb = _t(spark, sf_dir, "embeddings").filter("vec_id < 300")
    pairs = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.35)
    return pairs


@query(
    "dedup_embedding_lsh",
    # The corpus has no natural near-dups (max pairwise cosine ~0.48), so
    # plant one per vector: a x2-scaled copy — same direction, cosine
    # exactly 1.0, and (positively scaled) identical sign-LSH buckets in
    # every table, so the approximate path's recall on the planted set is
    # exactly 1 and the result is deterministic -> full hash-match oracle.
    oracle="""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     aug AS (
       SELECT vec_id, v FROM base
       UNION ALL
       SELECT vec_id + 100000, list_transform(v, x -> x * 2.0) FROM base
     )
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.95
""",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH embedding near-dup — the 100 TB path, unbounded input:
    bucket self-join on (table, bucket), id-pair dedup before vectors are
    re-attached, exact cosine verify on candidates only. Duplicates are
    planted as x2-scaled copies of every vector (see oracle comment)."""
    from ..profile import PROFILE_DEFAULT

    base = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )
    copies = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * 2.0D)").alias("embedding"),
    )
    aug = base.unionByName(copies)
    return embedding_neardup_pairs(
        aug, "vec_id", "embedding", threshold=0.95, bucket_bits=None,
        tables=8, bucket_cap=PROFILE_DEFAULT,
    )


@query(
    "dedup_incremental_minhash",
    oracle=f"""
WITH {_minhash_funnel_ctes(min_collisions=2)}
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id % 5 = 0 AND doc_id NOT IN (
  SELECT id_b FROM verified WHERE id_b % 5 = 0
  UNION
  SELECT id_a FROM verified WHERE id_a % 5 = 0 AND id_b % 5 != 0
)
""",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time dedup: the increment (doc_id % 5 = 0, a stand-in for a
    new crawl drop) deduped against the already-settled corpus remainder.
    Base-vs-base pairs are never generated and the corpus band table is
    pruned to buckets an increment member touches — the work scales with
    the increment, not the corpus (operators/dedup.py
    ``minhash_dedup_incremental``). The oracle replays the global funnel
    and keeps an increment doc iff it has no verified partner in the base
    and no smaller-id verified partner in the increment — provably the
    same rule the restricted pair generation enforces."""
    from ..operators.dedup import minhash_dedup_incremental

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    return minhash_dedup_incremental(base, inc, "doc_id", "text", threshold=0.8).select(
        "doc_id", "source", "n_chars"
    )


@query(
    "dedup_shared_spans",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS t
  FROM documents
),
w AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, greatest(len(t) - 15, 0)),
      i -> md5(array_to_string(list_slice(t, i, i + 15), ' '))))) AS h
  FROM toks
),
nwin AS (SELECT doc_id, COUNT(*) AS nw FROM w GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_spans
  FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, p.n_spans,
       ROUND(CAST(p.n_spans AS DOUBLE) / nwin.nw, 6) AS coverage_b
FROM p JOIN nwin ON nwin.doc_id = p.id_b
""",
)
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level duplication: document pairs sharing >= 1
    identical 16-token span (stride-1 window hashes, hash-bucketed join,
    singleton spans pruned — operators/dedup.py ``shared_span_pairs``).
    Catches the plagiarized-paragraph / boilerplate case document-level
    Jaccard misses."""
    from ..operators.dedup import shared_span_pairs

    docs = _t(spark, sf_dir, "documents")
    return shared_span_pairs(docs, "doc_id", "text", window=16)


@query(
    "dedup_signature_store",
    oracle=f"""
WITH {_minhash_funnel_ctes(min_collisions=2)},
survivors AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 5 = 0 AND doc_id NOT IN (
    SELECT id_b FROM verified WHERE id_b % 5 = 0
    UNION
    SELECT id_a FROM verified WHERE id_a % 5 = 0 AND id_b % 5 != 0
  )
)
SELECT 'base' AS section, doc_id FROM documents WHERE doc_id % 5 != 0
UNION ALL
SELECT 'added' AS section, doc_id FROM survivors
""",
)
def dedup_signature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted signature asset as a REAL lake table
    (sources/fixtures.py ``build_signature_store``): S1 bulk-inserts the
    corpus signatures, the increment dedups against the STORE's snapshot
    (no corpus re-shingle on the base side), and S2 upserts the
    survivors' signatures — so ``incremental(S1)`` reads exactly the
    surviving ids and the snapshot is the current asset. One query proves
    the lake format and the incremental funnel compose: section 'base' =
    ids at S1, 'added' = the incremental read after S2."""
    from ..sources.fixtures import C1, build_signature_store

    store = build_signature_store(spark, sf_dir)
    base_ids = (
        store.snapshot(as_of=C1)
        .select(F.lit("base").alias("section"), F.col("__id").cast("long").alias("doc_id"))
    )
    added = (
        store.incremental(C1)
        .select(F.lit("added").alias("section"), F.col("__id").cast("long").alias("doc_id"))
    )
    return base_ids.unionByName(added)


@query(
    "dedup_remove_boilerplate",
    late=True,  # family windowed via dedup_shared_spans; this adds the ACTION
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t,
    unnest(CASE WHEN len(t) < 8 THEN CAST([] AS BIGINT[])
                ELSE generate_series(1, len(t) - 7) END) AS s
  FROM toks
),
ws AS (
  SELECT doc_id, s, md5(array_to_string(list_slice(t, s, s + 7), ' ')) AS h
  FROM pos
),
hot AS (SELECT h FROM ws GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
starts AS (
  SELECT doc_id, list_sort(list(DISTINCT s)) AS st
  FROM ws JOIN hot USING (h) GROUP BY doc_id
),
cleaned AS (
  SELECT tk.doc_id, tk.t,
    list_transform(
      list_filter(generate_series(1, len(tk.t)),
        j -> len(list_filter(COALESCE(starts.st, CAST([] AS BIGINT[])),
                 s2 -> j >= s2 AND j <= s2 + 7)) = 0),
      j -> tk.t[j]) AS kept
  FROM toks tk LEFT JOIN starts ON starts.doc_id = tk.doc_id
)
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens_before,
  CAST(len(t) - len(kept) AS BIGINT) AS n_tokens_removed,
  COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
FROM cleaned
""",
)
def dedup_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate span REMOVAL (the action to ``dedup_shared_spans``'s
    detection): tokens covered by any 8-token sliding span shared by >= 2
    documents are cut from the text, per Lee et al.'s exact-substring
    dedup-by-deletion — the treatment for site-wide footers/headers that
    document-level dedup can't touch without discarding whole documents.
    The full cleaned text participates in the value hash, so the oracle
    verifies the surviving token sequence verbatim
    (operators/dedup.py ``remove_boilerplate_spans``)."""
    from ..operators.dedup import remove_boilerplate_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_boilerplate_spans(docs, "doc_id", "text", window=8, min_span_df=2)
