"""Similarity-search queries (B10) over ``embeddings`` — ALL fully
DuckDB-oracled, including the approximate paths: sign-LSH replays the
seeded hyperplanes as SQL literals, and the k-means IVF / SemDeDup
variants re-train the engine-exact Lloyd rounds in-oracle (shared
``_km_*`` CTE builders). Recall additionally property-tested in pytest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh
from ._tables import _t
from . import query


@query(
    "sim_topk_bruteforce",
    # DOUBLE[] cast: see dedup_embedding_neardup.
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
  ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY q.vec_id
    ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC, c.vec_id
  ) AS INT) AS rank
FROM e q JOIN e c ON q.vec_id != c.vec_id
WHERE q.vec_id < 20
QUALIFY rank <= 5
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 20 query vectors against the full corpus.

    The query side is tiny -> Catalyst broadcasts it; the corpus scan
    parallelizes across executors; ranking is one window per query id."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    out = cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=5)
    return out


def _lsh_topk_sql(k: int = 5, dim: int = 64, bits: int = 6, tables: int = 8) -> str:
    """DuckDB mirror of the sign-LSH path: the SAME seeded hyperplanes are
    embedded as SQL literals (full-precision repr), buckets recomputed
    from raw dot-product signs, then the identical candidate join + exact
    re-rank as the brute-force oracle. Approximate != unverifiable: the
    approximation is deterministic given the planes, so the oracle
    replicates it bit-for-bit (sign flips would need |dot| ~ 1e-13, far
    below the O(1) dots real embeddings produce against gaussian planes)."""
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits, tables, seed=42)
    rows = ", ".join(
        f"({t}, {b}, [{', '.join(repr(x) for x in planes[t][b])}])"
        for t in range(tables)
        for b in range(bits)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes AS (SELECT * FROM (VALUES {rows}) AS p(t, bit, pl)),
cb AS (
  SELECT e.vec_id, p.t,
    SUM(CASE WHEN list_sum(list_transform(generate_series(1, {dim}),
          i -> e.v[i] * p.pl[i])) >= 0
        THEN CAST(1 AS BIGINT) << p.bit ELSE 0 END) AS b
  FROM e CROSS JOIN planes p GROUP BY e.vec_id, p.t
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM cb q JOIN cb c ON q.t = c.t AND q.b = c.b AND q.vec_id != c.vec_id
  WHERE q.vec_id < 20
)
SELECT cand.query_id, cand.neighbor_id,
  ROUND(list_cosine_similarity(qe.v, ce.v), 6) AS cosine,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY cand.query_id
    ORDER BY ROUND(list_cosine_similarity(qe.v, ce.v), 6) DESC, cand.neighbor_id
  ) AS INT) AS rank
FROM cand
JOIN e qe ON qe.vec_id = cand.query_id
JOIN e ce ON ce.vec_id = cand.neighbor_id
QUALIFY rank <= {k}
"""


@query("sim_topk_lsh", oracle=_lsh_topk_sql())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH approximate top-5 (6 bits x 8 tables): candidates are
    bucket collisions only (~8/64 of the corpus per query), exact re-rank
    on the candidate set."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    return cosine_topk_lsh(emb, queries, "vec_id", "embedding", k=5, bits=6, tables=8)


@query(
    "sim_pair_metrics",
    # DOUBLE[] cast: see dedup_embedding_neardup.
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 30)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_sum(list_transform(generate_series(1, 64),
        i -> a.v[i] * b.v[i])), 6) AS dot,
  ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine,
  ROUND(sqrt(list_sum(list_transform(generate_series(1, 64),
        i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))), 6) AS l2
FROM e a JOIN e b ON a.vec_id < b.vec_id
""",
)
def sim_pair_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dot / cosine / L2 for all pairs in a bounded id range — the scalar
    vector-math kernel every similarity operator composes."""
    from ..operators.similarity import as_double_array, cosine_expr, dot_expr

    emb = _t(spark, sf_dir, "embeddings").filter("vec_id < 30")
    a = emb.select(F.col("vec_id").alias("id_a"), as_double_array("embedding").alias("__a"))
    b = emb.select(F.col("vec_id").alias("id_b"), as_double_array("embedding").alias("__b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    l2 = F.sqrt(
        F.expr(
            "aggregate(zip_with(__a, __b, (x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)"
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(dot_expr("__a", "__b"), 6).alias("dot"),
        F.round(cosine_expr("__a", "__b"), 6).alias("cosine"),
        F.round(l2, 6).alias("l2"),
    )


@query(
    "sim_label_centroid",
    oracle="""
SELECT label, COUNT(*) AS n,
  ROUND(AVG(list_cosine_similarity(embedding,
    list_transform(generate_series(1, 64), i -> 1.0))), 6) AS avg_cos_to_ones
FROM embeddings GROUP BY label
""",
)
def sim_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label aggregate similarity to a fixed reference vector (an
    embedding-column groupBy — exercises vector math under aggregation)."""
    from ..operators.similarity import as_double_array, cosine_expr

    emb = _t(spark, sf_dir, "embeddings").select(
        "label", as_double_array("embedding").alias("__v")
    )
    ones = "transform(sequence(1, 64), i -> 1.0D)"
    emb = emb.withColumn("__ones", F.expr(ones))
    return (
        emb.select("label", cosine_expr("__v", "__ones").alias("__cos"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("__cos"), 6).alias("avg_cos_to_ones"))
    )


def _km_assign(
    cents: str, out: str, where: str = "", rn: str = "rn = 1", src: str = "e"
) -> str:
    """CTE: nearest-centroid assignment with the engine-portable argmax
    (cosine ROUND 4, ties -> lowest cid) — shared by the IVF and the
    semantic-dedup oracles. ``src`` picks the vector CTE (the incremental
    variant trains on the base but assigns EVERYONE)."""
    return f"""
{out} AS (
  SELECT vec_id, cid, v FROM (
    SELECT {src}.vec_id, {cents}.cid, {src}.v,
      ROW_NUMBER() OVER (PARTITION BY {src}.vec_id
        ORDER BY ROUND(list_cosine_similarity({src}.v, {cents}.cvec), 4) DESC, {cents}.cid) AS rn
    FROM {src} CROSS JOIN {cents} {where}) WHERE {rn}
)"""


def _km_recompute(asg: str, out: str, dim: int) -> str:
    """CTE: centroid recompute via the integer-micro mean (bit-identical
    doubles in any engine regardless of float summation order)."""
    return f"""
{out} AS (
  SELECT cid, list(m ORDER BY pos) AS cvec FROM (
    SELECT {asg}.cid, g.i AS pos,
      CAST(CAST(SUM(CAST(FLOOR({asg}.v[g.i] * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
        / 1000000.0 / COUNT(*) AS m
    FROM {asg}, generate_series(1, {dim}) AS g(i)
    GROUP BY {asg}.cid, g.i)
  GROUP BY cid
)"""


def _km_train_ctes(
    nlist: int, iters: int, dim: int, source_where: str = ""
) -> tuple[list[str], str]:
    """The shared Lloyd-training CTE chain (e, c0, a1/c1, ...); returns
    (ctes, final_centroid_cte_name). ``source_where`` restricts the
    TRAINING corpus (the incremental variant trains on the base only)."""
    ctes = [
        f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings {source_where})",
        f"""c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v AS cvec
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {nlist})
)""",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(_km_assign(prev, f"a{i}").strip())
        ctes.append(_km_recompute(f"a{i}", f"c{i}", dim).strip())
        prev = f"c{i}"
    return ctes, prev


def _ivf_kmeans_sql(
    k: int = 5, dim: int = 64, nlist: int = 16, nprobe: int = 4, iters: int = 2
) -> str:
    """DuckDB mirror of the FULL iterative k-means IVF funnel: the Lloyd
    rounds are unrolled as nested CTEs. Each round's assignment uses the
    same quantized-cosine argmax as Spark (ROUND 4, ties -> lowest cid)
    and each centroid recompute uses the same integer-micro mean
    (floor(x*1e6+0.5) summed as BIGINT, divided in a fixed order), so the
    trained centroids are bit-identical doubles in both engines and the
    whole pipeline — train, assign, probe, exact re-rank — hash-matches.
    This is SURVEY §10.2's 'frozen centroids' taken one step further: the
    centroids aren't frozen constants, they're re-derived in-oracle."""
    ctes, prev = _km_train_ctes(nlist, iters, dim)
    ctes.append(_km_assign(prev, "lists").strip())
    ctes.append(
        f"""probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT e.vec_id, {prev}.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY ROUND(list_cosine_similarity(e.v, {prev}.cvec), 4) DESC, {prev}.cid) AS rn
    FROM e CROSS JOIN {prev} WHERE e.vec_id < 20) WHERE rn <= {nprobe}
)"""
    )
    return f"""
WITH {', '.join(ctes)}
SELECT query_id, neighbor_id, cosine,
  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
FROM (
  SELECT p.query_id, l.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(q.v, l.v), 6) AS cosine
  FROM probes p
  JOIN lists l ON l.cid = p.cid AND l.vec_id != p.query_id
  JOIN e q ON q.vec_id = p.query_id)
QUALIFY rank <= {k}
"""


@query("sim_topk_ivf", late=True, oracle=_ivf_kmeans_sql())  # IVF family;
# sim_topk_bruteforce/lsh hold the windowed slots
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (16 lists, 2 Lloyd rounds, probe 4): corpus
    bucketed by nearest k-means centroid; queries scan only their nprobe
    closest inverted lists, then re-rank exactly. Fully oracled since
    round 4 — the deterministic Lloyd arithmetic (see ``ivf_centroids``)
    lets DuckDB re-train the identical centroids in-query."""
    from ..operators.similarity import cosine_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    return cosine_topk_ivf(emb, queries, "vec_id", "embedding", k=5, nlist=16, nprobe=4)


@query(
    "pipeline_dedup_topk",
    late=True,  # composite of two windowed families; slot goes to stream_incremental_dedup
    # end-to-end LLM-pipeline composition: exact text dedup -> join to the
    # embedding table -> exact top-3 neighbors among surviving docs only
    oracle="""
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
),
e AS (
  SELECT em.vec_id, CAST(em.embedding AS DOUBLE[]) AS v
  FROM embeddings em JOIN keep k ON em.vec_id = k.doc_id
)
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
  ROUND(list_cosine_similarity(q.v, c.v), 6) AS cosine,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY q.vec_id
    ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC, c.vec_id
  ) AS INT) AS rank
FROM e q JOIN e c ON q.vec_id != c.vec_id
WHERE q.vec_id < 10
QUALIFY rank <= 3
""",
)
def pipeline_dedup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline: dedup the corpus, keep surviving docs'
    embeddings, search neighbors only among survivors — the shape of a
    real training-data curation pass (dedup feeding retrieval)."""
    from ..operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    keep = exact_dedup(docs, keys=["text"], order_by=["doc_id"]).select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = emb.join(keep, "vec_id", "left_semi")
    queries = corpus.filter("vec_id < 10")
    return cosine_topk_bruteforce(corpus, queries, "vec_id", "embedding", k=3)


@query(
    "sim_topk_ivf_label",
    late=True,  # IVF family; sim_topk_bruteforce/lsh hold the window slots
    # Fully-oracled IVF: the coarse quantizer is the LABEL centroids,
    # computed with engine-exact integer-micro sums (floor(x*1e6+0.5)
    # summed as BIGINT, divided in a fixed order). Selection stages
    # (assignment + probes) compare cosines quantized to 4 decimals with a
    # deterministic label tie-break: equal quantized scores resolve
    # identically in both engines, so a cross-engine flip would need the
    # two engines' cosines to straddle a 0.25e-4 grid edge within ~1e-12
    # (last-ulp) — the same robustness class as the other sim oracles'
    # ROUND-6 re-rank, with an extra 100x margin at the amplified
    # (list-membership) stage.
    oracle="""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT label, i AS pos, CAST(FLOOR(v[i] * 1000000 + 0.5) AS BIGINT) AS m
  FROM e, generate_series(1, 64) AS g(i)
),
cnt AS (SELECT label, COUNT(*) AS n FROM e GROUP BY label),
cent AS (
  SELECT ex.label, list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY pos) AS c
  FROM (SELECT label, pos, CAST(SUM(m) AS BIGINT) AS s FROM ex GROUP BY label, pos) ex
  JOIN cnt USING (label) GROUP BY ex.label, cnt.n
),
assigned AS (
  SELECT vec_id, cl, v FROM (
    SELECT e.vec_id, cent.label AS cl, e.v,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY ROUND(list_cosine_similarity(e.v, cent.c), 4) DESC, cent.label) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cl FROM (
    SELECT e.vec_id, cent.label AS cl,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY ROUND(list_cosine_similarity(e.v, cent.c), 4) DESC, cent.label) AS rn
    FROM e CROSS JOIN cent WHERE e.vec_id < 20
  ) WHERE rn <= 2
)
SELECT query_id, neighbor_id, cosine,
  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
FROM (
  SELECT p.query_id, a.vec_id AS neighbor_id,
    ROUND(list_cosine_similarity(q.v, a.v), 6) AS cosine
  FROM probes p
  JOIN assigned a ON a.cl = p.cl AND a.vec_id != p.query_id
  JOIN e q ON q.vec_id = p.query_id
)
QUALIFY rank <= 5
""",
)
def sim_topk_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 with a label-centroid coarse quantizer (nlist = #labels,
    nprobe 2): corpus vectors assign to their nearest centroid's inverted
    list; each query scans only its 2 closest lists, then exact re-rank.

    Here the quantizer is a one-pass aggregation with engine-exact
    integer arithmetic (the k-means variant re-trains its iterative
    Lloyd rounds in-oracle instead), and the selection stages quantize
    scores so the whole funnel carries a DuckDB oracle. Scale shape: the centroid table is 10
    rows, cached and broadcast; corpus assignment is ONE pass (max-struct
    argmax, no window over corpus x nlist); the only data shuffle is the
    inverted-list join keyed by centroid id."""
    from pyspark.sql import Window

    from ..operators.similarity import as_double_array, cosine_expr
    from ..operators.util import register_cache

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array("embedding").alias("__v")
    )
    micros = F.expr("transform(__v, x -> cast(floor(x * 1000000 + 0.5) as bigint))")
    ex = emb.select("label", F.posexplode(micros).alias("pos", "m"))
    cnt = emb.groupBy("label").agg(F.count("*").alias("n"))
    cent_rows = (
        ex.groupBy("label", "pos")
        .agg(F.sum("m").alias("s"))
        .join(cnt, "label")
        .withColumn("comp", F.col("s").cast("double") / F.lit(1000000.0) / F.col("n"))
    )
    cent = register_cache(
        cent_rows.groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, comp))), r -> r.comp)"
            ).alias("c")
        )
        .select(F.col("label").alias("cl"), "c")
    )

    # corpus assignment: ONE pass, no window — argmax as a max over
    # (quantized cos, -label, payload) structs; the tie-break mirrors the
    # oracle's (score DESC, label ASC)
    scored = emb.crossJoin(F.broadcast(cent)).withColumn(
        "__q", F.round(cosine_expr("__v", "c"), 4)
    )
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(
                F.col("__q").alias("q"),
                (-F.col("cl")).alias("nl"),
                F.col("__v").alias("v"),
            )
        ).alias("b")
    )
    assigned = best.select(
        F.col("vec_id").alias("nid"),
        (-F.col("b.nl")).alias("acl"),
        F.col("b.v").alias("nv"),
    )
    # probes: queries-only (20 x 10 rows) — the window here is trivial
    scored_q = (
        emb.filter("vec_id < 20")
        .crossJoin(F.broadcast(cent))
        .withColumn("__q", F.round(cosine_expr("__v", "c"), 4))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("__q"), F.asc("cl"))
    probes = (
        scored_q.withColumn("__rn", F.row_number().over(w))
        .filter("__rn <= 2")
        .select(F.col("vec_id").alias("query_id"), F.col("cl").alias("pcl"))
    )
    qv = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), F.col("__v").alias("qv")
    )
    cand = (
        probes.join(assigned, probes.pcl == assigned.acl)
        .filter(F.col("nid") != F.col("query_id"))
        .join(qv, "query_id")
        .withColumn("cosine", F.round(cosine_expr("qv", "nv"), 6))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter("rank <= 5")
        .select("query_id", F.col("nid").alias("neighbor_id"), "cosine", "rank")
    )


_BF_TOPK_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY q.vec_id
    ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC, c.vec_id
  ) AS INT) AS rank
FROM e q JOIN e c ON q.vec_id != c.vec_id
WHERE q.vec_id < 20
QUALIFY rank <= 5
"""


@query(
    "sim_recall_report",
    late=True,  # diagnostic composite of two windowed oracled paths
    oracle=f"""
WITH bf AS ({_BF_TOPK_SQL}),
lshk AS ({_lsh_topk_sql()})
SELECT bf.query_id,
  CAST(COUNT(lshk.neighbor_id) AS BIGINT) AS n_hits,
  ROUND(COUNT(lshk.neighbor_id) / 5.0, 6) AS recall_at_5
FROM bf LEFT JOIN lshk
  ON lshk.query_id = bf.query_id AND lshk.neighbor_id = bf.neighbor_id
GROUP BY bf.query_id
""",
)
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ANN quality as a first-class query: per-query recall@5 of
    the sign-LSH path against exact brute force. Both sides are
    deterministic (seeded hyperplanes, id-tiebroken ranks), so the recall
    numbers themselves hash-match a DuckDB replay — the continuous-
    monitoring shape for a production ANN index (run on a sampled query
    set; a recall drop flags drifted data or a stale index)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 20")
    bf = cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )
    lsh = cosine_topk_lsh(
        emb, queries, "vec_id", "embedding", k=5, bits=6, tables=8
    ).select("query_id", F.col("neighbor_id").alias("__ln"))
    hits = bf.join(
        lsh,
        (bf.query_id == lsh.query_id) & (bf.neighbor_id == lsh.__ln),
        "left",
    ).select(bf.query_id, lsh.__ln)
    return hits.groupBy("query_id").agg(
        F.count("__ln").alias("n_hits"),
        F.round(F.count("__ln") / 5.0, 6).alias("recall_at_5"),
    )


@query(
    "sim_quantize_int8",
    late=True,  # storage-side diagnostic; the search paths hold the window slots
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0 THEN 1.0
         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale
  FROM e
),
q AS (
  SELECT vec_id, v, scale,
    list_transform(v, x -> CAST(greatest(-127.0, least(127.0,
        floor(x / scale + 0.5))) AS INT)) AS qvec
  FROM s
)
SELECT vec_id, ROUND(scale, 6) AS scale,
  array_to_string(qvec, ',') AS qvec,
  ROUND(CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0 THEN 1.0
        ELSE list_cosine_similarity(v, list_transform(qvec, qq -> qq * scale))
        END, 6) AS recon_cosine
FROM q
""",
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding corpus with
    per-vector reconstruction cosine — the 4x storage/bandwidth lever for
    an ANN tier, quality-monitored in the same narrow pass (no shuffle,
    no Python). The int8 codes serialize to a CSV string in the QUERY
    output only (raw array columns break generic sort-then-hash
    harnesses — the r07 sim_vector_store driver err class)."""
    from ..operators.similarity import quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    out = quantize_int8(emb, "vec_id", "embedding")
    return out.withColumn(
        "qvec", F.concat_ws(",", F.col("qvec").cast("array<string>"))
    )


def _semantic_dedup_sql(nlist: int = 16, iters: int = 2, dim: int = 64,
                        threshold: float = 0.4) -> str:
    """Lloyd-training CTEs (shared with the IVF oracle) + the
    within-cluster pair drop: survivors = vectors with no smaller-id
    cluster-mate at cosine >= threshold (ROUND 6)."""
    ctes, prev = _km_train_ctes(nlist, iters, dim)
    ctes.append(_km_assign(prev, "asg").strip())
    return f"""
WITH {', '.join(ctes)},
losers AS (
  SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
)
SELECT vec_id, cid FROM asg
WHERE vec_id NOT IN (SELECT vec_id FROM losers)
"""


@query("sim_semantic_dedup", late=True, oracle=_semantic_dedup_sql())  # ANN
# family windowed via sim_topk_*; this composes clustering with the dedup rule
def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: deterministic k-means clusters
    (engine-exact Lloyd, re-trained bit-identically in the DuckDB oracle),
    within-cluster cosine pairs, lowest-id survivor per near-duplicate
    pair (operators/similarity.py ``semantic_dedup``). Threshold 0.4 is
    corpus-calibrated: the synthetic embeddings top out at cosine ~0.51,
    so the published 0.95-epsilon would be a no-op here — the rule,
    clustering, and survivor arithmetic are what the hash verifies."""
    from ..operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, "vec_id", "embedding", nlist=16, iters=2,
                          threshold=0.4)


def _semantic_dedup_incr_sql(nlist: int = 16, iters: int = 2, dim: int = 64,
                             threshold: float = 0.4) -> str:
    """Lloyd trained on the BASE (vec_id % 5 != 0), everyone assigned to
    the final centroids, increment survivors = no >=threshold partner in
    (base ∪ smaller-id increment) of the same cluster. Split-invariant:
    assignment and pair cosine are per-vector/per-pair properties, so the
    engine's touched-cluster pruning cannot change the answer."""
    ctes, prev = _km_train_ctes(nlist, iters, dim,
                                source_where="WHERE vec_id % 5 != 0")
    ctes.append(
        "e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    )
    ctes.append(_km_assign(prev, "asg", src="e2").strip())
    return f"""
WITH {', '.join(ctes)},
losers AS (
  SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
    ON a.cid = b.cid AND b.vec_id % 5 = 0
   AND (a.vec_id % 5 != 0 OR a.vec_id < b.vec_id)
  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
)
SELECT vec_id, cid FROM asg
WHERE vec_id % 5 = 0 AND vec_id NOT IN (SELECT vec_id FROM losers)
"""


@query("sim_semantic_dedup_incremental", late=True,
       oracle=_semantic_dedup_incr_sql())  # increment-vs-store sibling of
# sim_semantic_dedup; ANN family windowed via sim_topk_*
def sim_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Increment (vec_id % 5 = 0) deduped against the settled remainder
    through the persisted centroid store — base-vs-base pairs never
    generated, base side pruned to increment-touched clusters
    (operators/similarity.py ``semantic_dedup_incremental``)."""
    from ..operators.similarity import semantic_dedup_incremental

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)
    return semantic_dedup_incremental(base, inc, "vec_id", "embedding",
                                      nlist=16, iters=2, threshold=0.4)


def _vector_store_sql(nlist: int = 16, iters: int = 2, dim: int = 64,
                      threshold: float = 0.4) -> str:
    """The persisted vector store's full contents: Lloyd trained on the
    base (the centroid table's rows), everyone assigned, increment
    survivors per the incremental SemDeDup rule, and the int8 codes per
    the quantize_int8 arithmetic — one oracle hash over assignment,
    admission, and quantization at once."""
    ctes, prev = _km_train_ctes(nlist, iters, dim,
                                source_where="WHERE vec_id % 5 != 0")
    ctes.append(
        "e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    )
    ctes.append(_km_assign(prev, "asg", src="e2").strip())
    return f"""
WITH {', '.join(ctes)},
losers AS (
  SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
    ON a.cid = b.cid AND b.vec_id % 5 = 0
   AND (a.vec_id % 5 != 0 OR a.vec_id < b.vec_id)
  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
),
members AS (
  SELECT 'base' AS section, vec_id, cid FROM asg WHERE vec_id % 5 != 0
  UNION ALL
  SELECT 'added' AS section, vec_id, cid FROM asg
  WHERE vec_id % 5 = 0 AND vec_id NOT IN (SELECT vec_id FROM losers)
),
q AS (
  SELECT vec_id, v,
    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0 THEN 1.0
         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale0
  FROM e2
)
SELECT m.section, m.vec_id, m.cid, ROUND(q.scale0, 6) AS scale,
  array_to_string(list_transform(q.v, x -> CAST(greatest(-127.0, least(127.0,
      floor(x / q.scale0 + 0.5))) AS INT)), ',') AS qvec
FROM members m JOIN q ON m.vec_id = q.vec_id
"""


@query("sim_vector_store", late=True, oracle=_vector_store_sql())  # store
# sibling of dedup_signature_store; ANN family windowed via sim_topk_*
def sim_vector_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted VECTOR store as real lake tables
    (sources/fixtures.py ``build_vector_store`` — SURVEY §12 round-6
    item 3): per-vector rows (centroid assignment + raw vector + int8
    codes) keyed by vec_id plus the KB-sized centroid table.  C1 holds
    the settled base corpus; the increment dedups against the STORE
    (centroids and base assignments READ from the tables, never
    re-derived) and C2 upserts the admitted survivors — section 'base'
    = the C1 snapshot, 'added' = ``incremental(C1)``.  The oracle
    re-derives assignment, admission, and quantization from scratch, so
    a hash match proves the store round-trip changed nothing.  At
    100 TB: the store is THE ingest-time asset — admission work scales
    with the increment (touched clusters only), codes serve ANN at 4x
    less bandwidth, and raw vectors stay the exactness source of
    truth."""
    from ..sources.fixtures import C1, build_vector_store

    store, _cents = build_vector_store(spark, sf_dir)
    # qvec serializes to a CSV string: a raw array<int> output column is
    # un-canonicalizable by a generic pandas sort-then-hash harness
    # (unhashable list — the r07 driver err), and the stringified form
    # hashes identically on both sides.
    cols = [
        F.col("vec_id"), F.col("cid"), F.col("scale"),
        F.concat_ws(",", F.col("qvec").cast("array<string>")).alias("qvec"),
    ]
    base = store.snapshot(as_of=C1).select(F.lit("base").alias("section"), *cols)
    added = store.incremental(C1).select(F.lit("added").alias("section"), *cols)
    return base.unionByName(added)
