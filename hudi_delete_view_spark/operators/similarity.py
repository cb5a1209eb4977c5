"""Similarity search over embedding columns (SURVEY §2 B10).

Two paths, same semantics:

- ``cosine_topk_bruteforce`` — exact: query x corpus join with a JVM-side
  dot product (``zip_with`` + ``aggregate`` higher-order expressions; no
  Python in the loop). O(Q x N) — the verification baseline, and the right
  choice when Q is small (Catalyst broadcasts the query side).
- ``cosine_topk_lsh`` — the scale path: random-hyperplane sign buckets
  (deterministic seeded planes), multi-probe across tables; candidates =
  bucket collisions only, then exact re-rank per query. Recall is tunable
  with (tables, bits); the pytest suite measures it against brute force.

At 100 TB the corpus side stays partitioned by bucket; only the tiny plane
matrix and query set are broadcast. No driver-side vectors anywhere.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_double_array(col_name: str):
    return F.expr(f"transform({col_name}, x -> cast(x as double))")


def dot_expr(a: str, b: str):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)")


def norm_expr(a: str):
    return F.sqrt(F.expr(f"aggregate(transform({a}, x -> x * x), 0.0D, (acc, v) -> acc + v)"))


def cosine_expr(a: str, b: str):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_pandas():
    """Arrow-batched cosine for the candidate-verify hot path: one numpy
    pass per batch instead of an interpreted zip_with/aggregate fold per
    row (~4k interpreted ops per 64-dim pair). Used where candidate
    volume makes the HOF form the bottleneck; the HOF ``cosine_expr``
    stays the dependency-free form for small/oracle baselines."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.to_numpy())
        B = np.vstack(b.to_numpy())
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        return pd.Series(num / den)

    return _cos


# Provable per-pair cosine error bound of the int8 sketch below: with
# per-vector scale s = max|x|/127, component error <= s/2, so
# ||e|| <= sqrt(d)*s/2 <= sqrt(d)*||x||/254 and
# |cos(a,b) - cos_int8(a,b)| <= ||e_a||/||a|| + ||e_b||/||b|| + tiny
# = 2*sqrt(d)/254 (= 0.063 at d=64). EPS below is that bound padded to
# the next round number — pairs whose sketch cosine falls below
# threshold - EPS are PROVABLY below threshold and safe to discard
# before full vectors are ever attached.
INT8_COS_EPS = 0.08


def int8_sketch_pandas():
    """Arrow-batched int8 vector sketch: per-vector symmetric scale
    quantization packed as (bytes, norm) — 64 bytes + 8 instead of 512
    for a 64-dim double vector. The narrow form candidate pairs
    re-attach for the verify PREFILTER (the full-width re-attach of
    every candidate is what exhausted local disk at 4M vectors)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<q: binary, s: double, n: double>")
    def _sketch(v: pd.Series) -> pd.DataFrame:
        X = np.vstack(v.to_numpy())
        mx = np.abs(X).max(axis=1)
        scale = np.where(mx > 0, mx / 127.0, 1.0)
        Q = np.rint(X / scale[:, None]).astype(np.int8)
        return pd.DataFrame(
            {
                "q": [q.tobytes() for q in Q],
                "s": scale,
                "n": np.sqrt((X * X).sum(axis=1)),
            }
        )

    return _sketch


def int8_cosine_pandas():
    """Sketch-pair approximate cosine: dot(int8, int8)*s_a*s_b /
    (n_a*n_b) — within INT8_COS_EPS of the exact cosine (bound above)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
        # struct-typed args arrive as pd.DataFrames with the fields as
        # columns (Arrow struct -> pandas)
        A = np.vstack(
            [np.frombuffer(x, dtype=np.int8) for x in a["q"]]
        ).astype(np.float64)
        B = np.vstack(
            [np.frombuffer(x, dtype=np.int8) for x in b["q"]]
        ).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = a["n"].to_numpy() * b["n"].to_numpy()
        den = np.where(den > 0, den, 1.0)
        return pd.Series(num * a["s"].to_numpy() * b["s"].to_numpy() / den)

    return _cos


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).

    Returns (query_id, neighbor_id, cosine, rank). Cosine is rounded to 6
    decimals *before* ranking so the ordering is stable across engines
    (ties broken by neighbor id).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("__cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("__qv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr("__qv", "__cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 42) -> list[list[list[float]]]:
    """Deterministic gaussian hyperplanes: tables x bits x dim."""
    rnd = random.Random(seed)
    return [
        [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


def _bucket_expr(vec: str, planes: list[list[float]]):
    """Sign-bucket id: bit b set iff dot(vec, plane_b) >= 0. (Interpreted
    HOF form — kept as the dependency-free reference; the hot paths use
    ``sign_buckets_pandas``, one Arrow-batched matmul for ALL tables.)"""
    terms = []
    for b, plane in enumerate(planes):
        arr = "array(" + ",".join(f"{x!r}D" for x in plane) + ")"
        terms.append(
            f"IF(aggregate(zip_with({vec}, {arr}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) >= 0.0D,"
            f" shiftleft(1L, {b}), 0L)"
        )
    return F.expr(" + ".join(terms))


def sign_buckets_pandas(planes: list[list[list[float]]]):
    """All tables' sign-bucket ids in ONE Arrow-batched numpy matmul:
    (batch x dim) @ (dim x tables*bits) -> signs -> per-table bucket ids.
    Higher-order SQL expressions never enter whole-stage codegen, so the
    tables x bits x dim dot products are ~50x slower interpreted than this
    single vectorized pass (same trade as minhash_signature_pandas).
    Returns a UDF: array<double> vector -> array<long> of len(tables),
    index-aligned with the plane tables (posexplode pos == table idx)."""
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)  # (tables, bits, dim)
    tables, bits, dim = P.shape
    M = P.reshape(tables * bits, dim).T.copy()  # (dim, tables*bits)
    weights = (1 << np.arange(bits, dtype=np.int64))  # bit b of the bucket

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        X = np.vstack(vecs.to_numpy())  # (n, dim)
        signs = (X @ M) >= 0.0
        B = (signs.reshape(len(X), tables, bits) * weights).sum(axis=2)
        return pd.Series(list(B))

    return _buckets


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    bits: int = 6,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, exact re-rank of candidates.

    Candidates = vectors sharing a bucket with the query in >=1 of
    ``tables`` hash tables; expected candidate fraction ~= tables / 2^bits
    of the corpus per query (vs. 100% for brute force). Recall depends on
    how tight the true neighbors are: for P(bit agree) = 1 - theta/pi,
    P(candidate) = 1 - (1 - p^bits)^tables. The defaults target uniform
    random vectors (weak neighbors, the hard case); clustered real-world
    embeddings support higher ``bits`` for more pruning."""
    planes = _hyperplanes(dim, bits, tables, seed)
    bucket_udf = sign_buckets_pandas(planes)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("__qv"))

    def _explode_buckets(df, vec, id_name):
        # one Arrow-batched matmul computes every table's bucket id,
        # posexplode yields (table_idx, bucket) rows — no T-way union of
        # the scan. Vectors are dropped BEFORE the bucket join: the
        # collision join and the pair dedup shuffle 16-byte id pairs, not
        # 0.5 KB vectors (the difference between a light and a crushing
        # shuffle at 100 TB)
        return df.select(
            id_name, F.posexplode(bucket_udf(F.col(vec))).alias("__t", "__b")
        )

    cb = _explode_buckets(c, "__cv", "neighbor_id")
    qb = _explode_buckets(q, "__qv", "query_id")
    cand_ids = (
        qb.join(cb, ["__t", "__b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # a pair may collide in several tables
    )
    # re-attach vectors only to surviving pairs (query side broadcasts)
    cand = cand_ids.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
    scored = cand.withColumn("cosine", F.round(cosine_expr("__qv", "__cv"), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: centroid partitioning instead of hash buckets
# --------------------------------------------------------------------------
def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Deterministic mini k-means (Lloyd): init = the ``nlist`` lowest-id
    vectors, then ``iters`` rounds of assign + recompute. Returns
    (cid, cvec).

    Engine-exact by construction, which is what lets the ITERATIVE
    training carry a bit-level DuckDB oracle (SURVEY §10.2): assignment
    compares cosines quantized to 4 decimals with a lowest-cid tie-break
    (a cross-engine flip would need two engines' cosines to straddle a
    0.5e-4 grid edge within ~1e-12 — same robustness class as the other
    sim oracles), and the centroid recompute is an integer-micro mean —
    ``floor(x*1e6 + 0.5)`` summed as BIGINT, divided in a fixed order —
    so every Lloyd round produces bit-identical doubles in any engine
    regardless of float summation order. The oracle unrolls the same
    rounds as nested CTEs (``queries/similarity.py``).

    Scale shape: centroids are KB-sized and broadcast; assignment is a
    narrow map over the corpus; the mean recompute explodes to
    (rows x dim) only during the offline build."""
    v = corpus.select(F.col(id_col).alias("__vid"), as_double_array(vec_col).alias("__v"))
    head = v.orderBy("__vid").limit(nlist)
    cent = head.select(
        (F.row_number().over(Window.orderBy("__vid")) - 1).cast("long").alias("cid"),
        F.col("__v").alias("cvec"),
    )
    for _ in range(iters):
        assigned = _assign(v, cent)
        cent = (
            assigned.select("cid", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.expr("cast(floor(val * 1000000 + 0.5) as bigint)")).alias("s"),
                F.count("*").alias("n"),
            )
            .withColumn(
                "m", F.col("s").cast("double") / F.lit(1000000.0) / F.col("n")
            )
            .groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__pm")
            )
            .select("cid", F.expr("transform(__pm, x -> x.m)").alias("cvec"))
        )
    return cent


def _assign(v: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector by cosine quantized to 4 decimals
    (ties -> lowest cid) — the engine-portable argmax (see
    ``ivf_centroids``)."""
    scored = v.crossJoin(F.broadcast(cent.select("cid", "cvec"))).withColumn(
        "__cs", F.round(cosine_expr("__v", "cvec"), 4)
    )
    w = Window.partitionBy("__vid").orderBy(F.desc("__cs"), F.asc("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__vid", "__v", "cid")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Approximate top-k via IVF: corpus vectors are bucketed by nearest
    centroid (the inverted lists); a query scans only its ``nprobe``
    closest lists, then re-ranks candidates exactly.

    Expected scanned fraction ~ nprobe/nlist of the corpus. At 100 TB the
    inverted lists are the table's partition key, so probing prunes
    partitions at the source; centroids and queries broadcast."""
    from .util import register_cache

    # register_cache: persist + materialize once, tracked for release via
    # util.unpersist_operator_caches() (long-lived sessions)
    cent = register_cache(ivf_centroids(corpus, id_col, vec_col, nlist, iters))
    v = corpus.select(F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("__cv"))
    lists = register_cache(
        _assign(v.withColumnRenamed("neighbor_id", "__vid").withColumnRenamed("__cv", "__v"), cent)
        .select(F.col("__vid").alias("neighbor_id"), F.col("__v").alias("__cv"), "cid")
    )

    q = queries.select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("__qv"))
    # probe selection quantized like the assignment (engine-portable order)
    qscore = q.crossJoin(F.broadcast(cent)).withColumn(
        "__cs", F.round(cosine_expr("__qv", "cvec"), 4)
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__cs"), F.asc("cid"))
    probes = (
        qscore.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "cid")
    )
    cand = probes.join(lists, "cid").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn("cosine", F.round(cosine_expr("__qv", "__cv"), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Scalar quantization (int8) — the storage-side ANN component
# --------------------------------------------------------------------------
def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5) (explicit half-up — identical in DuckDB,
    unlike engine-native round()), clamped to [-127, 127]. Returns
    (id, scale, qvec, recon_cosine): the quantized codes plus the cosine
    between the original vector and its dequantized reconstruction — the
    quality number a storage tier reports.

    At 100 TB this is the 4x storage/bandwidth lever for the ANN corpus
    (float32 -> int8): pure JVM HOFs, one narrow map, no shuffle; the
    reconstruction check rides the same pass so quality monitoring costs
    no extra scan.
    """
    from .util import spread

    v = "__qv"
    out = spread(df).select(
        F.col(id_col), as_double_array(vec_col).alias(v)
    ).withColumn(
        "__scale",
        F.expr(
            # zero-vector guard: scale 1.0 keeps the codes (all zero) and
            # the arithmetic finite instead of dividing by zero
            f"IF(aggregate({v}, 0.0D, (acc, x) -> greatest(acc, abs(x))) = 0.0D, 1.0D,"
            f" aggregate({v}, 0.0D, (acc, x) -> greatest(acc, abs(x))) / 127.0D)"
        ),
    )
    q = (
        f"transform({v}, x -> cast(greatest(-127.0D, least(127.0D, "
        f"floor(x / __scale + 0.5D))) as int))"
    )
    out = out.withColumn("qvec", F.expr(q)).withColumn(
        "__dq", F.expr("transform(qvec, q -> q * __scale)")
    )
    recon = F.when(
        (norm_expr(v) == 0.0) | (norm_expr("__dq") == 0.0), F.lit(1.0)
    ).otherwise(cosine_expr(v, "__dq"))
    return out.select(
        F.col(id_col),
        F.round("__scale", 6).alias("scale"),
        "qvec",
        F.round(recon, 6).alias("recon_cosine"),
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup-shape semantic deduplication (Abbas et al.): cluster the
    embedding space with the deterministic mini k-means
    (``ivf_centroids``), then WITHIN each cluster drop every vector that
    has a higher-similarity twin — pair rule cosine >= ``threshold``
    (ROUND 6), deterministic survivor = lowest id, same rule family as
    the text funnels.

    Scale shape (the published SemDeDup design point): the quadratic
    pair search runs per CLUSTER, never corpus-wide — expected cluster
    size is N/nlist, so nlist is the knob that bounds each task's
    comparisons at 100 TB (SemDeDup used 50k clusters for LAION-scale);
    centroids broadcast, assignment is one narrow map, and only id pairs
    shuffle out of the cluster join. Returns surviving (id, cid) rows."""
    v = corpus.select(
        F.col(id_col).alias("__vid"), as_double_array(vec_col).alias("__v")
    )
    cent = ivf_centroids(corpus, id_col, vec_col, nlist=nlist, iters=iters)
    asg = _assign(v, cent)
    from .util import register_cache

    asg = register_cache(asg)
    a = asg.select("cid", F.col("__vid").alias("id_a"), F.col("__v").alias("__va"))
    b = asg.select("cid", F.col("__vid").alias("id_b"), F.col("__v").alias("__vb"))
    losers = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", F.round(cosine_expr("__va", "__vb"), 6))
        .filter(F.col("__cos") >= threshold)
        .select(F.col("id_b").alias("__vid"))
        .distinct()
    )
    return asg.join(losers, "__vid", "left_anti").select(
        F.col("__vid").alias(id_col), "cid"
    )


def semantic_dedup_incremental(
    base: DataFrame,
    inc: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    base_asg: DataFrame | None = None,
) -> DataFrame:
    """Ingest-time SemDeDup: dedup an embedding INCREMENT against a
    settled corpus without re-pairing the corpus against itself — the
    vector-space mirror of ``minhash_dedup_incremental``.

    The coarse quantizer (centroids) is the persisted store asset trained
    on the BASE — pass ``centroids`` (cid, cvec) to READ it instead of
    re-training (deterministic Lloyd makes the two identical), and
    ``base_asg`` (__vid, __v, cid) to read the settled corpus's
    assignments from the vector store instead of re-assigning (the
    ingest-time shape: see fixtures.build_vector_store).  Base and
    increment both assign to it, and the base side is semi-joined down to
    clusters an increment member actually touches BEFORE the pair join —
    corpus-side work is proportional to cluster collisions with the
    increment, never corpus size. Drop rule: an increment vector dies iff
    it has cosine >= ``threshold`` against ANY base member of its cluster
    or a smaller-id increment member (the deterministic survivor rule of
    ``semantic_dedup`` restricted to pairs touching the increment).
    Returns surviving increment (id, cid) rows."""
    from .util import register_cache

    vi = inc.select(F.col(id_col).alias("__vid"), as_double_array(vec_col).alias("__v"))
    cent = (
        centroids
        if centroids is not None
        else ivf_centroids(base, id_col, vec_col, nlist=nlist, iters=iters)
    )
    asg_i = register_cache(_assign(vi, cent))
    touched = asg_i.select("cid").distinct()
    if base_asg is None:
        vb = base.select(
            F.col(id_col).alias("__vid"), as_double_array(vec_col).alias("__v")
        )
        base_asg = _assign(vb, cent)
    asg_b = base_asg.join(F.broadcast(touched), "cid", "left_semi")
    right = asg_i.select("cid", F.col("__vid").alias("id_b"), F.col("__v").alias("__vb"))
    base_inc = asg_b.select("cid", F.col("__vid").alias("id_a"), F.col("__v").alias("__va")).join(right, "cid")
    inc_inc = (
        asg_i.select("cid", F.col("__vid").alias("id_a"), F.col("__v").alias("__va"))
        .join(right, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    losers = (
        base_inc.unionByName(inc_inc)
        .withColumn("__cos", F.round(cosine_expr("__va", "__vb"), 6))
        .filter(F.col("__cos") >= threshold)
        .select(F.col("id_b").alias("__vid"))
        .distinct()
    )
    return asg_i.join(losers, "__vid", "left_anti").select(
        F.col("__vid").alias(id_col), "cid"
    )
