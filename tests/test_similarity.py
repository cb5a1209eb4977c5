"""Similarity-search tests (B10): brute-force correctness against numpy,
LSH recall against brute force."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    df.cache().count()
    return df


def _numpy_topk(vectors: dict, query_ids, k=5):
    ids = sorted(vectors)
    mat = np.array([vectors[i] for i in ids], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for q in query_ids:
        qi = ids.index(q)
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        cos = np.round(cos, 6)
        order = sorted(
            ((float(cos[j]), ids[j]) for j in range(len(ids)) if ids[j] != q),
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [(nid, c) for c, nid in order[:k]]
    return out


def test_bruteforce_matches_numpy(spark, emb):
    sample = emb.filter("vec_id < 200")
    vectors = {r["vec_id"]: list(r["embedding"]) for r in sample.collect()}
    queries = sample.filter("vec_id < 10")
    got = cosine_topk_bruteforce(sample, queries, "vec_id", "embedding", k=5)
    got_by_q = {}
    for r in got.collect():
        got_by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    want = _numpy_topk(vectors, range(10), k=5)
    for q in range(10):
        got_list = [(nid, c) for _, nid, c in sorted(got_by_q[q])]
        for (g_id, g_cos), (w_id, w_cos) in zip(got_list, want[q]):
            assert g_id == w_id and abs(g_cos - w_cos) < 1e-5, (q, got_list, want[q])


def test_lsh_recall_vs_bruteforce(spark, emb):
    """Approximate top-5 must beat random-candidate recall (recall@5).

    Uniform random 64-dim vectors are sign-LSH's hard case (top neighbors
    sit near cosine 0.45); with 6-bit buckets x 8 tables measured recall is
    ~0.4 at a ~12% candidate fraction — assert a floor that catches broken
    bucketing (random candidates would give ~12%)."""
    queries = emb.filter("vec_id < 20")
    exact = cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=5)
    approx = cosine_topk_lsh(emb, queries, "vec_id", "embedding", k=5, bits=6, tables=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.25, f"recall@5 {recall}"


def test_lsh_candidates_are_exactly_reranked(spark, emb):
    """Cosines reported by the LSH path must equal brute-force cosines for
    the same (query, neighbor) pairs — the re-rank is exact."""
    queries = emb.filter("vec_id < 5")
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=2000).collect()
    }
    approx = cosine_topk_lsh(emb, queries, "vec_id", "embedding", k=5)
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert abs(r["cosine"] - exact[key]) < 1e-9


def test_ivf_recall_vs_bruteforce(spark, emb):
    """IVF with nprobe=4 of nlist=16 scans ~25% of the corpus; recall must
    clearly beat that random-scan floor."""
    from hudi_delete_view_spark.operators.similarity import cosine_topk_ivf

    queries = emb.filter("vec_id < 20")
    exact = cosine_topk_bruteforce(emb, queries, "vec_id", "embedding", k=5)
    approx = cosine_topk_ivf(emb, queries, "vec_id", "embedding", k=5, nlist=16, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"IVF recall@5 {recall}"


def test_ivf_deterministic(spark, emb):
    from hudi_delete_view_spark.operators.similarity import cosine_topk_ivf

    queries = emb.filter("vec_id < 5")
    a = sorted(map(tuple, cosine_topk_ivf(emb, queries, "vec_id", "embedding", k=3).collect()))
    b = sorted(map(tuple, cosine_topk_ivf(emb, queries, "vec_id", "embedding", k=3).collect()))
    assert a == b


def test_quantize_int8_quality_and_zero_guard(spark, sf_dir):
    import os
    from pyspark.sql import functions as F

    from hudi_delete_view_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = quantize_int8(emb, "vec_id", "embedding")
    rows = out.collect()
    assert len(rows) == emb.count()
    # int8 range respected, reconstruction good for real vectors
    assert all(-127 <= q <= 127 for r in rows for q in r["qvec"])
    assert min(r["recon_cosine"] for r in rows) > 0.995
    # zero vector: finite output, zero codes
    z = spark.createDataFrame([(1, [0.0] * 8)], "vec_id long, embedding array<double>")
    rz = quantize_int8(z, "vec_id", "embedding").collect()[0]
    assert rz["scale"] == 1.0 and set(rz["qvec"]) == {0}


def test_semantic_dedup_drops_near_identical(spark):
    """Planted near-identical vectors (cosine ~1) collapse to the lowest
    id; well-separated vectors all survive; the survivor set is exactly
    corpus minus higher-id twins."""
    import random

    from hudi_delete_view_spark.operators.similarity import semantic_dedup

    rnd = random.Random(5)
    rows = []
    for i in range(40):
        base = [rnd.gauss(0, 1) for _ in range(16)]
        rows.append((i, base))
        if i % 4 == 0:  # plant a twin with a tiny perturbation
            rows.append((1000 + i, [x + rnd.gauss(0, 1e-4) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    surv = {r["vec_id"] for r in semantic_dedup(
        df, "vec_id", "embedding", nlist=4, iters=2, threshold=0.99).collect()}
    assert set(range(40)) <= surv          # every base vector survives
    assert not {v for v in surv if v >= 1000}  # every twin dropped


def test_semantic_dedup_incremental_twins(spark):
    """Increment twins of base vectors die; novel increment vectors
    survive; a twin of a DROPPED increment vector survives iff its base
    partner is gone — mirrors the minhash incremental drop rule."""
    import random

    from hudi_delete_view_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    rnd = random.Random(9)
    base_rows, inc_rows = [], []
    for i in range(30):
        v = [rnd.gauss(0, 1) for _ in range(16)]
        base_rows.append((i, v))
        if i % 3 == 0:  # increment twin of a base vector
            inc_rows.append((1000 + i, [x + rnd.gauss(0, 1e-4) for x in v]))
    for j in range(10):  # novel increment vectors
        inc_rows.append((2000 + j, [rnd.gauss(0, 1) for _ in range(16)]))
    base = spark.createDataFrame(base_rows, "vec_id long, embedding array<double>")
    inc = spark.createDataFrame(inc_rows, "vec_id long, embedding array<double>")
    surv = {r["vec_id"] for r in semantic_dedup_incremental(
        base, inc, nlist=4, iters=2, threshold=0.99).collect()}
    assert surv == {2000 + j for j in range(10)}


def test_vector_store_is_the_read_path(spark, sf_dir):
    """build_vector_store persists centroids + assignments as lake
    tables; dedup through the STORE-read state must equal the retrained
    path bit-for-bit (deterministic Lloyd), and the store's sections
    must partition base/admitted rows."""
    import pyspark.sql.functions as F

    from hudi_delete_view_spark.operators.similarity import (
        semantic_dedup_incremental,
    )
    from hudi_delete_view_spark.sources.fixtures import C1, build_vector_store

    store, cents = build_vector_store(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)

    retrained = {(r["vec_id"], r["cid"]) for r in semantic_dedup_incremental(
        base, inc, "vec_id", "embedding", nlist=16, iters=2, threshold=0.4
    ).collect()}
    base_asg = store.snapshot(as_of=C1).select(
        F.col("vec_id").alias("__vid"), F.col("embedding").alias("__v"), "cid")
    from_store = {(r["vec_id"], r["cid"]) for r in semantic_dedup_incremental(
        base, inc, "vec_id", "embedding", nlist=16, iters=2, threshold=0.4,
        centroids=cents.snapshot().select("cid", "cvec"), base_asg=base_asg,
    ).collect()}
    assert from_store == retrained

    n_base = base.count()
    assert store.snapshot(as_of=C1).count() == n_base
    added = {r["vec_id"] for r in store.incremental(C1).collect()}
    assert added == {v for v, _ in from_store}
    # idempotent reuse: a second build call serves the existing tables
    store2, _ = build_vector_store(spark, sf_dir)
    assert store2.timeline.timestamps() == store.timeline.timestamps()
