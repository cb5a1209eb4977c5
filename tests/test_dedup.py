"""Dedup operator tests (SURVEY §2 B8/B9): exact dedup invariants, MinHash
determinism + LSH recall against exact-Jaccard ground truth, SimHash
bucketing, embedding near-dup."""

import os

import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.operators.dedup import (
    char_shingles,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash,
    simhash_near_pairs,
    token_hashes,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    df.cache().count()
    return df


def test_exact_dedup_keeps_one_per_key(spark, docs):
    out = exact_dedup(docs, keys=["text"], order_by=["doc_id"])
    n_unique = docs.select("text").distinct().count()
    assert out.count() == n_unique
    # deterministic winner: the min doc_id of each text group
    expected = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    assert out.select("doc_id").exceptAll(expected.select("doc_id")).count() == 0


def test_minhash_signature_deterministic(spark, docs):
    base = (
        docs.limit(20)
        .select("doc_id", char_shingles("text", 5).alias("sh"))
        .withColumn("hs", shingle_hashes("sh"))
        .select("doc_id", minhash_signature("hs", 32).alias("sig"))
    )
    a = {r["doc_id"]: r["sig"] for r in base.collect()}
    b = {r["doc_id"]: r["sig"] for r in base.collect()}
    assert a == b
    assert all(len(s) == 32 for s in a.values())


def test_minhash_similarity_estimate(spark):
    """Signature agreement rate approximates Jaccard for near-identical
    and disjoint strings."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the morning light"),
        (2, "the quick brown fox jumps over the lazy dog in the morning lights"),
        (3, "completely different content with no shared shingles whatsoever xyz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = (
        df.select("doc_id", char_shingles("text", 5).alias("sh"))
        .withColumn("hs", shingle_hashes("sh"))
        .select("doc_id", minhash_signature("hs", 128).alias("sig"))
    )
    sigs = {r["doc_id"]: r["sig"] for r in sig.collect()}
    agree_12 = sum(x == y for x, y in zip(sigs[1], sigs[2])) / 128
    agree_13 = sum(x == y for x, y in zip(sigs[1], sigs[3])) / 128
    assert agree_12 > 0.7  # true jaccard ~0.9
    assert agree_13 < 0.2  # true jaccard ~0


def test_lsh_recall_vs_exact_jaccard(spark, docs):
    """Every pair with exact Jaccard >= 0.8 must be an LSH candidate
    (16 bands x 4 rows: P[candidate | j=0.8] ~ 1 - (1-0.8^4)^16 ~ 0.9997)."""
    sample = docs.filter("doc_id < 200")
    truth = set(
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(sample, "doc_id", "text", threshold=0.8).collect()
    )
    cand = set(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidate_pairs(sample, "doc_id", "text").collect()
    )
    if truth:
        recall = len(truth & cand) / len(truth)
        assert recall >= 0.95, f"LSH recall {recall} over {len(truth)} true pairs"


def test_minhash_dedup_survivors(spark, docs):
    """Survivors: no doc is dropped unless it has a verified >=0.8-Jaccard
    partner with a smaller id; survivor set includes min id of each group."""
    out = minhash_dedup(docs, "doc_id", "text", threshold=0.8)
    survivors = {r["doc_id"] for r in out.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    dropped = all_ids - survivors
    verified = ngram_jaccard_pairs(docs, "doc_id", "text",
                                   pairs=minhash_lsh_candidate_pairs(docs, "doc_id", "text"),
                                   threshold=0.8)
    losers = {r["id_b"] for r in verified.collect()}
    assert dropped == losers & all_ids
    assert min(all_ids) in survivors


def test_simhash_deterministic_and_near(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta thetaX"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(df, "doc_id", "text", max_hamming=63, prefix_bits=0).collect()
    }
    # near-identical token sets -> small hamming; disjoint -> large
    assert pairs[(1, 2)] <= 16
    assert pairs.get((1, 3), 64) > pairs[(1, 2)]


def test_embedding_neardup_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter("vec_id < 50")
    dup = emb.withColumn("vec_id", F.col("vec_id") + 100000)
    both = emb.unionByName(dup)
    pairs = embedding_neardup_pairs(both, "vec_id", "embedding", threshold=0.999)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every vector pairs with its exact copy at cosine 1.0
    expected = {(i, i + 100000) for i in range(50)}
    assert expected <= found


def test_embedding_lsh_recall_vs_exact(spark, sf_dir):
    """Sign-LSH bucketed near-dup vs the exact all-pairs baseline at a hard
    threshold (0.40 ~ the top of this corpus's natural cosine range, wide
    angles where sign-LSH recall is weakest). LSH must find >= 90% of the
    exact pairs and report identical cosines, with zero false positives
    (the exact verify filter guarantees precision = 1)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.40
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.40, bucket_bits=3, tables=16
        ).collect()
    }
    assert exact, "baseline found no pairs — threshold too high for corpus"
    assert set(lsh) <= set(exact)  # no false positives
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9 ({len(lsh)}/{len(exact)})"
    for p, c in lsh.items():
        assert c == exact[p]


def test_embedding_lsh_scaled_copies_full_recall(spark, sf_dir):
    """Positively-scaled copies share every sign bucket with the original,
    so the LSH path finds all planted duplicate pairs (recall exactly 1)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter("vec_id < 60")
    dup = emb.withColumn("vec_id", F.col("vec_id") + 100000).withColumn(
        "embedding", F.expr("transform(embedding, x -> x * float(3.0))")
    )
    both = emb.unionByName(dup)
    pairs = embedding_neardup_pairs(
        both, "vec_id", "embedding", threshold=0.99, bucket_bits=8, tables=8
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 100000) for i in range(60)} <= found


# --------------------------------------------------------------------------
# Embedding sign-LSH bucket-occupancy guard (SURVEY §13 lead 2)
# --------------------------------------------------------------------------
def _lsh_guard_corpus(spark, n_dupes=300):
    """400 uniform + 50 tight 4-clusters + ``n_dupes`` exact copies of one
    vector (the residual-bucket shape: identical vectors agree on every
    hyperplane, so reserve-bit splitting can never subdivide them)."""
    import numpy as np

    rng = np.random.default_rng(7)
    bg = rng.standard_normal((400, 16))
    centers = rng.standard_normal((50, 16))
    members = np.repeat(centers, 4, axis=0) + 0.05 * rng.standard_normal((200, 16))
    dupes = np.repeat(rng.standard_normal((1, 16)), n_dupes, axis=0)
    X = np.vstack([bg, members, dupes])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(8)


def test_embedding_bucket_cap_not_firing_is_bit_exact(spark):
    """With the guard armed but no bucket over the cap, output is exactly
    the unguarded LSH result (the guard restructures plans, not answers,
    below its threshold — the property that keeps the DuckDB gate green
    under the default scale profile)."""
    df = _lsh_guard_corpus(spark)

    def run(**kw):
        return {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_neardup_pairs(
                df, "vec_id", "embedding", threshold=0.95, dim=16,
                bucket_bits=6, tables=12, **kw,
            ).collect()
        }

    assert run() == run(bucket_cap=500)  # dup block = 300 < 500: never fires


def test_embedding_bucket_cap_residual_star(spark):
    """A 300-identical-vector block over a cap of 50: reserve bits cannot
    split it, so it star-pairs — every member connects to the min-id
    member at cosine 1.0 (linear, not quadratic), ordinary tight clusters
    keep exact full-pair recall, and the exact-cosine verify still
    guarantees zero false positives."""
    df = _lsh_guard_corpus(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.95, dim=16
        ).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.95, dim=16,
            bucket_bits=6, tables=12, bucket_cap=50,
        ).collect()
    }
    assert set(guarded) <= exact  # precision 1: verify filter intact
    # dupes are ids 600..899 -> star center 600 reaches every member
    assert {(600, i) for i in range(601, 900)} <= set(guarded)
    assert all(guarded[(600, i)] == 1.0 for i in range(601, 900))
    # the quadratic inside the residual bucket is GONE from the output
    dup_pairs = [p for p in guarded if p[0] >= 600 and p[1] >= 600]
    assert len(dup_pairs) == 299
    # tight clusters (ids 400..599, occupancy far below cap) keep exact recall
    cl_exact = {p for p in exact if 400 <= p[0] < 600 and 400 <= p[1] < 600}
    cl_guarded = {p for p in guarded if 400 <= p[0] < 600 and 400 <= p[1] < 600}
    assert cl_guarded == cl_exact


def test_embedding_bucket_cap_split_bounds_occupancy(spark):
    """A hot-but-splittable bucket (3000 DISTINCT vectors in a tight cone
    all sharing the primary bucket) splits on reserve bits down to ~cap
    occupancy instead of star-pairing: the guard only degrades to star
    when hyperplanes genuinely cannot separate members."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    X = base + 0.4 * rng.standard_normal((3000, 16))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # bucket_bits=2 -> ~4 primary buckets for 3000 cone vectors: all hot.
    pairs = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.999, dim=16,
        bucket_bits=2, tables=4, bucket_cap=100, reserve_bits=12,
    )
    # 0.4 noise means essentially no pairs at 0.999 — the point is the
    # plan completes without a 3000^2/2-per-table self-join and without
    # star-pairing (star pairs would all fail the 0.999 verify anyway);
    # assert the result is computed and tiny.
    assert pairs.count() < 100


def test_embedding_two_stage_verify_exact_at_boundary(spark):
    """The int8 sketch prefilter must be invisible in the output: pairs
    engineered with exact cosines densely straddling the threshold
    (within the INT8_COS_EPS margin band on both sides) classify
    identically to the exact all-pairs baseline — the prefilter only
    discards pairs PROVABLY below threshold, never borderline ones."""
    import numpy as np

    from hudi_delete_view_spark.operators.similarity import INT8_COS_EPS

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows = [(0, [float(x) for x in base])]
    # partners at controlled angles: cos in [thr - eps - .02, thr + .02]
    thr = 0.9
    ortho = rng.standard_normal(16)
    ortho -= ortho @ base * base
    ortho /= np.linalg.norm(ortho)
    for i, c in enumerate(np.linspace(thr - INT8_COS_EPS - 0.02, thr + 0.06, 60)):
        v = c * base + np.sqrt(1 - c * c) * ortho
        rows.append((i + 1, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=thr, dim=16
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=thr, dim=16,
            bucket_bits=1, tables=8,  # 1 bit: near-total collision -> the
            # prefilter, not the bucketing, does the work here
        ).collect()
    }
    pairs_with_0 = {p: c for p, c in exact.items() if p[0] == 0}
    assert len(pairs_with_0) >= 10  # boundary pairs really exist
    assert {p: c for p, c in lsh.items() if p[0] == 0} == pairs_with_0


# --------------------------------------------------------------------------
# SimHash bucket-occupancy cap (skew guard)
# --------------------------------------------------------------------------
def test_simhash_bucket_cap_splits_skewed_bucket(spark):
    """All-identical-prefix corpus (the judge's skew soak shape): every
    signature shares the top 12 bits, so uncapped bucketing piles all N
    rows into ONE bucket (N^2/2 comparisons in one task). With the cap,
    the bucket splits on the next ceil(log2(N/cap)) signature bits and
    occupancy falls to ~cap — linear again."""
    import random

    from hudi_delete_view_spark.operators.dedup import refine_simhash_buckets

    rnd = random.Random(7)
    n, cap = 512, 32
    rows = []
    for i in range(n):
        mid = rnd.randrange(16)  # bits 47..44 vary across 16 sub-buckets
        low = rnd.getrandbits(40)
        rows.append((i, (0xABC << 48) | (mid << 44) | low))
    s = spark.createDataFrame(rows, "__id long, __sim long")
    bucketed = s.withColumn("__bucket", F.shiftrightunsigned("__sim", 48))
    # uncapped: one bucket of n
    assert bucketed.select("__bucket").distinct().count() == 1
    refined = refine_simhash_buckets(bucketed, prefix_bits=12, bucket_cap=cap)
    occ = refined.groupBy("__bucket", "__eb").count().collect()
    assert all(r["__eb"] == 4 for r in occ)  # ceil(log2(512/32)) = 4
    assert len(occ) == 16
    assert max(r["count"] for r in occ) <= 3 * cap  # multinomial slack


def test_simhash_bucket_cap_keeps_near_pairs(spark):
    """Near-dup pairs differ only in LOW signature bits, so both members
    land in the same refined sub-bucket — the split loses a pair only when
    its Hamming difference intersects the split bits, which low-bit twins
    never do. Candidate preservation must be exact here."""
    import random

    from hudi_delete_view_spark.operators.dedup import refine_simhash_buckets

    rnd = random.Random(11)
    rows = []
    for i in range(100):
        mid = rnd.randrange(16)
        low = rnd.getrandbits(40)
        sim = (0xABC << 48) | (mid << 44) | low
        twin = sim ^ rnd.getrandbits(8)  # flip within the low 8 bits only
        rows.append((i, sim))
        rows.append((i + 1000, twin))
    s = spark.createDataFrame(rows, "__id long, __sim long")
    refined = refine_simhash_buckets(
        s.withColumn("__bucket", F.shiftrightunsigned("__sim", 48)),
        prefix_bits=12,
        bucket_cap=16,
    )
    a = refined.select(F.col("__id").alias("id_a"), "__bucket", "__eb")
    b = refined.select(F.col("__id").alias("id_b"), "__bucket", "__eb")
    cand = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, ["__bucket", "__eb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .collect()
    }
    assert all((i, i + 1000) in cand for i in range(100))


def test_simhash_cap_neutral_on_real_corpus(spark, sf_dir):
    """On the (non-pathological) documents corpus the cap must not change
    the answer: capped pairs == uncapped pairs at the operator defaults,
    which is also why the windowed dedup_simhash_pairs oracle stays valid
    with the cap off."""
    from hudi_delete_view_spark.operators.dedup import simhash_near_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(docs, "doc_id", "text", max_hamming=12).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=12, bucket_cap=64
        ).collect()
    }
    assert capped <= base
    assert base, "no pairs at hamming<=12 — corpus drifted?"
    recall = len(capped) / len(base)
    assert recall >= 0.9, f"cap recall {recall:.2f} ({len(capped)}/{len(base)})"


def test_incremental_dedup_matches_global_rule(spark, docs):
    """Incremental survivors == inc docs with no verified base partner and
    no smaller-id verified inc partner (the restricted-funnel contract,
    cross-checked against the GLOBAL verified-pair funnel)."""
    from hudi_delete_view_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_verified_pairs,
    )

    base = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    survivors = {
        r["doc_id"]
        for r in minhash_dedup_incremental(base, inc, "doc_id", "text", threshold=0.8)
        .select("doc_id").collect()
    }
    pairs = [
        (r["id_a"], r["id_b"])
        for r in minhash_verified_pairs(docs, "doc_id", "text", threshold=0.8)
        .select("id_a", "id_b").collect()
    ]
    inc_ids = {r["doc_id"] for r in inc.select("doc_id").collect()}
    dropped = {b for a, b in pairs if b in inc_ids} | {
        a for a, b in pairs if a in inc_ids and b not in inc_ids
    }
    assert survivors == inc_ids - dropped
    assert survivors  # non-degenerate: something survives


def test_incremental_dedup_no_base_pairs(spark, docs):
    """Base rows pass through untouched and never appear in the output."""
    from hudi_delete_view_spark.operators.dedup import minhash_dedup_incremental

    base = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    out = minhash_dedup_incremental(base, inc, "doc_id", "text")
    assert out.filter(F.col("doc_id") % 5 != 0).count() == 0
    assert out.columns == inc.columns


def test_shared_span_pairs_and_boilerplate_cap(spark):
    from hudi_delete_view_spark.operators.dedup import shared_span_pairs

    span = " ".join(f"w{i}" for i in range(16))
    boiler = " ".join(f"b{i}" for i in range(16))
    rows = [
        (1, span + " alpha beta gamma"),
        (2, "delta " + span),
        (3, "completely different words " + " ".join(f"x{i}" for i in range(16))),
    ] + [(10 + k, boiler + f" tail{k}") for k in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["n_spans"]
        for r in shared_span_pairs(df, "doc_id", "text", window=16).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1
    assert all(a == 1 and b == 2 for (a, b) in pairs if a < 10)
    # the boilerplate span pairs all 5 docs (C(5,2) = 10 pairs)...
    assert sum(1 for (a, b) in pairs if a >= 10) == 10
    # ...until the document-frequency cap drops it before the join
    capped = {
        (r["id_a"], r["id_b"])
        for r in shared_span_pairs(df, "doc_id", "text", window=16, max_span_df=3).collect()
    }
    assert capped == {(1, 2)}
    # short docs (< window tokens) are silently span-free, not an error
    short = spark.createDataFrame([(1, "a b c"), (2, "a b c")], ["doc_id", "text"])
    assert shared_span_pairs(short, "doc_id", "text", window=16).count() == 0


def test_signature_store_roundtrip_and_incremental(spark, sf_dir):
    """Signatures survive the lake round-trip bit-exactly (the store's
    snapshot equals recomputation) and incremental(S1) returns exactly
    the increment survivors."""
    from hudi_delete_view_spark.operators.dedup import (
        _signature_table,
        minhash_dedup_incremental,
    )
    from hudi_delete_view_spark.sources.fixtures import C1, build_signature_store

    store = build_signature_store(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    stored = {r["__id"]: r["__sig"] for r in store.snapshot(as_of=C1).collect()}
    fresh = {r["__id"]: list(r["__sig"]) for r in
             _signature_table(base, "doc_id", "text", 5, 64, 16).collect()}
    assert {k: list(v) for k, v in stored.items()} == fresh
    surv = {r["doc_id"] for r in
            minhash_dedup_incremental(base, inc, "doc_id", "text").select("doc_id").collect()}
    added = {r["__id"] for r in store.incremental(C1).select("__id").collect()}
    assert added == surv


def test_simhash_rotation_exact_recall_through_d4(spark):
    """Manku rotation theorem: with prefix 12 and 5 tables the rotated
    prefix windows tile all 60 bits, so a pair is missed only when every
    window holds a differing bit — impossible for d <= 4. Twins flipped
    at RANDOM positions (including the top prefix, which the single-table
    bucketing provably misses) must all be recovered."""
    import random

    from hudi_delete_view_spark.operators.dedup import simhash_pairs_from_sigs

    rnd = random.Random(23)
    rows, want, top_flipped = [], set(), set()
    for i in range(80):
        sim = rnd.getrandbits(60)
        d = 1 + (i % 4)  # Hamming 1..4
        positions = rnd.sample(range(60), d)
        twin = sim
        for p in positions:
            twin ^= 1 << p
        rows.append((i, sim))
        rows.append((i + 1000, twin))
        want.add((i, i + 1000))
        if any(p >= 48 for p in positions):
            top_flipped.add((i, i + 1000))
    assert top_flipped  # the hard cases exist
    s = spark.createDataFrame(rows, "__id long, __sim long")

    got_rot = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs_from_sigs(s, max_hamming=4, tables=5).collect()
    }
    assert want <= got_rot  # exact recall through d=4

    got_single = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs_from_sigs(s, max_hamming=4, tables=1).collect()
    }
    # single-table provably misses every top-prefix flip
    assert not (top_flipped & got_single)
    assert len(got_single) < len(got_rot)

    with pytest.raises(ValueError):
        simhash_pairs_from_sigs(s, tables=6, prefix_bits=12)  # 72 > 60 bits


def test_simhash_capped_rotation_recall_geq_uncapped(spark):
    """The judge's d<=2 criterion: on a corpus that NEEDS the occupancy
    cap (a bit-identical pathological pile) plus ordinary d<=2 twins with
    differences anywhere, capped+rotated recall >= uncapped single-table
    recall — the rotation buys back (more than) what the cap could cost."""
    import random

    from hudi_delete_view_spark.operators.dedup import simhash_pairs_from_sigs

    rnd = random.Random(31)
    rows, want = [], set()
    pile_sig = (0xDEF << 48) | rnd.getrandbits(40)
    for j in range(300):  # pathological pile: 300 identical signatures
        rows.append((5000 + j, pile_sig))
    for i in range(60):
        sim = rnd.getrandbits(60)
        d = 1 + (i % 2)
        twin = sim
        for p in rnd.sample(range(60), d):
            twin ^= 1 << p
        rows.append((i, sim))
        rows.append((i + 1000, twin))
        want.add((i, i + 1000))
    s = spark.createDataFrame(rows, "__id long, __sim long")

    def recall(pairs_df):
        got = {(r["id_a"], r["id_b"]) for r in pairs_df.collect()}
        return len(want & got) / len(want)

    r_uncapped = recall(simhash_pairs_from_sigs(s, max_hamming=2, tables=1))
    r_capped_rot = recall(
        simhash_pairs_from_sigs(s, max_hamming=2, tables=5, bucket_cap=32)
    )
    assert r_capped_rot >= r_uncapped
    assert r_capped_rot == 1.0  # twins are sparse; splits never touch them
    # and the pile's genuine duplicates (Hamming 0) all survive the cap
    pile = simhash_pairs_from_sigs(s, max_hamming=2, tables=5, bucket_cap=32)
    n_pile = pile.filter("id_a >= 5000").count()
    assert n_pile == 300 * 299 // 2


def test_scale_profile_resolution(monkeypatch):
    """Scale guards are ON by default (round-7 flip); PROFILE_DEFAULT
    resolves through the active profile; explicit values (including
    None = off) always win; env + programmatic opt-out both work,
    including the legacy "default" alias for "plain"."""
    from hudi_delete_view_spark import profile as prof

    monkeypatch.delenv(prof.PROFILE_ENV, raising=False)
    prof.set_profile(None)
    assert prof.active_profile() == "scale"  # guards armed out of the box
    assert prof.scale_mode()
    assert prof.simhash_bucket_cap(prof.PROFILE_DEFAULT) == prof.SIMHASH_BUCKET_CAP
    assert prof.simhash_bucket_cap(None) is None  # explicit off beats profile
    assert prof.simhash_bucket_cap(77) == 77

    monkeypatch.setenv(prof.PROFILE_ENV, "plain")
    assert not prof.scale_mode()
    assert prof.simhash_bucket_cap(prof.PROFILE_DEFAULT) is None

    monkeypatch.setenv(prof.PROFILE_ENV, "default")  # legacy alias
    assert prof.active_profile() == "plain"
    assert not prof.scale_mode()

    monkeypatch.delenv(prof.PROFILE_ENV, raising=False)
    prof.set_profile("plain")
    assert not prof.scale_mode()
    prof.set_profile(None)
    assert prof.scale_mode()
    with pytest.raises(ValueError):
        prof.set_profile("warp9")


def test_remove_boilerplate_spans_footer(spark):
    """A site-wide footer injected into several docs is cut from each;
    unique body text survives untouched; a doc that is ONLY footer comes
    back empty; docs shorter than the window are never candidates."""
    from hudi_delete_view_spark.operators.dedup import remove_boilerplate_spans

    footer = "copyright acme corp all rights reserved terms apply here"  # 9 tokens
    bodies = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet ultra infra deep",
    ]
    rows = [(i, b + " " + footer) for i, b in enumerate(bodies)]
    rows.append((10, footer))
    rows.append((11, "tiny doc"))
    out = {r["doc_id"]: r for r in remove_boilerplate_spans(
        spark.createDataFrame(rows, ["doc_id", "text"]), "doc_id", "text",
        window=8, min_span_df=2).collect()}
    for i, b in enumerate(bodies):
        assert out[i]["cleaned_text"] == b, out[i]["cleaned_text"]
        assert out[i]["n_tokens_removed"] == 9
    assert out[10]["cleaned_text"] == "" and out[10]["n_tokens_removed"] == 9
    assert out[11]["cleaned_text"] == "tiny doc" and out[11]["n_tokens_removed"] == 0


def test_embedding_merge_slices_output_identical(spark, sf_dir):
    """Round-8 shard-and-merge guard: slicing the (table, bucket) space
    into sequential jobs must change PLANS, never ANSWERS — the sliced
    pair set equals the single pass bit-exactly (incl. with the bucket
    guard armed, where residual star pairs ride their own slice), and
    the profile auto-arms only past the measured spill threshold."""
    from hudi_delete_view_spark.profile import (
        EMBEDDING_MERGE_SLICE_ROWS,
        PROFILE_DEFAULT,
        embedding_merge_slices,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def pairs(**kw):
        return sorted(
            (r.id_a, r.id_b, r.cosine)
            for r in embedding_neardup_pairs(
                emb, "vec_id", "embedding", threshold=0.35, **kw
            ).collect()
        )

    single = pairs()
    assert pairs(merge_slices=4) == single
    # with the occupancy guard armed too (star pairs ride a slice)
    guarded_single = pairs(bucket_cap=2, reserve_bits=4)
    assert pairs(bucket_cap=2, reserve_bits=4, merge_slices=3) == \
        guarded_single
    assert single  # non-empty corpus: the equality proves something
    # parquet bucketing spill (round-8-late: the 8M re-validation died
    # with persist — the spill path must be answer-identical too)
    import os as _os

    sp = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".scratch", "emb_spill_test")
    _os.makedirs(sp, exist_ok=True)
    assert pairs(merge_slices=4, spill_dir=sp) == single
    assert not _os.listdir(sp)  # the bucketing parquet was reclaimed

    # profile arming: off below the measured threshold, one slice per
    # EMBEDDING_MERGE_SLICE_ROWS above it, plain profile never slices
    assert embedding_merge_slices(EMBEDDING_MERGE_SLICE_ROWS) == 1
    assert embedding_merge_slices(EMBEDDING_MERGE_SLICE_ROWS * 2) == 2
    assert embedding_merge_slices(8_000_000) == -(
        -8_000_000 // EMBEDDING_MERGE_SLICE_ROWS)
    from hudi_delete_view_spark import profile as prof

    prof.set_profile("plain")
    try:
        assert embedding_merge_slices(10**9) == 1
    finally:
        prof.set_profile(None)
    # PROFILE_DEFAULT at gate scale resolves to a single pass
    assert pairs(merge_slices=PROFILE_DEFAULT) == single
