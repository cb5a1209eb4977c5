"""Curation operators: decontamination, sequence packing, mixture sampling."""

import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.operators.curation import (
    decontaminate,
    mixture_sample,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestDecontaminate:
    def test_shared_ngram_is_dropped(self, spark):
        shared = "one two three four five six seven eight"
        train = _docs(
            spark,
            [
                (1, "a", f"prefix {shared} suffix"),       # contains the test 8-gram
                (2, "a", "totally different words entirely here and now ok"),
            ],
        )
        test = _docs(spark, [(100, "t", shared)])
        clean, hits = decontaminate(train, test, n=8)
        assert [r.doc_id for r in hits.collect()] == [1]
        assert [r.doc_id for r in clean.collect()] == [2]

    def test_short_docs_never_contaminate(self, spark):
        train = _docs(spark, [(1, "a", "one two three")])
        test = _docs(spark, [(100, "t", "one two three")])  # < 8 tokens: no grams
        clean, hits = decontaminate(train, test, n=8)
        assert hits.count() == 0
        assert clean.count() == 1

    def test_plan_broadcasts_test_grams(self, spark):
        train = _docs(spark, [(1, "a", "x " * 20)])
        test = _docs(spark, [(100, "t", "y " * 20)])
        clean, _ = decontaminate(train, test, n=8)
        plan = clean._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestPackSequences:
    def test_offsets_and_chunks(self, spark):
        # tokens: 3, 4, 2 in one shard; context_len=4
        df = _docs(
            spark,
            [(1, "s", "a b c"), (2, "s", "d e f g"), (3, "s", "h i")],
        )
        out = {r.doc_id: r for r in pack_sequences(df, context_len=4).collect()}
        assert (out[1].start_offset, out[1].first_chunk, out[1].last_chunk) == (0, 0, 0)
        # doc 2 spans offset 3..6 -> chunks 0..1
        assert (out[2].start_offset, out[2].first_chunk, out[2].last_chunk) == (3, 0, 1)
        assert out[2].n_chunks == 2
        # doc 3 spans offset 7..8 -> chunks 1..2
        assert (out[3].start_offset, out[3].first_chunk, out[3].last_chunk) == (7, 1, 2)

    def test_shards_are_independent(self, spark):
        df = _docs(
            spark,
            [(1, "s1", "a b"), (2, "s2", "c d"), (3, "s1", "e f")],
        )
        out = {r.doc_id: r.start_offset for r in pack_sequences(df, 4).collect()}
        assert out == {1: 0, 2: 0, 3: 2}

    def test_empty_doc_spans_no_chunk(self, spark):
        df = _docs(spark, [(1, "s", "a b c"), (2, "s", "")])
        out = {r.doc_id: r for r in pack_sequences(df, 4).collect()}
        assert out[2].n_tokens == 0
        assert out[2].n_chunks == 0


class TestMixtureSample:
    def test_rates_match_target_mixture(self, spark):
        rows = [(i, "heavy" if i % 3 else "light", "w") for i in range(3000)]
        df = _docs(spark, rows)
        kept = mixture_sample(df, {"heavy": 3.0, "light": 1.0})
        counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # T = min(2000/3, 1000/1) = 666.67 -> heavy rate = 3*T/2000 = 1.0
        # (binding: keeps all), light rate = 1*T/1000 = 0.667
        assert counts["heavy"] == 2000
        assert 0.60 <= counts["light"] / 1000 <= 0.74

    def test_deterministic_under_repartition(self, spark):
        rows = [(i, f"src{i % 4}", "w") for i in range(400)]
        df = _docs(spark, rows)
        w = {f"src{i}": float(i + 1) for i in range(4)}
        a = sorted(r.doc_id for r in mixture_sample(df, w).collect())
        b = sorted(r.doc_id for r in mixture_sample(df.repartition(13), w).collect())
        assert a == b

    def test_binding_source_keeps_everything(self, spark):
        rows = [(i, "big" if i < 900 else "small", "w") for i in range(1000)]
        df = _docs(spark, rows)
        kept = mixture_sample(df, {"big": 1.0, "small": 9.0})
        counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # small is binding: T = min(900/1, 100/9) = 11.1; small keeps 100%
        assert counts["small"] == 100


class TestShuffleShards:
    def test_positions_dense_and_deterministic(self, spark):
        from hudi_delete_view_spark.operators.curation import shuffle_shards

        df = _docs(spark, [(i, "s", "w") for i in range(200)])
        out = shuffle_shards(df, 4).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r.pos)
        # dense 0..k-1 positions per shard
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(len(ps)))
        # deterministic under repartition
        again = shuffle_shards(df.repartition(7), 4).collect()
        assert {(r.doc_id, r.shard, r.pos) for r in again} == {
            (r.doc_id, r.shard, r.pos) for r in out
        }

    def test_shards_balanced(self, spark):
        from hudi_delete_view_spark.operators.curation import shuffle_shards
        from pyspark.sql import functions as F2

        df = _docs(spark, [(i, "s", "w") for i in range(4000)])
        counts = [
            r.n
            for r in shuffle_shards(df, 8)
            .groupBy("shard")
            .agg(F2.count("*").alias("n"))
            .collect()
        ]
        assert len(counts) == 8
        assert max(counts) < 1.3 * min(counts)

    def test_breaks_source_locality(self, spark):
        from hudi_delete_view_spark.operators.curation import shuffle_shards

        # docs arrive grouped by source; after sharding each shard should
        # mix sources rather than inherit input order
        df = _docs(spark, [(i, f"src{i // 100}", "w") for i in range(400)])
        out = shuffle_shards(df, 4)
        per_shard_sources = (
            out.groupBy("shard").agg(F.countDistinct("source").alias("ns")).collect()
        )
        assert all(r.ns == 4 for r in per_shard_sources)


class TestChunkManifest:
    def test_chunks_reconstruct_exactly(self, spark):
        from hudi_delete_view_spark.operators.curation import chunk_manifest

        df = _docs(
            spark,
            [(i, f"s{i % 2}", " ".join(f"t{j}" for j in range(1 + (i * 7) % 13)))
             for i in range(40)],
        )
        man = chunk_manifest(df, context_len=8).collect()
        # per (source, chunk): spans sum to exactly 8 tokens, except the
        # final chunk of each shard
        totals = {}
        for r in man:
            totals[(r.source, r.chunk)] = totals.get((r.source, r.chunk), 0) + r.n_span_tokens
            assert 0 < r.n_span_tokens <= 8
            assert 0 <= r.doc_tok_from < r.doc_tok_to
        for src in {s for s, _ in totals}:
            chunks = sorted(c for s, c in totals if s == src)
            assert chunks == list(range(len(chunks)))  # dense chunk ids
            for c in chunks[:-1]:
                assert totals[(src, c)] == 8
        # every token of every doc appears exactly once
        tok_total = sum(r.n_span_tokens for r in man)
        expected = sum(1 + (i * 7) % 13 for i in range(40))
        assert tok_total == expected


import hashlib

import hypothesis.strategies as st
from hypothesis import given, settings


class TestCurationProperties:
    @settings(max_examples=6, deadline=None)
    @given(
        ntoks=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
        ctx=st.integers(min_value=1, max_value=16),
    )
    def test_pack_sequences_matches_model(self, spark, ntoks, ctx):
        df = _docs(
            spark,
            [(i, "s", " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(ntoks)],
        )
        got = {r.doc_id: r for r in pack_sequences(df, context_len=ctx).collect()}
        off = 0
        for i, n in enumerate(ntoks):
            r = got[i]
            assert r.n_tokens == n
            assert r.start_offset == off
            assert r.first_chunk == off // ctx
            if n > 0:
                assert r.last_chunk == (off + n - 1) // ctx
                assert r.n_chunks == r.last_chunk - r.first_chunk + 1
            else:
                assert r.n_chunks == 0
            off += n

    @settings(max_examples=6, deadline=None)
    @given(
        counts=st.dictionaries(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=1, max_value=120),
            min_size=2,
            max_size=3,
        ),
        weights=st.dictionaries(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=0.5, max_value=5.0, allow_nan=False),
            min_size=3,
            max_size=3,
        ),
    )
    def test_mixture_sample_matches_model(self, spark, counts, weights):
        rows, i = [], 0
        for s, c in sorted(counts.items()):
            for _ in range(c):
                rows.append((i, s, "w"))
                i += 1
        df = _docs(spark, rows)
        w = {s: weights[s] for s in counts}
        got = sorted(r.doc_id for r in mixture_sample(df, w).collect())
        # exact Python replica of the operator's arithmetic
        t = min(counts[s] / w[s] for s in counts)
        import math
        rate = {s: math.floor(w[s] * t / counts[s] * 1000000.0) / 1000000.0 for s in counts}
        exp = [
            doc_id
            for doc_id, s, _ in rows
            if int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 4294967296.0
            < rate[s]
        ]
        assert got == exp

    @settings(max_examples=6, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12).map(
                lambda xs: " ".join(xs)
            ),
            min_size=2,
            max_size=10,
        ),
        n=st.integers(min_value=2, max_value=4),
    )
    def test_decontaminate_matches_model(self, spark, docs, n):
        rows = [(i, "s", t) for i, t in enumerate(docs)]
        train = [r for r in rows if r[0] % 2 == 0]
        test = [r for r in rows if r[0] % 2 == 1]
        if not train or not test:
            return
        clean, hits = decontaminate(
            _docs(spark, train), _docs(spark, test), n=n
        )

        def grams(t):
            toks = [x for x in t.split() if x]
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

        test_grams = set().union(*(grams(t) for _, _, t in test))
        exp_hits = sorted(i for i, _, t in train if grams(t) & test_grams)
        assert sorted(r.doc_id for r in hits.collect()) == exp_hits
        assert sorted(r.doc_id for r in clean.collect()) == sorted(
            i for i, _, _ in train if i not in exp_hits
        )


def test_contamination_provenance_pairs(spark):
    from hudi_delete_view_spark.operators.curation import contamination_provenance

    shared = "one two three four five six seven eight"
    train = _docs(
        spark,
        [(1, "a", f"x {shared} y"), (2, "a", f"z {shared} w"), (3, "a", "clean " * 10)],
    )
    test = _docs(spark, [(100, "t", shared), (101, "t", "other words " * 6)])
    got = {
        (r.train_id, r.test_id): r.n_shared_grams
        for r in contamination_provenance(train, test, n=8).collect()
    }
    # both contaminated docs point at test doc 100, never 101
    assert set(got) == {(1, 100), (2, 100)}
    assert all(n >= 1 for n in got.values())


def test_assign_split_disjoint_exhaustive(spark, sf_dir):
    import os
    from pyspark.sql import functions as F

    from hudi_delete_view_spark.operators.curation import assign_split

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = assign_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    by = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(by.values()) == n  # exhaustive (one split per row)
    assert set(by) <= {"train", "val", "test"} and by["train"] > by.get("val", 0)
    # deterministic across recomputation
    again = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id",
             {"train": 0.8, "val": 0.1, "test": 0.1}).select("doc_id", "split").collect()}
    first = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    assert first == again
    import pytest as _pt
    with _pt.raises(ValueError):
        assign_split(docs, "doc_id", {"train": 0.5, "val": 0.1})


def test_domain_cap(spark):
    """Per-domain cap: no domain exceeds the cap, under-cap domains pass
    through whole, survivors are the deterministic top-by-order set, and
    the physical plan carries WindowGroupLimit (partition-level top-k —
    a hot domain never sorts its full tail)."""
    from hudi_delete_view_spark.operators.curation import domain_cap

    rows = [(i, f"d{i % 3}", (i * 37) % 100) for i in range(30)]
    rows += [(100 + i, "rare", i) for i in range(2)]  # under cap
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = domain_cap(df, "source", cap=5)
    got = {(r["source"], r["doc_id"]) for r in out.collect()}
    by_src = {}
    for s, d in got:
        by_src.setdefault(s, []).append(d)
    assert all(len(v) <= 5 for v in by_src.values())
    assert len(by_src["rare"]) == 2  # under-cap domain untouched
    # survivors = top-5 by (n_chars desc, doc_id asc) per domain, exactly
    import collections

    expect = collections.defaultdict(list)
    for i, s, n in rows:
        expect[s].append((-n, i))
    for s, v in expect.items():
        top = {i for _n, i in sorted(v)[:5]}
        assert {d for ss, d in got if ss == s} == top
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
