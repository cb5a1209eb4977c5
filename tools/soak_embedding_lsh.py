"""Measured corpus for the embedding-LSH geometry question (SURVEY §13
lead 2): does the auto-sized sign-LSH in ``embedding_neardup_pairs`` stay
sub-quadratic past ~1M vectors, where ``bucket_bits`` hits its 16-bit cap
(65k buckets/table) and per-bucket occupancy starts growing linearly with
n again?

Corpus shape (deterministic, numpy PCG64 seeded):
- 70% "background": uniform random unit vectors (no near-dup pairs —
  measures pure bucket-join overhead at the given occupancy).
- 30% "clusters": groups of ``cluster_size`` vectors around shared random
  centers with angular noise tight enough that within-cluster cosine
  >= 0.95 (the near-dup signal the operator exists to find).
- plus ``n_dupes`` exact copies of ONE vector (the skew block: extra
  hyperplane bits can never split identical vectors, so this measures the
  residual-bucket behavior the occupancy guard has to own).

Usage::

    python tools/soak_embedding_lsh.py 250000 1000000 [--dupes 2000] [--uncapped]

Default mode runs the GUARDED path (bucket_cap through the scale
profile: reserve-bit splitting + residual star pairing); ``--uncapped``
runs the pre-guard geometry instead (full pair semantics — WARNING: at
1M vectors with a 2000-dup block this exhausted 75 GB of shuffle spill
and died with SPILL_OUT_OF_MEMORY, which is the measurement that
motivated the guard).

Writes each corpus to .scratch/soak_vecs/n<NNN>.parquet (reused across
runs) and prints one line per n: wall seconds, pair count, auto geometry,
and the per-(table,bucket) occupancy p99/max that drives within-bucket
quadratic work.

Measured (local[32], SPARK_DRIVER_MEMORY=64g, 2026-08-16, final:
occupancy-2 auto geometry + bucket guard + two-stage int8 verify):

======  ========  ==========  ====  ======  =======
n       wall      pairs       bits  tables  occ p50
======  ========  ==========  ====  ======  =======
250k    58.3s     114,499     17    26      2
1M      168.7s    451,999     19    33      2
2M      408.2s    901,999     20    37      2
4M      859.1s    1,801,999   21    41      2
======  ========  ==========  ====  ======  =======

16x data = 14.7x wall (tables grow 26 -> 41 over the range, so the
per-(n*tables) cost actually FALLS). Earlier states of the operator on
the same corpora: occupancy-16 geometry DIED at 1M (>75 GB shuffle
spill re-attaching 512-byte vectors to ~350M candidates); occupancy-2
with the single-stage verify passed 1M (239s) but DIED on disk at 2M —
the two-stage int8 prefilter (INT8_COS_EPS-bounded, output-exact) is
what carries 2M/4M. Every pair count is exactly cluster pairs +
(n_dupes - 1) star pairs: the guard's output algebra, not an
approximation drift.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
CLUSTER_SIZE = 4
NOISE = 0.08  # angular noise: cos(center, member) ~ 0.997; pairwise >= 0.95


def make_corpus(n: int, n_dupes: int, path: str) -> None:
    if os.path.exists(path):
        return
    rng = np.random.default_rng(20260816)
    n_cluster_rows = int(n * 0.3) // CLUSTER_SIZE * CLUSTER_SIZE
    n_bg = n - n_cluster_rows - n_dupes
    bg = rng.standard_normal((n_bg, DIM), dtype=np.float32)
    centers = rng.standard_normal((n_cluster_rows // CLUSTER_SIZE, DIM), dtype=np.float32)
    members = np.repeat(centers, CLUSTER_SIZE, axis=0)
    members += NOISE * rng.standard_normal(members.shape, dtype=np.float32)
    dupes = np.repeat(rng.standard_normal((1, DIM), dtype=np.float32), n_dupes, axis=0)
    X = np.vstack([bg, members, dupes])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ids = np.arange(len(X), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.ravel(), type=pa.float32()), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)


def main() -> None:
    argv = sys.argv[1:]
    n_dupes = 2000
    if "--dupes" in argv:
        i = argv.index("--dupes")
        n_dupes = int(argv[i + 1])
        del argv[i : i + 2]
    uncapped = "--uncapped" in argv
    sizes = [int(a) for a in argv if not a.startswith("--")]
    if not sizes:
        sizes = [250_000, 1_000_000]

    from pyspark.sql import functions as F

    from hudi_delete_view_spark.operators.dedup import embedding_neardup_pairs
    from hudi_delete_view_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    import math

    for n in sizes:
        print(f"# corpus n={n}", flush=True)
        path = os.path.join(REPO, ".scratch", "soak_vecs", f"n{n}.parquet")
        make_corpus(n, n_dupes, path)
        df = spark.read.parquet(path)
        from hudi_delete_view_spark.profile import PROFILE_DEFAULT

        cap = None if uncapped else PROFILE_DEFAULT
        slices = None if uncapped else PROFILE_DEFAULT
        spill = os.path.join(REPO, ".scratch", "soak_vecs", "spill")
        os.makedirs(spill, exist_ok=True)
        t0 = time.time()
        pairs = embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.95, bucket_bits=None, dim=DIM,
            bucket_cap=cap, merge_slices=slices,
            spill_dir=None if uncapped else spill,
        )
        n_pairs = pairs.count()
        wall = time.time() - t0
        # reproduce the auto geometry for the report (keep in sync with
        # embedding_neardup_pairs' auto-sizing)
        bits = min(24, max(8, math.ceil(math.log2(max(n / 2, 2)))))
        p_bit = 1 - math.acos(0.95) / math.pi
        hit = p_bit**bits
        tables = max(8, math.ceil(math.log(0.01) / math.log(1 - hit)))
        # occupancy profile of the primary buckets (one table is
        # representative; use table 0)
        from hudi_delete_view_spark.operators.similarity import (
            _hyperplanes,
            as_double_array,
            sign_buckets_pandas,
        )

        planes = _hyperplanes(DIM, bits, 1, 42)
        budf = sign_buckets_pandas(planes)
        occ = (
            df.select(F.posexplode(budf(as_double_array("embedding"))).alias("__t", "__b"))
            .groupBy("__b")
            .count()
            .agg(
                F.expr("percentile(count, 0.5)").alias("p50"),
                F.expr("percentile(count, 0.99)").alias("p99"),
                F.max("count").alias("max"),
                F.count("*").alias("n_buckets"),
            )
            .collect()[0]
        )
        print(
            f"SOAK n={n} mode={'uncapped' if uncapped else 'guarded'} "
            f"wall={wall:.1f}s pairs={n_pairs} bits={bits} tables={tables} "
            f"occ_p50={occ['p50']:.0f} occ_p99={occ['p99']:.0f} occ_max={occ['max']} "
            f"buckets={occ['n_buckets']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
