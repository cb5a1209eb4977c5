"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Ensure a CPU-heavy narrow map downstream has enough partitions to
    use the cluster.

    A small table read from one parquet file arrives as ONE partition, so
    a compute-bound operator (minhash, simhash, winnowing) would run on a
    single core. Repartition only when the source parallelism is below
    ``min_factor * defaultParallelism`` — on a real multi-file 100 TB scan
    the input already has thousands of splits and this is a no-op (no
    shuffle added)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
