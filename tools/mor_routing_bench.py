"""Measure the log-free MOR group routing win (SURVEY §2 F3): snapshot
wall-time on a MOSTLY-COMPACTED table, routed (merge window over logged
groups only — the shipped path) vs forced-full-window (every group
through the (file_id, key) shuffle — the pre-round-6 shape, recreated
inline).  Appends the numbers to SCALE.md by hand; run on an idle box.

Usage: python tools/mor_routing_bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hudi_delete_view_spark.session import get_spark  # noqa: E402
from hudi_delete_view_spark.plans.slices import resolve_slices  # noqa: E402
from hudi_delete_view_spark.sources.mor import (  # noqa: E402
    COMMIT_SEQNO_FIELD,
    COMMIT_TIME_FIELD,
    DELETED_FIELD,
    FILE_NAME_FIELD,
    MorTable,
    RECORD_KEY_FIELD,
    Window,
    file_id_expr,
)

ROWS = 2_000_000
GROUPS = 32


def forced_full_window(t: MorTable):
    """The pre-routing merge: EVERY group through the window."""
    slices = resolve_slices(t.timeline)
    base_paths = [s.base_path for s in slices.values() if s.base_path]
    log_paths = [p for s in slices.values() for p in s.log_paths]
    parts = []
    base = t.spark.read.parquet(*base_paths)
    if DELETED_FIELD not in base.columns:
        base = base.withColumn(DELETED_FIELD, F.lit(False))
    parts.append(base)
    if log_paths:
        parts.append(t.spark.read.parquet(*log_paths))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    w = Window.partitionBy(
        file_id_expr(F.col(FILE_NAME_FIELD)), F.col(RECORD_KEY_FIELD)
    ).orderBy(F.desc(COMMIT_TIME_FIELD), F.desc(COMMIT_SEQNO_FIELD))
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") == 1)
        .drop("__rank")
        .filter(~F.coalesce(F.col(DELETED_FIELD), F.lit(False)))
        .drop(DELETED_FIELD)
    )


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    spark = get_spark("mor-routing-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/mor_routing_bench_tbl"
    shutil.rmtree(base, ignore_errors=True)
    t = MorTable(spark, base, key_fields=["k"], partition_field=None,
                 num_file_groups=GROUPS)
    t.bulk_insert(
        spark.range(ROWS).selectExpr(
            "cast(id as long) as k", "cast(id as double) as v",
            "concat('payload-', id) as s"),
        "20250101000000",
    )
    # mostly compacted: the delta touches keys of ONE file group (keys
    # are hash-routed, so "every 32nd id" would hit all groups — take a
    # group's actual members instead)
    from hudi_delete_view_spark.sources.cow import FILE_NAME_FIELD as FNF

    snap = t.snapshot()
    one_fid = next(iter(sorted(resolve_slices(t.timeline))))[1]
    t.upsert_delta(
        snap.filter(file_id_expr(F.col(FNF)) == one_fid)
        .select("k", F.lit(-1.0).alias("v"), F.lit("upd").alias("s")),
        "20250102000000",
    )
    logged = sum(1 for s in resolve_slices(t.timeline).values() if s.log_paths)
    print(f"# {ROWS} rows, {GROUPS} groups, {logged} logged")

    routed = timed(lambda: t.snapshot().agg(F.sum("v")).collect())
    forced = timed(lambda: forced_full_window(t).agg(F.sum("v")).collect())
    a = t.snapshot().agg(F.sum("v")).first()[0]
    b = forced_full_window(t).agg(F.sum("v")).first()[0]
    assert a == b, (a, b)
    print(f"routed (logged-groups-only window): {routed:.2f}s")
    print(f"forced full window (pre-round-6):   {forced:.2f}s")
    print(f"speedup: {forced / routed:.2f}x")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
