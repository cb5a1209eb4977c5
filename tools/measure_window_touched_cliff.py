"""Measure the window-advance touched-partition predicate CLIFF
(r8 verdict item 7): the literal eqNullSafe-OR fast path hard-stops at
``WINDOW_TOUCHED_PRED_MAX`` (1024) touched partitions and falls back to
full-input re-derive. Where does the OR predicate actually stop paying?

Setup mirrors tools/measure_window_self_join.py's SELF-JOIN arm
(restrict_ok=False → the literal-predicate path is the ONLY
restriction): one fact table, window partitioned on its group column.
Deltas are sized to touch exactly K partitions; for each K the advance
runs twice — once with the predicate bound ABOVE K (fast path) and once
with it BELOW K (full-input fallback) — so each K yields a paired
(predicate, fallback) wall-clock plus the predicate BUILD+ANALYSIS time
alone.

Usage::

    python tools/measure_window_touched_cliff.py [table_rows] [K ...]
    # defaults: 400000 rows; K = 64 256 1024 2048 4096
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "wtc_measure")


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    n = args[0] if args else 400_000
    ks = args[1:] or [64, 256, 1024, 2048, 4096]

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hudi_delete_view_spark.plans import ivm as ivm_mod
    from hudi_delete_view_spark.plans.ivm import AutoMaterializedView
    from hudi_delete_view_spark.session import get_spark
    from hudi_delete_view_spark.sources.cow import CowTable

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    groups = max(n // 100, max(ks) * 2)  # enough partitions to touch K
    rows = spark.range(n).selectExpr(
        "concat('k', id) as k",
        f"cast(id % {groups} as long) as g",
        f"concat('k', (id * 7 + 1) % {n}) as parent",
        "cast((id * 13) % 9973 as double) as v",
    )

    results = []
    for k_touch in ks:
        for mode, bound in (("predicate", max(ks) + 1), ("fallback", 0)):
            ivm_mod.WINDOW_TOUCHED_PRED_MAX = bound
            shutil.rmtree(SCRATCH, ignore_errors=True)
            t = CowTable(spark, os.path.join(SCRATCH, "f"),
                         key_fields=["k"], num_file_groups=4)
            t.bulk_insert(rows, "20260101000000")

            def wplan(s):
                a = s["t"].select(
                    F.col("_hoodie_record_key").alias("vk"),
                    "g", "parent", "v")
                b = s["t"].select(
                    F.col("k").alias("pj"), F.col("v").alias("pv"),
                    F.col("_hoodie_record_key").alias("pk"))
                w = W.partitionBy("g").orderBy(
                    F.desc("pv"), F.asc("vk"), F.asc("pk"))
                return (a.join(b, F.col("parent") == F.col("pj"))
                        .withColumn("rn", F.row_number().over(w))
                        .filter("rn <= 2")
                        .select("vk", "g", "pv", "pk", "rn"))

            mv = AutoMaterializedView(
                spark, os.path.join(SCRATCH, "mv"), {"t": t}, wplan)
            assert mv.spec()["restrict_ok"] is False
            mv.refresh()

            # delta touching exactly k_touch distinct groups (one row
            # per group, new keys so they are inserts)
            delta = spark.range(k_touch).selectExpr(
                f"concat('new', id) as k",
                "cast(id as long) as g",   # groups 0..k_touch-1
                f"concat('k', (id * 7 + 1) % {n}) as parent",
                "cast(88888 + id as double) as v",
            )
            t.upsert(delta, "20260102000000")
            t0 = time.time()
            mv.refresh()
            adv = time.time() - t0
            results.append((k_touch, mode, adv))
            print(f"WTC n={n} groups={groups} touched={k_touch} "
                  f"mode={mode} advance={adv:.1f}s", flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    print("\nsummary (touched, predicate_s, fallback_s):")
    by = {}
    for k_touch, mode, adv in results:
        by.setdefault(k_touch, {})[mode] = adv
    for k_touch in sorted(by):
        d = by[k_touch]
        print(f"  {k_touch:6d}  {d.get('predicate', -1):6.1f}  "
              f"{d.get('fallback', -1):6.1f}")


if __name__ == "__main__":
    main()
