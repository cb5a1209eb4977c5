"""Refresh-budget measurement for the window-over-SELF-JOIN full-input
fallback (SURVEY §14 lead 6, standing since round 7).

The question: `_classify_window_tree` sets ``restrict_ok=False`` when
the window's PARTITION source is a DUPLICATED leaf (the plan reads one
snapshot per occurrence, so restricting it would also filter PARTNER
occurrences — the fuzz-seed-3 bug). The fallback re-derives from the
FULL input and post-trims, so refresh cost grows with TABLE size, not
delta size. Is the constant small enough to keep it parked?

A/B at equal data volume, join shape, and window:

- SELF-JOIN arm: fact ⋈ fact on parent==pk (one partner per row),
  window partitioned on the fact's own group column → restrict_ok=False
  → full-input re-derive.
- CONTROL arm: the identical plan over fact ⋈ twin (a byte-equal COPY
  as a second table) → partition source not duplicated →
  restrict_ok=True → touched-partition restriction.

Each arm: seed the view, upsert a 10-row delta, measure refresh wall.

Usage::

    python tools/measure_window_self_join.py [100000 400000 1600000]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "wsj_measure")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 400_000, 1_600_000]

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hudi_delete_view_spark.plans.ivm import AutoMaterializedView
    from hudi_delete_view_spark.session import get_spark
    from hudi_delete_view_spark.sources.cow import CowTable

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        shutil.rmtree(SCRATCH, ignore_errors=True)
        groups = max(n // 100, 1)  # ~100 rows per window partition
        rows = spark.range(n).selectExpr(
            "concat('k', id) as k",
            f"cast(id % {groups} as long) as g",
            f"concat('k', (id * 7 + 1) % {n}) as parent",
            "cast((id * 13) % 9973 as double) as v",
        )
        delta = spark.range(10).selectExpr(
            "concat('k', id * 97) as k",
            f"cast((id * 97) % {groups} as long) as g",
            f"concat('k', ((id * 97) * 7 + 1) % {n}) as parent",
            "cast(99999 + id as double) as v",
        )

        for arm in ("self_join", "control"):
            t = CowTable(spark, os.path.join(SCRATCH, f"f_{arm}"),
                         key_fields=["k"], num_file_groups=4)
            t.bulk_insert(rows, "20260101000000")
            if arm == "control":
                twin = CowTable(spark, os.path.join(SCRATCH, "twin"),
                                key_fields=["k"], num_file_groups=4)
                twin.bulk_insert(rows, "20260101000000")
                srcs = {"t": t, "twin": twin}
            else:
                srcs = {"t": t}

            def wplan(s, arm=arm):
                a = s["t"].select(
                    F.col("_hoodie_record_key").alias("vk"),
                    "g", "parent", "v")
                partner = s["twin"] if arm == "control" else s["t"]
                # self-join: every occurrence must project its record
                # key (composite identity); control: exactly one record
                # key (the fact's) — the partner projects its plain key
                pk_col = (F.col("k") if arm == "control"
                          else F.col("_hoodie_record_key"))
                b = partner.select(
                    F.col("k").alias("pj"), F.col("v").alias("pv"),
                    pk_col.alias("pk"))
                w = W.partitionBy("g").orderBy(
                    F.desc("pv"), F.asc("vk"), F.asc("pk"))
                return (a.join(b, F.col("parent") == F.col("pj"))
                        .withColumn("rn", F.row_number().over(w))
                        .filter("rn <= 2")
                        .select("vk", "g", "pv", "pk", "rn"))

            mv = AutoMaterializedView(
                spark, os.path.join(SCRATCH, f"mv_{arm}"), srcs, wplan)
            spec = mv.spec()
            expect = arm == "control"
            assert spec["restrict_ok"] is expect, (arm, spec["restrict_ok"])
            t0 = time.time()
            mv.refresh()
            seed_s = time.time() - t0

            t.upsert(delta, "20260102000000")
            if arm == "control":
                pass  # twin unchanged: partner side static, like a dim
            t0 = time.time()
            mv.refresh()
            adv_s = time.time() - t0
            print(
                f"WSJ n={n} arm={arm} restrict_ok={spec['restrict_ok']} "
                f"seed={seed_s:.1f}s advance_10row={adv_s:.1f}s",
                flush=True,
            )
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
