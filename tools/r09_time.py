"""Time individual HEADLINE queries with the bench's exact methodology
(best-of-2 ``df.count()`` on the warmed session/fixtures) without running
the whole bench. Usage: python tools/r09_time.py q1 [q2 ...]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from hudi_delete_view_spark import queries as registry
    from hudi_delete_view_spark.operators.util import unpersist_operator_caches
    from hudi_delete_view_spark.session import get_spark

    registry.load_all()
    names = sys.argv[1:]
    spark = get_spark("r09-time")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as _F

    from hudi_delete_view_spark.sources.fixtures import (
        build_lineitem_cow,
        build_lineitem_evolved,
        build_lineitem_merged,
        build_orders_mor,
    )

    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    build_lineitem_cow(spark, SF_DIR)
    build_orders_mor(spark, SF_DIR)
    build_lineitem_evolved(spark, SF_DIR)
    build_lineitem_merged(spark, SF_DIR)
    _identity = _F.pandas_udf(lambda s: s, "long")
    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(1024).repartition(n_workers).select(
        _identity("id").alias("x")).count()

    for name in names:
        fn = registry.QUERIES[name]
        unpersist_operator_caches()
        best, n = None, 0
        for _ in range(2):
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.3f}s ({n} rows)")


if __name__ == "__main__":
    main()
