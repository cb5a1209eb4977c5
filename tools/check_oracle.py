"""Local stand-in for the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same parquet, compare row count,
schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [sf_dir] --window   # first 50 only
                                                        # (the driver's gate)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canonical(df_pandas):
    """Sort columns by name, normalize values, sort rows — a strict
    order-insensitive comparison surface."""
    import numpy as np
    import pandas as pd

    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.10g}"
        if isinstance(v, (np.floating,)):
            return f"{float(v):.10g}"
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(norm_cell(x) for x in v) + "]"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    rows = ["\x1f".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows), list(df.columns)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = {a for a in sys.argv[2:] if not a.startswith("--")}
    window_only = "--window" in sys.argv

    import duckdb

    from hudi_delete_view_spark import queries as reg
    from hudi_delete_view_spark.session import get_spark

    reg.load_all()
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from hudi_delete_view_spark.operators.util import unpersist_operator_caches

    failures = []
    results: list[tuple[str, str, int]] = []
    window = set(list(reg.ordered_queries())[:50]) if window_only else None
    for name, fn in sorted(reg.QUERIES.items()):
        if only and name not in only:
            continue
        if window is not None and name not in window:
            continue
        # operator caches (minhash signatures, LSH buckets, IVF lists) are
        # per-invocation working sets — release between queries so a
        # 100-query gate doesn't accumulate executor storage
        unpersist_operator_caches()
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in reg.ORACLES:
            results.append((name, "rows-only", len(got)))
            print(f"weak  {name}: rows={len(got)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.sql(reg.ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        g_rows, g_cols = canonical(got)
        w_rows, w_cols = canonical(want)
        status = []
        if len(g_rows) != len(w_rows):
            status.append(f"rowcount {len(g_rows)} != {len(w_rows)}")
        if g_cols != w_cols:
            status.append(f"schema {g_cols} != {w_cols}")
        if not status and g_rows != w_rows:
            bad = next(
                (i, a, b) for i, (a, b) in enumerate(zip(g_rows, w_rows)) if a != b
            )
            status.append(f"values differ at sorted-row {bad[0]}:\n  spark={bad[1][:300]}\n  duck ={bad[2][:300]}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            results.append((name, "ok", len(g_rows)))
            print(f"ok    {name}: rows={len(g_rows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))

    # full-registry run (no name filter): write the committed report — the
    # driver's own gate only covers the first 50 registered queries, so
    # this is the artifact showing the WHOLE corpus verified locally.
    # Written even when some queries FAIL (clearly marked): de-windowed
    # (late=True) queries' only continuous audit trail is this report, so
    # a failure must leave evidence rather than suppress the artifact.
    if not only and not window_only:
        report = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ORACLE_LOCAL.md"
        )
        n_ok = sum(1 for _, s, _ in results if s == "ok")
        headline = (
            f"**{len(results)} queries: {n_ok} value-hash matches, "
            f"{len(results) - n_ok} rows-only (no SQL-expressible oracle), "
            f"{len(failures)} failures.**"
        )
        if failures:
            headline = (
                f"**PARTIAL — {len(failures)} FAILING: {sorted(failures)}.** "
                + headline
            )
        with open(report, "w") as f:
            f.write(
                ("# Local oracle gate — full registry"
                 + (" (FAILING)" if failures else "") + "\n\n")
                + f"`python tools/check_oracle.py {sf_dir}`: every registered query\n"
                "run on Spark AND its DuckDB oracle over the same parquet; compared\n"
                "on row count, column names, and order-insensitive values (floats at\n"
                "10 significant digits). The driver's own gate covers the first 50\n"
                "registered queries; this report covers the whole registry.\n\n"
                f"{headline}\n\n"
                "| query | check | rows |\n|---|---|---|\n"
            )
            for name in sorted(failures):
                f.write(f"| {name} | **FAIL** | — |\n")
            for name, s, rows in results:
                f.write(f"| {name} | {s} | {rows} |\n")
        print(f"wrote {report}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
