#!/usr/bin/env python3
"""Derive the driver-window rotation (oldest-evidence-first).

The driver's correctness harness oracle-checks the FIRST 50 entries of
``ordered_queries()``.  This tool unions every committed
``CORRECTNESS_r*.json`` and prints, for each registry query, the NEWEST
round in which it earned a fully-green row (rows + schema + hash), then
the 50 queries whose newest green row is oldest — the window the r8
verdict asked to re-front (queries never driver-checked sort first).

Usage: python3 tools/window_rotation.py  (from the repo root)
"""
from __future__ import annotations

import glob
import json
import sys


def newest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        for q, row in json.load(open(f)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def main() -> None:
    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    latest = newest_green_rounds()
    order = sorted(range(len(names)), key=lambda i: (latest.get(names[i], 0), i))
    print("# oldest-evidence-first window (newest-green-round, name):")
    for i in order[:50]:
        print(f"{latest.get(names[i], 0):2d}  {names[i]}")


if __name__ == "__main__":
    main()
