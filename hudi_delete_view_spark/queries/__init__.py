"""Query registry: every implemented operator registers a (spark, sf_dir) ->
DataFrame callable plus, where SQL-expressible, a DuckDB oracle string.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry. Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
_LATE: set[str] = set()


def query(name: str, oracle: str | None = None, late: bool = False):
    """Register a query; ``oracle`` is the DuckDB-equivalent ANSI SQL.

    ``late=True`` sends the query to the very back of the registry
    (``ordered_queries``): the driver's correctness harness oracle-checks
    the first 50 registered entries, so the window is budgeted for queries
    that most need a driver row — ``late`` marks redundant/diagnostic
    variants whose behavior is already covered by a windowed query plus
    pytest (e.g. raw LSH candidate feeds behind a verified funnel)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if late:
            _LATE.add(name)
        return fn

    return deco


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry in driver order: registration order with ``late`` entries
    moved to the back (stable within each group)."""
    head = {n: f for n, f in QUERIES.items() if n not in _LATE}
    tail = {n: f for n, f in QUERIES.items() if n in _LATE}
    return {**head, **tail}


def load_all() -> None:
    """Import every query module so registration side effects run.

    Order matters: the driver's correctness harness oracle-checks the first
    50 registered queries, so the modules whose queries most need a driver
    row go first (lake/mor table format, then the LLM-pipeline operators),
    and the large relational corpus — fully driver-verified in round 1 —
    fills the remaining slots and the tail. A broken module must raise, not
    silently shrink the registry."""
    from . import (  # noqa: F401
        lake,
        mor,
        dedup,
        similarity,
        text,
        multimodal,
        streaming,
        curation,
        relational,
    )
