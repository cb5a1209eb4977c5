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


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-equivalent ANSI SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


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
        relational,
    )
