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
    """Import every query module so registration side effects run."""
    from . import lake, mor  # noqa: F401

    for mod in ("relational", "dedup", "text", "similarity", "multimodal", "streaming"):
        try:
            __import__(f"{__name__}.{mod}")
        except ImportError:
            pass  # module not built yet (incremental rounds)
