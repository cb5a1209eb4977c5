"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship delete-view query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator registry
(``hudi_delete_view_spark/queries/``) — one entry per implemented operator
from SURVEY.md §2, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hudi_delete_view_spark import queries as _registry  # noqa: E402

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the delete view of commit C3 over the scripted lineitem COW
    table (the reference's entire observable behavior, SURVEY §2 B6)."""
    return _registry.QUERIES["lake_delete_view"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(_registry.ORACLES)
