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

# The driver's correctness harness oracle-checks the FIRST 50 entries of
# ``ordered_queries()``. Rounds 1-4 earned their green driver rows in
# CORRECTNESS_r01-r06; this window now rotates onto the newest, riskiest
# surface — the IVM view lattice, the Python DataSource connector, Hudi
# interop (COW + MOR log-blocks), and ``rel_approx_sketches`` (which failed
# its only driver check in r1, was fixed, and needs a green row). Names
# listed here are pulled to the very front of the registry in this order;
# everything else follows in registration order (``late`` still at the back).
_WINDOW: tuple[str, ...] = (
    # flagship + interop (round-7-late: record-index point lookup,
    # column-stats data skipping, and the foreign incremental pull
    # replace three stable rows — lake_time_travel, mor_incremental and
    # lake_indexed_lookup have held green locally since rounds 2-4 and
    # share machinery with queries that stay windowed; the new
    # metadata-table surface is the risk)
    "lake_delete_view",
    "lake_hudi_interop",
    "mor_hudi_interop",
    "mor_hudi_point_lookup",
    "mor_hudi_data_skipping",
    "mor_hudi_incremental",
    "rel_approx_sketches",
    # IVM view lattice (rounds 5-6, plus round-7 shapes)
    "lake_mv_auto_agg",
    "lake_mv_auto_join",
    "lake_mv_auto_select",
    "lake_mv_auto_minmax",
    "lake_mv_auto_variance",
    "lake_mv_auto_count_distinct",
    "lake_mv_auto_having",
    "lake_mv_auto_staged",
    "lake_mv_auto_left_join",
    "lake_mv_auto_window",
    "lake_mv_auto_agg_join",
    "lake_mv_auto_agg_left_join",
    "lake_mv_auto_agg_full_join",
    "lake_mv_auto_approx_distinct",
    "lake_mv_auto_distinct",
    "lake_mv_auto_union",
    "lake_mv_auto_agg_union",
    "lake_mv_auto_agg_full_tree",
    "lake_mv_auto_self_join",
    "lake_mv_auto_window_union",
    "lake_mv_auto_window_tree",
    "lake_mv_auto_agg_tree",
    "lake_mv_auto_agg_stage",
    "lake_mv_auto_star",
    "lake_mv_auto_snowflake",
    "lake_mv_auto_snowflake_expr",
    "lake_mv_auto_window_self_join",
    "lake_mv_sql_ddl",
    # IVM view tables + stream-driven maintenance
    "lake_ivm_join",
    "lake_ivm_view_table",
    "lake_ivm_agg_table",
    "stream_ivm_view",
    "stream_ivm_view_multi",
    # Python DataSource connector
    "lake_pyds_scan",
    "lake_pyds_stream",
    "stream_pyds_sink",
    "stream_pyds_auto_absorb",
    "stream_pyds_live_view",
    # rounds-5/6 queries without a driver row yet
    "lake_colocated_join",
    "sim_semantic_dedup",
    "sim_semantic_dedup_incremental",
    "sim_vector_store",
    "stream_incremental_dedup",
)


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
    """Registry in driver order: ``_WINDOW`` names first (in window order),
    then registration order, with ``late`` entries at the back."""
    window = {n: QUERIES[n] for n in _WINDOW if n in QUERIES}
    head = {n: f for n, f in QUERIES.items() if n not in window and n not in _LATE}
    tail = {n: f for n, f in QUERIES.items() if n in _LATE and n not in window}
    return {**window, **head, **tail}


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
