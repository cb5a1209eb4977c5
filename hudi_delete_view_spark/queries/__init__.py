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
# ``ordered_queries()``. Round-8 rotation (r7 verdict item 3): the 30
# registry queries that have NEVER earned a green driver row across
# r01-r07 take the front — including the two r07 ``err`` rows
# (``lake_pyds_scan``: connector conf portability, ``sim_vector_store``:
# array output column), both fixed this round and kept windowed so the
# fixes earn their green rows. The remaining slots re-check the flagship
# and every surface whose CODE changed this round (foreign-Hudi bloom
# golden-vector rewrite, metadata-log keying, as_of index guard, CDC
# empty-window projection, executor-side export, connector register()).
# Names listed here are pulled to the very front of the registry in this
# order; everything else follows in registration order (``late`` still at
# the back).
_WINDOW: tuple[str, ...] = (
    # -- never driver-checked (30): curation family
    "curate_chunk_manifest",
    "curate_contamination_provenance",
    "curate_contamination_report",
    "curate_domain_cap",
    "curate_length_histogram",
    "curate_split_assignment",
    # dedup tail
    "dedup_lsh_candidates",
    "dedup_minhash_clusters",
    "dedup_remove_boilerplate",
    "dedup_simhash_pairs",
    # lake tail
    "lake_cdc_replay",
    "lake_commit_history",
    "lake_indexed_lookup",
    "lake_partition_scan",
    "lake_pyds_scan",  # r07 err #1: fixed (register() sets pushdown conf)
    "lake_sql_surface",
    # multimodal tail
    "mm_audio_windows",  # array column stringified this round
    "mm_extract_features",
    # foreign-Hudi CDC (landed after the r07 snapshot — riskiest unwindowed)
    "mor_hudi_cdc",
    "mor_ivm_aggregate",
    "pipeline_chunk_dedup",
    # similarity tail
    "sim_quantize_int8",  # array column stringified this round
    "sim_recall_report",
    "sim_topk_ivf",
    "sim_topk_ivf_label",
    "sim_vector_store",  # r07 err #2: fixed (qvec -> CSV string)
    "stream_decontaminate",
    # text tail
    "text_perplexity",
    "text_repetition",
    "text_winnowing",
    # -- round-8 NEW surfaces: foreign Delta Lake (sources/delta.py)
    # and foreign Apache Iceberg v2 (sources/iceberg.py)
    "delta_interop",
    "delta_incremental",
    "delta_cdc",
    "delta_data_skipping",
    "delta_dv_delete_view",
    "iceberg_interop",
    "iceberg_incremental",
    # -- re-checks: flagship + every surface with round-8 code changes
    "lake_delete_view",
    "lake_hudi_interop",
    "mor_hudi_interop",        # metadata-log keying + bloom rewrite
    "mor_hudi_point_lookup",   # as_of guard + golden-vector bloom
    "mor_hudi_data_skipping",  # metadata partition walk changed
    "mor_hudi_incremental",
    "lake_pyds_stream",        # register() changed for all pyds paths
    "stream_pyds_sink",
    "stream_pyds_auto_absorb",
    "stream_pyds_live_view",
    # -- round-8-late surfaces (this session's code changes)
    "lake_export_interop",     # NEW: both exports under the oracle (H17/H8)
    "lake_mv_auto_window_self_join",  # H18 fast advance (literal predicate)
    "lake_mv_auto_window_union",      # same trick for unrestricted branches
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
        delta,
        iceberg,
        dedup,
        similarity,
        text,
        multimodal,
        streaming,
        curation,
        relational,
    )
