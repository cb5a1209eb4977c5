"""Physical-plan audit: capture ``explain('formatted')`` for the headline
queries and machine-check the plan properties that matter at 100 TB:

- filters/column pruning reach the Parquet scan (PushedFilters/ReadSchema),
- small dimension sides broadcast (BroadcastHashJoin) instead of shuffling,
- hot paths stay inside WholeStageCodegen,
- no CartesianProduct except where the operator is a deliberate
  small-side cross join (brute-force similarity).

Writes PLANS.md (plans + audit table). Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> (must_contain, must_not_contain) substrings of the formatted
# plan. NB: in explain('formatted') whole-stage-codegen membership is the
# leading '* ' on an operator line, not the literal string.
AUDITS: dict[str, tuple[list[str], list[str]]] = {
    # flagship COMPUTE plan (special-cased below — dataset() serves the
    # materialized parquet, the anti-join runs inside materialize()):
    # stats-pruned scans + broadcast anti-join on (file_id, key)
    "lake_delete_view": (["LeftAnti"], ["CartesianProduct"]),
    # snapshot read: no join, no shuffle beyond the scan
    "lake_snapshot": ([], ["Exchange", "CartesianProduct"]),
    # TPC-H joins: dim filter pushed into the parquet scan, small dims broadcast
    "rel_q3_top_orders": (["BroadcastHashJoin", "EqualTo(c_mktsegment,BUILDING)"], ["CartesianProduct"]),
    "rel_q5_nation_revenue": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # aggregation: map-side partial agg before the exchange (codegen stars
    # aren't rendered in a pre-execution AdaptiveSparkPlan, so not checked)
    "rel_q1_pricing_summary": (["partial_", "HashAggregate"], ["CartesianProduct"]),
    # window top-k per group: single shuffle on the partition key
    "rel_window_topk_per_group": (["Window"], ["CartesianProduct"]),
    # brute-force similarity: deliberate broadcast NLJ (query side tiny)
    "sim_topk_bruteforce": (["BroadcastNestedLoopJoin"], ["SortMergeJoin"]),
    # exact dedup count: partial aggregation, no join
    "dedup_exact_count": (["partial_"], ["Join"]),
    # correlated EXISTS decorrelates to a semi join (no per-row subquery)
    "rel_exists_subquery": (["LeftSemi"], ["CartesianProduct"]),
    # tf-idf: the vocabulary-sized document-frequency table broadcasts
    "text_tfidf_top_terms": (["BroadcastHashJoin"], ["CartesianProduct", "SortMergeJoin"]),
    # bucketed co-located join: with broadcast disabled (so the plan shows
    # the large-to-large shape 100 TB would force), the sort-merge join
    # consumes bucketed scans directly — NO hash-partitioning exchange
    "rel_bucketed_join": (["SortMergeJoin", "Bucketed: true"], ["Exchange hashpartitioning"]),
    # sign-LSH near-dup: equi-join on bucket collisions — NEVER a cross
    # join; bucket ids come from one Arrow-batched matmul (ArrowEvalPython)
    "dedup_embedding_lsh": (["ArrowEvalPython"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # MOR log-resident delete view: anti-join on (file_id, key)
    "mor_delete_view_log_only": (["LeftAnti"], ["CartesianProduct"]),
    # CDC: ONE full-outer diff join on (file_id, key) between the pruned
    # boundary snapshots; payloads travel as structs
    "lake_cdc": (["FullOuter"], ["CartesianProduct"]),
    # IVM: base + retraction delta is pure aggregation — partial agg
    # before every exchange, no join wider than the tiny delete-stamp side
    "lake_ivm_aggregate": (["partial_", "HashAggregate"], ["CartesianProduct"]),
    # clustered range scan: the l_orderkey bounds push into the Parquet
    # scan (row-group skipping does the work inside the sorted files)
    "lake_clustered_scan": (["GreaterThanOrEqual(l_orderkey", "LessThanOrEqual(l_orderkey"], ["CartesianProduct", "Join"]),
    # chunking: tokenize -> explode, embarrassingly parallel; the only
    # exchange is spread()'s parallelism repartition of the tiny doc scan
    "text_chunks": (["Generate"], ["CartesianProduct", "Join"]),
    # PII scrub: pure JVM regexp chain over one scan — no shuffle at all
    "text_pii_redact": ([], ["Exchange", "Join"]),
    # hash-stratified sample: scan + filter + project, no shuffle
    "docs_stratified_sample": ([], ["Exchange", "Join"]),
    # decontamination: test-side gram set broadcasts (benchmark MBs vs TB
    # corpus); the corpus side is scan -> generate -> broadcast joins with
    # no corpus-sized shuffle
    "curate_decontaminate": (["BroadcastHashJoin"], ["CartesianProduct", "SortMergeJoin"]),
    # packing: exactly one exchange (the per-shard partition) feeding one
    # running-sum window
    "curate_pack_sequences": (["Window"], ["CartesianProduct", "Join"]),
    # mixture sampling: 20-row rate table broadcasts back onto the scan;
    # the corpus is never exchanged
    "curate_mixture_sample": (["BroadcastHashJoin"], ["CartesianProduct", "SortMergeJoin"]),
    # chunk manifest: packing window then explode — no join at all
    "curate_chunk_manifest": (["Window", "Generate"], ["CartesianProduct", "Join"]),
    # contamination provenance: benchmark gram side broadcasts; corpus side
    # streams one broadcast hash join into a partial-agg group-by
    "curate_contamination_provenance": (
        ["BroadcastHashJoin", "partial_"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    # global shard shuffle: one window exchange, nothing else
    "curate_shuffle_shards": (["Window"], ["CartesianProduct", "Join"]),
    # partition evolution: three parquet-backed reads (new-layout snapshot,
    # old-layout travel, materialized delete view) unioned — pure scans,
    # no join anywhere; the one-off rewrite cost lives in the commit, not
    # in any read plan
    "lake_partition_evolution": (["Union"], ["CartesianProduct", "Join"]),
    # MOR streaming-ingest readback: merged snapshot (one latest-per-key
    # window over base+logs) into a partial-agged group-by
    "stream_mor_ingest": (["Window", "partial_"], ["CartesianProduct"]),
    # k-means IVF: centroid side is nlist rows -> deliberate broadcast
    # NLJ for assignment; the inverted-list probe join is an equi-join
    "sim_topk_ivf": (["BroadcastNestedLoopJoin"], ["CartesianProduct"]),
    # MERGE INTO readback: post-merge snapshot + the merge commit's
    # materialized delete view — pure parquet scans unioned, the
    # mixed-action rewrite cost lives in the commit
    "lake_merge_into": (["Union"], ["CartesianProduct", "Join"]),
    # record-index point lookup: the key set is pushed into the pruned
    # scan (In filter on the record key; bloom filters skip row groups) —
    # no join, no shuffle
    "lake_point_lookup": (["In(_hoodie_record_key"], ["Join", "Exchange"]),
    # incremental dedup: bucket equi-joins only (never all-pairs), Arrow
    # signature UDF, final survivors anti-join
    "dedup_incremental_minhash": (
        ["ArrowEvalPython", "LeftAnti"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    # quality-filter cascade: one narrow JVM projection — no shuffle/join
    "text_quality_filter": ([], ["Join", "CartesianProduct"]),
    # MOR MERGE readback: merged snapshot window + materialized delete
    # view union — no cartesian anywhere
    "mor_merge_delta": (["Window", "Union"], ["CartesianProduct"]),
    # shared spans: hash-bucketed equi-join (never all-pairs), span-df
    # prune before the pair join
    "dedup_shared_spans": (["Generate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # int8 quantization: one narrow projection, no shuffle, no join
    "sim_quantize_int8": ([], ["Join", "CartesianProduct"]),
    # recall report: two candidate pipelines joined on (query, neighbor) —
    # equi-joins only
    "sim_recall_report": (["HashAggregate"], ["CartesianProduct"]),
    # secondary-index equality probe: bitmap pruning happens driver-side
    # (fewer files planned); the residual filter still pushes into the scan
    "lake_indexed_lookup": (["GreaterThanOrEqual(l_partkey", "LessThanOrEqual(l_partkey"], ["Join", "CartesianProduct"]),
    # composed training pipeline: quality gate is a scan-side filter, the
    # funnel's joins are bucketed equi-joins, decontamination broadcasts
    # the benchmark gram side — nothing cartesian anywhere in 4 stages
    "pipeline_training_corpus": (["BroadcastHashJoin"], ["CartesianProduct"]),
    # co-located lake-to-lake join: both sides are catalog-bucketed
    # mirrors of lake tables, so the sort-merge join AND the per-order
    # aggregation run with no hash-partitioning exchange anywhere
    "lake_colocated_join": (
        ["SortMergeJoin", "Bucketed: true"],
        ["Exchange hashpartitioning", "CartesianProduct"],
    ),
    # streaming-maintained signature store readback: per-commit
    # incremental reads of the store (string-range commit-time filters
    # pushed into pruned parquet scans) joined to doc metadata
    "stream_signature_store": (["PushedFilters"], ["CartesianProduct"]),
    # join-view IVM: stale slice dropped via change-key anti-joins, only
    # affected fact rows re-derived — equi-joins throughout
    "lake_ivm_join": (["LeftAnti"], ["CartesianProduct"]),
    # Python DataSource connector scan: a real DSv2 BatchScan over the
    # registered lakeview source (slice partitions + stats pushdown)
    "lake_pyds_scan": (["BatchScan lakeview"], ["CartesianProduct", "Join"]),
    # auto-MV serve paths: the maintained state is a real COW table, so
    # serving is a parquet scan + narrow projection — the advance cost
    # lives in refresh(), never in the read plan
    "lake_mv_auto_agg_join": ([], ["Join", "CartesianProduct", "Exchange"]),
    "lake_mv_auto_window": ([], ["Join", "CartesianProduct", "Exchange"]),
    "lake_mv_sql_ddl": ([], ["Join", "CartesianProduct", "Exchange"]),
    "lake_mv_auto_union": ([], ["Join", "CartesianProduct", "Exchange"]),
    "lake_mv_auto_distinct": ([], ["Join", "CartesianProduct", "Exchange"]),
    "lake_mv_auto_window_union": ([], ["Join", "CartesianProduct", "Exchange"]),
    "lake_mv_auto_self_join": ([], ["Join", "CartesianProduct", "Exchange"]),
    # foreign-layout Hudi fixture delete view: same anti-join shape as the
    # flagship, materialized then served as a parquet scan
    "lake_hudi_interop": ([], ["CartesianProduct"]),
    # foreign MOR merge: base parquet scan unioned with the mapInPandas
    # log decode, one row_number window on (partition, key) — no joins
    "mor_hudi_interop": (["Window", "MapInPandas"], ["CartesianProduct"]),
    # foreign Delta: snapshot sections are pure parquet scans (log
    # replay is driver-side metadata); the flagship section is the one
    # keyed anti-join over the deleting commit's own files
    "delta_interop": (["LeftAnti"], ["CartesianProduct"]),
    # foreign Delta net-effect CDC: ONE full-outer boundary diff on the
    # key (pruned to the window's moved files) + per-version mini-diffs
    # for stamps — equi-joins only
    "delta_cdc": (["FullOuter"], ["CartesianProduct"]),
    # foreign Iceberg: position deletes apply as an anti-join on
    # (recorded path, _metadata.row_index); the COW flagship section is
    # the keyed anti-join; manifest decode is driver-side metadata
    "iceberg_interop": (["LeftAnti"], ["CartesianProduct"]),
    # Delta deletion-vector delete view: DV blobs parse executor-side
    # (MapInPandas) and the victims come back by row ordinal — equi-join
    # on (file, ordinal), never a cartesian
    "delta_dv_delete_view": (["MapInPandas"], ["CartesianProduct"]),
    # round 9: column-mapped Delta — scans must read PHYSICAL columns
    # (col-NN in ReadSchema) while the output is logical; no cartesians
    "delta_column_mapping": (["col-01"], ["CartesianProduct"]),
    # round 9: Iceberg v3 puffin DVs — executor-side blob parse feeds
    # the ordinal anti-join
    "iceberg_v3_dv_delete_view": (["MapInPandas", "LeftAnti"],
                                  ["CartesianProduct"]),
    # round 9: staged incremental-sync exports read back through the
    # same foreign readers (union of five sections)
    "lake_export_incremental": (["Union"], ["CartesianProduct"]),
    # both exports read back through the foreign readers: plain unions
    # of parquet scans over the exported layouts + the Delta delete
    # view's keyed join — no cartesian anywhere in four sections
    "lake_export_interop": (["Union"], ["CartesianProduct"]),
    # record-index point lookup: the merge window runs over ONE file
    # group's slices (index resolution is driver-side metadata, not in
    # the plan); key filter on top
    "mor_hudi_point_lookup": (["Window"], ["CartesianProduct", "Join"]),
    # column-stats skipping: pruned groups never enter the scan (the
    # sound early filter is GROUP-level — a pre-merge row filter would
    # let an older in-range version win over a newer out-of-range one,
    # so the residual range filter stays post-window by design)
    "mor_hudi_data_skipping": (["Window", "Filter"], ["CartesianProduct", "Join"]),
    # per-domain cap: rank window rewritten to a partition-level top-k
    # (partial map-side + final) — a hot domain never sorts its tail
    "curate_domain_cap": (["WindowGroupLimit"], ["Join", "CartesianProduct"]),
}

# per-query session confs applied while building the audited plan
AUDIT_CONFS: dict[str, dict[str, str]] = {
    "rel_bucketed_join": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
}


def _audit_df(name: str, spark, reg):
    """The DataFrame whose plan we audit (normally the registered query;
    the flagship audits its internal compute pipeline)."""
    if name == "lake_delete_view":
        from hudi_delete_view_spark.sources.delete_view import DeleteView
        from hudi_delete_view_spark.sources.fixtures import C3, build_lineitem_cow

        table = build_lineitem_cow(spark, SF_DIR)
        return DeleteView(spark, table.base_path, C3)._compute()
    return reg.QUERIES[name](spark, SF_DIR)


def main() -> None:
    from hudi_delete_view_spark import queries as reg
    from hudi_delete_view_spark.session import get_spark

    reg.load_all()
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    sections = []
    results = []
    for name, (must, must_not) in AUDITS.items():
        saved = {}
        for k, v in AUDIT_CONFS.get(name, {}).items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            df = _audit_df(name, spark, reg)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        plan = buf.getvalue()
        missing = [m for m in must if m not in plan]
        present = [m for m in must_not if m in plan]
        ok = not missing and not present
        results.append((name, ok, missing, present))
        sections.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
        status = "ok" if ok else f"FAIL missing={missing} forbidden={present}"
        print(f"{name}: {status}", flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(
            "# Physical plan audit\n\n"
            f"Captured at sf_dir={SF_DIR} via `tools/explain_audit.py`.\n"
            "Checks: pushdown reaches scans, small dims broadcast, hot paths\n"
            "stay in WholeStageCodegen, no accidental cartesian products.\n\n"
            "| query | audit |\n|---|---|\n"
        )
        for name, ok, missing, present in results:
            f.write(f"| {name} | {'ok' if ok else f'FAIL missing={missing} forbidden={present}'} |\n")
        f.write("\n")
        f.write("\n".join(sections))

    bad = [r for r in results if not r[1]]
    print(f"\n{len(bad)} audit failures")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
