"""Structured Streaming tests (B13): batch-equivalence of the windowed
aggregations, watermark late-data drop, and foreachBatch lake ingest."""

import os

import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.queries.relational import _events
from hudi_delete_view_spark.sources.cow import CowTable
from hudi_delete_view_spark.streaming.ops import (
    dedup_first_per_user,
    events_stream,
    foreach_batch_upsert,
    run_to_table,
    session_stats,
    tumbling_counts,
)


def test_tumbling_equals_batch(spark, sf_dir):
    """Streaming complete-mode tumbling agg == the same agg run in batch."""
    got = run_to_table(tumbling_counts(events_stream(spark, sf_dir)))
    batch = _events(spark, sf_dir)
    want = (
        batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.expr("cast(round(value * 100) as bigint)")) / F.lit(100.0), 6)
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_session_count_invariant(spark, sf_dir):
    """Session stats: per-user event counts sum to the table's row counts."""
    got = run_to_table(session_stats(events_stream(spark, sf_dir)))
    per_user = {r["user_id"]: r["n"] for r in got.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()}
    want = {r["user_id"]: r["n"] for r in _events(spark, sf_dir).groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert per_user == want


def test_stream_dedup_one_row_per_user(spark, sf_dir):
    got = run_to_table(dedup_first_per_user(events_stream(spark, sf_dir)), mode="append")
    users = [r["user_id"] for r in got.collect()]
    assert len(users) == len(set(users))
    assert set(users) == {r["user_id"] for r in _events(spark, sf_dir).select("user_id").distinct().collect()}


def test_watermark_drops_late_rows(spark, scratch):
    """Two-batch replay: a row arriving in batch 2 that is older than the
    advanced watermark must be dropped from the aggregation state
    (dropDuplicatesWithinWatermark on a key seen long before)."""
    src = os.path.join(scratch, "src")
    os.makedirs(src)
    # batch file 1: key 1 at t0, key 2 far later (advances watermark past t0+10m)
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 06:00:00")], ["k", "ts"]
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(os.path.join(src, "f1"))
    # batch file 2: duplicate key 1 LATE (t0+1m, far below watermark 05:50)
    # and a fresh key 3 on time
    spark.createDataFrame(
        [(1, "2024-01-01 00:01:00"), (3, "2024-01-01 06:01:00")], ["k", "ts"]
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(os.path.join(src, "f2"))

    stream = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "f*"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    out = run_to_table(stream, mode="append")
    ks = sorted(r["k"] for r in out.collect())
    # key 1 appears once (batch-2 late duplicate dropped or deduped), 2 and 3 present
    assert ks == [1, 2, 3]


def test_foreach_batch_upsert_ingests_stream(spark, sf_dir, scratch):
    """Streaming lake ingest: replay events through foreachBatch upserts;
    the final snapshot equals the batch latest-row-per-event_id table."""
    table = CowTable(
        spark,
        os.path.join(scratch, "events_cow"),
        key_fields=["event_id"],
        partition_field="event_type",
        num_file_groups=2,
    )
    stream = events_stream(spark, sf_dir).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    n_batches = []
    foreach_batch_upsert(
        stream, table, lambda bid: f"202601020000{bid:02d}" if n_batches.append(bid) is None else None
    )
    snap = table.snapshot()
    src = _events(spark, sf_dir)
    assert snap.count() == src.count()
    # spot-check: values survived the round trip
    got = {r["event_id"]: r["value"] for r in snap.select("event_id", "value").collect()}
    want = {r["event_id"]: r["value"] for r in src.select("event_id", "value").collect()}
    assert got == want


def test_stateful_totals_accumulate_across_batches(spark, scratch):
    """applyInPandasWithState: totals must carry state batch to batch
    (two files, maxFilesPerTrigger=1 -> two micro-batches)."""
    from hudi_delete_view_spark.streaming.ops import stateful_running_totals

    src = os.path.join(scratch, "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], ["user_id", "value"]
    ).coalesce(1).write.parquet(os.path.join(src, "f1"))
    spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (2, 3.0)], ["user_id", "value"]
    ).coalesce(1).write.parquet(os.path.join(src, "f2"))

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "f*"))
    )
    out = run_to_table(stateful_running_totals(stream), mode="append")
    rows = [(r["user_id"], r["batch_events"], r["total_events"], r["total_cents"])
            for r in out.collect()]
    # per user, the max total_events must equal the sum of batch_events —
    # i.e. the second batch's total includes the first batch's state
    by_user = {}
    for u, b, t, c in rows:
        by_user.setdefault(u, []).append((b, t, c))
    assert max(t for _b, t, _c in by_user[1]) == 3
    assert max(t for _b, t, _c in by_user[2]) == 3
    assert max(c for _b, _t, c in by_user[1]) == 3100  # 10+20+1 in cents
    assert max(c for _b, _t, c in by_user[2]) == 1000  # 5+2+3 in cents
    # two emission rows per user (one per batch in which the user appeared)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 2


def test_stream_incremental_dedup_invariants(spark, sf_dir):
    """The streaming incremental dedup: batch-0 survivors equal the batch
    dedup of the same slice (empty base == plain minhash_dedup), the batch
    tag is doc_id % 4, and later-batch survivors never collide with any
    earlier-arrived doc."""
    from pyspark.sql import functions as F

    from hudi_delete_view_spark.operators.dedup import minhash_dedup
    from hudi_delete_view_spark.queries import QUERIES, load_all

    load_all()
    out = QUERIES["stream_incremental_dedup"](spark, sf_dir)
    rows = [(r["doc_id"], r["batch"]) for r in out.collect()]
    assert all(b == d % 4 for d, b in rows)
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    b0 = docs.filter(F.col("doc_id") % 4 == 0)
    expect0 = {r["doc_id"] for r in minhash_dedup(b0, "doc_id", "text", threshold=0.8)
               .select("doc_id").collect()}
    got0 = {d for d, b in rows if b == 0}
    assert got0 == expect0
    # survivors are a subset of the corpus and non-degenerate
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    got = {d for d, _b in rows}
    assert got <= all_ids and len(got) > len(all_ids) // 2


def test_signature_store_recursive_survivor_semantics(spark):
    """The unified state story's defining behavior: with survivors-only
    state, a doc matching ONLY a previously-DROPPED doc survives.
    Chain A ~ B, B ~ C, A !~ C (premises asserted via the exact-Jaccard
    kernel): B arrives after A -> dropped; C then arrives — against the
    STORE (= {A}) it survives; against raw seen-state (= {A, B}) it
    would have been dropped. This is what distinguishes
    stream_signature_store from the raw-state stream_incremental_dedup."""
    from pyspark.sql import functions as F

    from hudi_delete_view_spark.operators.dedup import (
        minhash_dedup_incremental,
        ngram_jaccard_pairs,
    )

    words = [f"tok{i:02d}" for i in range(60)]
    a = " ".join(words)
    b = " ".join(words[:-5] + [f"newb{i}" for i in range(5)])
    c = " ".join(words[:-10] + [f"newb{i}" for i in range(5)] + [f"newc{i}" for i in range(5)])
    docs = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])

    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", pairs=None, threshold=0.0).collect()
    }
    assert jac[(1, 2)] >= 0.8 and jac[(2, 3)] >= 0.8 and jac[(1, 3)] < 0.8, jac

    def batch(i):
        return docs.filter(F.col("doc_id") == i)

    empty = docs.limit(0)
    # batch 1: A vs empty store -> survives; store = {A}
    s1 = minhash_dedup_incremental(empty, batch(1), "doc_id", "text", threshold=0.8)
    assert [r["doc_id"] for r in s1.collect()] == [1]
    store = s1
    # batch 2: B vs {A} -> dropped; store unchanged
    s2 = minhash_dedup_incremental(store, batch(2), "doc_id", "text", threshold=0.8)
    assert s2.count() == 0
    # batch 3: C vs store {A} -> SURVIVES (matches only the dropped B)
    s3 = minhash_dedup_incremental(store, batch(3), "doc_id", "text", threshold=0.8)
    assert [r["doc_id"] for r in s3.collect()] == [3]
    # raw-seen-state rule would have dropped C (it matches B in {A, B})
    raw = minhash_dedup_incremental(
        docs.filter("doc_id < 3"), batch(3), "doc_id", "text", threshold=0.8
    )
    assert raw.count() == 0
