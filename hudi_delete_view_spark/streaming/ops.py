"""Structured Streaming operators (SURVEY §2 B13): watermarked windowed
aggregation (tumbling / sliding / session), stateful dedup, late-data
handling, and ``foreachBatch`` lake ingest.

Design: every operator is a plain function ``stream -> stream`` so the same
transformation graph serves a real streaming source (Kafka/files at scale)
and the deterministic test harness here (one-shot ``availableNow`` replay
of the events parquet into a named memory sink). Watermarks bound state:
at 100 TB/day the window state store only retains windows newer than
(max event time - delay), and ``dropDuplicatesWithinWatermark`` keeps the
dedup key set similarly bounded.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema pinned — streaming
    sources cannot infer). Session TZ pinned to UTC (window boundaries
    and timestamp rendering are TZ-dependent; the oracle is wall-clock).

    The driver regenerates the testdata parquet between rounds and the
    physical type of ``ts`` has varied (TIMESTAMP(NANOS) vs micros), so the
    unit is sniffed from the parquet footer: nanos are read as long and
    converted with exact integer division; micros read natively."""
    import os

    import pyarrow.parquet as pq

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_type = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    unit = getattr(ts_type, "unit", None)
    if unit == "ns" or str(ts_type) == "int64":
        # TIMESTAMP(NANOS), or a raw INT64 epoch-nanos column with no
        # logical annotation — both read as long + exact integer division
        # (float division would drift: epoch nanos exceed 2^53)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    schema = StructType(
        [
            f if f.name != "ts" else StructField("ts", TimestampType())
            for f in EVENTS_SCHEMA.fields
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


# -- windowed aggregations --------------------------------------------------
def tumbling_counts(stream: DataFrame, width: str = "1 day", watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window count/sum per event type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact integer-cent sum: engine-portable (see sliding_avg)
            F.round(F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")) / F.lit(100.0), 6)
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    stream: DataFrame, width: str = "1 day", slide: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Sliding-window event count + average value (each event lands in
    width/slide overlapping windows)."""
    # value is 2-decimal data: average over exact integer cents, so the
    # result is independent of float summation order (engine-portable)
    avg_exact = F.round(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")) / F.lit(100.0) / F.count("*"), 6
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), avg_exact.alias("avg_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


def session_stats(stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity; emits per-session event count and value sum."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")) / F.lit(100.0), 6)
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_first_per_user(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup: first event per user id within the
    watermark horizon (state = one row per key, expired by watermark)."""
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id"])
        .select("user_id")
    )


# -- harness ---------------------------------------------------------------
def run_to_table(stream_df: DataFrame, mode: str = "complete") -> DataFrame:
    """Deterministic one-shot execution: replay everything available
    (``availableNow``) into a uniquely-named in-memory sink, block until
    drained, return the sink as a DataFrame.

    This is the local test harness; production would swap the sink for
    Kafka/Delta/parquet with the identical transformation graph."""
    name = f"s_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def foreach_batch_upsert(stream_df: DataFrame, table, timestamp_fn) -> None:
    """Lake ingest: each micro-batch upserts into a COW table (B5 + B13 —
    streaming writes producing the same commit metadata the delete-view
    pipeline consumes). ``timestamp_fn(batch_id) -> commit timestamp``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.upsert(batch_df, timestamp_fn(batch_id))

    q = stream_df.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def foreach_batch_upsert_delta(stream_df: DataFrame, table, timestamp_fn) -> None:
    """MOR streaming ingest: each micro-batch lands as a DELTA COMMIT (log
    slices appended per file group, no base rewrite) — the write shape MOR
    exists for: at 100 TB/day ingest, a per-batch COW rewrite would re-copy
    every touched file group each trigger, while the delta append costs
    one shuffle of the batch itself; compaction folds logs into bases on
    its own schedule (``schedule_compaction`` + ``compact``).
    ``timestamp_fn(batch_id) -> commit timestamp`` keeps replays
    deterministic; id-keyed upserts make them idempotent."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.upsert_delta(batch_df, timestamp_fn(batch_id))

    q = stream_df.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich each event with a dimension row.

    The static side is planned per micro-batch (so a refreshed dim table
    is picked up batch-to-batch) and broadcast when small — the standard
    streaming enrichment shape; no state store involved."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, "left")


def stateful_running_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals that survive across micro-batches (state = one
    (count, cents) pair per user, Arrow-batched per group per batch).

    This is the escape hatch for operators Spark's built-in stateful ops
    can't express (custom accumulators, model state, CEP-ish logic); the
    state store bounds memory to O(active keys)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("batch_events", LongType()),
            StructField("total_events", LongType()),
            StructField("total_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    def update(key, pdf_iter, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        batch_n = 0
        for pdf in pdf_iter:
            batch_n += len(pdf)
            # floor(x*100 + 0.5): exact double arithmetic, bit-identical to
            # the Spark/DuckDB quantization (pandas .round() is half-even and
            # diverges from SQL round at exact .5 cents)
            cents += int(np.floor(pdf["value"].mul(100).add(0.5)).astype("int64").sum())
        n += batch_n
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_events": [batch_n],
                "total_events": [n],
                "total_cents": [cents],
            }
        )

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def stream_stream_funnel(
    stream: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join (funnel/CEP shape): for each user, pair a
    ``first_type`` event with any ``then_type`` event that follows it
    within ``within``.

    Both sides carry watermarks and the join has a bounded time-range
    condition, so the state store can expire buffered rows — the required
    shape for an unbounded stream-stream join."""
    from pyspark.sql import functions as F

    a = (
        stream.filter(F.col("event_type") == first_type)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("first_id"),
            F.col("ts").alias("first_ts"),
        )
        .withWatermark("first_ts", watermark)
    )
    b = (
        stream.filter(F.col("event_type") == then_type)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("then_id"),
            F.col("ts").alias("then_ts"),
        )
        .withWatermark("then_ts", watermark)
    )
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("then_ts") > F.col("first_ts"))
        & (F.col("then_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    )
    return joined.select(
        F.col("a_user").alias("user_id"),
        "first_id",
        "then_id",
        F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format("then_ts", "yyyy-MM-dd HH:mm:ss").alias("then_ts"),
    )
