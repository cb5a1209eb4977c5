"""Python DataSource connector (sources/pyds.py): batch scan, MOR merged
read, filter-pushdown slice pruning, time travel, streaming commit tail."""

import os

import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.sources import pyds
from hudi_delete_view_spark.sources.cow import CowTable
from hudi_delete_view_spark.sources.mor import MorTable


@pytest.fixture(autouse=True)
def _register(spark):
    pyds.register(spark)


def _lv(spark, path, **opts):
    r = spark.read.format("lakeview").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_pyds_cow_snapshot_and_travel(spark, scratch):
    t = CowTable(spark, os.path.join(scratch, "c"), key_fields=["k"],
                 partition_field=None, num_file_groups=4, stats_columns=["k"])
    t.bulk_insert(spark.createDataFrame([(i, i * 10) for i in range(500)],
                                        "k long, v long"), "20250101000000")
    t.upsert(spark.createDataFrame([(5, 555)], "k long, v long"), "20250102000000")
    df = _lv(spark, t.base_path)
    native = t.snapshot().select("k", "v").orderBy("k").collect()
    assert df.select("k", "v").orderBy("k").collect() == native
    old = _lv(spark, t.base_path, as_of="20250101000000")
    assert old.filter("k = 5").select("v").first().v == 50


def test_pyds_mor_merged_read(spark, scratch):
    t = MorTable(spark, os.path.join(scratch, "m"), key_fields=["k"],
                 partition_field=None, num_file_groups=2)
    t.bulk_insert(spark.createDataFrame([(i, i * 10) for i in range(100)],
                                        "k long, v long"), "20250101000000")
    t.upsert_delta(spark.createDataFrame([(7, 700)], "k long, v long"), "20250102000000")
    t.delete_delta(spark.createDataFrame([(3,)], "k long"), "20250103000000")
    df = _lv(spark, t.base_path)
    # the per-partition pandas merge must equal the native window merge
    assert df.select("k", "v").orderBy("k").collect() == \
        t.snapshot().select("k", "v").orderBy("k").collect()
    assert df.filter("k = 3").count() == 0
    assert df.filter("k = 7").first().v == 700


def test_pyds_pushdown_prunes_slices(spark, scratch):
    """pushFilters: range/equality bounds prune whole file slices through
    the published stats BEFORE any file opens; results stay exact because
    Spark still applies every filter row-level."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan, IsNotNull

    t = CowTable(spark, os.path.join(scratch, "p"), key_fields=["k"],
                 partition_field="band", num_file_groups=1, stats_columns=["k"])
    rows = [(k, f"b{k // 100}", k) for k in range(400)]  # 4 tight slices
    t.bulk_insert(spark.createDataFrame(rows, ["k", "band", "v"]), "20250101000000")

    reader = pyds.LakeviewReader({"path": t.base_path})
    assert len(reader.partitions()) == 4
    leftover = list(reader.pushFilters([EqualTo(("k",), 150)]))
    assert len(leftover) == 1  # partial push: Spark re-checks row-level
    assert len(reader.partitions()) == 1

    # bounds are CONSERVATIVE (inclusive): GreaterThan(99) keeps the
    # [0, 99] slice — a file is pruned only when it provably can't match
    r2 = pyds.LakeviewReader({"path": t.base_path})
    list(r2.pushFilters([GreaterThan(("k",), 100), LessThan(("k",), 250)]))
    assert len(r2.partitions()) == 2  # b1 + b2; b0 (max 99) and b3 (min 300) pruned

    # unsupported filters pass through untouched and prune nothing
    r3 = pyds.LakeviewReader({"path": t.base_path})
    out = list(r3.pushFilters([IsNotNull(("k",))]))
    assert len(out) == 1 and len(r3.partitions()) == 4

    # end-to-end answer with pushdown active
    got = _lv(spark, t.base_path).filter("k between 100 and 249").count()
    assert got == 150


def test_pyds_pushdown_nonscalar_probe_types_safe(spark, scratch):
    """Probe types outside int/str (date, datetime, Decimal — which
    Spark DOES push) must not fail planning: stats are JSON-published,
    so cross-type comparison would TypeError. Those filters skip file
    pruning and flow back to Spark for row-level evaluation."""
    import datetime
    from decimal import Decimal

    from pyspark.sql.datasource import EqualTo, GreaterThan

    t = CowTable(spark, os.path.join(scratch, "pd"), key_fields=["k"],
                 partition_field=None, num_file_groups=2,
                 stats_columns=["k", "d", "amt"])
    rows = [(k, datetime.date(2025, 1, 1 + k % 20), Decimal(k) / 4)
            for k in range(100)]
    t.bulk_insert(
        spark.createDataFrame(rows, "k long, d date, amt decimal(10,2)"),
        "20250101000000")

    # planning-time safety: pushing date/Decimal probes must not raise
    r = pyds.LakeviewReader({"path": t.base_path})
    leftover = list(r.pushFilters([
        EqualTo(("d",), datetime.date(2025, 1, 5)),
        GreaterThan(("amt",), Decimal("10.00")),
        EqualTo(("k",), 7),
    ]))
    assert len(leftover) == 3  # everything re-checked row-level
    parts = r.partitions()  # must not TypeError
    assert 1 <= len(parts) <= 2  # int probe on k still prunes

    # end-to-end: correct answers with the filters active
    df = _lv(spark, t.base_path)
    assert df.filter(F.col("d") == F.lit(datetime.date(2025, 1, 5))).count() \
        == sum(1 for _k, d, _a in rows if d == datetime.date(2025, 1, 5))
    assert df.filter("amt > 10.00").count() == sum(
        1 for _k, _d, a in rows if a > Decimal("10.00"))


def test_pyds_stream_tails_commits(spark, scratch):
    """Streaming source: offset = commit timestamp; batches emit exactly
    the rows stamped by each commit; a restart from the checkpoint
    re-emits nothing old and picks up NEW commits."""
    import shutil

    t = CowTable(spark, os.path.join(scratch, "s"), key_fields=["k"],
                 partition_field=None, num_file_groups=2)
    t.bulk_insert(spark.createDataFrame([(i, i * 10) for i in range(20)],
                                        "k long, v long"), "20250101000000")
    t.upsert(spark.createDataFrame([(3, 333)], "k long, v long"), "20250102000000")
    ckpt = os.path.join(scratch, "ckpt")
    out = os.path.join(scratch, "out")

    def drain():
        stream = spark.readStream.format("lakeview").option("path", t.base_path).load()
        q = (
            stream.select("_hoodie_commit_time", "k", "v")
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    got = spark.read.parquet(out)
    assert got.count() == 21  # 20 inserts + 1 after-image
    assert got.filter("_hoodie_commit_time = '20250102000000'").count() == 1

    # new commit after the first drain: only ITS rows arrive on restart
    t.upsert(spark.createDataFrame([(50, 5000)], "k long, v long"), "20250103000000")
    drain()
    got2 = spark.read.parquet(out)
    assert got2.count() == 22
    assert got2.filter("_hoodie_commit_time = '20250103000000'").count() == 1
    shutil.rmtree(ckpt, ignore_errors=True)


def test_pyds_stream_mor_delta_tail(spark, scratch):
    """Streaming tail over a MOR table: delta-commit batches emit the
    after-images written by each commit; tombstones never surface as
    data rows (they flow through delete view / CDC)."""
    t = MorTable(spark, os.path.join(scratch, "sm"), key_fields=["k"],
                 partition_field=None, num_file_groups=2)
    t.bulk_insert(spark.createDataFrame([(i, i * 10) for i in range(10)],
                                        "k long, v long"), "20250101000000")
    t.upsert_delta(spark.createDataFrame([(4, 400), (99, 990)],
                                         "k long, v long"), "20250102000000")
    t.delete_delta(spark.createDataFrame([(2,)], "k long"), "20250103000000")

    out, ckpt = os.path.join(scratch, "out"), os.path.join(scratch, "ckpt")
    stream = spark.readStream.format("lakeview").option("path", t.base_path).load()
    q = (
        stream.select("_hoodie_commit_time", "k", "v")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 12  # 10 inserts + 2 delta after-images, 0 tombstones
    by_ct = {r[0]: r[1] for r in got.groupBy("_hoodie_commit_time").count().collect()}
    assert by_ct == {"20250101000000": 10, "20250102000000": 2}


def test_archive_corrupt_checkpoint_raises(spark, scratch):
    """A damaged archive checkpoint must fail loudly at resolution time,
    not serve a partial table."""
    import json

    from hudi_delete_view_spark.plans.timeline import (
        ARCHIVE_CHECKPOINT,
        ARCHIVE_DIR_NAME,
    )

    t = CowTable(spark, os.path.join(scratch, "cc"), key_fields=["k"],
                 partition_field=None, num_file_groups=1)
    t.bulk_insert(spark.createDataFrame([(1, 1)], "k long, v long"), "20250101000000")
    t.upsert(spark.createDataFrame([(2, 2)], "k long, v long"), "20250102000000")
    t.archive_timeline(keep_last_n=1)
    cp_path = os.path.join(t.base_path, ".hoodie", ARCHIVE_DIR_NAME, ARCHIVE_CHECKPOINT)
    with open(cp_path) as f:
        cp = json.load(f)
    del cp["slices"]
    with open(cp_path, "w") as f:
        json.dump(cp, f)
    t.timeline.refresh()
    with pytest.raises(KeyError):
        t.snapshot().count()


def test_pyds_stream_writer_ingest(spark, scratch):
    """writeStream.format('lakeview'): two-phase exactly-once ingest —
    executors stage, the driver commit routes through a real keyed upsert
    (one table commit per epoch); replays with the same checkpoint add no
    duplicate commits; later epochs upsert over earlier ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = os.path.join(scratch, "in")
    os.makedirs(in_dir, exist_ok=True)
    rows0 = {"k": list(range(10)), "v": [i * 10 for i in range(10)]}
    rows1 = {"k": [3, 100], "v": [333, 1000]}
    for i, rows in enumerate((rows0, rows1)):
        p = os.path.join(in_dir, f"f{i}.parquet")
        pq.write_table(pa.table(rows), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    tbl_path = os.path.join(scratch, "tbl")
    ckpt = os.path.join(scratch, "ckpt")

    def drain():
        stream = (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", "1").parquet(in_dir)
        )
        q = (
            stream.writeStream.format("lakeview")
            .option("path", tbl_path).option("keys", "k")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    t = CowTable(spark, tbl_path, key_fields=["k"])
    published = t.absorb_stream_epochs()
    assert published == ["20300101000000", "20300101000001"]
    assert t.timeline.timestamps() == ["20300101000000", "20300101000001"]
    snap = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
    assert len(snap) == 11 and snap[3] == 333 and snap[100] == 1000 and snap[4] == 40
    # the epoch upsert published real write stats (delete-view consumable)
    hist = {r["commit_ts"]: r for r in t.commit_history().collect()}
    assert hist["20300101000001"]["num_update_writes"] == 1
    assert hist["20300101000001"]["num_inserts"] == 1
    # replay with the same checkpoint: no new data, no new epochs
    drain()
    assert t.absorb_stream_epochs() == []
    assert t.timeline.timestamps() == ["20300101000000", "20300101000001"]
    # no staged debris left behind
    staged = os.path.join(tbl_path, ".stream-staging")
    assert not os.path.isdir(staged) or not os.listdir(staged)
    pending = os.path.join(tbl_path, ".stream-pending")
    assert not os.path.isdir(pending) or not os.listdir(pending)


def test_pyds_stream_fresh_checkpoint_no_loss(spark, scratch):
    """A stream restart with a FRESH checkpoint resets batchId to 0, so
    its epochs prefer already-published commit timestamps. That must NOT
    be misread as a replay (which would delete the staged data without
    ingesting): identity is (writer_id, batchId), and the colliding epoch
    publishes under the next free monotonic timestamp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    in1 = os.path.join(scratch, "in1")
    in2 = os.path.join(scratch, "in2")
    for d, rows in ((in1, {"k": [1, 2], "v": [10, 20]}),
                    (in2, {"k": [2, 3], "v": [222, 30]})):
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table(rows), os.path.join(d, "f.parquet"))

    tbl_path = os.path.join(scratch, "tbl")

    def run(in_dir, ckpt):
        q = (
            spark.readStream.schema("k long, v long").parquet(in_dir)
            .writeStream.format("lakeview")
            .option("path", tbl_path).option("keys", "k")
            .option("checkpointLocation", os.path.join(scratch, ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run(in1, "ckpt1")
    t = CowTable(spark, tbl_path, key_fields=["k"])
    assert t.absorb_stream_epochs() == ["20300101000000"]
    # second run, FRESH checkpoint: batchId 0 again -> same preferred ts
    run(in2, "ckpt2")
    pub2 = t.absorb_stream_epochs()
    assert pub2 == ["20300101000001"]  # bumped, not dropped
    snap = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
    assert snap == {1: 10, 2: 222, 3: 30}
    # replaying run 2's checkpoint adds nothing (identity dedupe)
    run(in2, "ckpt2")
    assert t.absorb_stream_epochs() == []
    assert t.timeline.timestamps() == ["20300101000000", "20300101000001"]


def test_pyds_streaming_materialized_view(spark, scratch):
    """STREAMING MATERIALIZED VIEW composition: writeStream lakeview →
    absorber publishes keyed commits → the on_publish hook refreshes an
    AutoMaterializedView over the same table, so the maintained
    aggregate tracks the stream with no orchestration beyond the
    listener. After drain, the view equals a from-scratch recompute."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hudi_delete_view_spark.plans.ivm import AutoMaterializedView
    from hudi_delete_view_spark.sources.pyds import LakeviewAbsorber

    in_dir = os.path.join(scratch, "in")
    os.makedirs(in_dir, exist_ok=True)
    for i in range(3):
        p = os.path.join(in_dir, f"f{i}.parquet")
        pq.write_table(pa.table(
            {"k": [i * 10 + j for j in range(6)],
             "g": [(i * 10 + j) % 3 for j in range(6)],
             "v": [float(i * 100 + j) for j in range(6)]}), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    tbl_path = os.path.join(scratch, "tbl")
    state = {"mv": None, "advances": 0}

    def plan(t):
        return t["tbl"].groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))

    def on_publish(done):
        from hudi_delete_view_spark.sources.cow import CowTable

        if state["mv"] is None:
            state["mv"] = AutoMaterializedView(
                spark, os.path.join(scratch, "mv"),
                {"tbl": CowTable(spark, tbl_path, key_fields=["k"])}, plan)
        state["mv"].refresh()
        state["advances"] += 1

    absorber = LakeviewAbsorber(spark, tbl_path, min_pending=1,
                                on_publish=on_publish)
    spark.streams.addListener(absorber.listener())
    try:
        q = (
            spark.readStream.schema("k long, g long, v double")
            .option("maxFilesPerTrigger", "1").parquet(in_dir)
            .writeStream.format("lakeview")
            .option("path", tbl_path).option("keys", "k")
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        absorber.drain()
    finally:
        spark.streams.removeListener(absorber._listener)
    from hudi_delete_view_spark.sources.cow import CowTable

    t = CowTable(spark, tbl_path, key_fields=["k"])
    assert len(t.timeline.timestamps()) == 3
    assert state["advances"] >= 1
    got = sorted(tuple(r) for r in state["mv"].serve().collect())
    want = sorted(tuple(r) for r in plan({"tbl": t.snapshot()}).collect())
    assert got == want


def test_pyds_schema_evolution_read(spark, scratch):
    """Batch read of an EVOLVED table: files written before a column
    existed surface it as null — never a positionally-aliased wrong
    column (pyarrow's get_field_index returns -1 for missing names)."""
    t = CowTable(spark, os.path.join(scratch, "evo"), key_fields=["k"],
                 partition_field="p", num_file_groups=1)
    t.bulk_insert(spark.createDataFrame(
        [(i, "a" if i < 5 else "b", i * 10) for i in range(10)],
        ["k", "p", "v"]), "20250101000000")
    # evolution: partition 'a' gets rewritten with a new column; 'b' keeps
    # its ORIGINAL pre-evolution file
    t.upsert(spark.createDataFrame([(0, "a", 999, "extra")],
                                   ["k", "p", "v", "note"]), "20250102000000")
    df = _lv(spark, t.base_path)
    rows = {r["k"]: (r["v"], r["note"]) for r in df.select("k", "v", "note").collect()}
    assert rows[0] == (999, "extra")
    assert rows[7] == (70, None)  # old-file row: null note, CORRECT v
    assert rows[2] == (20, None)
    native = t.snapshot().select("k", "v", "note").orderBy("k").collect()
    assert df.select("k", "v", "note").orderBy("k").collect() == native


def test_pyds_auto_absorb_listener(spark, scratch):
    """LakeviewAbsorber: the listener absorbs epochs WHILE the stream
    runs (no manual absorb between micro-batches), drain() finishes the
    tail, and a concurrent drain racing the terminated-event callback
    publishes nothing twice."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hudi_delete_view_spark.sources.pyds import LakeviewAbsorber

    in_dir = os.path.join(scratch, "in")
    os.makedirs(in_dir, exist_ok=True)
    for i in range(3):
        p = os.path.join(in_dir, f"f{i}.parquet")
        pq.write_table(
            pa.table({"k": [i * 10 + j for j in range(5)],
                      "v": [i * 100 + j for j in range(5)]}), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    tbl_path = os.path.join(scratch, "tbl")
    absorber = LakeviewAbsorber(spark, tbl_path, min_pending=1)
    spark.streams.addListener(absorber.listener())
    try:
        stream = (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", "1").parquet(in_dir)
        )
        q = (
            stream.writeStream.format("lakeview")
            .option("path", tbl_path).option("keys", "k")
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        # listener callbacks are asynchronous: give the bus a moment to
        # deliver, then require that the LISTENER (not drain) published
        import time

        deadline = time.time() + 30
        while not absorber.published and time.time() < deadline:
            time.sleep(0.2)
        listener_published = list(absorber.published)
        absorber.drain()
    finally:
        spark.streams.removeListener(absorber._listener)
    t = CowTable(spark, tbl_path, key_fields=["k"])
    # all three epochs published exactly once, no pending debris
    assert t.timeline.timestamps() == [
        "20300101000000", "20300101000001", "20300101000002"]
    assert sorted(absorber.published) == t.timeline.timestamps()
    assert absorber.pending() == []
    assert t.snapshot().count() == 15
    # the listener did real MID-STREAM work before drain() ran
    assert len(listener_published) >= 1


def test_pyds_register_on_stock_session(spark, scratch):
    """Driver-harness portability (CORRECTNESS_r07 lake_pyds_scan err):
    a stock session has spark.sql.python.filterPushdown.enabled unset
    (default false), and Spark refuses to plan a reader that overrides
    pushFilters under it (DATA_SOURCE_PUSHDOWN_DISABLED). register()
    must flip the runtime conf itself; if a deployment rejects the set,
    the no-pushFilters fallback reader keeps the scan answering."""
    conf_key = "spark.sql.python.filterPushdown.enabled"
    t = CowTable(spark, os.path.join(scratch, "stock"), key_fields=["k"],
                 partition_field=None, num_file_groups=2, stats_columns=["k"])
    t.bulk_insert(spark.createDataFrame([(i, i * 10) for i in range(50)],
                                        "k long, v long"), "20250101000000")
    old = spark.conf.get(conf_key, None)
    try:
        # stock-session shape: conf explicitly off, then register()
        spark.conf.set(conf_key, "false")
        pyds.register(spark)
        assert spark.conf.get(conf_key) == "true"  # register enabled it
        got = _lv(spark, t.base_path).select("k", "v").orderBy("k").collect()
        assert [(r.k, r.v) for r in got] == [(i, i * 10) for i in range(50)]

        # locked-down shape: conf pinned off, fallback source must still
        # answer (row-level filters in Spark, no slice pruning)
        spark.conf.set(conf_key, "false")
        spark.dataSource.register(pyds.LakeviewDataSourceNoPushdown)
        got = (_lv(spark, t.base_path).filter("k >= 48")
               .select("k", "v").orderBy("k").collect())
        assert [(r.k, r.v) for r in got] == [(48, 480), (49, 490)]
    finally:
        spark.conf.set(conf_key, old if old is not None else "true")
        pyds.register(spark)
