"""Filesystem seam (plans/fs.py): the metadata layer and writer-side
listing/open/rename go through one adapter, so a table rooted at a URI
(hdfs://, s3a://, file://) works end-to-end — the reference's Hadoop
FileSystem behavior (DeleteUtils.java:50-59) the local-only layer used
to narrow. mem:// proves the seam carries no hidden os.path calls;
file:// exercises the REAL Hadoop FileSystem through the JVM gateway."""

import os

import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.plans.fs import (
    HadoopFS,
    LocalFS,
    MemoryFS,
    fs_for,
)
from hudi_delete_view_spark.plans.metadata import CommitMetadata, WriteStat
from hudi_delete_view_spark.plans.timeline import Timeline
from hudi_delete_view_spark.sources.cow import CowTable


@pytest.fixture(autouse=True)
def _fresh_memory():
    MemoryFS.reset()
    yield
    MemoryFS.reset()


def test_fs_dispatch():
    assert isinstance(fs_for("/tmp/x"), LocalFS)
    assert isinstance(fs_for("relative/path"), LocalFS)
    assert isinstance(fs_for("mem://t"), MemoryFS)


def test_memory_fs_ops():
    fs = fs_for("mem://t")
    fs.write_text_atomic("mem://t/a/b.txt", "hello")
    assert fs.read_text("mem://t/a/b.txt") == "hello"
    assert fs.exists("mem://t/a/b.txt") and fs.isdir("mem://t/a")
    assert fs.listdir("mem://t/a") == ["b.txt"]
    fs.append_line("mem://t/a/log", "x\n")
    fs.append_line("mem://t/a/log", "y\n")
    assert fs.read_text("mem://t/a/log") == "x\ny\n"
    fs.copy("mem://t/a/b.txt", "mem://t/a/c.txt")
    fs.replace("mem://t/a/c.txt", "mem://t/a/d.txt")
    assert not fs.exists("mem://t/a/c.txt")
    assert fs.read_text("mem://t/a/d.txt") == "hello"
    fs.rmtree("mem://t/a")
    assert not fs.isdir("mem://t/a")
    with pytest.raises(FileNotFoundError):
        fs.read_text("mem://t/a/b.txt")


def _stat(fid, ts):
    return WriteStat(file_id=fid, path=f"{fid}_{ts}.parquet",
                     prev_commit="null", num_writes=1, num_deletes=0,
                     num_update_writes=0, num_inserts=1, file_size_bytes=10)


def test_memory_fs_timeline_lifecycle():
    """The whole metadata layer — publish, list, load, archive (batch +
    checkpoint + healing) — runs against a backend with no os.path at
    all: any hidden local-filesystem assumption fails this test."""
    base = "mem://tbl"
    tss = ["20250101000000", "20250102000000", "20250103000000"]
    for ts in tss:
        CommitMetadata(
            commit_ts=ts, operation="upsert",
            partition_to_write_stats={"": [_stat("f0", ts)]},
            total_records_deleted=0, schema_json="{}",
        ).write(base + "/.hoodie")
    tl = Timeline(base)
    assert isinstance(tl.fs, MemoryFS)
    assert tl.timestamps() == tss
    assert tl.commit_metadata(tss[1]).commit_ts == tss[1]
    assert tl.archive(keep_last_n=1) == tss[:2]
    assert tl.timestamps() == [tss[2]]
    assert tl.all_timestamps() == tss
    # archived metadata point lookup loads through the seam too
    assert tl.commit_metadata(tss[0]).find_write_stat("f0").path == \
        f"f0_{tss[0]}.parquet"


def test_mor_table_on_hadoop_fs(spark, scratch):
    """MERGE-ON-READ over a file:// URI: delta log commits, the merged
    snapshot, tombstones, and compaction all publish and read through
    the Hadoop FileSystem seam."""
    from hudi_delete_view_spark.sources.mor import MorTable

    base = "file://" + os.path.join(scratch, "urimor")
    t = MorTable(spark, base, key_fields=["k"], partition_field=None,
                 num_file_groups=2)
    assert isinstance(t.fs, HadoopFS)
    t.bulk_insert(spark.createDataFrame(
        [(i, i * 10) for i in range(30)], "k long, v long"),
        "20250101000000")
    t.upsert_delta(spark.createDataFrame([(7, 777)], "k long, v long"),
                   "20250102000000")
    t.delete_delta(spark.createDataFrame([(9,)], "k long"),
                   "20250103000000")
    snap = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
    assert len(snap) == 29 and snap[7] == 777 and 9 not in snap
    t.compact("20250104000000")
    snap2 = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
    assert snap2 == snap
    # log-resident delete view across the URI metadata
    dv = t.delete_view("20250103000000")
    assert [r["k"] for r in dv.select("k").collect()] == [9]


def test_cow_table_end_to_end_on_hadoop_fs(spark, scratch):
    """A full table lifecycle rooted at a file:// URI: every metadata
    byte and writer-side rename rides Hadoop's FileSystem via the JVM
    gateway (the exact layer an hdfs:// or s3a:// table would use),
    while Spark and pyarrow reach the same URI natively for data."""
    base = "file://" + os.path.join(scratch, "uritbl")
    t = CowTable(spark, base, key_fields=["k"], partition_field=None,
                 num_file_groups=2, stats_columns=["k"])
    assert isinstance(t.fs, HadoopFS)
    t.bulk_insert(spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "k long, v long"),
        "20250101000000")
    t.upsert(spark.createDataFrame([(7, 777)], "k long, v long"),
             "20250102000000")
    t.delete(spark.createDataFrame([(9,), (10,)], "k long"),
             "20250103000000")
    assert t.timeline.timestamps() == [
        "20250101000000", "20250102000000", "20250103000000"]
    snap = {r["k"]: r["v"] for r in t.snapshot().select("k", "v").collect()}
    assert len(snap) == 48 and snap[7] == 777 and 9 not in snap
    # time travel + incremental through URI-loaded metadata
    old = {r["k"]: r["v"] for r in
           t.snapshot(as_of="20250101000000").select("k", "v").collect()}
    assert len(old) == 50 and old[7] == 70
    inc = t.incremental("20250102000000").select("k").collect()
    assert {r["k"] for r in inc} <= set(range(50))
    # the flagship: delete view of C3 reconstructs the vanished rows
    from hudi_delete_view_spark.sources.delete_view import delete_view

    dv = delete_view(spark, base, "20250103000000")
    assert sorted(r["k"] for r in dv.select("k").collect()) == [9, 10]
    # savepoint marker files go through the seam
    t.savepoint("20250102000000")
    assert t.savepoints() == {"20250102000000"}
    t.release_savepoint("20250102000000")
    # stats pruning consults URI-published stats: an out-of-range probe
    # prunes every slice (both groups' [min, max] cover mid-range keys)
    kept, total = t.pruned_files({"k": (1000, 2000)})
    assert total == 2 and kept == []
    kept2, _ = t.pruned_files({"k": (7, 7)})
    assert len(kept2) >= 1  # in-range probe keeps the covering slice(s)
