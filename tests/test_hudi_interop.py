"""Real-Hudi interop: the committed fixture at tests/fixtures/hudi_cow
is a genuine-LAYOUT Apache Hudi 0.x COW table (hand-authored to the
public 0.6 on-disk format by tools/make_hudi_fixture.py — metadata this
repo's writers did not produce). The readers must speak that foreign
format end-to-end: timeline listing, HoodieCommitMetadata JSON framing
(no embedded commitTs, operationType, extraMetadata, prevCommit
"null"), nested date partition paths, and the flagship delete-view
reconstruction over fileId/prevCommit pairing
(DeleteView.java:112-163)."""

import os
import shutil

import pytest

from hudi_delete_view_spark.plans.timeline import Timeline
from hudi_delete_view_spark.sources.cow import CowTable
from hudi_delete_view_spark.sources.delete_view import DeleteView, delete_view

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "hudi_cow")
C1, C2 = "20201212121212", "20201213101010"


@pytest.fixture()
def hudi_table(scratch):
    """Copy the committed fixture into scratch (delete-view
    materialization writes under the table dir; the repo copy stays
    pristine)."""
    dst = os.path.join(scratch, "hudi_cow")
    shutil.copytree(FIXTURE, dst)
    return dst


def test_foreign_timeline_and_metadata(hudi_table):
    tl = Timeline(hudi_table)
    assert tl.timestamps() == [C1, C2]
    m1 = tl.commit_metadata(C1)
    # commitTs recovered from the FILENAME (Hudi embeds none)
    assert m1.commit_ts == C1
    assert m1.operation == "bulk_insert"
    # prevCommit "null" normalized: no phantom predecessor
    assert all(s.prev_commit is None for _p, s in m1.all_stats())
    m2 = tl.commit_metadata(C2)
    assert m2.operation == "upsert"
    # totalRecordsDeleted computed by summing numDeletes (Hudi
    # serializes no total — DeleteView.java:186 computes it)
    assert m2.total_records_deleted == 2
    assert {s.prev_commit for _p, s in m2.all_stats()} == {C1}
    # the Avro schema rides in extra, never mistaken for StructType json
    assert m2.schema_json is None
    assert "schema" in m2.extra


def test_foreign_snapshot_and_time_travel(spark, hudi_table):
    t = CowTable(spark, hudi_table, key_fields=["id"])
    snap = {r["id"]: r["value"]
            for r in t.snapshot().select("id", "value").collect()}
    assert snap == {"id1": 10, "id3": 333, "id4": 40, "id6": 60}
    old = {r["id"]: r["value"]
           for r in t.snapshot(as_of=C1).select("id", "value").collect()}
    assert old == {f"id{i}": i * 10 for i in range(1, 7)}
    # nested date partition path survives slice resolution
    pps = {r["_hoodie_partition_path"]
           for r in t.snapshot().select("_hoodie_partition_path").collect()}
    assert pps == {"2020/12/12"}


def test_foreign_delete_view_reconstruction(spark, hudi_table):
    """The reference's headline query over metadata it would itself
    read: which rows did commit C2 delete?"""
    dv = delete_view(spark, hudi_table, C2)
    rows = {r["id"]: (r["name"], r["value"], r["_hoodie_commit_time"])
            for r in dv.collect()}
    # exactly the two vanished rows, served with their pre-delete
    # payloads, stamped with the DELETING commit's time (A9)
    assert set(rows) == {"id2", "id5"}
    assert rows["id2"] == ("bravo", 20, C2)
    assert rows["id5"] == ("echo", 50, C2)
    # cache-validity: second call serves the materialized parquet
    v = DeleteView(spark, hudi_table, C2)
    assert v.is_materialized()
    assert v.dataset().count() == 2


def test_hudi_framing_round_trip(spark, scratch):
    """Write direction: a NATIVE table's commits re-exported in genuine
    Hudi framing (to_hudi_json) and republished as a clone table must
    read back identically — snapshot, time travel, and the flagship
    delete view all agree. This is our-writer → Hudi-framing →
    our-foreign-reader, the strongest round-trip verifiable without a
    real Hudi installation."""
    import json

    src = CowTable(spark, os.path.join(scratch, "native"), key_fields=["k"],
                   partition_field="p", num_file_groups=2)
    src.bulk_insert(spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i * 10) for i in range(30)],
        "k long, p string, v long"), "20250101000000")
    src.upsert(spark.createDataFrame([(3, "a", 333)], "k long, p string, v long"),
               "20250102000000")
    src.delete(spark.createDataFrame([(4, "b"), (5, "a")], "k long, p string"),
               "20250103000000")

    # clone: same data files, commits re-framed through to_hudi_json
    clone = os.path.join(scratch, "clone")
    shutil.copytree(src.base_path, clone)
    shutil.rmtree(os.path.join(clone, ".hoodie"))
    os.makedirs(os.path.join(clone, ".hoodie"))
    for ts in src.timeline.timestamps():
        text = src.timeline.commit_metadata(ts).to_hudi_json()
        d = json.loads(text)
        # strict foreign framing: none of our native keys leak
        assert set(d) == {"partitionToWriteStats", "compacted",
                          "extraMetadata", "operationType"}
        for _p, sl in d["partitionToWriteStats"].items():
            for s in sl:
                assert "columnStats" not in s and "logFile" not in s
                assert s["prevCommit"] != ""  # "null" or a real instant
        with open(os.path.join(clone, ".hoodie", f"{ts}.commit"), "w") as f:
            f.write(text)

    t2 = CowTable(spark, clone, key_fields=["k"])
    assert t2.timeline.timestamps() == src.timeline.timestamps()
    for ts in src.timeline.timestamps():
        assert sorted(
            tuple(r) for r in
            t2.snapshot(as_of=ts).select("k", "v").collect()
        ) == sorted(
            tuple(r) for r in
            src.snapshot(as_of=ts).select("k", "v").collect()
        )
    # delete reconstruction over the re-framed metadata
    dv_clone = delete_view(spark, clone, "20250103000000")
    dv_native = delete_view(spark, src.base_path, "20250103000000")
    assert sorted(r["k"] for r in dv_clone.select("k").collect()) == \
        sorted(r["k"] for r in dv_native.select("k").collect()) == [4, 5]


def test_foreign_commit_history(spark, hudi_table):
    t = CowTable(spark, hudi_table, key_fields=["id"])
    hist = {r["commit_ts"]: r for r in t.commit_history().collect()}
    assert hist[C2]["total_records_deleted"] == 2
    assert hist[C1]["num_inserts"] == 6
