"""Delete-view flagship: golden expectations + cache semantics + edge cases
(reference invariants from DeleteView.java / FIXTURES.md §2.1/2.3)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.sources.fixtures import LINEITEM_KEY
from hudi_delete_view_spark.plans.timeline import TimelineError
from hudi_delete_view_spark.sources.cow import COMMIT_TIME_FIELD, RECORD_KEY_FIELD, CowTable
from hudi_delete_view_spark.sources.delete_view import DeleteView, delete_view

C1, C2, C3, C4 = "20260101000000", "20260102000000", "20260103000000", "20260104000000"


@pytest.fixture()
def table(spark, lineitem, scratch):
    t = CowTable(
        spark,
        os.path.join(scratch, "tbl"),
        key_fields=LINEITEM_KEY,
        partition_field="l_returnflag",
        num_file_groups=4,
    )
    t.bulk_insert(lineitem, C1)
    updates = lineitem.filter("l_partkey % 10 = 0").withColumn(
        "l_quantity", F.col("l_quantity") + F.lit(100.0)
    )
    t.upsert(updates, C2)
    t.delete_where("l_suppkey % 17 = 0", C3)
    return t


def test_delete_view_golden(table, spark, lineitem):
    dv = delete_view(spark, table.base_path, C3)
    meta = table.timeline.commit_metadata(C3)
    # reference invariant: |view| == totalRecordsDeleted (DeleteView.java:184-186)
    assert dv.count() == meta.total_records_deleted > 0
    # exactly the deleted keys
    expected_keys = {
        f"{r.l_orderkey}:{r.l_linenumber}:{r.l_partkey}:{r.l_suppkey}"
        for r in lineitem.filter("l_suppkey % 17 = 0").collect()
    }
    got_keys = {r[0] for r in dv.select(RECORD_KEY_FIELD).collect()}
    assert got_keys == expected_keys
    # stamped with the delete commit (HudiDeleteHandle.java:73-74)
    assert dv.filter(F.col(COMMIT_TIME_FIELD) != C3).count() == 0
    # payload reflects the C2 update (deleted rows were the *current* versions)
    got_qty = dv.filter("l_partkey % 10 = 0").agg(F.sum("l_quantity")).first()[0]
    want_qty = (
        lineitem.filter("l_suppkey % 17 = 0 and l_partkey % 10 = 0")
        .agg(F.sum("l_quantity") + 100.0 * F.count("*"))
        .first()[0]
    )
    assert got_qty == pytest.approx(want_qty)


def test_cache_hit_and_invalidation(table, spark):
    view = DeleteView(spark, table.base_path, C3)
    path = view.materialize()
    assert view.is_materialized()
    # corrupt the cache: drop one parquet file -> row count mismatch -> recompute
    victim = next(f for f in os.listdir(path) if f.endswith(".parquet"))
    os.remove(os.path.join(path, victim))
    assert not view.is_materialized()
    dv = view.dataset()
    assert dv.count() == table.timeline.commit_metadata(C3).total_records_deleted
    assert view.is_materialized()
    # wiping the dir also invalidates
    shutil.rmtree(path)
    assert not view.is_materialized()


def test_empty_delete_commit(table, spark):
    # a delete matching nothing -> numDeletes==0 everywhere -> empty view
    meta = table.delete_where("l_suppkey = -1", C4)
    assert meta.total_records_deleted == 0
    dv = delete_view(spark, table.base_path, C4)
    assert dv.count() == 0


def test_full_file_group_delete(spark, lineitem, scratch):
    # single file group: deleting everything empties the group; the new
    # slice is a 0-row file and the view holds every old row
    t = CowTable(spark, os.path.join(scratch, "one"), key_fields=LINEITEM_KEY, num_file_groups=1)
    small = lineitem.limit(100)
    t.bulk_insert(small, C1)
    t.delete_where("1 = 1", C2)
    assert t.snapshot().count() == 0
    dv = delete_view(spark, t.base_path, C2)
    assert dv.count() == 100


def test_missing_instant_is_explicit(table, spark):
    with pytest.raises(TimelineError, match="no completed commit instant"):
        DeleteView(spark, table.base_path, "20991231000000")


def test_second_delete_commit_views_are_independent(table, spark, lineitem):
    table.delete_where("l_suppkey % 23 = 0", C4)
    dv3 = delete_view(spark, table.base_path, C3)
    dv4 = delete_view(spark, table.base_path, C4)
    want4 = lineitem.filter("l_suppkey % 23 = 0 and l_suppkey % 17 != 0").count()
    assert dv4.count() == want4
    assert dv3.count() == lineitem.filter("l_suppkey % 17 = 0").count()
    # no key overlap between the two views
    overlap = (
        dv3.select(RECORD_KEY_FIELD).intersect(dv4.select(RECORD_KEY_FIELD)).count()
    )
    assert overlap == 0


def test_delete_view_range_includes_merge_commits(spark, scratch):
    """delete_views_between must surface rows removed by MERGE commits
    alongside plain delete commits, each stamped with its own instant."""
    import os

    from hudi_delete_view_spark.sources.cow import CowTable
    from hudi_delete_view_spark.sources.delete_view import delete_views_between

    t = CowTable(spark, os.path.join(scratch, "dvr_m"), key_fields=["k"],
                 partition_field="p", num_file_groups=2)
    t.bulk_insert(
        spark.createDataFrame([(k, f"p{k % 2}", k * 10) for k in range(1, 11)],
                              "k int, p string, v int"),
        "20280101000000",
    )
    t.delete(
        spark.createDataFrame([(2, "p0"), (3, "p1")], "k int, p string"),
        "20280102000000",
    )
    src = spark.createDataFrame(
        [(5, "p1", 999, False), (6, "p0", 0, True), (21, "p1", 210, False)],
        "k int, p string, v int, is_del boolean",
    )
    t.merge_into(src, "20280103000000", delete_condition="is_del")
    got = {
        (r["k"], r["_hoodie_commit_time"])
        for r in delete_views_between(spark, t.base_path, "20280101000000")
        .select("k", "_hoodie_commit_time").collect()
    }
    assert got == {
        (2, "20280102000000"), (3, "20280102000000"), (6, "20280103000000")
    }


def test_two_phase_anti_join_scale_shape(table, spark, monkeypatch):
    """Scale-shape pin: when commit stats say the new slices outgrow a
    broadcast while the deleted count stays bounded, the compute splits
    into a NARROW (fid, key) anti-join plus a broadcast semi-join of the
    deleted keys back onto the wide side — so the wide old rows feed a
    BroadcastHashJoin directly and never shuffle (with broadcast
    estimation disabled below, only the explicit hint can produce one).
    Output must be identical to the single anti-join."""
    import io
    from contextlib import redirect_stdout

    from hudi_delete_view_spark.sources import delete_view as dv_mod

    baseline = {
        r[0] for r in DeleteView(spark, table.base_path, C3)._compute()
        .select(RECORD_KEY_FIELD).collect()
    }
    monkeypatch.setattr(dv_mod, "_TWO_PHASE_MIN_NEW_ROWS", 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = DeleteView(spark, table.base_path, C3)._compute()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # wide side consumed by the hinted broadcast semi-join
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
        # the only shuffled join is the narrow key anti-join (tree lines
        # carry the join type; the detail section repeats the bare name)
        smj = [ln for ln in plan.splitlines() if "- SortMergeJoin" in ln]
        assert smj and all("LeftAnti" in ln for ln in smj), plan
        got = {r[0] for r in df.select(RECORD_KEY_FIELD).collect()}
        assert got == baseline and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
