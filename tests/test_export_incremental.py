"""Incremental (append-only) export sync — r8 verdict item 4: a second
export call into the SAME directory after new native commits must write
ONLY the new commits' files (re-exporting a petabyte because one commit
landed is not a plan), leave every previously-exported byte untouched,
and keep the foreign readers matching the native table at every
instant."""

import os

import pytest


def _file_state(root: str) -> dict[str, tuple[int, float]]:
    """path -> (size, mtime) for every file under root."""
    out = {}
    for r, _d, fs in os.walk(root):
        for f in fs:
            p = os.path.join(r, f)
            rel = os.path.relpath(p, root)
            st = os.stat(p)
            out[rel] = (st.st_size, st.st_mtime_ns)
    return out


def _build_mor(spark, path):
    from hudi_delete_view_spark.sources.mor import MorTable

    t = MorTable(spark, path, key_fields=["k"], partition_field=None,
                 num_file_groups=2)
    t.bulk_insert(spark.range(12).selectExpr(
        "concat('k', id) as k", "cast(id as long) as v"), "20260101000000")
    t.upsert_delta(spark.range(4).selectExpr(
        "concat('k', id) as k", "cast(id + 100 as long) as v"),
        "20260102000000")
    return t


def test_hudi_mor_export_incremental_sync(spark, scratch):
    from hudi_delete_view_spark.sources.hudi import (
        export_hudi_mor,
        read_hudi_metadata_files,
        read_hudi_mor_snapshot,
    )

    t = _build_mor(spark, os.path.join(scratch, "inc_src"))
    out = os.path.join(scratch, "inc_exp")
    export_hudi_mor(t, out)
    before = _file_state(out)

    # two new native commits: a delete (tombstone log block) + upsert
    t.delete_delta(spark.createDataFrame([("k3",)], "k string"),
                   "20260103000000")
    t.upsert_delta(spark.createDataFrame([("k99", 999)], "k string, v long"),
                   "20260104000000")
    export_hudi_mor(t, out)
    after = _file_state(out)

    # append-only: every pre-existing file byte-stable (size+mtime),
    # except the metadata-table files log, which APPENDS one
    # HFILE_DATA_BLOCK per new instant (so its size grows)
    grown = [rel for rel in before
             if after.get(rel) != before[rel]]
    assert grown == [
        os.path.join(".hoodie", "metadata", "files",
                     ".files-0000_20260101000000.log.1_0-0-0")
    ], grown
    mfl = grown[0]
    assert after[mfl][0] > before[mfl][0]  # strictly appended

    # only the NEW instants' artifacts appeared
    new_files = sorted(set(after) - set(before))
    new_data = [n for n in new_files if ".hoodie" not in n]
    assert len(new_data) == 2  # one log block file per new delta commit
    assert all(".log." in os.path.basename(n) for n in new_data)
    new_timeline = [n for n in new_files
                    if n.startswith(".hoodie") and "metadata" not in n]
    assert sorted(os.path.basename(n) for n in new_timeline) == [
        "20260103000000.deltacommit", "20260104000000.deltacommit"]

    # the synced export still reads identically at EVERY instant
    def native(as_of=None):
        return {(r.k, r.v) for r in t.snapshot(as_of).select("k", "v")
                .collect()}

    def foreign(as_of=None):
        return {(r.k, r.v)
                for r in read_hudi_mor_snapshot(spark, out, as_of=as_of)
                .select("k", "v").collect()}

    assert foreign() == native()
    for ts in ("20260101000000", "20260102000000", "20260103000000"):
        assert foreign(as_of=ts) == native(as_of=ts), ts

    # metadata-table listing (base HFile + appended blocks) still
    # reproduces the walk exactly
    listing = read_hudi_metadata_files(out)
    walked = {
        f for _r, _d, fs in os.walk(out) for f in fs
        if (f.endswith(".parquet") or ".log." in f)
        and ".hoodie" not in _r.replace(out, "")
    }
    assert {n for files in listing.values() for n in files} == walked

    # a third call with nothing new is a byte-level no-op
    state3a = _file_state(out)
    export_hudi_mor(t, out)
    assert _file_state(out) == state3a


def test_hudi_mor_export_divergent_history_refuses(spark, scratch):
    from hudi_delete_view_spark.sources.hudi import export_hudi_mor

    t = _build_mor(spark, os.path.join(scratch, "div_src"))
    out = os.path.join(scratch, "div_exp")
    export_hudi_mor(t, out)
    t2 = _build_mor(spark, os.path.join(scratch, "div_src2"))
    # t2's timeline starts at the same instants; fake divergence by
    # renaming an exported commit file
    hdir = os.path.join(out, ".hoodie")
    os.rename(os.path.join(hdir, "20260101000000.deltacommit"),
              os.path.join(hdir, "20250101000000.deltacommit"))
    with pytest.raises(ValueError, match="prefix"):
        export_hudi_mor(t2, out)


def _build_cow(spark, path):
    from hudi_delete_view_spark.sources.cow import CowTable

    t = CowTable(spark, path, key_fields=["k"], partition_field="p",
                 num_file_groups=2)
    t.bulk_insert(spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i * 10) for i in range(40)],
        "k long, p string, v long"), "20260101000000")
    t.upsert(spark.createDataFrame([(3, "a", 333)],
                                   "k long, p string, v long"),
             "20260102000000")
    return t


def _extend_cow(spark, t):
    t.delete(spark.createDataFrame([(4, "b"), (5, "a")], "k long, p string"),
             "20260103000000")
    t.upsert(spark.createDataFrame([(99, "a", 990)],
                                   "k long, p string, v long"),
             "20260104000000")


def test_delta_export_incremental_sync(spark, scratch):
    from pyspark.sql import DataFrame

    from hudi_delete_view_spark.sources.delta import (
        export_delta,
        read_delta_delete_view,
        read_delta_snapshot,
    )

    t = _build_cow(spark, os.path.join(scratch, "dinc_src"))
    out = os.path.join(scratch, "dinc_exp")
    export_delta(t, out)
    before = _file_state(out)

    _extend_cow(spark, t)

    from pyspark.sql import DataFrame

    collected = []
    real_collect = DataFrame.collect

    def counting_collect(self):
        rows = real_collect(self)
        collected.append(len(rows))
        return rows

    DataFrame.collect = counting_collect
    try:
        export_delta(t, out)
    finally:
        DataFrame.collect = real_collect
    after = _file_state(out)

    # append-only on previously exported bytes: only the checkpoint
    # POINTER moves (the new checkpoint parquet is a NEW file)
    changed = [rel for rel in before if after.get(rel) != before[rel]]
    assert changed == [os.path.join("_delta_log", "_last_checkpoint")]
    new_files = sorted(set(after) - set(before))
    new_data = [n for n in new_files if "_delta_log" not in n]
    # v2 rewrites the two deleted keys' files; v3 rewrites one file
    assert 1 <= len(new_data) <= 4
    new_log = {os.path.basename(n) for n in new_files if "_delta_log" in n}
    assert new_log == {
        f"{2:020d}.json", f"{3:020d}.json", f"{3:020d}.checkpoint.parquet",
    }
    # job audit: the sync collected one metadata row per NEW data file
    assert sum(collected) <= len(new_data)

    # identity stable: one metaData id across the whole log
    import json as _json

    ids = set()
    for v in range(4):
        with open(os.path.join(out, "_delta_log", f"{v:020d}.json")) as f:
            for line in f:
                a = _json.loads(line)
                if "metaData" in a:
                    ids.add(a["metaData"]["id"])
    assert len(ids) <= 1

    # full fidelity at every version, checkpoint replay included
    for v, ts in enumerate(t.timeline.timestamps()):
        got = {(r.k, r.p, r.v)
               for r in read_delta_snapshot(spark, out, version=v)
               .select("k", "p", "v").collect()}
        want = {(r.k, r.p, r.v)
                for r in t.snapshot(ts).select("k", "p", "v").collect()}
        assert got == want, f"version {v}"
    dv = read_delta_delete_view(spark, out, 2, ["k"])
    assert sorted(r.k for r in dv.collect()) == [4, 5]

    # nothing-new sync is a byte-level no-op
    state3 = _file_state(out)
    export_delta(t, out)
    assert _file_state(out) == state3


def test_iceberg_export_incremental_sync(spark, scratch):
    from pyspark.sql import DataFrame

    from hudi_delete_view_spark.sources.iceberg import (
        _load_metadata,
        export_iceberg,
        read_iceberg_snapshot,
    )

    t = _build_cow(spark, os.path.join(scratch, "iinc_src"))
    out = os.path.join(scratch, "iinc_exp")
    export_iceberg(t, out)
    before = _file_state(out)
    uuid_before = _load_metadata(out)["table-uuid"]

    _extend_cow(spark, t)

    collected = []
    real_collect = DataFrame.collect

    def counting_collect(self):
        rows = real_collect(self)
        collected.append(len(rows))
        return rows

    DataFrame.collect = counting_collect
    try:
        export_iceberg(t, out)
    finally:
        DataFrame.collect = real_collect
    after = _file_state(out)

    # append-only: only version-hint.text (the pointer) changes
    changed = [rel for rel in before if after.get(rel) != before[rel]]
    assert changed == [os.path.join("metadata", "version-hint.text")]
    new_files = sorted(set(after) - set(before))
    new_data = [n for n in new_files if n.startswith("data")]
    assert 1 <= len(new_data) <= 4
    new_meta = sorted(os.path.basename(n) for n in new_files
                      if n.startswith("metadata"))
    assert "m00002.avro" in new_meta and "m00003.avro" in new_meta
    assert "v3.metadata.json" in new_meta and "v4.metadata.json" in new_meta
    assert sum(collected) <= len(new_data)

    # identity stable across the sync
    assert _load_metadata(out)["table-uuid"] == uuid_before

    # full fidelity at every snapshot (carried EXISTING entries in the
    # new manifests reference never-rewritten old files)
    meta = _load_metadata(out)
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    assert len(snaps) == 4
    for s, ts in zip(snaps, t.timeline.timestamps()):
        got = {(r.k, r.p, r.v)
               for r in read_iceberg_snapshot(
                   spark, out, snapshot_id=s["snapshot-id"])
               .select("k", "p", "v").collect()}
        want = {(r.k, r.p, r.v)
                for r in t.snapshot(ts).select("k", "p", "v").collect()}
        assert got == want, ts

    # nothing-new sync is a byte-level no-op
    state3 = _file_state(out)
    export_iceberg(t, out)
    assert _file_state(out) == state3
