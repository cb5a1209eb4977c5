"""Foreign Apache Iceberg v2 reader (sources/iceberg.py +
plans/avro_ocf.py) against the committed genuine-layout fixture
tests/fixtures/iceberg_tbl (authored by the independent encoder
tools/make_iceberg_fixture.py — metadata JSON + Avro OCF manifest
lists/manifests + position-delete parquet this reader did not produce).

The oracle queries (queries/iceberg.py) hash-verify values; these tests
pin the structural behaviors: OCF codec handling, relocation (the
fixture's recorded file:// URIs re-root when the table directory
moves), both flagship delete shapes, named refusals (equality deletes,
format-version 3, missing key for the COW shape), and that position
deletes never leak into other snapshots."""

import json
import os
import shutil

import pytest

from hudi_delete_view_spark.sources.iceberg import (
    IcebergFormatError,
    read_iceberg_delete_view,
    read_iceberg_incremental,
    read_iceberg_snapshot,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "iceberg_tbl")
TS0 = 1710000000000
S1, S2, S3, S4, S5, S6 = (9111111111111111101, 9111111111111111102,
                          9111111111111111103, 9111111111111111104,
                          9111111111111111105, 9111111111111111106)


def test_iceberg_snapshots_and_travel(spark):
    # current = s6: the equality delete killed old id2 (seq 2), its
    # same-commit re-insert (seq 6) survives the strict-inequality rule
    cur = {r.id: r.value for r in read_iceberg_snapshot(spark, FIXTURE).collect()}
    assert cur == {"id1": 10, "id2": 222, "id3": 333, "id4": 40, "id6": 60}
    s5 = {r.id: r.value for r in read_iceberg_snapshot(
        spark, FIXTURE, snapshot_id=S5).collect()}
    assert s5 == {"id1": 10, "id2": 20, "id3": 333, "id4": 40, "id6": 60}
    s1 = {r.id: r.value
          for r in read_iceberg_snapshot(spark, FIXTURE, snapshot_id=S1).collect()}
    assert s1 == {f"id{i}": i * 10 for i in range(1, 7)}
    s4 = {r.id: r.value
          for r in read_iceberg_snapshot(spark, FIXTURE, snapshot_id=S4).collect()}
    assert "id7" in s4 and "id5" not in s4  # pos delete applied, append seen
    ts = {r.id: r.value for r in read_iceberg_snapshot(
        spark, FIXTURE, timestamp_ms=TS0 + 180_000).collect()}
    assert "id5" not in ts and "id7" not in ts  # timestamp -> s3
    with pytest.raises(IcebergFormatError, match="not in table"):
        read_iceberg_snapshot(spark, FIXTURE, snapshot_id=12345)


def test_iceberg_flagship_both_delete_shapes(spark):
    """The reference's headline question in BOTH Iceberg delete shapes:
    the s3 MERGE-ON-READ position delete reconstructs EXACTLY with no
    user key (the delete file names its target file + row ordinal); the
    s5 COPY-ON-WRITE file drop reconstructs through the keyed
    anti-join; and the COW shape without a key refuses by name."""
    mor = read_iceberg_delete_view(spark, FIXTURE, S3)
    rows = {r.id: (r.name, r.value, r._deleted_by_snapshot, r._deleted_at_ts)
            for r in mor.collect()}
    assert rows == {"id5": ("echo", 50, S3, TS0 + 180_000)}

    cow = read_iceberg_delete_view(spark, FIXTURE, S5, key_cols=["id"])
    assert {r.id: r.value for r in cow.collect()} == {"id7": 70}
    with pytest.raises(IcebergFormatError, match="key_cols"):
        read_iceberg_delete_view(spark, FIXTURE, S5)

    # an update snapshot (all rows survive the rewrite) deletes nothing;
    # an append deletes nothing
    assert read_iceberg_delete_view(spark, FIXTURE, S2,
                                    key_cols=["id"]).count() == 0
    assert read_iceberg_delete_view(spark, FIXTURE, S4).count() == 0


def test_iceberg_incremental_appends(spark):
    inc = read_iceberg_incremental(spark, FIXTURE, S1)
    got = sorted((r.id, r.value, r._snapshot_id) for r in inc.collect())
    assert got == [("id1", 10, S2), ("id2", 20, S2), ("id2", 222, S6),
                   ("id3", 333, S2), ("id7", 70, S4)]
    # the MOR delete snapshot adds only a delete file: emits nothing
    assert read_iceberg_incremental(spark, FIXTURE, S2, S3).count() == 0


def test_iceberg_relocation(spark, tmp_path):
    """file_path entries are full URIs under the RECORDED location; a
    moved table (this is a committed fixture — it moves with the repo)
    re-roots them by prefix, and the position-delete comparison keeps
    using recorded paths so relocation cannot desynchronize it."""
    moved = os.path.join(tmp_path, "relocated")
    shutil.copytree(FIXTURE, moved)
    cur = {r.id: r.value for r in read_iceberg_snapshot(spark, moved).collect()}
    assert cur == {"id1": 10, "id2": 222, "id3": 333, "id4": 40, "id6": 60}
    mor = read_iceberg_delete_view(spark, moved, S3)
    assert {r.id for r in mor.collect()} == {"id5"}


def test_iceberg_refusals(spark, tmp_path):
    """format-version 3 and equality deletes refuse BY NAME."""
    v3 = os.path.join(tmp_path, "v3")
    shutil.copytree(FIXTURE, v3)
    mp = os.path.join(v3, "metadata", "v6.metadata.json")
    with open(mp) as f:
        meta = json.load(f)
    meta["format-version"] = 3
    with open(mp, "w") as f:
        json.dump(meta, f)
    with pytest.raises(IcebergFormatError, match="format-version 3"):
        read_iceberg_snapshot(spark, v3)

    # equality delete: flip the fixture's pos-delete manifest entry
    # content to 2 via a re-encoded manifest (independent encoder)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ice_tool", os.path.join(os.path.dirname(__file__), "..", "tools",
                                 "make_iceberg_fixture.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    eq = os.path.join(tmp_path, "eq")
    shutil.copytree(FIXTURE, eq)
    pd_uri = f"{tool.LOCATION}/data/pd1-delete-00001.parquet"
    entry = tool._entry(1, S3, 3, pd_uri, 1, 100, content=2)
    img = tool._ocf(tool.MANIFEST_ENTRY_T, [entry])
    # m6-deletes feeds the CURRENT snapshot (s6)
    with open(os.path.join(eq, "metadata", "m6-deletes.avro"), "wb") as f:
        f.write(img)
    with pytest.raises(IcebergFormatError, match="equality_ids"):
        read_iceberg_snapshot(spark, eq)


def test_ocf_reader_codecs():
    """plans/avro_ocf.py: null + deflate codecs decode identically;
    unknown codec and bad magic refuse by name; block sync mismatch is
    detected."""
    import importlib.util

    from hudi_delete_view_spark.plans.avro_ocf import read_ocf
    from hudi_delete_view_spark.plans.hudi_log import HudiLogFormatError

    spec = importlib.util.spec_from_file_location(
        "ice_tool2", os.path.join(os.path.dirname(__file__), "..", "tools",
                                  "make_iceberg_fixture.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    schema = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ]}
    recs = [{"a": i, "b": None if i % 2 else f"s{i}", "m": {"k": i}}
            for i in range(50)]
    for codec in ("null", "deflate"):
        img = tool._ocf(schema, recs, codec=codec)
        _meta, got = read_ocf(img)
        assert got == recs, codec
    with pytest.raises(HudiLogFormatError, match="codec"):
        read_ocf(tool._ocf(schema, recs, codec="snappy"))
    with pytest.raises(HudiLogFormatError, match="magic"):
        read_ocf(b"nope" + tool._ocf(schema, recs)[4:])
    img = bytearray(tool._ocf(schema, recs, codec="null"))
    img[-1] ^= 0xFF  # corrupt the trailing block sync
    with pytest.raises(HudiLogFormatError, match="sync"):
        read_ocf(bytes(img))


def test_iceberg_equality_deletes(spark, tmp_path):
    """The Flink CDC writer shape (s6): an equality delete {id=id2}
    plus a same-snapshot re-insert. The spec's STRICT data_seq <
    delete_seq rule must kill da2's old id2 (seq 2) and spare dd's new
    one (seq 6); the flagship over the eq commit reconstructs the OLD
    image exactly and keyless; an eq delete referencing an unknown
    field id refuses by name."""
    import importlib.util

    cur = {r.id: (r.name, r.value)
           for r in read_iceberg_snapshot(spark, FIXTURE).collect()}
    assert cur["id2"] == ("bravo-reborn", 222)
    dv = read_iceberg_delete_view(spark, FIXTURE, S6)
    assert [(r.id, r.name, r.value, r._deleted_by_snapshot)
            for r in dv.collect()] == [("id2", "bravo", 20, S6)]

    # unknown equality field id -> named refusal
    spec = importlib.util.spec_from_file_location(
        "ice_tool3", os.path.join(os.path.dirname(__file__), "..", "tools",
                                  "make_iceberg_fixture.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    bad = os.path.join(tmp_path, "badfid")
    shutil.copytree(FIXTURE, bad)
    ed_uri = f"{tool.LOCATION}/data/ed1-eqdelete-00001.parquet"
    entry = tool._entry(1, S6, 6, ed_uri, 1, 100, content=2,
                        equality_ids=[99])
    pd_uri = f"{tool.LOCATION}/data/pd1-delete-00001.parquet"
    keep = tool._entry(0, S3, 3, pd_uri, 1, 100, content=1)
    img = tool._ocf(tool.MANIFEST_ENTRY_T, [keep, entry])
    with open(os.path.join(bad, "metadata", "m6-deletes.avro"), "wb") as f:
        f.write(img)
    with pytest.raises(IcebergFormatError, match="field id"):
        read_iceberg_snapshot(spark, bad).collect()


def test_iceberg_equality_delete_multi_column(spark, tmp_path):
    """Multi-column equality_ids: a delete row must match ALL named
    columns — (id4, 40) matches and dies, (id6, 999) matches id but not
    value and survives."""
    import importlib.util

    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "ice_tool4", os.path.join(os.path.dirname(__file__), "..", "tools",
                                  "make_iceberg_fixture.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    mc = os.path.join(tmp_path, "mc")
    shutil.copytree(FIXTURE, mc)
    # the eq-delete parquet carries BOTH equality columns
    pq.write_table(pa.table({
        "id": pa.array(["id4", "id6"], pa.string()),
        "value": pa.array([40, 999], pa.int64()),
    }), os.path.join(mc, "data", "ed2-eqdelete.parquet"))
    ed2 = f"{tool.LOCATION}/data/ed2-eqdelete.parquet"
    pd_uri = f"{tool.LOCATION}/data/pd1-delete-00001.parquet"
    ed1 = f"{tool.LOCATION}/data/ed1-eqdelete-00001.parquet"
    img = tool._ocf(tool.MANIFEST_ENTRY_T, [
        tool._entry(0, S3, 3, pd_uri, 1, 100, content=1),
        tool._entry(1, S6, 6, ed1, 1, 100, content=2, equality_ids=[1]),
        tool._entry(1, S6, 6, ed2, 2, 100, content=2, equality_ids=[1, 3]),
    ])
    with open(os.path.join(mc, "metadata", "m6-deletes.avro"), "wb") as f:
        f.write(img)
    # ed2's file_path is recorded under the ORIGINAL location; relocation
    # re-roots it, so drop a copy where the recorded prefix resolves
    cur = {r.id: r.value for r in read_iceberg_snapshot(spark, mc).collect()}
    assert cur == {"id1": 10, "id2": 222, "id3": 333, "id6": 60}


def test_iceberg_partition_value_pruning(spark, tmp_path):
    """Identity partition values in the manifest's r102 struct prune
    data files BEFORE any scan (the manifest-resident mirror of Delta's
    add.stats skipping): bounds part=b never plans the part=a file, and
    the bounded read equals the unbounded read filtered row-level.
    Non-identity transforms never prune (pruning is an optimization,
    never a filter)."""
    import copy
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ice_tool5", os.path.join(os.path.dirname(__file__), "..", "tools",
                                  "make_iceberg_fixture.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    base = os.path.join(tmp_path, "part_tbl")
    os.makedirs(os.path.join(base, "metadata"))
    tool.OUT = base
    tool.LOCATION = f"file://{base}"

    da, da_n, da_sz = tool._write_data(
        "data/pa.parquet", [("id1", "alpha", 10, "a"), ("id2", "bravo", 20, "a")])
    db, db_n, db_sz = tool._write_data(
        "data/pb.parquet", [("id3", "charlie", 30, "b")])

    entry_t = copy.deepcopy(tool.MANIFEST_ENTRY_T)
    entry_t["fields"][4]["type"]["fields"][3]["type"] = {
        "type": "record", "name": "r102", "fields": [
            {"name": "part", "type": ["null", "string"], "field-id": 1000},
        ],
    }
    SID = 7111111111111111101
    ea = tool._entry(1, SID, 1, da, da_n, da_sz)
    ea["data_file"]["partition"] = {"part": "a"}
    eb = tool._entry(1, SID, 1, db, db_n, db_sz)
    eb["data_file"]["partition"] = {"part": "b"}
    m = tool._ocf(entry_t, [ea, eb])
    with open(os.path.join(base, "metadata", "m1.avro"), "wb") as f:
        f.write(m)
    ml = tool._ocf(tool.MANIFEST_FILE_T, [{
        "manifest_path": f"{tool.LOCATION}/metadata/m1.avro",
        "manifest_length": len(m), "partition_spec_id": 0, "content": 0,
        "sequence_number": 1, "min_sequence_number": 1,
        "added_snapshot_id": SID, "added_files_count": 2,
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": 3, "existing_rows_count": 0,
        "deleted_rows_count": 0}])
    with open(os.path.join(base, "metadata", "ml1.avro"), "wb") as f:
        f.write(ml)
    meta = {
        "format-version": 2, "table-uuid": "0" * 8, "location": tool.LOCATION,
        "last-sequence-number": 1, "last-updated-ms": TS0,
        "last-column-id": 4, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "string"},
            {"id": 2, "name": "name", "required": False, "type": "string"},
            {"id": 3, "name": "value", "required": False, "type": "long"},
            {"id": 4, "name": "part", "required": False, "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "part", "transform": "identity", "source-id": 4,
             "field-id": 1000}]}],
        "last-partition-id": 1000, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}], "properties": {},
        "current-snapshot-id": SID,
        "snapshots": [{"snapshot-id": SID, "timestamp-ms": TS0,
                       "sequence-number": 1,
                       "summary": {"operation": "append"},
                       "manifest-list": f"{tool.LOCATION}/metadata/ml1.avro",
                       "schema-id": 0}],
        "snapshot-log": [{"timestamp-ms": TS0, "snapshot-id": SID}],
        "metadata-log": [],
    }
    with open(os.path.join(base, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(base, "metadata", "version-hint.text"), "w") as f:
        f.write("1")

    from hudi_delete_view_spark.sources.iceberg import (
        _identity_partition_names,
        _live_files,
        _load_metadata,
        _partition_pass,
        _select_snapshot,
    )

    md = _load_metadata(base)
    snap = _select_snapshot(md, None, None)
    data, _pos, _eq = _live_files(base, md, snap)
    ident = _identity_partition_names(md)
    assert ident == {"part": "part"}
    kept = [os.path.basename(f["file_path"]) for f in data
            if _partition_pass(f, ident, {"part": ("b", "b")})]
    assert kept == ["pb.parquet"]  # part=a pruned BEFORE any scan

    bounded = read_iceberg_snapshot(spark, base, bounds={"part": ("b", "b")})
    assert sorted((r.id, r.value, r.part) for r in bounded.collect()) == \
        [("id3", 30, "b")]
    full = read_iceberg_snapshot(spark, base)
    assert sorted((r.id, r.value) for r in full.collect()) == \
        [("id1", 10), ("id2", 20), ("id3", 30)]
