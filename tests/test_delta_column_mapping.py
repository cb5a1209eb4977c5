"""Column-mapped Delta tables (PROTOCOL.md "Column Mapping", r8 VERDICT
gap #1): data files store columns under per-field PHYSICAL names
recorded in the logical schema's ``delta.columnMapping.physicalName``
metadata (+ integer field ids); partitionValues / stats keys / hive
partition dirs are physical too. The committed fixture
``tests/fixtures/delta_cm_tbl`` is authored by the INDEPENDENT encoder
``tools/make_delta_cm_fixture.py`` (mode=name, minReaderVersion=2,
nested struct members physically renamed, a NULL struct row)."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hudi_delete_view_spark.sources.delta import (
    DeltaFormatError,
    read_delta_delete_view,
    read_delta_snapshot,
    resolve_delta_state,
)

CM_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                          "delta_cm_tbl")


def test_cm_snapshot_logical_shape(spark):
    """The latest snapshot surfaces the LOGICAL schema — physical names
    nowhere visible, nested struct members renamed, NULL structs stay
    NULL (not structs of NULLs), hive partition col recovered."""
    df = read_delta_snapshot(spark, CM_FIXTURE)
    assert [f.name for f in df.schema.fields] == [
        "id", "doc", "geo", "tags", "part"]
    geo = df.schema["geo"].dataType
    assert [f.name for f in geo.fields] == ["lat", "lon"]
    rows = {r.id: r for r in df.collect()}
    assert sorted(rows) == [1, 3, 4, 5, 6]  # id2 deleted at v1
    assert rows[1].geo.lat == 10.5 and rows[1].geo.lon == -3.25
    assert rows[6].geo is None  # NULL struct preserved
    assert rows[5].tags == ["x", "z"]
    assert rows[4].part == "b"


def test_cm_time_travel_and_delete_view(spark):
    v0 = read_delta_snapshot(spark, CM_FIXTURE, version=0)
    assert sorted(r.id for r in v0.collect()) == [1, 2, 3, 4, 5]
    dv = read_delta_delete_view(spark, CM_FIXTURE, 1, ["id"]).collect()
    assert [(r.id, r.doc, r._deleted_by_version) for r in dv] == [
        (2, "bravo", 1)]


def test_cm_state_exposes_mode_and_physical_mapping():
    st = resolve_delta_state(CM_FIXTURE)
    assert st.column_mapping_mode == "name" and st.mapped
    l2p = st.logical_to_physical()
    assert l2p == {"id": "col-01", "doc": "col-02", "geo": "col-04",
                   "tags": "col-07", "part": "col-08"}
    ps = st.physical_schema()
    assert [f.name for f in ps["col-04"].dataType.fields] == [
        "col-05", "col-06"]
    # field ids re-attached for Spark's native parquet field-id path
    assert ps["col-01"].metadata["parquet.field.id"] == 1


def test_cm_stats_and_partition_pruning_accept_logical_bounds(spark):
    """``bounds`` arrive keyed by LOGICAL names; stats/partitionValues
    are physical. Proof-by-absence: with bounds excluding every other
    file, the pruned files can be DELETED from disk and the read still
    succeeds — they were never planned."""
    tmp = os.path.join(CM_FIXTURE + ".prune_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(CM_FIXTURE, tmp)
    try:
        # id >= 6 lives only in FD; part='b' excludes the col-08=a dir
        for rel in (
            "col-08=a/part-00000-aa2a0000-0000-4000-8000-000000000002-c000.parquet",
            "col-08=b/part-00001-aa1b0000-0000-4000-8000-000000000001-c000.parquet",
        ):
            os.remove(os.path.join(tmp, rel))
        df = read_delta_snapshot(
            spark, tmp, bounds={"id": (6, None), "part": ("b", "b")})
        assert [(r.id, r.part) for r in df.collect()] == [(6, "b")]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_cm_mode_id_resolves_by_parquet_field_id(spark, tmp_path):
    """Mode 'id' resolution is BY FIELD ID, not name: a data file whose
    parquet column names match NEITHER the logical nor the metadata
    physicalName still reads correctly because its parquet field ids
    match delta.columnMapping.id."""
    base = str(tmp_path / "idtbl")
    os.makedirs(os.path.join(base, "_delta_log"))
    cm = "delta.columnMapping."
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {cm + "id": 1, cm + "physicalName": "col-01"}},
            {"name": "doc", "type": "string", "nullable": True,
             "metadata": {cm + "id": 2, cm + "physicalName": "col-02"}},
        ],
    })
    fname = "part-00000-00aa0000-0000-4000-8000-000000000000-c000.parquet"
    tbl = pa.table({
        "whatever_a": pa.array([7, 8], pa.int64()),
        "whatever_b": pa.array(["seven", "eight"], pa.string()),
    })
    tbl = tbl.cast(pa.schema([
        pa.field("whatever_a", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("whatever_b", pa.string(),
                 metadata={b"PARQUET:field_id": b"2"}),
    ]))
    pq.write_table(tbl, os.path.join(base, fname))
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "9f000000-0000-4000-8000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string, "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 1710000000000}},
        {"add": {"path": fname, "partitionValues": {}, "size": 1,
                 "modificationTime": 1710000000000, "dataChange": True}},
    ]
    with open(os.path.join(base, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    rows = sorted(
        (r.id, r.doc) for r in read_delta_snapshot(spark, base).collect())
    assert rows == [(7, "seven"), (8, "eight")]


def test_cm_fixture_regenerates_identically(tmp_path):
    """The committed fixture matches its encoder byte-for-byte on the
    log (the parquet payloads carry no timestamps, but sizes/stats in
    the log pin them transitively)."""
    import subprocess
    import sys

    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "make_delta_cm_fixture.py")
    env = dict(os.environ)
    out = str(tmp_path / "regen")
    src = open(tool).read().replace(
        'OUT = os.path.join(os.path.dirname(__file__), "..", "tests", '
        '"fixtures",\n                   "delta_cm_tbl")',
        f'OUT = {out!r}')
    script = tmp_path / "regen_tool.py"
    script.write_text(src)
    subprocess.run([sys.executable, str(script)], check=True, env=env)
    for v in range(3):
        a = open(os.path.join(CM_FIXTURE, "_delta_log",
                              f"{v:020d}.json")).read()
        b = open(os.path.join(out, "_delta_log",
                              f"{v:020d}.json")).read()
        assert a == b, f"log version {v} differs from its encoder"


def test_cm_cdc_and_incremental(spark):
    """Net-effect CDC and incremental scans flow through the mapped
    scan path too (logical keys, physical files)."""
    from hudi_delete_view_spark.sources.delta import (
        read_delta_cdc,
        read_delta_incremental,
    )

    cdc = read_delta_cdc(spark, CM_FIXTURE, ["id"], 0, 2)
    assert sorted((r.op, r.id) for r in cdc.collect()) == [
        ("delete", 2), ("insert", 6)]
    inc = read_delta_incremental(spark, CM_FIXTURE, 0, 2)
    assert sorted((r.id, r._commit_version) for r in inc.collect()) == [
        (1, 1), (3, 1), (6, 2)]


def test_cm_export_round_trip(spark, scratch):
    """WRITE direction (r9): export_delta(column_mapping='name') writes
    the physically-renamed layout — parquet columns + hive dirs +
    partitionValues/stats keys all 'col-NN', field ids attached,
    protocol 2/5 — and the own reader round-trips every version and the
    flagship delete view."""
    import glob

    import pyarrow.parquet as pq

    from hudi_delete_view_spark.sources.cow import CowTable
    from hudi_delete_view_spark.sources.delta import (
        export_delta,
        read_delta_delete_view,
        read_delta_snapshot,
    )

    t = CowTable(spark, os.path.join(scratch, "cme_src"), key_fields=["k"],
                 partition_field="p", num_file_groups=2)
    t.bulk_insert(spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i * 10) for i in range(40)],
        "k long, p string, v long"), "20260101000000")
    t.upsert(spark.createDataFrame([(3, "a", 333)],
                                   "k long, p string, v long"),
             "20260102000000")
    t.delete(spark.createDataFrame([(4, "b"), (5, "a")], "k long, p string"),
             "20260103000000")
    out = export_delta(t, os.path.join(scratch, "cme_exp"),
                       column_mapping="name")

    st = resolve_delta_state(out)
    assert st.column_mapping_mode == "name"
    assert st.logical_to_physical() == {
        "k": "col-01", "p": "col-02", "v": "col-03"}
    f0 = glob.glob(os.path.join(out, "col-02=*", "part-00000*"))[0]
    sch = pq.read_schema(f0)
    assert sch.names == ["col-01", "col-03"]  # physical, partition dropped
    assert sch.field("col-01").metadata[b"PARQUET:field_id"] == b"1"

    for v, ts in enumerate(t.timeline.timestamps()):
        got = {(r.k, r.p, r.v)
               for r in read_delta_snapshot(spark, out, version=v).collect()}
        want = {(r.k, r.p, r.v)
                for r in t.snapshot(ts).select("k", "p", "v").collect()}
        assert got == want, f"version {v}"
    dv = read_delta_delete_view(spark, out, 2, ["k"])
    assert sorted(r.k for r in dv.collect()) == [4, 5]


def test_cm_export_incremental_sync_keeps_mapping(spark, scratch):
    """A sync call reproduces the identical field-id assignment (ids by
    first appearance — deterministic), so physical names stay stable
    and every pre-existing byte is untouched."""
    from hudi_delete_view_spark.sources.cow import CowTable
    from hudi_delete_view_spark.sources.delta import (
        export_delta,
        read_delta_snapshot,
        resolve_delta_state,
    )

    t = CowTable(spark, os.path.join(scratch, "cmi_src"), key_fields=["k"],
                 partition_field="p", num_file_groups=2)
    t.bulk_insert(spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i * 10) for i in range(20)],
        "k long, p string, v long"), "20260101000000")
    out = os.path.join(scratch, "cmi_exp")
    export_delta(t, out, column_mapping="name")

    def _state(root):
        st = {}
        for r, _d, fs in os.walk(root):
            for f in fs:
                p = os.path.join(r, f)
                st[os.path.relpath(p, root)] = os.stat(p).st_mtime_ns
        return st

    before = _state(out)
    t.upsert(spark.createDataFrame([(3, "a", 333)],
                                   "k long, p string, v long"),
             "20260102000000")
    export_delta(t, out, column_mapping="name")
    after = _state(out)
    changed = [rel for rel in before if after.get(rel) != before[rel]]
    assert changed == [os.path.join("_delta_log", "_last_checkpoint")]
    assert resolve_delta_state(out).logical_to_physical() == {
        "k": "col-01", "p": "col-02", "v": "col-03"}
    got = {(r.k, r.v) for r in read_delta_snapshot(spark, out)
           .select("k", "v").collect()}
    want = {(r.k, r.v) for r in t.snapshot().select("k", "v").collect()}
    assert got == want


def test_cm_export_refusals(spark, scratch):
    from hudi_delete_view_spark.sources.cow import CowTable
    from hudi_delete_view_spark.sources.delta import export_delta

    t = CowTable(spark, os.path.join(scratch, "cmr_src"), key_fields=["k"],
                 num_file_groups=1)
    t.bulk_insert(spark.createDataFrame([(1, 10)], "k long, v long"),
                  "20260101000000")
    with pytest.raises(DeltaFormatError, match="column_mapping"):
        export_delta(t, os.path.join(scratch, "cmr_exp"),
                     column_mapping="id")
