"""Author a genuine-layout **Apache Iceberg v2** table fixture at
tests/fixtures/iceberg_tbl — metadata JSON, Avro OCF manifest lists +
manifests (own from-spec Avro encoder below), parquet data files and a
POSITION DELETE file — with ZERO imports from the package (the
independence is the proof: hudi_delete_view_spark/sources/iceberg.py
must speak container bytes it did not produce, the same clean-room
pattern as the Hudi and Delta fixtures).

History (unpartitioned, schema id/name/value/part — format-version 2):
  s1  append   : da (id1..id3), db (id4..id6)
  s2  overwrite: da removed, da2 added (id3 -> 333)   [COW update]
  s3  delete   : POSITION delete pd1 -> (db, pos 1) = id5  [MOR delete]
  s4  append   : dc (id7)
  s5  delete   : dc removed, nothing added (id7)      [COW file drop]
  s6  overwrite: EQUALITY delete {id=id2} (field-id 1, seq 6) + dd
                 re-inserting id2 with value 222 AT THE SAME snapshot
                 (seq 6) — the Flink CDC upsert shape: the strict
                 data_seq < delete_seq rule must kill da2's old id2
                 (seq 2) and spare dd's new one (seq 6)

file_path entries are full file:// URIs under the table location (the
layout real writers produce); the reader relocates them by prefix when
the table directory moves.
"""

import json
import os
import shutil
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                   "tests", "fixtures", "iceberg_tbl"))
LOCATION = f"file://{OUT}"
TS0 = 1710000000000
UUID = "9c3f2e1d-0000-4000-8000-123456789abc"


# -- minimal from-spec Avro binary + OCF encoder ----------------------------

def _zz(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zz(len(b)) + b


def _enc(schema, value) -> bytes:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _zz(i)
            if value is not None and bt != "null":
                return _zz(i) + _enc(branch, value)
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return b"".join(_enc(f["type"], value[f["name"]])
                            for f in schema["fields"])
        if t == "array":
            if not value:
                return _zz(0)
            return _zz(len(value)) + b"".join(
                _enc(schema["items"], v) for v in value) + _zz(0)
        if t == "map":
            if not value:
                return _zz(0)
            return _zz(len(value)) + b"".join(
                _enc_str(k) + _enc(schema["values"], v)
                for k, v in value.items()) + _zz(0)
        return _enc(t, value)
    if schema == "null":
        return b""
    if schema == "boolean":
        return b"\x01" if value else b"\x00"
    if schema in ("int", "long"):
        return _zz(int(value))
    if schema == "double":
        return struct.pack("<d", value)
    if schema == "bytes":
        return _zz(len(value)) + bytes(value)
    if schema == "string":
        return _enc_str(value)
    raise ValueError(f"unsupported Avro type {schema!r}")


def _ocf(schema: dict, records: list[dict], codec: str = "deflate") -> bytes:
    sync = bytes(range(16))
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out = bytearray(b"Obj\x01")
    out += _zz(len(meta))
    for k, v in meta.items():
        out += _enc_str(k) + _zz(len(v)) + v
    out += _zz(0)
    out += sync
    payload = b"".join(_enc(schema, r) for r in records)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    out += _zz(len(records)) + _zz(len(payload)) + payload + sync
    return bytes(out)


# -- Iceberg spec schemas (the required v2 subset) --------------------------

_PARTITION_T = {"type": "record", "name": "r102", "fields": []}

DATA_FILE_T = {
    "type": "record", "name": "r2", "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "type": _PARTITION_T, "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "equality_ids",
         "type": ["null", {"type": "array", "items": "int"}],
         "field-id": 135},
    ],
}

MANIFEST_ENTRY_T = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "field-id": 4},
        {"name": "data_file", "type": DATA_FILE_T, "field-id": 2},
    ],
}

MANIFEST_FILE_T = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

EXISTING, ADDED, DELETED = 0, 1, 2
DATA, DELETES = 0, 1


def _write_data(rel: str, rows) -> tuple[str, int, int]:
    full = os.path.join(OUT, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    tbl = pa.table({
        "id": pa.array([r[0] for r in rows], pa.string()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.int64()),
        "part": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(tbl, full)
    return f"{LOCATION}/{rel}", len(rows), os.path.getsize(full)


def _entry(status, snap, seq, path, nrec, size, content=DATA,
           equality_ids=None):
    return {"status": status, "snapshot_id": snap, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {"content": content, "file_path": path,
                          "file_format": "PARQUET", "partition": {},
                          "record_count": nrec,
                          "file_size_in_bytes": size,
                          "equality_ids": equality_ids}}


def _write_manifest(name: str, entries: list[dict]) -> dict:
    img = _ocf(MANIFEST_ENTRY_T, entries)
    rel = f"metadata/{name}"
    full = os.path.join(OUT, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(img)
    return {"path": f"{LOCATION}/{rel}", "length": len(img)}


def main() -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(os.path.join(OUT, "metadata"))

    da, da_n, da_sz = _write_data("data/da-00001.parquet", [
        ("id1", "alpha", 10, "a"), ("id2", "bravo", 20, "a"),
        ("id3", "charlie", 30, "a")])
    db, db_n, db_sz = _write_data("data/db-00002.parquet", [
        ("id4", "delta", 40, "b"), ("id5", "echo", 50, "b"),
        ("id6", "foxtrot", 60, "b")])
    da2, da2_n, da2_sz = _write_data("data/da2-00003.parquet", [
        ("id1", "alpha", 10, "a"), ("id2", "bravo", 20, "a"),
        ("id3", "charlie", 333, "a")])
    dc, dc_n, dc_sz = _write_data("data/dc-00004.parquet", [
        ("id7", "golf", 70, "a")])

    # position delete file: schema field ids 2147483546 (file_path) /
    # 2147483545 (pos) per spec; content parquet
    pd_rel = "data/pd1-delete-00001.parquet"
    pd_full = os.path.join(OUT, pd_rel)
    pq.write_table(pa.table({
        "file_path": pa.array([db], pa.string()),
        "pos": pa.array([1], pa.int64()),
    }), pd_full)
    pd1 = f"{LOCATION}/{pd_rel}"
    pd1_sz = os.path.getsize(pd_full)

    S1, S2, S3, S4, S5 = (9111111111111111101, 9111111111111111102,
                          9111111111111111103, 9111111111111111104,
                          9111111111111111105)

    # per-snapshot manifests (full rewrite each snapshot — valid Iceberg)
    m1 = _write_manifest("m1-data.avro", [
        _entry(ADDED, S1, 1, da, da_n, da_sz),
        _entry(ADDED, S1, 1, db, db_n, db_sz)])
    m2 = _write_manifest("m2-data.avro", [
        _entry(DELETED, S2, 2, da, da_n, da_sz),
        _entry(ADDED, S2, 2, da2, da2_n, da2_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz)])
    m3d = _write_manifest("m3-data.avro", [
        _entry(EXISTING, S2, 2, da2, da2_n, da2_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz)])
    m3x = _write_manifest("m3-deletes.avro", [
        _entry(ADDED, S3, 3, pd1, 1, pd1_sz, content=1)])
    m4d = _write_manifest("m4-data.avro", [
        _entry(EXISTING, S2, 2, da2, da2_n, da2_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz),
        _entry(ADDED, S4, 4, dc, dc_n, dc_sz)])
    m4x = _write_manifest("m4-deletes.avro", [
        _entry(EXISTING, S3, 3, pd1, 1, pd1_sz, content=1)])
    m5d = _write_manifest("m5-data.avro", [
        _entry(EXISTING, S2, 2, da2, da2_n, da2_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz),
        _entry(DELETED, S5, 5, dc, dc_n, dc_sz)])
    m5x = _write_manifest("m5-deletes.avro", [
        _entry(EXISTING, S3, 3, pd1, 1, pd1_sz, content=1)])

    # s6: equality delete {id = id2} + same-snapshot re-insert (dd)
    dd, dd_n, dd_sz = _write_data("data/dd-00005.parquet", [
        ("id2", "bravo-reborn", 222, "a")])
    ed_rel = "data/ed1-eqdelete-00001.parquet"
    pq.write_table(pa.table({"id": pa.array(["id2"], pa.string())}),
                   os.path.join(OUT, ed_rel))
    ed1 = f"{LOCATION}/{ed_rel}"
    ed1_sz = os.path.getsize(os.path.join(OUT, ed_rel))
    S6 = 9111111111111111106
    m6d = _write_manifest("m6-data.avro", [
        _entry(EXISTING, S2, 2, da2, da2_n, da2_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz),
        _entry(ADDED, S6, 6, dd, dd_n, dd_sz)])
    m6x = _write_manifest("m6-deletes.avro", [
        _entry(EXISTING, S3, 3, pd1, 1, pd1_sz, content=1),
        _entry(ADDED, S6, 6, ed1, 1, ed1_sz, content=2,
               equality_ids=[1])])

    def mf(m, content, seq, minseq, snap, a, e, d, ar, er, dr):
        return {"manifest_path": m["path"], "manifest_length": m["length"],
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "min_sequence_number": minseq,
                "added_snapshot_id": snap,
                "added_files_count": a, "existing_files_count": e,
                "deleted_files_count": d, "added_rows_count": ar,
                "existing_rows_count": er, "deleted_rows_count": dr}

    lists = {
        S1: [mf(m1, DATA, 1, 1, S1, 2, 0, 0, 6, 0, 0)],
        S2: [mf(m2, DATA, 2, 1, S2, 1, 1, 1, 3, 3, 3)],
        S3: [mf(m3d, DATA, 3, 1, S3, 0, 2, 0, 0, 6, 0),
             mf(m3x, DELETES, 3, 3, S3, 1, 0, 0, 1, 0, 0)],
        S4: [mf(m4d, DATA, 4, 1, S4, 1, 2, 0, 1, 6, 0),
             mf(m4x, DELETES, 4, 3, S4, 0, 1, 0, 0, 1, 0)],
        S5: [mf(m5d, DATA, 5, 1, S5, 0, 2, 1, 0, 6, 1),
             mf(m5x, DELETES, 5, 3, S5, 0, 1, 0, 0, 1, 0)],
        S6: [mf(m6d, DATA, 6, 1, S6, 1, 2, 0, 1, 6, 0),
             mf(m6x, DELETES, 6, 3, S6, 1, 1, 0, 1, 1, 0)],
    }
    snapshots = []
    snap_log = []
    for i, (sid, entries) in enumerate(lists.items(), start=1):
        rel = f"metadata/snap-{sid}-manifest-list.avro"
        with open(os.path.join(OUT, rel), "wb") as f:
            f.write(_ocf(MANIFEST_FILE_T, entries))
        ts = TS0 + 60_000 * i
        op = {1: "append", 2: "overwrite", 3: "delete", 4: "append",
              5: "delete", 6: "overwrite"}[i]
        snapshots.append({
            "snapshot-id": sid, "timestamp-ms": ts, "sequence-number": i,
            "summary": {"operation": op},
            "manifest-list": f"{LOCATION}/{rel}", "schema-id": 0,
        })
        snap_log.append({"timestamp-ms": ts, "snapshot-id": sid})

    meta = {
        "format-version": 2, "table-uuid": UUID, "location": LOCATION,
        "last-sequence-number": 6, "last-updated-ms": TS0 + 360_000,
        "last-column-id": 4, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "string"},
            {"id": 2, "name": "name", "required": False, "type": "string"},
            {"id": 3, "name": "value", "required": False, "type": "long"},
            {"id": 4, "name": "part", "required": False, "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": S6,
        "snapshots": snapshots,
        "snapshot-log": snap_log,
        "metadata-log": [],
    }
    with open(os.path.join(OUT, "metadata", "v6.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(OUT, "metadata", "version-hint.text"), "w") as f:
        f.write("6")
    print(f"wrote genuine-layout Iceberg v2 fixture at {OUT}")


if __name__ == "__main__":
    main()
