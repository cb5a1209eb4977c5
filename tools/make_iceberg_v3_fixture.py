"""Author a genuine-layout **Apache Iceberg format-version 3** table
fixture with PUFFIN DELETION VECTORS at tests/fixtures/iceberg_v3_tbl —
metadata JSON, Avro OCF manifests (own from-spec encoder, shared shape
with make_iceberg_fixture.py), parquet data files and Puffin DV files —
with ZERO imports from the package (the independence is the proof:
hudi_delete_view_spark/sources/iceberg.py + plans/puffin.py must speak
container bytes they did not produce).

History (unpartitioned, schema id/name/value — format-version 3):
  s1  append   : da (id1..id4), db (id5..id8)
  s2  delete   : DV for da = {1, 2}  (kills id2, id3) — puffin P1
  s3  delete   : DV for da = {1, 2, 3} (kills id4; CUMULATIVE — the v3
                 rule: at most one DV per data file, a new DV contains
                 and supersedes the old, which this snapshot marks
                 DELETED). The commit's own delta is {3}.
  s4  append   : dc (id9)

v3 manifest data_file additions: referenced_data_file (field-id 143),
content_offset (144), content_size_in_bytes (145); DV entries use
file_format PUFFIN with content=1 (position deletes).

Puffin layout (public spec): "PFA1" magic, blobs, footer = magic +
JSON payload + int32 LE size + 4 flag bytes + magic. DV blob =
4-byte BE length of (magic+vector), magic D1 D3 39 64, portable
64-bit roaring bitmap, 4-byte BE CRC-32 of (magic+vector).
"""

import json
import os
import shutil
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                   "tests", "fixtures", "iceberg_v3_tbl"))
LOCATION = f"file://{OUT}"
TS0 = 1720000000000
UUID = "7d3f2e1d-0000-4000-8000-abcdef123456"


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
        return _enc(t, value)
    if schema == "null":
        return b""
    if schema in ("int", "long"):
        return _zz(int(value))
    if schema == "string":
        return _enc_str(value)
    raise ValueError(f"unsupported Avro type {schema!r}")


def _ocf(schema: dict, records: list[dict]) -> bytes:
    sync = bytes(range(16))
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"deflate"}
    out = bytearray(b"Obj\x01")
    out += _zz(len(meta))
    for k, v in meta.items():
        out += _enc_str(k) + _zz(len(v)) + v
    out += _zz(0)
    out += sync
    payload = b"".join(_enc(schema, r) for r in records)
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = comp.compress(payload) + comp.flush()
    out += _zz(len(records)) + _zz(len(payload)) + payload + sync
    return bytes(out)


# -- puffin + DV encoding (from the public specs, independent) --------------

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])  # LE of 1681511377


def _portable64(positions: list[int]) -> bytes:
    by_high: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = struct.pack("<q", len(by_high))
    for high, vals in sorted(by_high.items()):
        by_key: dict[int, list[int]] = {}
        for v in vals:
            by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
        r32 = struct.pack("<i", 12346) + struct.pack("<i", len(by_key))
        for key, kv in sorted(by_key.items()):
            r32 += struct.pack("<HH", key, len(kv) - 1)
        off = len(r32) + 4 * len(by_key)
        for _key, kv in sorted(by_key.items()):
            r32 += struct.pack("<i", off)
            off += 2 * len(kv)
        for _key, kv in sorted(by_key.items()):
            r32 += struct.pack(f"<{len(kv)}H", *kv)
        out += struct.pack("<i", high) + r32
    return out


def _dv_blob(positions: list[int]) -> bytes:
    mv = DV_MAGIC + _portable64(positions)
    return (struct.pack(">i", len(mv)) + mv
            + struct.pack(">I", zlib.crc32(mv) & 0xFFFFFFFF))


def _write_puffin(rel: str, positions: list[int], referenced: str,
                  snap: int, seq: int) -> tuple[str, int, int, int]:
    """Write one single-blob DV puffin file; returns (uri, file size,
    blob offset, blob length)."""
    blob = _dv_blob(positions)
    out = bytearray(PUFFIN_MAGIC)
    off = len(out)
    out += blob
    payload = json.dumps({"blobs": [{
        "type": "deletion-vector-v1", "fields": [],
        "snapshot-id": snap, "sequence-number": seq,
        "offset": off, "length": len(blob),
        "properties": {"referenced-data-file": referenced,
                       "cardinality": str(len(positions))},
    }], "properties": {}}).encode()
    out += PUFFIN_MAGIC + payload + struct.pack("<i", len(payload))
    out += b"\x00\x00\x00\x00" + PUFFIN_MAGIC
    full = os.path.join(OUT, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(bytes(out))
    return f"{LOCATION}/{rel}", len(out), off, len(blob)


# -- Iceberg v3 manifest schemas -------------------------------------------

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
        {"name": "referenced_data_file", "type": ["null", "string"],
         "field-id": 143},
        {"name": "content_offset", "type": ["null", "long"],
         "field-id": 144},
        {"name": "content_size_in_bytes", "type": ["null", "long"],
         "field-id": 145},
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
    })
    pq.write_table(tbl, full)
    return f"{LOCATION}/{rel}", len(rows), os.path.getsize(full)


def _entry(status, snap, seq, path, nrec, size, content=DATA, fmt="PARQUET",
           referenced=None, c_off=None, c_size=None):
    return {"status": status, "snapshot_id": snap, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {"content": content, "file_path": path,
                          "file_format": fmt, "partition": {},
                          "record_count": nrec,
                          "file_size_in_bytes": size,
                          "equality_ids": None,
                          "referenced_data_file": referenced,
                          "content_offset": c_off,
                          "content_size_in_bytes": c_size}}


def _write_manifest(name: str, entries: list[dict]) -> dict:
    img = _ocf(MANIFEST_ENTRY_T, entries)
    rel = f"metadata/{name}"
    with open(os.path.join(OUT, rel), "wb") as f:
        f.write(img)
    return {"path": f"{LOCATION}/{rel}", "length": len(img)}


def main() -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(os.path.join(OUT, "metadata"))

    da, da_n, da_sz = _write_data("data/da-00001.parquet", [
        ("id1", "alpha", 10), ("id2", "bravo", 20),
        ("id3", "charlie", 30), ("id4", "delta", 40)])
    db, db_n, db_sz = _write_data("data/db-00002.parquet", [
        ("id5", "echo", 50), ("id6", "foxtrot", 60),
        ("id7", "golf", 70), ("id8", "hotel", 80)])
    dc, dc_n, dc_sz = _write_data("data/dc-00003.parquet", [
        ("id9", "india", 90)])

    S1, S2, S3, S4 = (9222222222222222201, 9222222222222222202,
                      9222222222222222203, 9222222222222222204)

    p1, p1_sz, p1_off, p1_len = _write_puffin(
        "data/dv-p1.puffin", [1, 2], da, S2, 2)
    # s3's DV is CUMULATIVE per the v3 spec: {1,2} + the new {3}
    p2, p2_sz, p2_off, p2_len = _write_puffin(
        "data/dv-p2.puffin", [1, 2, 3], da, S3, 3)

    m1 = _write_manifest("m1-data.avro", [
        _entry(ADDED, S1, 1, da, da_n, da_sz),
        _entry(ADDED, S1, 1, db, db_n, db_sz)])
    m2d = _write_manifest("m2-data.avro", [
        _entry(EXISTING, S1, 1, da, da_n, da_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz)])
    m2x = _write_manifest("m2-deletes.avro", [
        _entry(ADDED, S2, 2, p1, 2, p1_sz, content=1, fmt="PUFFIN",
               referenced=da, c_off=p1_off, c_size=p1_len)])
    m3d = _write_manifest("m3-data.avro", [
        _entry(EXISTING, S1, 1, da, da_n, da_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz)])
    m3x = _write_manifest("m3-deletes.avro", [
        _entry(DELETED, S3, 2, p1, 2, p1_sz, content=1, fmt="PUFFIN",
               referenced=da, c_off=p1_off, c_size=p1_len),
        _entry(ADDED, S3, 3, p2, 3, p2_sz, content=1, fmt="PUFFIN",
               referenced=da, c_off=p2_off, c_size=p2_len)])
    m4d = _write_manifest("m4-data.avro", [
        _entry(EXISTING, S1, 1, da, da_n, da_sz),
        _entry(EXISTING, S1, 1, db, db_n, db_sz),
        _entry(ADDED, S4, 4, dc, dc_n, dc_sz)])
    m4x = _write_manifest("m4-deletes.avro", [
        _entry(EXISTING, S3, 3, p2, 3, p2_sz, content=1, fmt="PUFFIN",
               referenced=da, c_off=p2_off, c_size=p2_len)])

    def mf(m, content, seq, minseq, snap, a, e, d, ar, er, dr):
        return {"manifest_path": m["path"], "manifest_length": m["length"],
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "min_sequence_number": minseq,
                "added_snapshot_id": snap,
                "added_files_count": a, "existing_files_count": e,
                "deleted_files_count": d, "added_rows_count": ar,
                "existing_rows_count": er, "deleted_rows_count": dr}

    lists = {
        S1: [mf(m1, DATA, 1, 1, S1, 2, 0, 0, 8, 0, 0)],
        S2: [mf(m2d, DATA, 2, 1, S2, 0, 2, 0, 0, 8, 0),
             mf(m2x, DELETES, 2, 2, S2, 1, 0, 0, 2, 0, 0)],
        S3: [mf(m3d, DATA, 3, 1, S3, 0, 2, 0, 0, 8, 0),
             mf(m3x, DELETES, 3, 2, S3, 1, 0, 1, 3, 0, 2)],
        S4: [mf(m4d, DATA, 4, 1, S4, 1, 2, 0, 1, 8, 0),
             mf(m4x, DELETES, 4, 3, S4, 0, 1, 0, 0, 3, 0)],
    }
    snapshots, snap_log = [], []
    for i, (sid, entries) in enumerate(lists.items(), start=1):
        rel = f"metadata/snap-{sid}-manifest-list.avro"
        with open(os.path.join(OUT, rel), "wb") as f:
            f.write(_ocf(MANIFEST_FILE_T, entries))
        ts = TS0 + 60_000 * i
        op = {1: "append", 2: "delete", 3: "delete", 4: "append"}[i]
        snapshots.append({
            "snapshot-id": sid, "timestamp-ms": ts, "sequence-number": i,
            "summary": {"operation": op},
            "manifest-list": f"{LOCATION}/{rel}", "schema-id": 0,
        })
        snap_log.append({"timestamp-ms": ts, "snapshot-id": sid})

    meta = {
        "format-version": 3, "table-uuid": UUID, "location": LOCATION,
        "last-sequence-number": 4, "last-updated-ms": TS0 + 240_000,
        "last-column-id": 3, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "string"},
            {"id": 2, "name": "name", "required": False, "type": "string"},
            {"id": 3, "name": "value", "required": False, "type": "long"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": S4,
        "snapshots": snapshots,
        "snapshot-log": snap_log,
        "metadata-log": [],
    }
    with open(os.path.join(OUT, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(OUT, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    print(f"wrote Iceberg v3 (puffin DV) fixture at {OUT}")


if __name__ == "__main__":
    main()
