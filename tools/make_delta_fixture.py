"""Author a genuine-layout **Delta Lake** table fixture at
tests/fixtures/delta_tbl — transaction log JSON, hive-partitioned
parquet data files, a checkpoint parquet + _last_checkpoint — written
from the PUBLIC Delta protocol spec (PROTOCOL.md) with ZERO imports
from the package (the independence is the proof: the reader in
hudi_delete_view_spark/sources/delta.py must speak bytes it did not
produce, the same clean-room pattern as make_hudi_mor_fixture.py).

History (partition column ``part``, schema id/name/value/part):
  v0  bulk insert: part=a -> f0 (id1..id3), part=b -> f1 (id4..id6)
  v1  update id3 -> 333: f0 rewritten as f2 (dataChange)
  v2  DELETE id2, id5: f2 -> f3, f1 -> f4 (the flagship target commit)
  v3  OPTIMIZE part=b: f4 -> f5, dataChange=FALSE (no logical change)
      + checkpoint parquet at v3 + _last_checkpoint
  v4  insert id7: part=a -> f6 (proves checkpoint + post-delta replay)
  v5  DV DELETE id4: f5 re-added with an INLINE deletion vector {0}
  v6  DV DELETE id6: f5 re-added with an on-disk 'u' (z85-uuid-named)
      deletion vector {0, 1} — cumulative per the protocol, so the
      commit's own delta is {1}

Every add carries stats (numRecords, minValues/maxValues) so the
column-stats file-skipping path has something real to prune on. The
deletion vectors use this tool's OWN roaring/z85/DV-file encoder
(independent of the package; the 32-bit roaring layer of BOTH sides is
pinned against images from the real org.roaringbitmap — see
tests/test_delta_interop.py golden vectors).
"""

import json
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "delta_tbl")

TS0 = 1700000000000  # ms; one minute apart per version
SCHEMA_STRING = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "string", "nullable": True, "metadata": {}},
        {"name": "name", "type": "string", "nullable": True, "metadata": {}},
        {"name": "value", "type": "long", "nullable": True, "metadata": {}},
        {"name": "part", "type": "string", "nullable": True, "metadata": {}},
    ],
})

META = {
    "id": "3f1b5f2e-aaaa-bbbb-cccc-0123456789ab",
    "format": {"provider": "parquet", "options": {}},
    "schemaString": SCHEMA_STRING,
    "partitionColumns": ["part"],
    "configuration": {},
    "createdTime": TS0,
}
PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def _write_data(relpath: str, rows: list[tuple[str, str, int]]) -> int:
    """Data file WITHOUT the partition column (per PROTOCOL.md, partition
    values live only in add.partitionValues / the directory name)."""
    full = os.path.join(OUT, relpath)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    tbl = pa.table({
        "id": pa.array([r[0] for r in rows], pa.string()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, full)
    return os.path.getsize(full)


def _add(relpath: str, part: str, rows, ts: int, data_change: bool = True) -> dict:
    size = _write_data(relpath, rows)
    values = [r[2] for r in rows]
    ids = [r[0] for r in rows]
    return {
        "path": relpath,
        "partitionValues": {"part": part},
        "size": size,
        "modificationTime": ts,
        "dataChange": data_change,
        "stats": json.dumps({
            "numRecords": len(rows),
            "minValues": {"id": min(ids), "value": min(values)},
            "maxValues": {"id": max(ids), "value": max(values)},
            "nullCount": {"id": 0, "value": 0},
        }),
    }


def _remove(relpath: str, part: str, ts: int, data_change: bool = True) -> dict:
    return {
        "path": relpath,
        "deletionTimestamp": ts,
        "dataChange": data_change,
        "extendedFileMetadata": True,
        "partitionValues": {"part": part},
    }


# -- independent deletion-vector encoder (roaring + z85 + DV framing) ------

_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")


def _z85e(b: bytes) -> str:
    out = []
    for i in range(0, len(b), 4):
        acc = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, r = divmod(acc, 85)
            chunk.append(_Z85[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _roaring32(values: list[int]) -> bytes:
    """Portable 32-bit roaring, array containers only (cookie 12346 —
    layout confirmed by the org.roaringbitmap golden vectors)."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    out = struct.pack("<i", 12346) + struct.pack("<i", len(by_key))
    for key, vals in sorted(by_key.items()):
        out += struct.pack("<HH", key, len(vals) - 1)
    # container offsets (always present for cookie 12346)
    off = len(out) + 4 * len(by_key)
    for _key, vals in sorted(by_key.items()):
        out += struct.pack("<i", off)
        off += 2 * len(vals)
    for _key, vals in sorted(by_key.items()):
        out += struct.pack(f"<{len(vals)}H", *vals)
    return out


def _dv_blob(positions: list[int]) -> bytes:
    """RoaringBitmapArray portable: LE magic 1681511377, int64 count,
    per bitmap int32 key + 32-bit serialization."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(positions):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = struct.pack("<i", 1681511377) + struct.pack("<q", len(by_high))
    for high, vals in sorted(by_high.items()):
        out += struct.pack("<i", high) + _roaring32(vals)
    return out


def _dv_inline(positions: list[int]) -> dict:
    blob = _dv_blob(positions)
    return {"storageType": "i", "pathOrInlineDv": _z85e(blob),
            "offset": None, "sizeInBytes": len(blob),
            "cardinality": len(positions)}


def _dv_ufile(positions: list[int], uuid_bytes: bytes) -> dict:
    """On-disk DV: file deletion_vector_<uuid>.bin = [version byte 1]
    [int32 BE size][blob][int32 BE CRC32-of-blob]."""
    import uuid as _uuid

    blob = _dv_blob(positions)
    u = _uuid.UUID(bytes=uuid_bytes)
    fname = f"deletion_vector_{u}.bin"
    body = (b"\x01" + struct.pack(">i", len(blob)) + blob
            + struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    with open(os.path.join(OUT, fname), "wb") as f:
        f.write(body)
    return {"storageType": "u", "pathOrInlineDv": _z85e(uuid_bytes),
            "offset": 1, "sizeInBytes": len(blob),
            "cardinality": len(positions)}


def _commit(version: int, actions: list[dict], op: str, ts: int) -> None:
    log_dir = os.path.join(OUT, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    lines = [json.dumps({"commitInfo": {
        "timestamp": ts, "operation": op, "operationParameters": {},
        "engineInfo": "delta-fixture-tool/1.0",
    }})]
    lines += [json.dumps(a) for a in actions]
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    import shutil

    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)

    F0 = "part=a/part-00000-0f0a0000-0000-4000-8000-000000000000-c000.parquet"
    F1 = "part=b/part-00001-0f1b0000-0000-4000-8000-000000000001-c000.parquet"
    F2 = "part=a/part-00000-0f2a0000-0000-4000-8000-000000000002-c000.parquet"
    F3 = "part=a/part-00000-0f3a0000-0000-4000-8000-000000000003-c000.parquet"
    F4 = "part=b/part-00001-0f4b0000-0000-4000-8000-000000000004-c000.parquet"
    F5 = "part=b/part-00001-0f5b0000-0000-4000-8000-000000000005-c000.parquet"
    F6 = "part=a/part-00002-0f6a0000-0000-4000-8000-000000000006-c000.parquet"

    # v0: bulk insert
    a0 = _add(F0, "a", [("id1", "alpha", 10), ("id2", "bravo", 20),
                        ("id3", "charlie", 30)], TS0)
    a1 = _add(F1, "b", [("id4", "delta", 40), ("id5", "echo", 50),
                        ("id6", "foxtrot", 60)], TS0)
    _commit(0, [{"protocol": PROTOCOL}, {"metaData": META},
                {"add": a0}, {"add": a1}], "WRITE", TS0)

    # v1: update id3 -> 333 (rewrite of f0)
    ts1 = TS0 + 60_000
    a2 = _add(F2, "a", [("id1", "alpha", 10), ("id2", "bravo", 20),
                        ("id3", "charlie", 333)], ts1)
    _commit(1, [{"remove": _remove(F0, "a", ts1)}, {"add": a2}],
            "UPDATE", ts1)

    # v2: DELETE id2, id5 — the flagship target
    ts2 = TS0 + 120_000
    a3 = _add(F3, "a", [("id1", "alpha", 10), ("id3", "charlie", 333)], ts2)
    a4 = _add(F4, "b", [("id4", "delta", 40), ("id6", "foxtrot", 60)], ts2)
    _commit(2, [{"remove": _remove(F2, "a", ts2)}, {"add": a3},
                {"remove": _remove(F1, "b", ts2)}, {"add": a4}],
            "DELETE", ts2)

    # v3: OPTIMIZE part=b (no logical change: dataChange=false both ways)
    ts3 = TS0 + 180_000
    a5 = _add(F5, "b", [("id4", "delta", 40), ("id6", "foxtrot", 60)],
              ts3, data_change=False)
    _commit(3, [{"remove": _remove(F4, "b", ts3, data_change=False)},
                {"add": a5}], "OPTIMIZE", ts3)

    # checkpoint at v3 (classic single-file parquet checkpoint): the
    # compacted state — protocol + metaData + the live adds; map-typed
    # partitionValues/configuration, exactly the physical shape Delta
    # writers produce
    map_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct([
        ("path", pa.string()), ("partitionValues", map_t),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()), ("stats", pa.string()),
    ])
    meta_t = pa.struct([
        ("id", pa.string()), ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", map_t), ("createdTime", pa.int64()),
    ])
    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
    ])

    def add_row(a):
        return {"path": a["path"],
                "partitionValues": list(a["partitionValues"].items()),
                "size": a["size"], "modificationTime": a["modificationTime"],
                "dataChange": a["dataChange"], "stats": a["stats"]}

    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None},
        {"protocol": None,
         "metaData": {"id": META["id"], "schemaString": SCHEMA_STRING,
                      "partitionColumns": ["part"], "configuration": [],
                      "createdTime": TS0},
         "add": None},
        {"protocol": None, "metaData": None, "add": add_row(a3)},
        {"protocol": None, "metaData": None, "add": add_row(a5)},
    ]
    cp_schema = pa.schema([
        ("protocol", proto_t), ("metaData", meta_t), ("add", add_t),
    ])
    cp = pa.Table.from_pylist(rows, schema=cp_schema)
    pq.write_table(cp, os.path.join(
        OUT, "_delta_log", f"{3:020d}.checkpoint.parquet"))
    with open(os.path.join(OUT, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 3, "size": len(rows)}, f)

    # v4: insert id7 after the checkpoint
    ts4 = TS0 + 240_000
    a6 = _add(F6, "a", [("id7", "golf", 70)], ts4)
    _commit(4, [{"add": a6}], "WRITE", ts4)

    # v5: DV DELETE id4 (f5 pos 0) — INLINE deletion vector; a DV
    # commit re-adds the SAME path carrying the vector
    ts5 = TS0 + 300_000
    a5_dv = dict(a5)
    a5_dv["dataChange"] = True
    a5_dv["modificationTime"] = ts5
    a5_dv["deletionVector"] = _dv_inline([0])
    _commit(5, [{"remove": _remove(F5, "b", ts5)}, {"add": a5_dv}],
            "DELETE", ts5)

    # v6: DV DELETE id6 (f5 pos 1) — on-disk 'u' storage; the new DV is
    # CUMULATIVE ({0, 1}), so this commit's own delta is {1}
    ts6 = TS0 + 360_000
    a5_dv2 = dict(a5_dv)
    a5_dv2["modificationTime"] = ts6
    a5_dv2["deletionVector"] = _dv_ufile(
        [0, 1], bytes(range(0xA0, 0xB0)))
    _commit(6, [{"remove": _remove(F5, "b", ts6)}, {"add": a5_dv2}],
            "DELETE", ts6)

    print(f"wrote genuine-layout Delta fixture at {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
