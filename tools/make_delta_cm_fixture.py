"""Author a genuine-layout **column-mapped** Delta Lake table fixture at
tests/fixtures/delta_cm_tbl — written from the PUBLIC Delta protocol
spec (PROTOCOL.md, "Column Mapping") with ZERO imports from the package
(same clean-room pattern as make_delta_fixture.py: the reader in
hudi_delete_view_spark/sources/delta.py must speak bytes it did not
produce).

``delta.columnMapping.mode = name``: every logical field carries
``delta.columnMapping.physicalName`` ('col-NN') and an integer
``delta.columnMapping.id`` in its schemaString metadata; data files
store columns UNDER THE PHYSICAL NAMES (with parquet field ids);
``add.partitionValues`` keys, ``add.stats`` keys and the hive partition
directory all use the physical partition name. This is the layout every
renamed/dropped-column Databricks table ships with — r8 VERDICT gap #1.

Logical schema (physical name, field id):
  id     long            (col-01, 1)
  doc    string          (col-02, 2)
  geo    struct<lat double (col-05, 5), lon double (col-06, 6)>
                         (col-04, 4)  -- proves NESTED physical rename
  tags   array<string>   (col-07, 7)
  part   string          (col-08, 8)  -- PARTITION column

History (protocol minReaderVersion=2 — classic column-mapping gate,
no readerFeatures list):
  v0  WRITE: part=a -> FA (id 1..3), part=b -> FB (id 4..5)
  v1  DELETE id=2: FA rewritten as FC (the flagship delete-view target)
  v2  WRITE: part=b -> FD (id 6, geo NULL — null-struct preservation)
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "delta_cm_tbl")

TS0 = 1710000000000

_CM = "delta.columnMapping."


def _f(name, typ, phys, fid, metadata=None):
    return {"name": name, "type": typ, "nullable": True,
            "metadata": {**(metadata or {}),
                         _CM + "id": fid, _CM + "physicalName": phys}}


SCHEMA_STRING = json.dumps({
    "type": "struct",
    "fields": [
        _f("id", "long", "col-01", 1),
        _f("doc", "string", "col-02", 2),
        _f("geo", {
            "type": "struct",
            "fields": [
                _f("lat", "double", "col-05", 5),
                _f("lon", "double", "col-06", 6),
            ],
        }, "col-04", 4),
        _f("tags", {"type": "array", "elementType": "string",
                    "containsNull": True}, "col-07", 7),
        _f("part", "string", "col-08", 8),
    ],
})

META = {
    "id": "77cc5f2e-aaaa-bbbb-cccc-0123456789cd",
    "format": {"provider": "parquet", "options": {}},
    "schemaString": SCHEMA_STRING,
    "partitionColumns": ["part"],  # LOGICAL name, per delta-spark
    "configuration": {
        "delta.columnMapping.mode": "name",
        "delta.columnMapping.maxColumnId": "8",
    },
    "createdTime": TS0,
}
PROTOCOL = {"minReaderVersion": 2, "minWriterVersion": 5}


def _pf(name, typ, fid):
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})


_GEO_T = pa.struct([_pf("col-05", pa.float64(), 5),
                    _pf("col-06", pa.float64(), 6)])
_DATA_SCHEMA = pa.schema([
    _pf("col-01", pa.int64(), 1),
    _pf("col-02", pa.string(), 2),
    _pf("col-04", _GEO_T, 4),
    _pf("col-07", pa.list_(pa.string()), 7),
])


def _write_data(relpath: str, rows: list[dict]) -> int:
    """rows: [{'id':…, 'doc':…, 'geo':(lat,lon)|None, 'tags':[…]}] —
    written under PHYSICAL column names (partition column omitted)."""
    full = os.path.join(OUT, relpath)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    tbl = pa.Table.from_pylist([
        {"col-01": r["id"], "col-02": r["doc"],
         "col-04": (None if r["geo"] is None
                    else {"col-05": r["geo"][0], "col-06": r["geo"][1]}),
         "col-07": r["tags"]}
        for r in rows
    ], schema=_DATA_SCHEMA)
    pq.write_table(tbl, full)
    return os.path.getsize(full)


def _add(relpath: str, part: str, rows, ts: int) -> dict:
    size = _write_data(relpath, rows)
    ids = [r["id"] for r in rows]
    return {
        "path": relpath,
        "partitionValues": {"col-08": part},  # PHYSICAL key
        "size": size,
        "modificationTime": ts,
        "dataChange": True,
        "stats": json.dumps({
            "numRecords": len(rows),
            "minValues": {"col-01": min(ids)},
            "maxValues": {"col-01": max(ids)},
            "nullCount": {"col-01": 0},
        }),
    }


def _remove(relpath: str, part: str, ts: int) -> dict:
    return {"path": relpath, "deletionTimestamp": ts, "dataChange": True,
            "extendedFileMetadata": True,
            "partitionValues": {"col-08": part}}


def _commit(version: int, actions: list[dict], op: str, ts: int) -> None:
    log_dir = os.path.join(OUT, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    lines = [json.dumps({"commitInfo": {
        "timestamp": ts, "operation": op, "operationParameters": {},
        "engineInfo": "delta-cm-fixture-tool/1.0",
    }})]
    lines += [json.dumps(a) for a in actions]
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        f.write("\n".join(lines) + "\n")


FA = "col-08=a/part-00000-aa0a0000-0000-4000-8000-000000000000-c000.parquet"
FB = "col-08=b/part-00001-aa1b0000-0000-4000-8000-000000000001-c000.parquet"
FC = "col-08=a/part-00000-aa2a0000-0000-4000-8000-000000000002-c000.parquet"
FD = "col-08=b/part-00002-aa3b0000-0000-4000-8000-000000000003-c000.parquet"

ROWS_A = [
    {"id": 1, "doc": "alpha", "geo": (10.5, -3.25), "tags": ["x", "y"]},
    {"id": 2, "doc": "bravo", "geo": (20.0, 4.75), "tags": ["y"]},
    {"id": 3, "doc": "charlie", "geo": (30.25, 8.0), "tags": []},
]
ROWS_B = [
    {"id": 4, "doc": "delta", "geo": (40.0, -1.5), "tags": ["z"]},
    {"id": 5, "doc": "echo", "geo": (50.5, 2.25), "tags": ["x", "z"]},
]
ROWS_A2 = [r for r in ROWS_A if r["id"] != 2]
ROWS_D = [{"id": 6, "doc": "foxtrot", "geo": None, "tags": ["w"]}]


def main() -> None:
    import shutil

    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)

    a_fa = _add(FA, "a", ROWS_A, TS0)
    a_fb = _add(FB, "b", ROWS_B, TS0)
    _commit(0, [{"protocol": PROTOCOL}, {"metaData": META},
                {"add": a_fa}, {"add": a_fb}], "WRITE", TS0)

    ts1 = TS0 + 60_000
    a_fc = _add(FC, "a", ROWS_A2, ts1)
    _commit(1, [{"remove": _remove(FA, "a", ts1)}, {"add": a_fc}],
            "DELETE", ts1)

    ts2 = TS0 + 120_000
    a_fd = _add(FD, "b", ROWS_D, ts2)
    _commit(2, [{"add": a_fd}], "WRITE", ts2)

    print(f"wrote column-mapped Delta fixture at {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
