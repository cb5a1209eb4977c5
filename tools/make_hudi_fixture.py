"""Generate a tiny genuine-layout Apache Hudi 0.x COPY_ON_WRITE table
fixture at tests/fixtures/hudi_cow/ — metadata this repo's writers did
NOT produce, proving the readers (Timeline, slice resolution,
delete_view) speak the FOREIGN format, not just their own output.

The layout is hand-authored to the public Hudi 0.6 on-disk format (the
reference pins hudi 0.6.1, pom.xml:15) rather than produced by Hudi
itself (not installable here):

- ``.hoodie/hoodie.properties`` — table descriptor.
- ``.hoodie/<instant>.commit`` — HoodieCommitMetadata JSON exactly as
  Hudi serializes it: ``partitionToWriteStats`` keyed by partition path,
  per-stat camelCase fields (fileId/path/prevCommit/numWrites/
  numDeletes/numUpdateWrites/numInserts/fileSizeInBytes/...),
  ``prevCommit: "null"`` for bootstrap, ``operationType``,
  ``extraMetadata.schema`` carrying the AVRO schema, and NO embedded
  commit timestamp (it lives in the filename) and NO
  totalRecordsDeleted (computed by summing numDeletes —
  DeleteView.java:186).
- data files ``<partition>/<fileId>_<writeToken>_<instant>.parquet``
  with the five Hudi meta columns prepended
  (_hoodie_commit_time/_hoodie_commit_seqno/_hoodie_record_key/
  _hoodie_partition_path/_hoodie_file_name), nested date partition
  path ``2020/12/12`` (TestDeleteSupport.java:12's timestamp style).

Commit history: C1 bulk-inserts 6 rows across two file groups; C2
rewrites BOTH groups, deleting id2 (group 1) and id5 (group 2) and
updating id3 — the delete-reconstruction case the reference exists for.

Deterministic: re-running produces byte-identical JSON and row content.
"""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "hudi_cow")
C1, C2 = "20201212121212", "20201213101010"
PART = "2020/12/12"
FG1 = "4a5c9e2f-7b13-4d6a-9f21-3e8d0c5b7a10-0"
FG2 = "b91f3d84-2c6e-47b5-8a9d-1f4e6c2d9b37-0"
TOKEN = "1-10-43"

AVRO_SCHEMA = json.dumps({
    "type": "record", "name": "interop_cow_record",
    "namespace": "hoodie.interop_cow",
    "fields": [
        {"name": "_hoodie_commit_time", "type": ["null", "string"]},
        {"name": "_hoodie_commit_seqno", "type": ["null", "string"]},
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "_hoodie_partition_path", "type": ["null", "string"]},
        {"name": "_hoodie_file_name", "type": ["null", "string"]},
        {"name": "id", "type": "string"},
        {"name": "name", "type": "string"},
        {"name": "value", "type": "long"},
    ],
})


def _fname(fid, ts):
    return f"{fid}_{TOKEN}_{ts}.parquet"


def _write_slice(fid, ts, rows):
    """rows: [(key, name, value)] — one parquet base file with the five
    Hudi meta columns."""
    fname = _fname(fid, ts)
    pdir = os.path.join(OUT, PART)
    os.makedirs(pdir, exist_ok=True)
    tbl = pa.table({
        "_hoodie_commit_time": [ts] * len(rows),
        "_hoodie_commit_seqno": [f"{ts}_0_{i + 1}" for i in range(len(rows))],
        "_hoodie_record_key": [r[0] for r in rows],
        "_hoodie_partition_path": [PART] * len(rows),
        "_hoodie_file_name": [fname] * len(rows),
        "id": [r[0] for r in rows],
        "name": [r[1] for r in rows],
        "value": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    path = os.path.join(pdir, fname)
    pq.write_table(tbl, path)
    return os.path.join(PART, fname), path


def _stat(fid, rel, size, prev, writes, deletes, updates, inserts):
    """One HoodieWriteStat exactly as Hudi 0.6 serializes it."""
    return {
        "fileId": fid,
        "path": rel,
        "prevCommit": prev,
        "numWrites": writes,
        "numDeletes": deletes,
        "numUpdateWrites": updates,
        "numInserts": inserts,
        "totalWriteBytes": size,
        "totalWriteErrors": 0,
        "partitionPath": PART,
        "totalLogRecords": 0,
        "totalLogFilesCompacted": 0,
        "totalLogSizeCompacted": 0,
        "totalUpdatedRecordsCompacted": 0,
        "totalLogBlocks": 0,
        "totalCorruptLogBlock": 0,
        "totalRollbackBlocks": 0,
        "fileSizeInBytes": size,
    }


def main() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    meta_dir = os.path.join(OUT, ".hoodie")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "hoodie.properties"), "w") as f:
        f.write(
            "#Properties saved on Sat Dec 12 12:12:12 UTC 2020\n"
            "hoodie.table.name=interop_cow\n"
            "hoodie.table.type=COPY_ON_WRITE\n"
            "hoodie.table.version=1\n"
            "hoodie.timeline.layout.version=1\n"
            "hoodie.archivelog.folder=archived\n"
        )

    # C1: bootstrap — two file groups, six rows
    g1_rows = [("id1", "alpha", 10), ("id2", "bravo", 20),
               ("id3", "charlie", 30)]
    g2_rows = [("id4", "delta", 40), ("id5", "echo", 50),
               ("id6", "foxtrot", 60)]
    rel11, p11 = _write_slice(FG1, C1, g1_rows)
    rel21, p21 = _write_slice(FG2, C1, g2_rows)
    c1 = {
        "partitionToWriteStats": {PART: [
            _stat(FG1, rel11, os.path.getsize(p11), "null", 3, 0, 0, 3),
            _stat(FG2, rel21, os.path.getsize(p21), "null", 3, 0, 0, 3),
        ]},
        "compacted": False,
        "extraMetadata": {"schema": AVRO_SCHEMA},
        "operationType": "BULK_INSERT",
    }
    with open(os.path.join(meta_dir, f"{C1}.commit"), "w") as f:
        json.dump(c1, f, indent=2)

    # C2: both groups rewritten — id2 and id5 DELETED, id3 updated
    g1_v2 = [("id1", "alpha", 10), ("id3", "charlie", 333)]
    g2_v2 = [("id4", "delta", 40), ("id6", "foxtrot", 60)]
    rel12, p12 = _write_slice(FG1, C2, g1_v2)
    rel22, p22 = _write_slice(FG2, C2, g2_v2)
    c2 = {
        "partitionToWriteStats": {PART: [
            _stat(FG1, rel12, os.path.getsize(p12), C1, 2, 1, 1, 0),
            _stat(FG2, rel22, os.path.getsize(p22), C1, 2, 1, 0, 0),
        ]},
        "compacted": False,
        "extraMetadata": {"schema": AVRO_SCHEMA},
        "operationType": "UPSERT",
    }
    with open(os.path.join(meta_dir, f"{C2}.commit"), "w") as f:
        json.dump(c2, f, indent=2)
    print(f"wrote genuine-layout Hudi COW fixture at {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
