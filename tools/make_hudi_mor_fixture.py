"""Generate a tiny genuine-layout Apache Hudi MERGE_ON_READ table fixture
at tests/fixtures/hudi_mor/ — base parquet + REAL binary ``.log`` files of
``HoodieLogFormat`` blocks that this repo's reader code did NOT produce.

This writer is deliberately INDEPENDENT of ``plans/hudi_log.py`` (no
imports from the package): two separate implementations of the public
format, so the package parser is proven against foreign bytes, exactly
as ``make_hudi_fixture.py`` proves the COW commit-JSON reader.

Format authored (public Apache Hudi on-disk format; the reference repo
is COW-only — ``README.md:5`` — so MOR interop is parity-plus):

- ``.hoodie/<instant>.deltacommit`` — completed delta commits
  (HoodieCommitMetadata JSON, same framing as the COW fixture).
- base files ``<fileId>_<writeToken>_<instant>.parquet`` with the five
  Hudi meta columns (+ ``_hoodie_is_deleted`` false, the public
  tombstone convention of OverwriteWithLatestAvroPayload).
- log files ``.<fileId>_<baseInstant>.log.<version>_<writeToken>``
  (note the leading dot: Hudi log files are hidden files) containing
  HoodieLogFormat v1 blocks:
  magic ``#HUDI#`` | int64 block size | int32 format version=1 |
  int32 block-type ordinal | header map | int64 content length |
  content | footer map | int64 total block length.
  Header map: int32 count, then per entry int32 HeaderMetadataType
  ordinal + int32 length + UTF-8 bytes.
  - AVRO_DATA_BLOCK (ordinal 3): content = int32 content version +
    int32 record count + per record int32 length + Avro-binary record
    (writer schema in the SCHEMA header).
  - DELETE_BLOCK (ordinal 1): content = int32 content version +
    int32 length + Avro-binary HoodieDeleteRecordList
    (Hudi 0.14+ framing; older Kryo framing is JVM-private).
  - COMMAND_BLOCK (ordinal 0): empty content; COMMAND_BLOCK_TYPE "0"
    (ROLLBACK) + TARGET_INSTANT_TIME header void earlier blocks of
    that instant in the same log file.

Commit history (three file groups, partition 2021/03/01; every base
parquet footer carries ``org.apache.hudi.bloomfilter`` — a Base64
SIMPLE Hadoop BloomFilter over the file's record keys, built by the
clean-room MurmurHash encoder below):

- C1 ``20210301090000.deltacommit``: base files — g1: id1/10 id2/20
  id3/30; g2: id4/40 id5/50 id6/60; g3: id9/900 id10/1000 (g3 stays
  LOG-FREE forever — the shape footer-bloom point-lookup pruning can
  act on).
- C2 ``20210301100000.deltacommit``: g1 log.1 data block (id3 -> 333,
  INSERT id7/70, id2 tombstoned via _hoodie_is_deleted); g2 log.1
  DELETE_BLOCK (id5).
- C3 ``20210301110000.deltacommit``: g1 log.2 data block (id3 -> 444)
  PLUS a data block under instant 20210301120000 that never commits
  (id1 -> 999 — a reader honoring timeline membership must drop it);
  g2 log.2: failed-write data block (instant 20210301105500,
  id6 -> 600), COMMAND rollback block targeting it, then the C3 retry
  data block (id6 -> 666).

- C4 ``20210301130000.deltacommit``: g2 log.3 — a PARQUET_DATA_BLOCK
  (the alternative block codec; content = a complete parquet file
  image) updating id4 -> 440.

- C5 ``20210301140000.deltacommit``: g1 log.3 — an HFILE_DATA_BLOCK
  (the metadata-table block codec; content = a complete HBase HFile v3
  image, GZ-compressed blocks, CRC32 checksums, protobuf trailer;
  cells = recordKey -> Avro-binary record, key-sorted) updating
  id7 -> 77 and inserting id8/hotel/80. The HFile encoder below is a
  from-spec clean-room implementation independent of
  ``plans/hfile.py``.

- ``.hoodie/metadata/`` — a Hudi METADATA TABLE mirroring the commit
  history: its own timeline (schema embedded in each deltacommit's
  extraMetadata — deliberately WIDER than the package's fallback
  subset, so the reader must honor it), a ``files`` partition with an
  HFile base file (state as of C3 plus a GHOST base-file entry) and a
  log whose HFILE_DATA_BLOCK appends the C4/C5 files and tombstones
  the ghost (``isDeleted`` = true) — the no-filesystem-walk listing
  path real Hudi readers use at scale — a ``record_index`` partition
  mapping every live key to its file group through BOTH
  HoodieRecordIndexInfo encodings (FG1/FG3 keys: UUID packed into
  high/low longs + fileIndex; FG2 keys: raw fileId string), and a
  ``column_stats`` partition with per-file min/max/valueCount of
  ``value`` (the data-skipping index; min/max travel through the
  NAMED-REFERENCE wrapper union of the public avsc).

Merged snapshot at C5: id1/10, id3/444, id4/440, id6/666, id7/77,
id8/80, id9/900, id10/1000. Deterministic: re-running produces
byte-identical files.
"""

import json
import os
import shutil
import struct

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "hudi_mor")
C1, C2, C3 = "20210301090000", "20210301100000", "20210301110000"
C4 = "20210301130000"  # PARQUET_DATA_BLOCK delta (alt block codec)
C5 = "20210301140000"  # HFILE_DATA_BLOCK delta (metadata-table codec)
UNCOMMITTED = "20210301120000"   # block present, instant never completes
FAILED = "20210301105500"        # rolled back by a command block
PART = "2021/03/01"
FG1 = "7c2e91d4-5a38-4f6b-b0c7-8e1f3a9d2c55-0"
FG2 = "e3a8b7f1-9c24-4d5e-a6b3-0f7d8c1e4a92-0"
FG3 = "b5c6d7e8-1111-2222-3333-94a5b6c7d8e9-0"  # log-free group (bloom demo)
TOKEN = "1-20-77"

AVRO_SCHEMA = {
    "type": "record", "name": "interop_mor_record",
    "namespace": "hoodie.interop_mor",
    "fields": [
        {"name": "_hoodie_commit_time", "type": ["null", "string"]},
        {"name": "_hoodie_commit_seqno", "type": ["null", "string"]},
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "_hoodie_partition_path", "type": ["null", "string"]},
        {"name": "_hoodie_file_name", "type": ["null", "string"]},
        {"name": "id", "type": "string"},
        {"name": "name", "type": "string"},
        {"name": "value", "type": "long"},
        {"name": "_hoodie_is_deleted", "type": "boolean", "default": False},
    ],
}

MAGIC = b"#HUDI#"
# HoodieLogBlockType ordinals
T_COMMAND, T_DELETE, T_AVRO, T_PARQUET, T_HFILE = 0, 1, 3, 5, 4
# HeaderMetadataType ordinals
H_INSTANT, H_TARGET, H_SCHEMA, H_CMDTYPE = 0, 1, 2, 3


# -- Avro binary encoding (hand-rolled, spec-direct) ----------------------

def _zz(n: int) -> bytes:
    """Avro long: zigzag + little-endian base-128 varint."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _astr(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zz(len(b)) + b


def _rec_bytes(ts, seqno, key, fname, id_, name, value, deleted=False):
    """One interop_mor_record, field order per AVRO_SCHEMA: the five
    nullable-string meta fields (union index 1 = string), then id,
    name (string), value (long), _hoodie_is_deleted (boolean)."""
    out = bytearray()
    for v in (ts, seqno, key, PART, fname):
        out += _zz(1) + _astr(v)     # union branch 1: string
    out += _astr(id_) + _astr(name) + _zz(value)
    out += b"\x01" if deleted else b"\x00"
    return bytes(out)


def _delete_list_bytes(keys):
    """Avro-binary HoodieDeleteRecordList: one array field; items are
    records of three nullable unions (recordKey, partitionPath set;
    orderingVal null = union branch 0)."""
    out = bytearray()
    out += _zz(len(keys))            # array block count
    for k in keys:
        out += _zz(1) + _astr(k)     # recordKey: union 1 = string
        out += _zz(1) + _astr(PART)  # partitionPath
        out += _zz(0)                # orderingVal: union 0 = null
    out += _zz(0)                    # array terminator
    return bytes(out)


# -- HoodieLogFormat block framing ----------------------------------------

def _meta_map(entries: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(entries))
    for ordinal, value in entries.items():
        vb = value.encode("utf-8")
        out += struct.pack(">i", ordinal) + struct.pack(">i", len(vb)) + vb
    return out


def _block(btype: int, headers: dict[int, str], content: bytes) -> bytes:
    hb = _meta_map(headers)
    fb = _meta_map({})
    block_size = 4 + 4 + len(hb) + 8 + len(content) + len(fb) + 8
    out = bytearray()
    out += MAGIC
    out += struct.pack(">q", block_size)
    out += struct.pack(">i", 1)          # log format version
    out += struct.pack(">i", btype)
    out += hb
    out += struct.pack(">q", len(content))
    out += content
    out += fb
    out += struct.pack(">q", 14 + block_size)  # total incl. magic+size field
    return bytes(out)


def _data_block(instant: str, records: list[bytes]) -> bytes:
    content = struct.pack(">i", 3) + struct.pack(">i", len(records))
    for rb in records:
        content += struct.pack(">i", len(rb)) + rb
    return _block(T_AVRO, {H_INSTANT: instant,
                           H_SCHEMA: json.dumps(AVRO_SCHEMA)}, content)


def _delete_block(instant: str, keys: list[str]) -> bytes:
    payload = _delete_list_bytes(keys)
    content = struct.pack(">i", 3) + struct.pack(">i", len(payload)) + payload
    return _block(T_DELETE, {H_INSTANT: instant}, content)


def _parquet_block(instant: str, rows, fname: str) -> bytes:
    """PARQUET_DATA_BLOCK: content is a complete parquet file image
    (HoodieParquetDataBlock framing — no version prefix; schema in the
    parquet footer)."""
    import io

    buf = io.BytesIO()
    tbl = pa.table({
        "_hoodie_commit_time": [instant] * len(rows),
        "_hoodie_commit_seqno": [f"{instant}_0_{i + 1}"
                                 for i in range(len(rows))],
        "_hoodie_record_key": [r[0] for r in rows],
        "_hoodie_partition_path": [PART] * len(rows),
        "_hoodie_file_name": [fname] * len(rows),
        "id": [r[0] for r in rows],
        "name": [r[1] for r in rows],
        "value": pa.array([r[2] for r in rows], type=pa.int64()),
        "_hoodie_is_deleted": [r[3] for r in rows],
    })
    pq.write_table(tbl, buf)
    return _block(T_PARQUET, {H_INSTANT: instant,
                              H_SCHEMA: json.dumps(AVRO_SCHEMA)},
                  buf.getvalue())


# -- HBase HFile v3 encoding (clean-room, spec-direct: FixedFileTrailer/
# -- HFileBlock/HFileWriterImpl in the Apache HBase tree; independent of
# -- the package's plans/hfile.py so the reader is proven on foreign bytes)

def _pbv(n: int) -> bytes:
    """Protobuf varint."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _pbf(num: int, wire: int, val) -> bytes:
    tag = _pbv((num << 3) | wire)
    return tag + (_pbv(val) if wire == 0 else _pbv(len(val)) + val)


def _hvint(n: int) -> bytes:
    """Hadoop WritableUtils vint (non-negative, multi-byte form only
    needed past 127; fixture keys are short)."""
    if n <= 127:
        return struct.pack("b", n)
    size, tmp = 0, n
    while tmp:
        size += 1
        tmp >>= 8
    out = bytearray(struct.pack("b", -112 - size))
    for i in range(size - 1, -1, -1):
        out.append((n >> (8 * i)) & 0xFF)
    return bytes(out)


def _hfile_hblock(file_out: bytearray, magic: bytes, payload: bytes,
                  prev: int) -> tuple[int, int]:
    """One GZ-compressed HFile block with CRC32 checksums; returns
    (offset, on-disk size incl. header)."""
    import zlib

    offset = len(file_out)
    comp = zlib.compressobj(9, zlib.DEFLATED, 16 + 15)
    gz = comp.compress(payload) + comp.flush()
    on_disk_data_with_header = 33 + len(gz)
    bpc = 16384
    n_chunks = -(-on_disk_data_with_header // bpc)
    on_disk_without_header = len(gz) + 4 * n_chunks
    header = (magic + struct.pack(">ii", on_disk_without_header, len(payload))
              + struct.pack(">q", prev) + b"\x01"       # CRC32
              + struct.pack(">i", bpc)
              + struct.pack(">i", on_disk_data_with_header))
    body = header + gz
    file_out += body
    for i in range(0, len(body), bpc):
        file_out += struct.pack(">I", zlib.crc32(body[i:i + bpc]) & 0xFFFFFFFF)
    return offset, 33 + on_disk_without_header


def _hfile_image(cells: list[tuple[bytes, bytes]]) -> bytes:
    """A single-data-block HFile v3 image of key-sorted (row, value)
    cells. Cell = int32 keyLen/valueLen, key (int16 rowLen, row, int8
    famLen=0, int64 ts=0, int8 type=Put), value, vlong mvcc=0 (the file
    declares KEY_VALUE_VERSION=2)."""
    out = bytearray()
    block = bytearray()
    first_key = None
    for row, value in sorted(cells):
        key = (struct.pack(">H", len(row)) + row + b"\x00"
               + struct.pack(">q", 0) + b"\x04")
        if first_key is None:
            first_key = bytes(key)
        block += struct.pack(">ii", len(key), len(value)) + key + value
        block += b"\x00"  # vlong mvcc = 0
    d_off, d_size = _hfile_hblock(out, b"DATABLK*", bytes(block), -1)

    load_on_open = len(out)
    root = struct.pack(">qi", d_off, d_size) + _hvint(len(first_key)) + first_key
    _hfile_hblock(out, b"IDXROOT2", root, -1)  # BlockType.ROOT_INDEX

    info_entries = {
        b"KEY_VALUE_VERSION": struct.pack(">i", 2),
        b"MAX_MEMSTORE_TS_KEY": struct.pack(">q", 0),
    }
    pairs = b"".join(_pbf(1, 2, _pbf(1, 2, k) + _pbf(2, 2, v))
                     for k, v in sorted(info_entries.items()))
    info_off = len(out)
    _hfile_hblock(out, b"FILEINF2", b"PBUF" + _pbv(len(pairs)) + pairs, -1)

    trailer_pb = (_pbf(1, 0, info_off) + _pbf(2, 0, load_on_open)
                  + _pbf(3, 0, len(root)) + _pbf(4, 0, 33 + len(block))
                  + _pbf(5, 0, 1) + _pbf(6, 0, 0) + _pbf(7, 0, len(cells))
                  + _pbf(8, 0, 1) + _pbf(9, 0, d_off) + _pbf(10, 0, d_off)
                  + _pbf(11, 2, b"org.apache.hadoop.hbase.CellComparatorImpl")
                  + _pbf(12, 0, 1))                      # codec GZ
    trailer = b'TRABLK"$' + _pbv(len(trailer_pb)) + trailer_pb
    trailer += b"\x00" * (4096 - len(trailer) - 4)
    trailer += struct.pack(">i", (3 << 24) | 3)          # minor 3, major 3
    out += trailer
    return bytes(out)


def _hfile_cell_key(row: bytes) -> bytes:
    return (struct.pack(">H", len(row)) + row + b"\x00"
            + struct.pack(">q", 0) + b"\x04")


def _hfile_nonroot_block(entries: list[tuple[int, int, bytes]]) -> bytes:
    """HBase non-root index block layout (HFileBlockIndex): entryCount,
    secondary index of entryCount+1 relative offsets, packed entries of
    int64 offset / int32 onDiskSize / raw key."""
    sec, body = [], bytearray()
    for off, size, key in entries:
        sec.append(len(body))
        body += struct.pack(">qi", off, size) + key
    sec.append(len(body))
    return (struct.pack(">i", len(entries))
            + b"".join(struct.pack(">i", s) for s in sec) + bytes(body))


def _hfile_image_multi(cells: list[tuple[bytes, bytes]],
                       rows_per_block: int = 4, fanout: int = 4,
                       levels: int = 2) -> bytes:
    """FORCED multi-level HFile v3 image (levels=2: root->leaf->data;
    levels=3: root->intermediate->leaf->data) — the index shape a >GB
    real-Hudi metadata table grows, which single-block fixtures never
    exercise. Same clean-room block/trailer encoding as _hfile_image."""
    assert levels in (2, 3)
    out = bytearray()
    cells = sorted(cells)
    data_entries = []  # (off, size, first cell key)
    total_uncompressed = 0
    first_d = last_d = 0
    for i in range(0, len(cells), rows_per_block):
        block = bytearray()
        first_key = None
        for row, value in cells[i:i + rows_per_block]:
            key = _hfile_cell_key(row)
            if first_key is None:
                first_key = bytes(key)
            block += struct.pack(">ii", len(key), len(value)) + key + value
            block += b"\x00"  # vlong mvcc = 0
        off, size = _hfile_hblock(out, b"DATABLK*", bytes(block), -1)
        if not data_entries:
            first_d = off
        last_d = off
        total_uncompressed += 33 + len(block)
        data_entries.append((off, size, first_key))

    def index_level(children, magic):
        parents = []
        for i in range(0, len(children), fanout):
            group = children[i:i + fanout]
            payload = _hfile_nonroot_block(group)
            off, size = _hfile_hblock(out, magic, payload, -1)
            parents.append((off, size, group[0][2]))
        return parents

    tier = index_level(data_entries, b"IDXLEAF2")
    if levels == 3:
        tier = index_level(tier, b"IDXINTE2")

    load_on_open = len(out)
    root = bytearray()
    for off, size, key in tier:
        root += struct.pack(">qi", off, size) + _hvint(len(key)) + key
    _hfile_hblock(out, b"IDXROOT2", bytes(root), -1)

    info_entries = {
        b"KEY_VALUE_VERSION": struct.pack(">i", 2),
        b"MAX_MEMSTORE_TS_KEY": struct.pack(">q", 0),
    }
    pairs = b"".join(_pbf(1, 2, _pbf(1, 2, k) + _pbf(2, 2, v))
                     for k, v in sorted(info_entries.items()))
    info_off = len(out)
    _hfile_hblock(out, b"FILEINF2", b"PBUF" + _pbv(len(pairs)) + pairs, -1)

    trailer_pb = (_pbf(1, 0, info_off) + _pbf(2, 0, load_on_open)
                  + _pbf(3, 0, len(root)) + _pbf(4, 0, total_uncompressed)
                  + _pbf(5, 0, len(tier)) + _pbf(6, 0, 0)
                  + _pbf(7, 0, len(cells))
                  + _pbf(8, 0, levels) + _pbf(9, 0, first_d)
                  + _pbf(10, 0, last_d)
                  + _pbf(11, 2, b"org.apache.hadoop.hbase.CellComparatorImpl")
                  + _pbf(12, 0, 1))                      # codec GZ
    trailer = b'TRABLK"$' + _pbv(len(trailer_pb)) + trailer_pb
    trailer += b"\x00" * (4096 - len(trailer) - 4)
    trailer += struct.pack(">i", (3 << 24) | 3)          # minor 3, major 3
    out += trailer
    return bytes(out)


def _hfile_block(instant: str, records: list[bytes], keys: list[str]) -> bytes:
    """HFILE_DATA_BLOCK: content = an HFile image with recordKey ->
    Avro-binary record cells (HoodieHFileDataBlock framing)."""
    cells = [(k.encode(), rb) for k, rb in zip(keys, records)]
    return _block(T_HFILE, {H_INSTANT: instant,
                            H_SCHEMA: json.dumps(AVRO_SCHEMA)},
                  _hfile_image(cells))


def _command_block(instant: str, target: str) -> bytes:
    return _block(T_COMMAND, {H_INSTANT: instant, H_TARGET: target,
                              H_CMDTYPE: "0"}, b"")


# -- Hudi metadata table (files partition) ----------------------------------

# DELIBERATELY WIDER than the package's fallback subset (extra
# recordIndexMetadata field): HFile cells carry no schema, so the
# package reader must honor the schema embedded in this table's commit
# extraMetadata — decoding positionally with its own subset would
# misread every record, and the fixture proves it doesn't.
METADATA_SCHEMA = {
    "type": "record", "name": "HoodieMetadataRecord",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {"name": "filesystemMetadata", "type": ["null", {
            "type": "map", "values": {
                "type": "record", "name": "HoodieMetadataFileInfo",
                "fields": [{"name": "size", "type": "long"},
                           {"name": "isDeleted", "type": "boolean"}]}}]},
        {"name": "recordIndexMetadata", "type": ["null", {
            "type": "record", "name": "HoodieRecordIndexInfo",
            "fields": [
                {"name": "partitionName", "type": ["null", "string"]},
                {"name": "fileIdHighBits", "type": ["null", "long"]},
                {"name": "fileIdLowBits", "type": ["null", "long"]},
                {"name": "fileIndex", "type": ["null", "int"]},
                {"name": "fileId", "type": ["null", "string"]},
                {"name": "instantTime", "type": ["null", "long"]},
                {"name": "fileIdEncoding", "type": ["null", "int"]}]}]},
        {"name": "ColumnStatsMetadata", "type": ["null", {
            "type": "record", "name": "HoodieMetadataColumnStats",
            "fields": [
                {"name": "fileName", "type": ["null", "string"]},
                {"name": "columnName", "type": ["null", "string"]},
                {"name": "minValue", "type": ["null",
                    {"type": "record", "name": "IntWrapper",
                     "fields": [{"name": "value", "type": "int"}]},
                    {"type": "record", "name": "LongWrapper",
                     "fields": [{"name": "value", "type": "long"}]},
                    {"type": "record", "name": "StringWrapper",
                     "fields": [{"name": "value", "type": "string"}]}]},
                {"name": "maxValue", "type": ["null", "IntWrapper",
                                              "LongWrapper", "StringWrapper"]},
                {"name": "valueCount", "type": ["null", "long"]},
                {"name": "nullCount", "type": ["null", "long"]},
                {"name": "totalSize", "type": ["null", "long"]},
                {"name": "totalUncompressedSize", "type": ["null", "long"]},
                {"name": "isDeleted", "type": "boolean"}]}]},
    ],
}

# a file-group id that LOOKS like a real base file: if a reader ignores
# the metadata log's isDeleted tombstone it will try to open this
# nonexistent parquet and fail loudly
GHOST = "aaaa1111-2222-3333-4444-555566667777-0"


def _md_record(key: str, rtype: int, files: dict[str, tuple[int, bool]]) -> bytes:
    """Avro-binary HoodieMetadataRecord: key, type, filesystemMetadata
    union branch 1 = map of name -> (size long, isDeleted bool),
    recordIndexMetadata null."""
    out = bytearray()
    out += _astr(key)
    out += _zz(rtype)
    out += _zz(1)                      # union branch 1: map
    out += _zz(len(files))             # map block count
    for name, (size, deleted) in sorted(files.items()):
        out += _astr(name) + _zz(size) + (b"\x01" if deleted else b"\x00")
    out += _zz(0)                      # map terminator
    out += _zz(0)                      # recordIndexMetadata: null
    out += _zz(0)                      # ColumnStatsMetadata: null
    return bytes(out)


def _cs_record(file_name: str, column: str, mn, mx, count: int) -> bytes:
    """Avro-binary HoodieMetadataRecord for column stats (type 3):
    filesystemMetadata/recordIndexMetadata null; ColumnStatsMetadata
    with LONG min/max through the named-reference wrapper union
    (branch 2 = LongWrapper; null min/max for value-free files)."""
    out = bytearray()
    out += _astr(f"cstats-{column}-{file_name}")
    out += _zz(3)
    out += _zz(0)                      # filesystemMetadata: null
    out += _zz(0)                      # recordIndexMetadata: null
    out += _zz(1)                      # ColumnStatsMetadata: branch 1
    out += _zz(1) + _astr(file_name)   # fileName
    out += _zz(1) + _astr(column)      # columnName
    for v in (mn, mx):
        if v is None:
            out += _zz(0)              # null
        else:
            out += _zz(2) + _zz(v)     # LongWrapper
    out += _zz(1) + _zz(count)         # valueCount
    out += _zz(1) + _zz(0)             # nullCount
    out += _zz(1) + _zz(0)             # totalSize
    out += _zz(1) + _zz(0)             # totalUncompressedSize
    out += b"\x00"                     # isDeleted
    return bytes(out)


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _ri_record(key: str, fid: str, encoding: int) -> bytes:
    """Avro-binary HoodieMetadataRecord for the record index (type 5):
    filesystemMetadata null; recordIndexMetadata with the requested
    fileId encoding — 0 packs the UUID into (high, low) longs + the
    numeric suffix as fileIndex, 1 carries the raw fileId string."""
    import uuid

    out = bytearray()
    out += _astr(key)
    out += _zz(5)
    out += _zz(0)                      # filesystemMetadata: null
    out += _zz(1)                      # recordIndexMetadata: branch 1
    out += _zz(1) + _astr(PART)        # partitionName
    if encoding == 0:
        u, idx = fid.rsplit("-", 1)
        val = uuid.UUID(u).int
        out += _zz(1) + _zz(_signed64(val >> 64))          # fileIdHighBits
        out += _zz(1) + _zz(_signed64(val & ((1 << 64) - 1)))  # fileIdLowBits
        out += _zz(1) + _zz(int(idx))  # fileIndex
        out += _zz(0)                  # fileId: null
    else:
        out += _zz(0) + _zz(0) + _zz(0)  # high/low/index: null
        out += _zz(1) + _astr(fid)     # fileId
    out += _zz(1) + _zz(int(C5))       # instantTime
    out += _zz(1) + _zz(encoding)      # fileIdEncoding
    out += _zz(0)                      # ColumnStatsMetadata: null
    return bytes(out)


def _write_metadata_table(data_files_by_commit: dict[str, list[str]]) -> None:
    """Author <OUT>/.hoodie/metadata: its own timeline, one HFile base
    file in the files partition (state as of C3, PLUS a ghost base-file
    entry), and one log file whose HFILE_DATA_BLOCK appends the C4/C5
    files and tombstones the ghost (isDeleted=true) — so a reader that
    honors HoodieMetadataPayload merge semantics lists exactly the real
    files, and one that ignores the tombstone trips over the ghost."""
    mt = os.path.join(OUT, ".hoodie", "metadata")
    mt_meta = os.path.join(mt, ".hoodie")
    files_dir = os.path.join(mt, "files")
    os.makedirs(mt_meta, exist_ok=True)
    os.makedirs(files_dir, exist_ok=True)
    for ts in (C1, C2, C3, C4, C5):
        with open(os.path.join(mt_meta, f"{ts}.deltacommit"), "w") as f:
            json.dump({"operationType": "UPSERT",
                       "extraMetadata": {
                           "schema": json.dumps(METADATA_SCHEMA)}}, f)

    upto_c3 = {n: (100, False) for c in (C1, C2, C3)
               for n in data_files_by_commit[c]}
    upto_c3[f"{GHOST}_{TOKEN}_{C1}.parquet"] = (100, False)
    base_cells = [
        (PART.encode(), _md_record(PART, 2, upto_c3)),
        (b"__all_partitions__", _md_record("__all_partitions__", 1,
                                           {PART: (0, False)})),
    ]
    with open(os.path.join(files_dir, f"files-0000_0-0-0_{C3}.hfile"),
              "wb") as f:
        f.write(_hfile_image(base_cells))

    delta = {n: (100, False) for c in (C4, C5)
             for n in data_files_by_commit[c]}
    delta[f"{GHOST}_{TOKEN}_{C1}.parquet"] = (0, True)
    log_block = _block(T_HFILE,
                       {H_INSTANT: C5, H_SCHEMA: json.dumps(METADATA_SCHEMA)},
                       _hfile_image([(PART.encode(),
                                      _md_record(PART, 2, delta))]))
    with open(os.path.join(files_dir, f".files-0000_{C3}.log.1_0-0-0"),
              "wb") as f:
        f.write(log_block)

    # record_index partition: every live key's file group — FG1 keys
    # via encoding 0 (UUID packed into high/low longs + fileIndex),
    # FG2 keys via encoding 1 (raw fileId string)
    ri_dir = os.path.join(mt, "record_index")
    os.makedirs(ri_dir, exist_ok=True)
    ri_cells = sorted(
        [(k.encode(), _ri_record(k, FG1, 0))
         for k in ("id1", "id3", "id7", "id8")]
        + [(k.encode(), _ri_record(k, FG2, 1)) for k in ("id4", "id6")]
        + [(k.encode(), _ri_record(k, FG3, 0)) for k in ("id9", "id10")]
    )
    with open(os.path.join(ri_dir, f"record-index-0000_0-0-0_{C5}.hfile"),
              "wb") as f:
        f.write(_hfile_image(ri_cells))

    # column_stats partition: per-file min/max/count of "value" — the
    # data-skipping index (g2's delete-only log carries valueCount=0
    # with null min/max: no values, still skippable)
    cs_dir = os.path.join(mt, "column_stats")
    os.makedirs(cs_dir, exist_ok=True)
    g1b = f"{FG1}_{TOKEN}_{C1}.parquet"
    g2b = f"{FG2}_{TOKEN}_{C1}.parquet"
    g3b = f"{FG3}_{TOKEN}_{C1}.parquet"
    stats = {
        g1b: (10, 30, 3),
        g2b: (40, 60, 3),
        g3b: (900, 1000, 2),
        _log_name(FG1, C1, 1): (20, 333, 3),
        _log_name(FG2, C1, 1): (None, None, 0),   # delete block only
        _log_name(FG1, C1, 2): (444, 999, 2),
        _log_name(FG2, C1, 2): (600, 666, 2),
        _log_name(FG2, C1, 3): (440, 440, 1),
        _log_name(FG1, C1, 3): (77, 80, 2),
    }
    cs_cells = sorted(
        (f"cstats-value-{n}".encode(), _cs_record(n, "value", mn, mx, c))
        for n, (mn, mx, c) in stats.items()
    )
    with open(os.path.join(cs_dir, f"col-stats-0000_0-0-0_{C5}.hfile"),
              "wb") as f:
        f.write(_hfile_image(cs_cells))


# -- table pieces ----------------------------------------------------------

def _base_name(fid, ts):
    return f"{fid}_{TOKEN}_{ts}.parquet"


def _log_name(fid, base_ts, version):
    return f".{fid}_{base_ts}.log.{version}_0-20-77"


# -- Hadoop bloom filter (clean-room: org.apache.hadoop.util.bloom) --------

def _murmur2(data: bytes, seed: int) -> int:
    """Hadoop MurmurHash (32-bit MurmurHash2, Java signed ints)."""
    M32, m, r = 0xFFFFFFFF, 0x5BD1E995, 24
    h = (seed ^ len(data)) & M32
    n4 = len(data) // 4
    for i in range(n4):
        (k,) = struct.unpack_from("<i", data, i * 4)
        k &= M32
        k = (k * m) & M32
        k ^= k >> r
        k = (k * m) & M32
        h = (h * m) & M32
        h ^= k
    left, length = len(data) % 4, len(data)
    # Hadoop tail: indexed from the END (data[length-3]<<16 ...) and
    # sign-extended bytes — see plans/bloom.py for the golden-vector
    # derivation against a real org.apache.hadoop BloomFilter image.
    _s = lambda b: b - 256 if b >= 128 else b  # noqa: E731
    if left:
        if left >= 3:
            h = (h ^ ((_s(data[length - 3]) << 16) & M32)) & M32
        if left >= 2:
            h = (h ^ ((_s(data[length - 2]) << 8) & M32)) & M32
        h = (((h ^ (_s(data[length - 1]) & M32)) & M32) * m) & M32
    h ^= h >> 13
    h = (h * m) & M32
    h ^= h >> 15
    return h - (1 << 32) if h >= (1 << 31) else h


def _bloom_b64(keys, vector_size=2048, nb_hash=3) -> str:
    """Base64 SIMPLE bloom image, the org.apache.hudi.bloomfilter footer
    form: int32 -1, int32 nbHash, int8 hashType MURMUR=1, int32 bits,
    packed bit vector (java.util.BitSet: bit i at byte i/8, LSB-first
    mask 1 << i%8 — golden-vector-verified in plans/bloom.py)."""
    import base64

    bits = bytearray(-(-vector_size // 8))
    for key in keys:
        h = 0
        for i in range(nb_hash):
            h = _murmur2(key.encode(), 0 if i == 0 else h)
            # Java Math.abs(h % vs) == abs(h) % vs (truncated modulo)
            bit = abs(h) % vector_size
            bits[bit // 8] |= 1 << (bit % 8)
    img = struct.pack(">ii", -1, nb_hash) + b"\x01"
    img += struct.pack(">i", vector_size) + bytes(bits)
    return base64.b64encode(img).decode()


def _write_base(fid, ts, rows):
    fname = _base_name(fid, ts)
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
        "_hoodie_is_deleted": [False] * len(rows),
    })
    # the per-file record-key bloom every bloom-indexed Hudi writer
    # stores in the footer (HoodieBloomIndex reads it to prune files)
    tbl = tbl.replace_schema_metadata(
        {"org.apache.hudi.bloomfilter": _bloom_b64([r[0] for r in rows])}
    )
    path = os.path.join(pdir, fname)
    pq.write_table(tbl, path)
    return os.path.join(PART, fname), path


def _write_log(fid, base_ts, version, blocks: list[bytes]):
    fname = _log_name(fid, base_ts, version)
    path = os.path.join(OUT, PART, fname)
    with open(path, "wb") as f:
        for b in blocks:
            f.write(b)
    return os.path.join(PART, fname), path


def _stat(fid, rel, size, prev, writes, deletes, updates, inserts,
          log_version=0):
    s = {
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
        "fileSizeInBytes": size,
    }
    if log_version:
        s["logVersion"] = log_version
        s["logOffset"] = 0
    return s


def _commit(meta_dir, ts, stats, op):
    doc = {
        "partitionToWriteStats": {PART: stats},
        "compacted": False,
        "extraMetadata": {"schema": json.dumps(AVRO_SCHEMA)},
        "operationType": op,
    }
    with open(os.path.join(meta_dir, f"{ts}.deltacommit"), "w") as f:
        json.dump(doc, f, indent=2)


def main() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    meta_dir = os.path.join(OUT, ".hoodie")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "hoodie.properties"), "w") as f:
        f.write(
            "#Properties saved on Mon Mar 01 09:00:00 UTC 2021\n"
            "hoodie.table.name=interop_mor\n"
            "hoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.version=6\n"
            "hoodie.timeline.layout.version=1\n"
            "hoodie.archivelog.folder=archived\n"
            "hoodie.compaction.payload.class=org.apache.hudi.common.model.OverwriteWithLatestAvroPayload\n"
        )

    # C1: bootstrap base files
    rel11, p11 = _write_base(FG1, C1, [("id1", "alpha", 10),
                                       ("id2", "bravo", 20),
                                       ("id3", "charlie", 30)])
    rel21, p21 = _write_base(FG2, C1, [("id4", "delta", 40),
                                       ("id5", "echo", 50),
                                       ("id6", "foxtrot", 60)])
    # g3 stays LOG-FREE across the whole history: the shape footer-bloom
    # point-lookup pruning can act on (a group with logs may hold any
    # key, so only log-free groups are bloom-prunable)
    rel31, p31 = _write_base(FG3, C1, [("id9", "india", 900),
                                       ("id10", "juliet", 1000)])
    _commit(meta_dir, C1, [
        _stat(FG1, rel11, os.path.getsize(p11), "null", 3, 0, 0, 3),
        _stat(FG2, rel21, os.path.getsize(p21), "null", 3, 0, 0, 3),
        _stat(FG3, rel31, os.path.getsize(p31), "null", 2, 0, 0, 2),
    ], "BULK_INSERT")

    # C2: g1 data block (update + insert + tombstone), g2 delete block
    g1_fname = _log_name(FG1, C1, 1)
    b1 = _data_block(C2, [
        _rec_bytes(C2, f"{C2}_0_1", "id3", g1_fname, "id3", "charlie", 333),
        _rec_bytes(C2, f"{C2}_0_2", "id7", g1_fname, "id7", "golf", 70),
        _rec_bytes(C2, f"{C2}_0_3", "id2", g1_fname, "id2", "bravo", 20,
                   deleted=True),
    ])
    rel12, p12 = _write_log(FG1, C1, 1, [b1])
    b2 = _delete_block(C2, ["id5"])
    rel22, p22 = _write_log(FG2, C1, 1, [b2])
    _commit(meta_dir, C2, [
        _stat(FG1, rel12, os.path.getsize(p12), C1, 3, 1, 1, 1, log_version=1),
        _stat(FG2, rel22, os.path.getsize(p22), C1, 0, 1, 0, 0, log_version=1),
    ], "UPSERT")

    # C3: g1 rollover log.2 — the C3 update, then an UNCOMMITTED block
    # (instant 20210301120000 never completes; timeline-honoring readers
    # must drop id1 -> 999)
    g1_f2 = _log_name(FG1, C1, 2)
    b3 = _data_block(C3, [
        _rec_bytes(C3, f"{C3}_0_1", "id3", g1_f2, "id3", "charlie", 444),
    ])
    b_uncommitted = _data_block(UNCOMMITTED, [
        _rec_bytes(UNCOMMITTED, f"{UNCOMMITTED}_0_1", "id1", g1_f2,
                   "id1", "alpha", 999),
    ])
    rel13, p13 = _write_log(FG1, C1, 2, [b3, b_uncommitted])
    # g2 rollover log.2 — failed write, rollback command, committed retry
    g2_f2 = _log_name(FG2, C1, 2)
    b_failed = _data_block(FAILED, [
        _rec_bytes(FAILED, f"{FAILED}_0_1", "id6", g2_f2,
                   "id6", "foxtrot", 600),
    ])
    b_rollback = _command_block(C3, FAILED)
    b_retry = _data_block(C3, [
        _rec_bytes(C3, f"{C3}_0_1", "id6", g2_f2, "id6", "foxtrot", 666),
    ])
    rel23, p23 = _write_log(FG2, C1, 2, [b_failed, b_rollback, b_retry])
    _commit(meta_dir, C3, [
        _stat(FG1, rel13, os.path.getsize(p13), C1, 1, 0, 1, 0, log_version=2),
        _stat(FG2, rel23, os.path.getsize(p23), C1, 1, 0, 1, 0, log_version=2),
    ], "UPSERT")

    # C4: g2 rollover log.3 — a PARQUET_DATA_BLOCK (the alternative
    # block codec real Hudi writers can emit) updating id4 -> 440
    g2_f3 = _log_name(FG2, C1, 3)
    b_pq = _parquet_block(C4, [("id4", "delta", 440, False)], g2_f3)
    rel24, p24 = _write_log(FG2, C1, 3, [b_pq])
    _commit(meta_dir, C4, [
        _stat(FG2, rel24, os.path.getsize(p24), C1, 1, 0, 1, 0, log_version=3),
    ], "UPSERT")

    # C5: g1 rollover log.3 — an HFILE_DATA_BLOCK (the metadata-table
    # block codec) updating id7 -> 77 and inserting id8
    g1_f3 = _log_name(FG1, C1, 3)
    b_hf = _hfile_block(C5, [
        _rec_bytes(C5, f"{C5}_0_1", "id7", g1_f3, "id7", "golf", 77),
        _rec_bytes(C5, f"{C5}_0_2", "id8", g1_f3, "id8", "hotel", 80),
    ], ["id7", "id8"])
    rel15, p15 = _write_log(FG1, C1, 3, [b_hf])
    _commit(meta_dir, C5, [
        _stat(FG1, rel15, os.path.getsize(p15), C1, 2, 0, 1, 1, log_version=3),
    ], "UPSERT")

    # the metadata table mirrors the commit history's file additions
    bn = os.path.basename
    _write_metadata_table({
        C1: [bn(rel11), bn(rel21), bn(rel31)],
        C2: [bn(rel12), bn(rel22)],
        C3: [bn(rel13), bn(rel23)],
        C4: [bn(rel24)],
        C5: [bn(rel15)],
    })
    print(f"wrote genuine-layout Hudi MOR fixture at {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
