"""Genuine Apache Hudi MOR log-file reader: ``HoodieLogFormat`` block
framing + a minimal pure-Python Avro binary decoder.

This is the READ half of the MOR interop contract; the fixture at
``tests/fixtures/hudi_mor`` is authored by an INDEPENDENT writer
(``tools/make_hudi_mor_fixture.py``) so the parser is proven against
bytes this module did not produce.

Format implemented (all public, from the Apache Hudi source tree —
the reference repo itself is COW-only, ``/root/reference/README.md:5``,
so this is parity-plus):

- Block framing: ``HoodieLogFormatWriter.appendBlocks`` /
  ``HoodieLogFileReader`` (hudi-common) — per block:
  ``#HUDI#`` magic (6 bytes), block size (int64 BE, everything after
  this field), log-format version (int32 BE, =1), block-type ordinal
  (int32 BE), header map, content length (int64 BE), content bytes,
  footer map, total block length (int64 BE, incl. magic — used for
  reverse traversal; we validate it forward).
- Header/footer maps: ``HoodieLogBlock.getLogMetadataBytes`` —
  int32 entry count, then per entry int32 key ordinal
  (``HeaderMetadataType``: INSTANT_TIME=0, TARGET_INSTANT_TIME=1,
  SCHEMA=2, COMMAND_BLOCK_TYPE=3), int32 byte length, UTF-8 value.
- Block types: ``HoodieLogBlockType`` ordinals — COMMAND_BLOCK=0,
  DELETE_BLOCK=1, CORRUPT_BLOCK=2, AVRO_DATA_BLOCK=3,
  HFILE_DATA_BLOCK=4 (content = a complete HBase HFile v3 image,
  ``plans/hfile.py``), PARQUET_DATA_BLOCK=5 (content = a complete
  parquet file image). All three data codecs decode to the same
  record-dict shape; encode halves exist for Avro and HFile.
- Avro data block content: ``HoodieAvroDataBlock.serializeRecords`` —
  int32 content-format version, int32 record count, then per record
  int32 length + Avro-binary record bytes (writer schema in the
  SCHEMA header).
- Delete block content: ``HoodieDeleteBlock`` (Hudi 0.14+, table
  version 6) — int32 content-format version, int32 byte length, then
  an Avro-binary ``HoodieDeleteRecordList``
  (``hudi-common/src/main/avro/HoodieDeleteRecordList.avsc``:
  array of {recordKey, partitionPath, orderingVal} with nullable
  unions). Hudi ≤0.13 Kryo-serialized delete keys — a JVM-private
  framing no non-Java reader can speak; the Avro framing is the
  stable public format and is what we implement.
- Command block: empty content; ``COMMAND_BLOCK_TYPE`` header "0"
  (= ROLLBACK_BLOCK ordinal) + ``TARGET_INSTANT_TIME`` header names
  the instant whose earlier blocks in this log file are void
  (``AbstractHoodieLogRecordReader`` rollback semantics).

Everything in this module is bytes-in, rows-out and runs EXECUTOR-side
(one task per log file via ``mapInPandas`` in ``sources/hudi.py``);
nothing here touches Spark or the driver.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass

MAGIC = b"#HUDI#"

# HoodieLogBlockType ordinals (hudi-common HoodieLogBlock.java)
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
HFILE_DATA_BLOCK = 4
PARQUET_DATA_BLOCK = 5

# HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3

_HEADER_NAMES = {
    H_INSTANT_TIME: "INSTANT_TIME",
    H_TARGET_INSTANT_TIME: "TARGET_INSTANT_TIME",
    H_SCHEMA: "SCHEMA",
    H_COMMAND_BLOCK_TYPE: "COMMAND_BLOCK_TYPE",
}

# HoodieDeleteRecordList.avsc (bundled: the delete block carries no
# schema header; readers know this specific schema)
DELETE_RECORD_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "HoodieDeleteRecord",
                    "fields": [
                        {"name": "recordKey", "type": ["null", "string"]},
                        {"name": "partitionPath", "type": ["null", "string"]},
                        {
                            "name": "orderingVal",
                            "type": [
                                "null", "boolean", "int", "long",
                                "float", "double", "bytes", "string",
                            ],
                        },
                    ],
                },
            },
        }
    ],
}


class HudiLogFormatError(ValueError):
    """Structurally invalid log file (bad magic / truncated block)."""


@dataclass
class LogBlock:
    block_type: int
    headers: dict[str, str]
    content: bytes
    footers: dict[str, str]


# -- Avro binary decoding (Avro 1.x spec, the subset Hudi log blocks use) --


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise HudiLogFormatError("truncated Avro payload")
        self.pos += n
        return b


def _zigzag(cur: _Cursor) -> int:
    """Avro int/long: little-endian base-128 varint, zigzag-encoded."""
    shift, acc = 0, 0
    while True:
        byte = cur.take(1)[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def avro_decode(schema, cur: _Cursor):
    """Decode one value of ``schema`` (parsed Avro JSON) at the cursor.

    Supports the types Hudi record payloads use: primitives, record,
    union, array, map, enum, fixed. Logical types decode as their base
    primitive (timestamps stay long, decimals stay bytes) — the Spark
    side casts by column type.
    """
    if isinstance(schema, list):  # union: long index, then that branch
        idx = _zigzag(cur)
        if not 0 <= idx < len(schema):
            raise HudiLogFormatError(f"union index {idx} out of range")
        return avro_decode(schema[idx], cur)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: avro_decode(f["type"], cur)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _zigzag(cur)
                if n == 0:
                    return out
                if n < 0:  # negative count: abs(count) items + block size
                    n = -n
                    _zigzag(cur)
                for _ in range(n):
                    out.append(avro_decode(schema["items"], cur))
        if t == "map":
            out = {}
            while True:
                n = _zigzag(cur)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _zigzag(cur)
                for _ in range(n):
                    k = avro_decode("string", cur)
                    out[k] = avro_decode(schema["values"], cur)
        if t == "enum":
            return schema["symbols"][_zigzag(cur)]
        if t == "fixed":
            return cur.take(schema["size"])
        return avro_decode(t, cur)  # {"type": "string", ...} wrapper
    # primitive names
    if schema == "null":
        return None
    if schema == "boolean":
        return cur.take(1) == b"\x01"
    if schema in ("int", "long"):
        return _zigzag(cur)
    if schema == "float":
        return struct.unpack("<f", cur.take(4))[0]
    if schema == "double":
        return struct.unpack("<d", cur.take(8))[0]
    if schema == "bytes":
        return bytes(cur.take(_zigzag(cur)))
    if schema == "string":
        return cur.take(_zigzag(cur)).decode("utf-8")
    raise HudiLogFormatError(f"unsupported Avro type: {schema!r}")


# -- block framing ---------------------------------------------------------


_AVRO_PRIMITIVES = frozenset(
    {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}
)


def resolve_named_types(schema):
    """Expand Avro NAMED-TYPE REFERENCES into their definitions.

    Real Avro schemas define a record/enum/fixed once and reference it
    by name afterwards — e.g. Hudi's HoodieMetadataColumnStats defines
    the min/max value-wrapper records inside ``minValue``'s union and
    ``maxValue``'s union just says ``["null", "IntWrapper", ...]``. The
    positional decoder needs the full definition at every use site, so
    this pre-pass collects named definitions (bare and
    namespace-qualified) and substitutes references. Recursive types
    raise (no Hudi payload is recursive; silently looping would be
    worse)."""
    defs: dict[str, dict] = {}

    def collect(s) -> None:
        if isinstance(s, list):
            for b in s:
                collect(b)
            return
        if not isinstance(s, dict):
            return
        t = s.get("type")
        if t in ("record", "enum", "fixed") and "name" in s:
            defs[s["name"]] = s
            if s.get("namespace"):
                defs[f"{s['namespace']}.{s['name']}"] = s
        if t == "record":
            for f in s.get("fields", ()):
                collect(f["type"])
        elif t == "array":
            collect(s.get("items"))
        elif t == "map":
            collect(s.get("values"))
        elif isinstance(t, (dict, list)):
            collect(t)

    collect(schema)
    if not defs:
        return schema

    def subst(s, stack: frozenset):
        if isinstance(s, str):
            if s in _AVRO_PRIMITIVES or s not in defs:
                return s
            if s in stack:
                raise HudiLogFormatError(f"recursive Avro type: {s}")
            return subst(defs[s], stack | {s})
        if isinstance(s, list):
            return [subst(b, stack) for b in s]
        if not isinstance(s, dict):
            return s
        t = s.get("type")
        out = dict(s)
        if t == "record":
            inner = stack | {s["name"]} if "name" in s else stack
            out["fields"] = [
                {**f, "type": subst(f["type"], inner)} for f in s.get("fields", ())
            ]
        elif t == "array":
            out["items"] = subst(s.get("items"), stack)
        elif t == "map":
            out["values"] = subst(s.get("values"), stack)
        elif isinstance(t, (dict, list)) or (
            isinstance(t, str) and t not in _AVRO_PRIMITIVES
            and t not in ("record", "enum", "fixed")
        ):
            out["type"] = subst(t, stack)
        return out

    return subst(schema, frozenset())


def decode_avro_bytes(schema, data: bytes):
    """Decode one Avro-binary value from a standalone byte string (e.g.
    an HFile cell value or a metadata-table payload). Named-type
    references in the schema are resolved first."""
    return avro_decode(resolve_named_types(schema), _Cursor(data))


def _read_meta_map(cur: _Cursor) -> dict[str, str]:
    count = struct.unpack(">i", cur.take(4))[0]
    out = {}
    for _ in range(count):
        ordinal = struct.unpack(">i", cur.take(4))[0]
        length = struct.unpack(">i", cur.take(4))[0]
        value = cur.take(length).decode("utf-8")
        out[_HEADER_NAMES.get(ordinal, f"UNKNOWN_{ordinal}")] = value
    return out


def parse_log_file(data: bytes) -> list[LogBlock]:
    """Parse every block of one log file, forward scan.

    A block whose framing is inconsistent (size field disagreeing with
    the next magic position / truncation at EOF) is surfaced as a
    CORRUPT_BLOCK carrying the raw bytes up to the next magic — the
    same recovery ``HoodieLogFileReader`` performs by scanning for the
    next magic — so one torn append never hides later blocks.
    """
    blocks: list[LogBlock] = []
    cur = _Cursor(data)
    while cur.pos < len(data):
        start = cur.pos
        if data[cur.pos:cur.pos + 6] != MAGIC:
            raise HudiLogFormatError(
                f"bad magic at offset {cur.pos} (want {MAGIC!r})"
            )
        try:
            cur.pos += 6
            block_size = struct.unpack(">q", cur.take(8))[0]
            struct.unpack(">i", cur.take(4))  # log-format version (=1)
            btype = struct.unpack(">i", cur.take(4))[0]
            headers = _read_meta_map(cur)
            content_len = struct.unpack(">q", cur.take(8))[0]
            content = bytes(cur.take(content_len))
            footers = _read_meta_map(cur)
            total_len = struct.unpack(">q", cur.take(8))[0]
            # forward validation of the reverse-traversal fields: the
            # size field covers everything after itself; the trailing
            # total covers the whole block including magic
            if (cur.pos - start - 14) != block_size or (cur.pos - start) != total_len:
                raise HudiLogFormatError("block size fields inconsistent")
            nxt = data.find(MAGIC, cur.pos)
            if cur.pos != len(data) and cur.pos != nxt:
                raise HudiLogFormatError("block does not land on next magic")
        except HudiLogFormatError:
            # torn/corrupt append: skip to the next magic, keep reading
            nxt = data.find(MAGIC, start + 6)
            end = nxt if nxt != -1 else len(data)
            blocks.append(LogBlock(CORRUPT_BLOCK, {}, bytes(data[start:end]), {}))
            cur.pos = end
            continue
        blocks.append(LogBlock(btype, headers, content, footers))
    return blocks


def apply_rollbacks(blocks: list[LogBlock]) -> list[LogBlock]:
    """Drop blocks voided by ROLLBACK command blocks.

    ``AbstractHoodieLogRecordReader`` semantics: a command block whose
    ``COMMAND_BLOCK_TYPE`` is ROLLBACK (ordinal 0) voids every EARLIER
    block in the same log file whose ``INSTANT_TIME`` equals the
    command's ``TARGET_INSTANT_TIME`` (a failed write's blocks, before
    the retry appends under a fresh instant)."""
    out: list[LogBlock] = []
    for b in blocks:
        if b.block_type == COMMAND_BLOCK:
            if b.headers.get("COMMAND_BLOCK_TYPE", "0") == "0":
                target = b.headers.get("TARGET_INSTANT_TIME")
                out = [
                    x for x in out
                    if x.headers.get("INSTANT_TIME") != target
                ]
            continue  # command blocks carry no data themselves
        out.append(b)
    return out


def data_block_records(block: LogBlock) -> list[dict]:
    """Decode an AVRO_DATA_BLOCK's records using its SCHEMA header.

    Content framing (``HoodieAvroDataBlock.serializeRecords``): int32
    content-format version, int32 record count, then per record int32
    byte length + Avro binary."""
    if block.block_type != AVRO_DATA_BLOCK:
        raise HudiLogFormatError("not an Avro data block")
    schema = resolve_named_types(json.loads(block.headers["SCHEMA"]))
    cur = _Cursor(block.content)
    struct.unpack(">i", cur.take(4))  # content-format version
    count = struct.unpack(">i", cur.take(4))[0]
    records = []
    for _ in range(count):
        rec_len = struct.unpack(">i", cur.take(4))[0]
        rec_cur = _Cursor(cur.take(rec_len))
        records.append(avro_decode(schema, rec_cur))
    return records


def parquet_block_records(block: LogBlock) -> list[dict]:
    """Decode a PARQUET_DATA_BLOCK's records.

    Content framing (``HoodieParquetDataBlock.serializeRecords``): the
    content IS a complete parquet file image — no version prefix; the
    writer schema travels in the parquet footer itself (the SCHEMA
    header carries the Avro twin, unused here)."""
    import io

    import pyarrow.parquet as pq

    if block.block_type != PARQUET_DATA_BLOCK:
        raise HudiLogFormatError("not a parquet data block")
    table = pq.read_table(io.BytesIO(block.content))
    return table.to_pylist()


def hfile_block_records(block: LogBlock) -> list[dict]:
    """Decode an HFILE_DATA_BLOCK's records.

    Content framing (``HoodieHFileDataBlock.serializeRecords``): the
    content is a complete in-memory HBase HFile image — each cell's row
    is the record key, its value the Avro-binary record in the SCHEMA
    header's writer schema (records are key-sorted, an HFile invariant).
    The HFile container itself (blocks, index, trailer, GZ/NONE
    compression, checksums) is parsed by ``plans/hfile.py``."""
    from .hfile import read_hfile_cells

    if block.block_type != HFILE_DATA_BLOCK:
        raise HudiLogFormatError("not an HFile data block")
    schema = resolve_named_types(json.loads(block.headers["SCHEMA"]))
    return [
        avro_decode(schema, _Cursor(value))
        for _row, value in read_hfile_cells(block.content)
    ]


def delete_block_keys(block: LogBlock) -> list[dict]:
    """Decode a DELETE_BLOCK into delete records.

    Content framing (``HoodieDeleteBlock``, Hudi 0.14+): int32
    content-format version, int32 byte length, Avro-binary
    ``HoodieDeleteRecordList``."""
    if block.block_type != DELETE_BLOCK:
        raise HudiLogFormatError("not a delete block")
    cur = _Cursor(block.content)
    struct.unpack(">i", cur.take(4))  # content-format version
    length = struct.unpack(">i", cur.take(4))[0]
    payload = _Cursor(cur.take(length))
    decoded = avro_decode(DELETE_RECORD_LIST_SCHEMA, payload)
    return decoded["deleteRecordList"]


# -- write direction (round 7): encode blocks for MOR interop EXPORT -------
# The committed fixture (tests/fixtures/hudi_mor) stays authored by the
# INDEPENDENT encoder in tools/make_hudi_mor_fixture.py — these package
# encoders exist for the export path (sources/hudi.py export_hudi_mor),
# whose round-trip proof runs through the foreign READER, with the
# fixture still proving that reader against bytes the package never
# produced.

_HEADER_ORDINALS = {v: k for k, v in _HEADER_NAMES.items()}


def _zz_bytes(n: int) -> bytes:
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


def avro_encode(schema, value, out: bytearray) -> None:
    """Encode one value of ``schema`` (mirror of ``avro_decode``:
    primitives, 2-branch nullable unions, records, arrays, maps, enums,
    fixed). Timestamp-micros ride as their base long. Byte-compatible
    with ``org.apache.avro`` — pinned against the real library in
    ``tests/test_avro_golden.py`` (maps sort keys; Avro readers don't
    care about entry order)."""
    if isinstance(schema, list):  # union: branch index, then the branch
        if value is None:
            idx = schema.index("null")
            out += _zz_bytes(idx)
            return
        idx = next(i for i, b in enumerate(schema) if b != "null")
        out += _zz_bytes(idx)
        avro_encode(schema[idx], value, out)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                avro_encode(f["type"], value.get(f["name"]), out)
            return
        if t == "array":
            items = list(value)
            if items:
                out += _zz_bytes(len(items))
                for it in items:
                    avro_encode(schema["items"], it, out)
            out += _zz_bytes(0)
            return
        if t == "map":
            entries = dict(value)
            if entries:
                out += _zz_bytes(len(entries))
                for k in sorted(entries):
                    avro_encode("string", k, out)
                    avro_encode(schema["values"], entries[k], out)
            out += _zz_bytes(0)
            return
        if t == "enum":
            out += _zz_bytes(schema["symbols"].index(value))
            return
        if t == "fixed":
            b = bytes(value)
            if len(b) != schema["size"]:
                raise HudiLogFormatError(
                    f"fixed {schema.get('name')}: {len(b)} bytes != size {schema['size']}"
                )
            out += b
            return
        avro_encode(t, value, out)  # {"type": "long", "logicalType": ...}
        return
    if schema == "null":
        return
    if schema == "boolean":
        out += b"\x01" if value else b"\x00"
        return
    if schema in ("int", "long"):
        out += _zz_bytes(int(value))
        return
    if schema == "float":
        out += struct.pack("<f", float(value))
        return
    if schema == "double":
        out += struct.pack("<d", float(value))
        return
    if schema == "bytes":
        b = bytes(value)
        out += _zz_bytes(len(b)) + b
        return
    if schema == "string":
        b = str(value).encode("utf-8")
        out += _zz_bytes(len(b)) + b
        return
    raise HudiLogFormatError(f"unsupported Avro type for encode: {schema!r}")


def _meta_map_bytes(headers: dict[str, str]) -> bytes:
    out = struct.pack(">i", len(headers))
    for name, value in headers.items():
        vb = value.encode("utf-8")
        out += struct.pack(">i", _HEADER_ORDINALS[name])
        out += struct.pack(">i", len(vb)) + vb
    return out


def frame_block(btype: int, headers: dict[str, str], content: bytes) -> bytes:
    """One HoodieLogFormat v1 block, framed exactly as
    ``HoodieLogFormatWriter.appendBlocks`` writes it (and as
    ``parse_log_file`` validates it)."""
    hb = _meta_map_bytes(headers)
    fb = _meta_map_bytes({})
    block_size = 4 + 4 + len(hb) + 8 + len(content) + len(fb) + 8
    out = bytearray()
    out += MAGIC
    out += struct.pack(">q", block_size)
    out += struct.pack(">i", 1)  # log format version
    out += struct.pack(">i", btype)
    out += hb
    out += struct.pack(">q", len(content))
    out += content
    out += fb
    out += struct.pack(">q", 14 + block_size)
    return bytes(out)


def data_block_bytes(instant: str, schema: dict, records: list[dict]) -> bytes:
    """AVRO_DATA_BLOCK: int32 content version, int32 record count, per
    record int32 length + Avro binary (writer schema in the header)."""
    content = bytearray()
    content += struct.pack(">i", 3)
    content += struct.pack(">i", len(records))
    for rec in records:
        rb = bytearray()
        avro_encode(schema, rec, rb)
        content += struct.pack(">i", len(rb)) + rb
    return frame_block(
        AVRO_DATA_BLOCK,
        {"INSTANT_TIME": instant, "SCHEMA": json.dumps(schema)},
        bytes(content),
    )


def hfile_block_bytes(
    instant: str,
    schema: dict,
    records: list[dict],
    key_field: str = "_hoodie_record_key",
    compression: str = "gz",
) -> bytes:
    """HFILE_DATA_BLOCK: content = an HFile image of (recordKey ->
    Avro-binary record) cells, key-sorted (``HoodieHFileDataBlock``
    sorts before writing; HFiles require ascending rows)."""
    from .hfile import write_hfile

    cells = []
    for rec in records:
        rb = bytearray()
        avro_encode(schema, rec, rb)
        cells.append((str(rec[key_field]).encode("utf-8"), bytes(rb)))
    cells.sort(key=lambda kv: kv[0])
    return frame_block(
        HFILE_DATA_BLOCK,
        {"INSTANT_TIME": instant, "SCHEMA": json.dumps(schema)},
        write_hfile(cells, compression=compression),
    )


def delete_block_bytes(instant: str, keys: list[tuple[str, str]]) -> bytes:
    """DELETE_BLOCK: Avro HoodieDeleteRecordList of (recordKey,
    partitionPath) pairs, orderingVal null."""
    payload = bytearray()
    avro_encode(
        DELETE_RECORD_LIST_SCHEMA,
        {
            "deleteRecordList": [
                {"recordKey": rk, "partitionPath": pp, "orderingVal": None}
                for rk, pp in keys
            ]
        },
        payload,
    )
    content = struct.pack(">i", 3) + struct.pack(">i", len(payload)) + bytes(payload)
    return frame_block(DELETE_BLOCK, {"INSTANT_TIME": instant}, content)
