"""Apache Avro **Object Container File** (OCF) reader — the framing
Iceberg uses for manifest lists and manifest files (and Hudi for its
archived timeline).

Format (public, Avro 1.x spec "Object Container Files"): magic
``Obj\\x01``, a file-metadata MAP (bytes values; ``avro.schema`` = the
writer schema JSON, ``avro.codec`` = null | deflate), a 16-byte sync
marker, then blocks of [record count (long), serialized size (long),
payload, sync marker]. Records decode with the EMBEDDED writer schema
through the same from-spec Avro binary decoder the Hudi log blocks use
(``plans/hudi_log.avro_decode`` + named-type resolution).

Codecs: null and deflate (raw zlib, no header — RFC 1951) — the two the
spec requires; anything else raises with the codec named."""

from __future__ import annotations

import hashlib
import json
import zlib

from .hudi_log import (
    HudiLogFormatError,
    _Cursor,
    _zz_bytes,
    avro_decode,
    avro_encode,
    resolve_named_types,
)

OCF_MAGIC = b"Obj\x01"


def write_ocf(schema: dict, records: list, codec: str = "deflate") -> bytes:
    """Author one OCF image (the inverse of ``read_ocf``): magic,
    metadata map, sync marker, one block. The binary record layer is
    ``hudi_log.avro_encode`` — byte-pinned against the real
    ``org.apache.avro`` in ``tests/test_avro_golden.py``, which also
    proves the real ``DataFileReader`` parses this framing. The sync
    marker derives from the content (deterministic output for identical
    input — exports are reproducible byte-for-byte)."""
    if codec not in ("null", "deflate"):
        raise HudiLogFormatError(f"unsupported OCF codec {codec!r}")
    schema_b = json.dumps(schema).encode("utf-8")
    payload = bytearray()
    resolved = resolve_named_types(schema)
    for rec in records:
        avro_encode(resolved, rec, payload)
    sync = hashlib.md5(schema_b + bytes(payload)).digest()
    out = bytearray(OCF_MAGIC)
    meta = {"avro.schema": schema_b, "avro.codec": codec.encode()}
    avro_encode({"type": "map", "values": "bytes"}, meta, out)
    out += sync
    body = bytes(payload)
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()
    out += _zz_bytes(len(records)) + _zz_bytes(len(body)) + body + sync
    return bytes(out)


def read_ocf(data: bytes) -> tuple[dict, list]:
    """Parse one OCF image: (file metadata dict, decoded records)."""
    if data[:4] != OCF_MAGIC:
        raise HudiLogFormatError(
            f"not an Avro object container file (magic {data[:4]!r})"
        )
    cur = _Cursor(data, 4)
    meta_schema = {"type": "map", "values": "bytes"}
    meta = avro_decode(meta_schema, cur)
    sync = cur.take(16)
    schema = resolve_named_types(
        json.loads(meta["avro.schema"].decode("utf-8"))
    )
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise HudiLogFormatError(f"unsupported OCF codec {codec!r}")
    records: list = []
    while cur.pos < len(cur.buf):
        count = _read_long(cur)
        size = _read_long(cur)
        payload = cur.take(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        block = _Cursor(payload)
        for _ in range(count):
            records.append(avro_decode(schema, block))
        if cur.take(16) != sync:
            raise HudiLogFormatError("OCF block sync marker mismatch")
    return {k: v for k, v in meta.items()}, records


def _read_long(cur: _Cursor) -> int:
    shift, acc = 0, 0
    while True:
        byte = cur.take(1)[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)
