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

import json
import zlib

from .hudi_log import HudiLogFormatError, _Cursor, avro_decode, resolve_named_types

OCF_MAGIC = b"Obj\x01"


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
