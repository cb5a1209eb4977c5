"""Golden-vector validation of the pure-Python Avro layer against the
REAL ``org.apache.avro`` (1.12, bundled in pyspark's JVM, reached via
py4j — the same discipline that caught three shared-convention bugs in
the Hadoop bloom and one in the HFile root-index magic).

What this pins (SURVEY §14 lead 1, the Avro slice of "real-binary
validation"):

- ``plans/avro_ocf.read_ocf`` parses container files the REAL library
  wrote — deflate and null codecs, multi-block framing, named-type
  reuse, unicode — not just files our own fixture encoder wrote.
- ``plans/hudi_log.avro_encode`` is BYTE-IDENTICAL to
  ``GenericDatumWriter`` + ``binaryEncoder`` on the full supported type
  surface, so Hudi log blocks / exported manifests we write are bytes
  the real ecosystem produces, not merely bytes it tolerates.
- The committed Iceberg fixture's manifest/manifest-list OCF files
  (``tests/fixtures/iceberg_tbl``) are readable by the real library and
  decode to the SAME records our reader sees — upgrading the Iceberg
  interop evidence from "two independent Python encoders agree" to
  "the reference implementation agrees".

All tests are pure-JVM-driver work (no Spark jobs); records cross the
py4j boundary as Avro-JSON / raw bytes so no py4j numeric coercion can
mask a type bug.
"""

import glob
import json
import os

import pytest

from hudi_delete_view_spark.plans.avro_ocf import read_ocf
from hudi_delete_view_spark.plans.hudi_log import (
    avro_encode,
    decode_avro_bytes,
    resolve_named_types,
)

GNARLY = {
    "type": "record",
    "name": "Gnarly",
    "namespace": "golden",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "optnull", "type": ["null", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "int"}},
        {"name": "en", "type": {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
        {
            "name": "nest",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "long"}],
            },
        },
        # named-type REFERENCE — exercises resolve_named_types against
        # how the real library emits reused records
        {"name": "nest2", "type": "Inner"},
    ],
}

# Avro-JSON form (unions wrapped by branch name, null branch bare)
GNARLY_JSON = {
    "b": True,
    "i": -7,
    "l": 2**40 + 3,
    "f": 1.5,
    "d": -2.25,
    "s": "héllo ✓",
    "by": "abc",
    "opt": {"long": 99},
    "optnull": None,
    "arr": [1, -2, 3],
    "m": {"k1": 5},  # single entry: canonical order for byte compare
    "en": "B",
    "fx": "WXYZ",
    "nest": {"x": 11},
    "nest2": {"x": -12},
}

# what our decoder must produce for that record
GNARLY_EXPECT = {
    "b": True,
    "i": -7,
    "l": 2**40 + 3,
    "f": 1.5,
    "d": -2.25,
    "s": "héllo ✓",
    "by": b"abc",
    "opt": 99,
    "optnull": None,
    "arr": [1, -2, 3],
    "m": {"k1": 5},
    "en": "B",
    "fx": b"WXYZ",
    "nest": {"x": 11},
    "nest2": {"x": -12},
}


def _jvm_record(jvm, schema, rec_json: str):
    """Parse Avro-JSON into a GenericRecord with the REAL library (no
    py4j numeric coercion touches field values)."""
    dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(schema, rec_json)
    return jvm.org.apache.avro.generic.GenericDatumReader(schema).read(None, dec)


def _jvm_binary(jvm, schema, rec) -> bytes:
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
    jvm.org.apache.avro.generic.GenericDatumWriter(schema).write(rec, enc)
    enc.flush()
    return bytes(baos.toByteArray())


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_read_ocf_of_real_avro_container(spark, scratch, codec):
    """The REAL DataFileWriter authors a multi-block OCF (both spec
    codecs); our reader must decode every record and the metadata."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(GNARLY))
    rec = _jvm_record(jvm, schema, json.dumps(GNARLY_JSON))

    path = os.path.join(scratch, f"golden_{codec}.avro")
    w = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(w)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.create(schema, jvm.java.io.File(path))
    dfw.append(rec)
    dfw.sync()  # force a block boundary mid-file
    dfw.append(rec)
    dfw.append(rec)
    dfw.close()

    with open(path, "rb") as fh:
        meta, records = read_ocf(fh.read())
    assert meta.get("avro.codec", b"null").decode() == codec
    assert records == [GNARLY_EXPECT] * 3


def test_avro_encode_byte_exact_vs_real_library(spark):
    """Our binary encoder's bytes == the real GenericDatumWriter's, and
    the real library round-trips our bytes to the identical image."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(GNARLY))
    rec = _jvm_record(jvm, schema, json.dumps(GNARLY_JSON))
    theirs = _jvm_binary(jvm, schema, rec)

    ours = bytearray()
    avro_encode(resolve_named_types(GNARLY), GNARLY_EXPECT, ours)
    assert bytes(ours) == theirs

    # and our decoder inverts the real library's bytes
    assert decode_avro_bytes(resolve_named_types(GNARLY), theirs) == GNARLY_EXPECT

    # real library reads OUR bytes and re-encodes to the same image
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes(ours), None)
    rec2 = jvm.org.apache.avro.generic.GenericDatumReader(schema).read(None, dec)
    assert _jvm_binary(jvm, schema, rec2) == bytes(ours)


def _iceberg_fixture_avros():
    here = os.path.dirname(os.path.abspath(__file__))
    return sorted(glob.glob(os.path.join(here, "fixtures", "iceberg_tbl", "metadata", "*.avro")))


def test_real_avro_reads_committed_iceberg_fixture_manifests(spark):
    """Every committed Iceberg manifest / manifest-list OCF is readable
    by the REAL library, record-for-record byte-identical (per-record
    canonical re-encode) to what our reader decodes."""
    jvm = spark._jvm
    paths = _iceberg_fixture_avros()
    assert paths, "iceberg fixture avro files missing"
    for path in paths:
        with open(path, "rb") as fh:
            raw = fh.read()
        meta, ours = read_ocf(raw)
        writer_schema = resolve_named_types(json.loads(meta["avro.schema"].decode()))

        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        dfr = jvm.org.apache.avro.file.DataFileReader(
            jvm.org.apache.avro.file.SeekableFileInput(jvm.java.io.File(path)), reader
        )
        jschema = dfr.getSchema()
        theirs = []
        while dfr.hasNext():
            theirs.append(_jvm_binary(jvm, jschema, dfr.next()))
        dfr.close()

        assert len(theirs) == len(ours), path
        for jbytes, orec in zip(theirs, ours):
            out = bytearray()
            avro_encode(writer_schema, orec, out)
            assert bytes(out) == jbytes, f"record mismatch in {os.path.basename(path)}"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_write_ocf_round_trip_and_real_reader(spark, scratch, codec):
    """write_ocf (the export's OCF author): both spec codecs round-trip
    through our reader AND the REAL DataFileReader, deterministically
    (same input -> identical bytes)."""
    from hudi_delete_view_spark.plans.avro_ocf import write_ocf

    recs = [GNARLY_EXPECT] * 3
    img = write_ocf(GNARLY, recs, codec=codec)
    assert img == write_ocf(GNARLY, recs, codec=codec)  # reproducible
    meta, back = read_ocf(img)
    assert meta["avro.codec"].decode() == codec
    assert back == recs

    path = os.path.join(scratch, f"w_{codec}.avro")
    with open(path, "wb") as f:
        f.write(img)
    jvm = spark._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.org.apache.avro.file.SeekableFileInput(jvm.java.io.File(path)),
        jvm.org.apache.avro.generic.GenericDatumReader())
    jschema = dfr.getSchema()
    n = 0
    while dfr.hasNext():
        rec = dfr.next()
        assert _jvm_binary(jvm, jschema, rec) == _jvm_binary(
            jvm, jschema, _jvm_record(jvm, jschema, json.dumps(GNARLY_JSON)))
        n += 1
    dfr.close()
    assert n == 3
