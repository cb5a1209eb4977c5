"""Hadoop/Hudi bloom-filter interop: deserialize
``org.apache.hadoop.util.bloom.BloomFilter`` images and test record keys
against them — the payload Hudi stores per data file (parquet footer key
``org.apache.hudi.bloomfilter`` and the metadata table's
``bloom_filters`` partition) to prune files during key lookups.

Format (public, from the Apache Hadoop source —
``org.apache.hadoop.util.bloom.Filter.write`` /
``BloomFilter.write``): int32 VERSION (-1), int32 nbHash, int8 hashType
(0 = Jenkins, 1 = Murmur), int32 vectorSize (bits), then
ceil(vectorSize/8) bytes of bit vector, LSB-first within each byte
(java.util.BitSet semantics: bit i lives at byte i/8, mask
1 << (i % 8) — verified against a genuine Hadoop BloomFilter image;
see the golden vector in tests/test_format.py).

Membership test (``org.apache.hadoop.util.bloom.HashFunction.hash``):
h_0 = murmur(key, seed=0); h_i = murmur(key, seed=h_{i-1}); probe bit
``Math.abs(h_i % vectorSize)`` — which under Java's TRUNCATED modulo
equals ``abs(h_i) % vectorSize`` (NOT Python's ``abs(h % vs)``) — for
each of nbHash rounds. The Murmur variant
is Hadoop's ``MurmurHash`` (32-bit MurmurHash2, signed-int semantics
including sign-extended tail bytes);
Jenkins is not implemented (Hudi writes MURMUR) and raises with the
type named.

Hudi wraps this image either raw (metadata-table ``bloomFilter`` bytes
field) or Base64 (``serializeToString`` in parquet footers); both entry
points are provided. The DYNAMIC_V0 variant concatenates several such
matrices after a row count — only SIMPLE is implemented, the default
(``hoodie.bloom.index.filter.type=SIMPLE``); DYNAMIC raises with the
length mismatch named.
"""

from __future__ import annotations

import base64
import struct

HASH_MURMUR = 1
HASH_JENKINS = 0


class BloomFormatError(ValueError):
    """Structurally invalid or unsupported bloom filter image."""


def _murmur2_signed(data: bytes, seed: int) -> int:
    """Hadoop ``MurmurHash.hash(byte[], int, int)``: 32-bit MurmurHash2
    with Java signed-int arithmetic (the seed chains between rounds, so
    sign behavior must match Java exactly)."""
    M32 = 0xFFFFFFFF
    m = 0x5BD1E995
    r = 24
    length = len(data)
    h = (seed ^ length) & M32
    n4 = length // 4
    for i in range(n4):
        (k,) = struct.unpack_from("<i", data, i * 4)
        k &= M32
        k = (k * m) & M32
        k ^= k >> r
        k = (k * m) & M32
        h = (h * m) & M32
        h ^= k
    left = length % 4
    # Hadoop's tail differs from the classic murmur2 reference in TWO
    # Java-isms: (1) bytes are indexed from the END (data[length-3]<<16,
    # data[length-2]<<8, data[length-1]) — byte-REVERSED vs the C
    # reference's data[base+2]<<16 — and (2) each byte is SIGN-EXTENDED
    # (byte -> int widening), so a tail byte >= 0x80 flips every bit
    # above its shift. Both verified against a genuine
    # org.apache.hadoop.util.bloom.BloomFilter image (see
    # tests/test_format.py golden vector).
    if left:
        _s = lambda b: b - 256 if b >= 128 else b  # noqa: E731
        if left >= 3:
            h = (h ^ ((_s(data[length - 3]) << 16) & M32)) & M32
        if left >= 2:
            h = (h ^ ((_s(data[length - 2]) << 8) & M32)) & M32
        h = (h ^ (_s(data[length - 1]) & M32)) & M32
        h = (h * m) & M32
    h ^= h >> 13
    h = (h * m) & M32
    h ^= h >> 15
    # back to Java signed int
    return h - (1 << 32) if h >= (1 << 31) else h


class HadoopBloomFilter:
    def __init__(self, nb_hash: int, hash_type: int, vector_size: int,
                 bits: bytes):
        self.nb_hash = nb_hash
        self.hash_type = hash_type
        self.vector_size = vector_size
        self.bits = bits

    def might_contain(self, key: bytes) -> bool:
        """False = the key is DEFINITELY absent (the pruning guarantee);
        True = maybe present."""
        if self.hash_type != HASH_MURMUR:
            raise BloomFormatError(
                f"unsupported bloom hash type {self.hash_type} (only MURMUR)"
            )
        h = 0
        for i in range(self.nb_hash):
            h = _murmur2_signed(key, 0 if i == 0 else h)
            # Java Math.abs(h % vectorSize) with TRUNCATED modulo equals
            # abs(h) % vectorSize; Python's floor modulo makes
            # abs(h % vs) land on a DIFFERENT bit for every negative h.
            bit = abs(h) % self.vector_size
            if not self.bits[bit // 8] & (1 << (bit % 8)):
                return False
        return True


def parse_hadoop_bloom(data: bytes) -> HadoopBloomFilter:
    if len(data) < 13:
        raise BloomFormatError("bloom image shorter than its header")
    version, nb_hash = struct.unpack_from(">ii", data, 0)
    if version != -1:
        raise BloomFormatError(f"unsupported bloom serialization version {version}")
    hash_type = data[8]
    (vector_size,) = struct.unpack_from(">i", data, 9)
    nbytes = -(-vector_size // 8)
    bits = data[13 : 13 + nbytes]
    if len(bits) != nbytes:
        raise BloomFormatError(
            f"bloom bit vector truncated or DYNAMIC variant: have "
            f"{len(data) - 13} bytes, SIMPLE needs {nbytes}"
        )
    return HadoopBloomFilter(nb_hash, hash_type, vector_size, bits)


def parse_hudi_bloom_string(s: str) -> HadoopBloomFilter:
    """The Base64 form Hudi's ``serializeToString`` writes into parquet
    footers (key ``org.apache.hudi.bloomfilter``)."""
    return parse_hadoop_bloom(base64.b64decode(s))


def serialize_hadoop_bloom(f: HadoopBloomFilter) -> bytes:
    out = struct.pack(">ii", -1, f.nb_hash) + bytes([f.hash_type])
    out += struct.pack(">i", f.vector_size) + f.bits
    return out


def build_hadoop_bloom(keys: list[bytes], vector_size: int = 4096,
                       nb_hash: int = 3) -> HadoopBloomFilter:
    """Writer half (exports + tests): same probe math as the reader."""
    bits = bytearray(-(-vector_size // 8))
    for key in keys:
        h = 0
        for i in range(nb_hash):
            h = _murmur2_signed(key, 0 if i == 0 else h)
            bit = abs(h) % vector_size
            bits[bit // 8] |= 1 << (bit % 8)
    return HadoopBloomFilter(nb_hash, HASH_MURMUR, vector_size, bytes(bits))
