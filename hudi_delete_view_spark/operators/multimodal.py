"""Multimodal column support (SURVEY §2 B12): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas`` — the one place Python touches row data, batched through
Arrow rather than row-at-a-time.

Decode is REAL for codec-free containers: WAV (RIFF/PCM) and PPM (P6)
parse with pure Python + numpy — header fields (sample rate, channels,
bit depth, dimensions) and raw-sample features (RMS, peak, channel means)
come from the actual bytes. Payloads in formats that need codecs absent
from this container (JPEG, MP3, MP4, ...) fall back to a deterministic
sha-seeded fake feature vector — or ``NotImplementedError`` in strict
mode — with ``fmt = 'unknown'`` marking them honestly.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),  # opaque encoded bytes
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic binary payload derived from text (UTF-8 bytes) +
    typed metadata — a stand-in for real encoded media that exercises the
    exact same column types and plumbing."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.lower(F.sha2(payload, 256)).alias("sha256"),
    )


FEATURE_DIM = 8
_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("fmt", StringType()),  # wav | ppm | unknown
        StructField("sample_rate", LongType()),  # wav only
        StructField("channels", LongType()),  # wav only
        StructField("bit_depth", LongType()),  # wav only
        StructField("width", LongType()),  # ppm only
        StructField("height", LongType()),  # ppm only
        # double (not float32): the features carry the full IEEE chains
        # the hash oracle reproduces — truncation would break bit-equality
        StructField("feature", ArrayType(DoubleType())),
        StructField("n_bytes", LongType()),
    ]
)


# --------------------------------------------------------------------------
# real codec-free decoders: WAV (RIFF/PCM) and PPM (P6) headers + samples
# --------------------------------------------------------------------------
def synth_wav(media_id: int, sample_rate: int = 8000, n_samples: int | None = None) -> bytes:
    """Deterministic 16-bit mono PCM WAV: a ramp pattern seeded by id."""
    n = n_samples if n_samples is not None else 64 + (media_id % 64)
    samples = [((media_id * 31 + i * 997) % 20001) - 10000 for i in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_ppm(media_id: int, width: int | None = None, height: int | None = None) -> bytes:
    """Deterministic P6 PPM: a gradient seeded by id."""
    w = width if width is not None else 8 + (media_id % 8)
    h = height if height is not None else 6 + (media_id % 6)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(
                ((media_id + x * c + y * (c + 1)) % 256 for c in (3, 5, 7))
            )
    return f"P6\n{w} {h}\n255\n".encode() + bytes(px)


def parse_wav(payload: bytes) -> dict | None:
    """RIFF/WAVE header walk (pure Python, no codecs): returns fmt fields +
    the raw PCM data chunk, or None if not an integer-PCM WAV."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt " and size >= 16:
            a, ch, sr, _br, _ba, bd = struct.unpack_from("<HHIIHH", body, 0)
            fmt = (a, ch, sr, bd)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None or fmt[0] != 1 or fmt[3] not in (8, 16, 32):
        return None
    audio_format, channels, sample_rate, bit_depth = fmt
    # malformed-but-RIFF guards: zero channels/rate would divide-by-zero in
    # the feature stage, and a data chunk that isn't a whole number of
    # samples would crash np.frombuffer — such payloads take the
    # fake-feature fallback instead of killing the executor task
    if channels == 0 or sample_rate == 0 or len(data) % (bit_depth // 8) != 0:
        return None
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bit_depth": bit_depth,
        "data": data,
    }


def parse_ppm(payload: bytes) -> dict | None:
    """P6 PPM header (pure Python): returns dimensions + raw RGB bytes."""
    if not payload.startswith(b"P6"):
        return None
    fields, pos = [], 2
    while len(fields) < 3 and pos < len(payload):
        # skip whitespace and '#' comment lines between header fields
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if not payload[start:pos].isdigit():
            return None
        fields.append(int(payload[start:pos]))
    if len(fields) < 3 or fields[2] > 255:
        return None
    w, h, _maxval = fields
    if w == 0 or h == 0:
        return None  # degenerate image: aspect/mean would divide by zero
    rgb = payload[pos + 1 : pos + 1 + w * h * 3]
    if len(rgb) < w * h * 3:
        return None
    return {"width": w, "height": h, "rgb": rgb}


def _wav_features(meta: dict, dim: int = FEATURE_DIM) -> list[float]:
    """Real signal features from raw PCM: duration, RMS, peak, mean, zero-
    crossing rate, third-energies — computed from the actual samples.

    ORACLE CONTRACT: every accumulation runs EXACTLY in the integer
    domain (sums / sums-of-squares of integer PCM are exact in int64) and
    each float feature is then a fixed short chain of IEEE-754 double
    ops. That makes the values bit-reproducible by any engine applying
    the same formula (the DuckDB mirror in queries/multimodal.py) — no
    dependence on numpy's pairwise-summation order."""
    width = meta["bit_depth"] // 8
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    xi = np.frombuffer(meta["data"], dtype=dtype).astype(np.int64)
    if width == 1:
        xi = xi - 128  # 8-bit PCM is UNSIGNED with midpoint 128 (WAV spec)
    n = int(xi.size)
    if n == 0:
        return [0.0] * dim
    peak = int(np.max(np.abs(xi))) or 1
    pk2 = float(peak * peak)

    def _rms(seg: np.ndarray) -> float:
        if seg.size == 0:
            return 0.0
        if width <= 2:
            # exact: |x| <= 2^15 so sum(x^2) <= n * 2^30 — n would need
            # to exceed 2^33 samples (~32 GiB of PCM in one cell) to wrap
            ssq = int(np.dot(seg, seg))
        else:
            # 32-bit PCM: x^2 <= 2^62 fits int64 PER ELEMENT, but the
            # SUM wraps after ~2 full-scale samples — accumulate the
            # element squares in arbitrary-precision Python ints
            ssq = sum((seg * seg).tolist())
        return float(np.sqrt((ssq / pk2) / seg.size))

    sgn = np.sign(xi)
    zc = int(np.count_nonzero(np.diff(sgn))) if n > 1 else 0
    thirds = np.array_split(xi, 3)
    return [
        float(n / (meta["sample_rate"] * meta["channels"])),  # duration s
        _rms(xi),
        float((int(xi.sum()) / peak) / n),
        float(zc / (n - 1)) if n > 1 else 0.0,  # zero-cross rate
        _rms(thirds[0]),
        _rms(thirds[1]),
        _rms(thirds[2]),
        float(peak),
    ][:dim]


def _ppm_features(meta: dict, dim: int = FEATURE_DIM) -> list[float]:
    """Real image features from raw RGB: per-channel means/stds + aspect —
    the 'resize' here is a real block reduction over the pixel array.

    Same ORACLE CONTRACT as ``_wav_features``: integer-exact channel sums
    / sums-of-squares, then fixed short IEEE chains (std via the
    E[x^2] - E[x]^2 identity over exact integers, not numpy's two-pass
    deviation form) — bit-reproducible in SQL."""
    a = np.frombuffer(meta["rgb"], dtype=np.uint8).astype(np.int64)
    a = a.reshape(meta["height"], meta["width"], 3)
    n = int(meta["height"] * meta["width"])

    def _mean(c: np.ndarray) -> float:
        return float((int(c.sum()) / c.size) / 255.0)

    def _std(c: np.ndarray) -> float:
        flat = c.ravel()
        ssq = int(np.dot(flat, flat))
        m = int(flat.sum()) / flat.size
        return float(np.sqrt(ssq / flat.size - m * m) / 255.0)

    return [
        _mean(a[..., 0]),
        _mean(a[..., 1]),
        _mean(a[..., 2]),
        _std(a[..., 0]),
        _std(a[..., 1]),
        _std(a[..., 2]),
        _mean(a),
        float(meta["width"] / meta["height"]),
    ][:dim]


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake 'decoder' for payloads needing absent codecs
    (JPEG/MP3/MP4...): sha256-seeded feature vector. In production this is
    where PIL/librosa/ffmpeg would run (per Arrow batch, vectorized)."""
    # seeded on the payload's lowercase HEX (not raw bytes): SQL engines'
    # sha256 takes strings, so the oracle can replay the seed exactly
    h = hashlib.sha256(payload.hex().encode()).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media_df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    WAV and PPM payloads decode for real (header fields + raw-sample
    features). Other formats fall back to sha-seeded fake features with
    ``fmt='unknown'`` — or, with ``strict=True``, raise
    ``NotImplementedError`` (the honest mode: those codecs are not present
    in this environment)."""

    def decode_one(payload: bytes) -> dict:
        wav = parse_wav(payload)
        if wav is not None:
            return {
                "fmt": "wav",
                "sample_rate": wav["sample_rate"],
                "channels": wav["channels"],
                "bit_depth": wav["bit_depth"],
                "width": None,
                "height": None,
                "feature": _wav_features(wav),
            }
        ppm = parse_ppm(payload)
        if ppm is not None:
            return {
                "fmt": "ppm",
                "sample_rate": None,
                "channels": None,
                "bit_depth": None,
                "width": ppm["width"],
                "height": ppm["height"],
                "feature": _ppm_features(ppm),
            }
        if strict:
            raise NotImplementedError(
                "payload is neither WAV nor PPM; decoding other formats "
                "requires codecs not present in this container "
                "(use strict=False for deterministic fake features)"
            )
        return {
            "fmt": "unknown",
            "sample_rate": None,
            "channels": None,
            "bit_depth": None,
            "width": None,
            "height": None,
            "feature": _fake_decode_features(payload),
        }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_one(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )
            for field in ("fmt", "sample_rate", "channels", "bit_depth", "width", "height", "feature"):
                out[field] = [d[field] for d in decoded]
            yield out[[f.name for f in _FEATURE_SCHEMA.fields]]

    return media_df.mapInPandas(batches, schema=_FEATURE_SCHEMA)


def attach_synthetic_media(df: DataFrame, id_col: str) -> DataFrame:
    """Build REAL binary payloads (WAV for audio, PPM for image, opaque
    bytes for video) deterministically from the id, via one Arrow-batched
    pass — same schema as ``attach_fake_media`` but the payloads parse."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                kind = ("image", "audio", "video")[mid % 3]
                if kind == "audio":
                    payload = synth_wav(mid)
                elif kind == "image":
                    payload = synth_ppm(mid)
                else:  # no codec-free video container: opaque bytes
                    payload = b"FAKEVIDEO" + hashlib.sha256(str(mid).encode()).digest()
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": kind,
                        "payload": payload,
                        "byte_len": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col).alias("media_id")).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def frame_sample_plan(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Metadata-only 'frame sampling' plan: which offsets a video decoder
    would sample, computed without decoding (JVM-side arithmetic over
    byte_len as a duration stand-in)."""
    offsets = F.expr(f"sequence(0, greatest(byte_len - 1, 0), {every_n})")
    return media_df.filter(F.col("media_type") == "video").select(
        "media_id",
        offsets.alias("sample_offsets"),
        F.size(offsets).cast("long").alias("n_samples"),
    )


def audio_window_plan(
    decoded: DataFrame, window: int = 32, hop: int = 16
) -> DataFrame:
    """Metadata-only audio windowing plan over DECODED WAV headers: which
    fixed-length sample windows a feature extractor would cut, computed
    from (sample_rate, duration) without touching payload bytes again —
    the audio sibling of ``frame_sample_plan``. Pure JVM arithmetic: at
    100 TB the planning pass reads KB-scale header columns, and the
    expensive decode runs only on the planned windows."""
    n = F.round(F.col("duration_s") * F.col("sample_rate")).cast("long")
    n_win = F.when(
        n >= window, (F.floor((n - window) / hop) + 1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        decoded.filter(F.col("fmt") == "wav")
        .withColumn("n_samples", n)
        .withColumn("n_windows", n_win)
        .select(
            "media_id",
            "n_samples",
            "n_windows",
            F.expr(
                f"IF(n_windows > 0, transform(sequence(0, n_windows - 1),"
                f" i -> cast(i * {hop} as bigint)), cast(array() as array<bigint>))"
            ).alias("window_offsets"),
        )
    )
