"""Text-analysis (B11) and multimodal (B12) operator tests."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from hudi_delete_view_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_fake_media,
    extract_features,
    frame_sample_plan,
)
from hudi_delete_view_spark.operators.text import (
    fingerprint,
    gram_hashes,
    lang_id,
    quality_score,
    text_stats,
    token_count,
    winnowing_from_hashes,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    df.cache().count()
    return df


def test_token_count_known_values(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "  a  b   c "), (3, ""), (4, "one")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 2, 2: 3, 3: 0, 4: 1}


def test_quality_score_bounds(spark, docs):
    rows = docs.select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_lang_id_obvious_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is here"),
            (2, "el perro de la casa que los gatos"),
            (3, "le chat et les chiens des maisons"),
            (4, "der hund und die katze das ist gut"),
            (5, "zzz qqq www"),
            (6, "你好 world"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["l"] for r in df.select("doc_id", lang_id("text").alias("l")).collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und", 6: "zh"}


def test_fingerprint_normalizes_space_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello worlds")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["f"] for r in df.select("doc_id", fingerprint("text").alias("f")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_text_stats_attaches_all_columns(spark, docs):
    out = text_stats(docs.limit(10))
    for c in ("n_tokens", "punct_ratio", "stopword_ratio", "mean_token_len",
              "quality", "lang_pred", "fingerprint"):
        assert c in out.columns
    assert out.count() == 10


def test_winnowing_shared_substring(spark):
    """Docs sharing a long substring share winnowing fingerprints."""
    shared = "this exact long shared passage appears verbatim in both documents"
    df = spark.createDataFrame(
        [(1, "prefix one " + shared), (2, "other start " + shared + " tail"), (3, "nothing alike here at all")],
        ["doc_id", "text"],
    )
    fp = df.select("doc_id", gram_hashes("text").alias("gh")).select(
        "doc_id", winnowing_from_hashes("gh").alias("fps")
    )
    sets = {r["doc_id"]: set(r["fps"]) for r in fp.collect()}
    assert len(sets[1] & sets[2]) > 0
    assert len(sets[1] & sets[3]) == 0


def test_media_metadata_matches_python(spark, docs):
    sample = docs.filter("doc_id < 20")
    media = attach_fake_media(sample, "doc_id", "text")
    rows = {r["media_id"]: r for r in media.collect()}
    for r in sample.collect():
        m = rows[r["doc_id"]]
        raw = r["text"].encode("utf-8")
        assert m["byte_len"] == len(raw)
        assert m["sha256"] == hashlib.sha256(raw).hexdigest()
        assert m["media_type"] == ["image", "audio", "video"][r["doc_id"] % 3]
        assert bytes(m["payload"]) == raw


def test_extract_features_shape_and_determinism(spark, docs):
    media = attach_fake_media(docs.filter("doc_id < 30"), "doc_id", "text")
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


def test_extract_features_strict_raises(spark, docs):
    media = attach_fake_media(docs.limit(2), "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_features(media, strict=True).collect()


def test_frame_plan_video_only(spark, docs):
    media = attach_fake_media(docs.filter("doc_id < 30"), "doc_id", "text")
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r["media_id"] % 3 == 2 for r in rows)  # video ids
    for r in rows:
        assert r["n_samples"] == len(r["sample_offsets"])


def test_wav_parser_hand_built(spark):
    """A hand-built 16-bit mono WAV parses to exact header fields and real
    signal features (duration, peak) computed from the actual samples."""
    import struct

    import numpy as np

    from hudi_delete_view_spark.operators.multimodal import parse_wav, _wav_features

    samples = [0, 1000, -1000, 500, -500, 250, -250, 0] * 100  # 800 samples
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 16000 * 4, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body

    meta = parse_wav(wav)
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 2
    assert meta["bit_depth"] == 16
    feats = _wav_features(meta)
    assert feats[0] == pytest.approx(800 / (16000 * 2))  # duration seconds
    assert feats[7] == 1000.0  # peak
    x = np.array(samples) / 1000.0
    assert feats[1] == pytest.approx(float(np.sqrt(np.mean(x**2))))

    # corrupt / truncated payloads parse to None, never raise
    assert parse_wav(b"RIFF") is None
    assert parse_wav(b"not a wav at all") is None
    assert parse_wav(wav[:30]) is None


def test_ppm_parser_hand_built(spark):
    from hudi_delete_view_spark.operators.multimodal import parse_ppm, _ppm_features

    # 2x2 image with a comment line; all-red top row, all-blue bottom row
    px = bytes([255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255])
    ppm = b"P6\n# comment\n2 2\n255\n" + px
    meta = parse_ppm(ppm)
    assert (meta["width"], meta["height"]) == (2, 2)
    feats = _ppm_features(meta)
    assert feats[0] == pytest.approx(0.5)  # mean red: 2 of 4 pixels full
    assert feats[2] == pytest.approx(0.5)  # mean blue
    assert feats[7] == pytest.approx(1.0)  # aspect
    assert parse_ppm(b"P3\n2 2\n255\n") is None  # ASCII PPM not supported
    assert parse_ppm(ppm[:10]) is None  # truncated pixel data


def test_synthetic_media_decodes_for_real(spark, docs):
    """End-to-end Spark plumbing: synthesized WAV/PPM payloads round-trip
    through the Arrow-batched decoder with real parsed fields; video
    payloads fall back to fmt='unknown'."""
    from hudi_delete_view_spark.operators.multimodal import attach_synthetic_media

    media = attach_synthetic_media(docs.filter("doc_id < 30"), "doc_id")
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    for mid, r in rows.items():
        if mid % 3 == 1:  # audio -> wav
            assert r["fmt"] == "wav"
            assert r["sample_rate"] == 8000
            assert r["channels"] == 1
            assert r["bit_depth"] == 16
            n = 64 + mid % 64
            assert r["feature"][0] == pytest.approx(n / 8000, rel=1e-5)
        elif mid % 3 == 0:  # image -> ppm
            assert r["fmt"] == "ppm"
            assert r["width"] == 8 + mid % 8
            assert r["height"] == 6 + mid % 6
        else:  # video -> no codec-free container
            assert r["fmt"] == "unknown"
            assert r["sample_rate"] is None
    # strict mode still raises, but only for undecodable payloads
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_features(media, strict=True).collect()
    wav_ppm_only = media.filter("media_type != 'video'")
    assert extract_features(wav_ppm_only, strict=True).count() == 20


def test_chunk_documents_stride_and_tail(spark):
    from hudi_delete_view_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words), (2, ""), (3, "solo")], "id long, text string")
    rows = chunk_documents(df, "id", "text", chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # stride 2 over 10 tokens -> starts 0,2,4,6,8
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2, 3, 4]
    assert c1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c1[1]["chunk_text"] == "w2 w3 w4 w5"  # 2-token overlap
    assert c1[-1]["chunk_text"] == "w8 w9"  # short tail kept
    assert c1[-1]["n_chunk_tokens"] == 2
    # empty doc -> one empty chunk; single-token doc -> itself
    assert by_doc[2][0]["chunk_text"] == "" and by_doc[2][0]["n_chunk_tokens"] == 0
    assert by_doc[3][0]["chunk_text"] == "solo" and by_doc[3][0]["n_chunk_tokens"] == 1


def test_chunk_documents_rejects_bad_overlap(spark):
    from hudi_delete_view_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_tokens=4, overlap=4)


def test_pii_redaction_order_and_counts(spark):
    from hudi_delete_view_spark.operators.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.org or call 555-123-4567, see https://x.io/p?q=1 end")],
        "id long, text string",
    )
    counts = pii_counts("text")
    row = df.select(
        redact_pii("text").alias("red"),
        counts["email"].alias("e"), counts["url"].alias("u"), counts["phone"].alias("p"),
    ).collect()[0]
    assert row["e"] == 1 and row["u"] == 1 and row["p"] == 1
    assert row["red"] == "mail <EMAIL> or call <PHONE>, see <URL> end"


def test_quality_filter_verdict_is_and_of_rules(spark, sf_dir):
    import os
    from hudi_delete_view_spark.operators.text import quality_filter_flags

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = quality_filter_flags(docs, "text")
    rules = [
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_stopwords", "r_blacklist", "r_repetition",
    ]
    verdict = F.col(rules[0])
    for r in rules[1:]:
        verdict = verdict & F.col(r)
    bad = out.filter(F.col("qf_pass") != verdict)
    assert bad.count() == 0
    # each band rule actually fires somewhere on the corpus (non-trivial
    # thresholds) and the cascade keeps a non-trivial fraction
    n = docs.count()
    n_pass = out.filter("qf_pass").count()
    assert 0 < n_pass < n
    assert out.filter(~F.col("r_word_count")).count() > 0


def test_quality_filter_blacklist_and_shape(spark):
    from hudi_delete_view_spark.operators.text import quality_filter_flags

    df = spark.createDataFrame(
        [(1, "lorem ipsum " + "the quick brown fox jumps over the lazy dog " * 4)],
        ["doc_id", "text"],
    )
    row = quality_filter_flags(df, "text").collect()[0]
    assert row["r_blacklist"] is False and row["qf_pass"] is False


def test_wav_features_32bit_no_overflow(spark):
    """32-bit PCM at full scale: sum-of-squares exceeds int64 after ~2
    samples; the integer-exact RMS path must accumulate in Python ints and
    produce the true finite value, never a wrapped/NaN one."""
    import math
    import struct

    from hudi_delete_view_spark.operators.multimodal import parse_wav, _wav_features

    full = 2**31 - 1
    samples = [full, -full, full, -full, full, -full, 0, full] * 50
    data = struct.pack(f"<{len(samples)}i", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body

    meta = parse_wav(wav)
    assert meta is not None and meta["bit_depth"] == 32
    feats = _wav_features(meta)
    assert all(math.isfinite(f) for f in feats), feats
    # exact: 350 of 400 samples at |full| -> rms = sqrt(350/400)
    assert feats[1] == pytest.approx(math.sqrt(350 / 400), abs=1e-12)
    assert feats[7] == float(full)


def test_quality_filter_empty_blacklist(spark, monkeypatch):
    """QF_BLACKLIST is a documented tunable: emptying it must yield
    r_blacklist = true for every row, not a TypeError on ~None."""
    from hudi_delete_view_spark.operators import text as text_mod

    monkeypatch.setattr(text_mod, "QF_BLACKLIST", [])
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 4)],
        ["doc_id", "text"],
    )
    row = text_mod.quality_filter_flags(df, "text").collect()[0]
    assert row["r_blacklist"] is True


def test_quality_filter_repetition_rule(spark):
    """The Gopher repetition rule: a phrase-looping spam page fails on
    duplicate-3-gram fraction; clean prose passes with ratio ~0; docs
    under 3 tokens get ratio 0.0 (empty-gram guard), not an error."""
    from hudi_delete_view_spark.operators.text import quality_filter_flags

    spam = "buy cheap pills now " * 30  # 4 tokens looping -> dup3 ~ 0.97
    prose = (
        "the quick brown fox jumps over a lazy dog while seven other "
        "animals watch from their burrows and consider whether any of "
        "them should attempt something similar before winter arrives"
    )
    rows = [(1, spam), (2, prose), (3, "too short")]
    out = {r["doc_id"]: r for r in quality_filter_flags(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text").collect()}
    assert out[1]["r_repetition"] is False and out[1]["qf_dup3_ratio"] > 0.9
    assert out[2]["r_repetition"] is True
    assert out[3]["qf_dup3_ratio"] == 0.0 and out[3]["r_repetition"] is True
    assert out[1]["qf_pass"] is False


def test_ngram_lm_cross_entropy_hand_computed(spark):
    """Two-doc corpus, hand-computed interpolated bigram probabilities:
    'a b a b', 'a c', and the unscored single-token 'x'. Unigrams:
    a=3, b=2, c=1, x=1 (N=7, V=4); bigrams: (a,b)=2, (b,a)=1,
    (a,c)=1. Checks exact micro-nat sums and the repeated-bigram
    case."""
    import math

    from hudi_delete_view_spark.operators.text import ngram_lm_cross_entropy

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "x")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["xent_micro"])
           for r in ngram_lm_cross_entropy(docs).collect()}

    def p(c12, c1, c2):
        return 0.7 * c12 / c1 + 0.3 * (c2 + 1) / (7 + 4)

    def xm(c12, c1, c2):
        return round(-math.log(p(c12, c1, c2)) * 1_000_000)

    # doc 1 bigrams: (a,b) x2, (b,a) x1
    want1 = 2 * xm(2, 3, 2) + xm(1, 2, 3)  # c(a)=3, c(b)=2
    # doc 2: (a,c) x1
    want2 = xm(1, 3, 1)
    assert got[1] == (3, want1)
    assert got[2] == (1, want2)
    assert 3 not in got  # single-token doc carries no bigram
