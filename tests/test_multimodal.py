"""Multimodal plumbing tests: schemas, mapInPandas batch shapes,
1->N frame fan-out, stub gating, digest parity, and the REAL
BMP/WAV codec paths (pure-Python codecs, no external libraries)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.operators import codecs
from delta_lake_gcp_implementation_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    return mm.text_as_media(docs, "doc_id", "text", source="testdocs")


def _same_types(a, b) -> bool:
    return [(f.name, f.dataType.simpleString()) for f in a.fields] == [
        (f.name, f.dataType.simpleString()) for f in b.fields
    ]


def test_media_schema(media):
    assert _same_types(media.schema, mm.MEDIA_SCHEMA)
    row = media.first()
    assert isinstance(row.content, bytearray | bytes)
    assert row.meta.n_bytes == len(row.content)
    assert row.meta.format in ("png", "jpg")


def test_decode_fake_features(media):
    out = mm.decode_media(media, fake=True)
    assert out.schema == mm.FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram


def test_decode_without_fake_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        mm.decode_media(media, fake=False).collect()


def test_frame_sampling_fanout(media):
    out = mm.sample_frames(media, n_frames=4, fake=True)
    assert out.schema == mm.FRAME_SCHEMA
    assert out.count() == 20 * 4
    per = out.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)


def test_decode_preserves_partitioning(spark, media):
    reparted = media.repartition(5)
    out = mm.decode_media(reparted, fake=True)
    # mapInPandas is partition-preserving: no shuffle added
    assert out.rdd.getNumPartitions() == 5


def test_resize_normalizes_byte_budget(media):
    out = mm.resize_media(media, width=8, height=8, fake=True)
    assert _same_types(out.schema, mm.MEDIA_SCHEMA)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.content) == 64
        assert r.meta.n_bytes == 64


def test_content_digest_matches_python(media):
    out = mm.content_digest(media).collect()
    raw = {r.media_id: bytes(r.content) for r in media.collect()}
    for r in out:
        assert r.sha256 == mm.python_digest(raw[r.media_id])


# ------------------------------------------------- real codec paths


def _gradient_bmp(w: int, h: int) -> bytes:
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)), x * 0 + 7],
        axis=2,
    ).astype(np.uint8)
    return codecs.encode_bmp(px)


def _tone_wav(n: int = 8000, rate: int = 16000) -> bytes:
    t = np.arange(n) / rate
    samples = (np.sin(2 * np.pi * 440.0 * t) * 20000).astype(np.int16)
    return codecs.encode_wav(samples, rate)


@pytest.fixture(scope="module")
def real_media(spark):
    rows = [
        (1, _gradient_bmp(10, 6), ("bmp", None, "gen")),
        (2, _gradient_bmp(33, 17), ("bmp", None, "gen")),  # stride padding case
        (3, _tone_wav(), ("wav", None, "gen")),
    ]
    rows = [
        (mid, blob, (fmt, len(blob), src))
        for mid, blob, (fmt, _, src) in rows
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_bmp_roundtrip_pure_python():
    px = np.random.default_rng(3).integers(0, 256, (17, 33, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)
    assert codecs.sniff_format(codecs.encode_bmp(px)) == "bmp"


def test_wav_roundtrip_pure_python():
    s = np.random.default_rng(4).integers(-32768, 32767, (1000, 2), dtype=np.int16)
    got, rate = codecs.decode_wav(codecs.encode_wav(s, 22050))
    assert rate == 22050
    assert np.array_equal(got, s)
    assert codecs.sniff_format(codecs.encode_wav(s, 22050)) == "wav"


def test_wav_rejects_malformed_chunks():
    s = np.random.default_rng(5).integers(-32768, 32767, (64, 1), dtype=np.int16)
    blob = codecs.encode_wav(s, 8000)
    # declared data size larger than the blob: must raise, not
    # silently clamp-truncate the samples
    import struct

    data_off = blob.index(b"data")
    hacked = (
        blob[: data_off + 4]
        + struct.pack("<I", len(blob) * 2)
        + blob[data_off + 8 :]
    )
    with pytest.raises(ValueError, match="truncated data"):
        codecs.decode_wav(hacked)
    # duplicated data chunk: last-wins is silent corruption — reject
    dup = blob + blob[data_off:]
    with pytest.raises(ValueError, match="duplicate data"):
        codecs.decode_wav(dup)


def test_real_decode_features(real_media):
    rows = {r.media_id: r for r in mm.decode_media(real_media, fake=False).collect()}
    # BMP: [w, h, meanR, meanG, meanB, luma_std, hist*8]
    f1 = rows[1].features
    assert f1[0] == 10.0 and f1[1] == 6.0
    assert abs(f1[4] - 7 / 255.0) < 1e-12  # constant blue channel
    assert abs(sum(f1[6:]) - 1.0) < 1e-9
    # WAV: [n, channels, rate, duration, rms, zcr, peak]
    f3 = rows[3].features
    assert f3[0] == 8000.0 and f3[1] == 1.0 and f3[2] == 16000.0
    assert abs(f3[3] - 0.5) < 1e-12
    # 440 Hz sine: rms ~ amp/sqrt(2), zcr ~ 2*440/16000
    assert abs(f3[4] - (20000 / 32768.0) / np.sqrt(2)) < 1e-3
    assert abs(f3[5] - 2 * 440 / 16000.0) < 5e-3


def test_real_resize_bmp(real_media):
    bmps = real_media.filter(F.col("meta.format") == "bmp")
    out = mm.resize_media(bmps, width=8, height=8, fake=False).collect()
    assert len(out) == 2
    for r in out:
        px = codecs.decode_bmp(bytes(r.content))
        assert px.shape == (8, 8, 3)
        assert r.meta.n_bytes == len(r.content)
    # nearest-neighbor parity with numpy reference
    src = codecs.decode_bmp(_gradient_bmp(10, 6))
    ref = codecs.resize_nearest(src, 8, 8)
    got = codecs.decode_bmp(bytes(next(r.content for r in out if r.media_id == 1)))
    assert np.array_equal(got, ref)


def test_real_wav_segments(real_media):
    wavs = real_media.filter(F.col("meta.format") == "wav")
    out = mm.sample_frames(wavs, n_frames=4, fake=False).collect()
    assert len(out) == 4
    total = 0
    for r in sorted(out, key=lambda r: r.frame_idx):
        seg, rate = codecs.decode_wav(bytes(r.frame_bytes))
        assert rate == 16000
        total += len(seg)
    assert total == 8000  # segments partition the original samples


def test_real_decode_unknown_format_raises(spark):
    blob = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    df = spark.createDataFrame(
        [(9, blob, ("png", len(blob), "gen"))], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="no codec|NotImplemented"):
        mm.decode_media(df, fake=False).collect()


def test_media_frames_index_tiles_and_digests(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import textops as X

    rows = X.q_media_frames(spark, sf_dir).collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    import hashlib

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for mid, rs in by_media.items():
        assert sorted(r.frame_idx for r in rs) == [0, 1, 2, 3]
        blob = docs[mid].encode()
        step = max(len(blob) // 4, 1)
        for r in rs:
            frame = blob[r.frame_idx * step : (r.frame_idx + 1) * step]
            assert r.frame_len == len(frame)
            assert r.frame_md5 == hashlib.md5(frame).hexdigest()
