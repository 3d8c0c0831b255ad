"""Multimodal plumbing tests: schemas, mapInPandas batch shapes,
1->N frame fan-out, stub gating, digest parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
