"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns plus a typed metadata struct —
the lakehouse pattern for training-data pipelines: keep bytes in
parquet, push decode/feature work to Arrow-batched Python only where
built-ins cannot express it.

The Spark-side plumbing here (schemas, partition-preserving
``mapInPandas``, batch shapes, UDF signatures) is real and tested; the
codec step itself is STUBBED because this environment has no
image/audio libraries: ``decode_media`` raises ``NotImplementedError``
unless ``fake=True``, in which case a clearly-marked deterministic
fake (byte-histogram features, byte-slice "frames") stands in so the
downstream plan shape can be exercised end-to-end.

Scale notes (100 TB of media): mapInPandas streams Arrow batches —
no per-row Python, no driver collect; partition count = parallelism,
so repartition by a size-balanced key before heavy decode;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
(set lower for large blobs).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as sqltypes

MEDIA_SCHEMA = sqltypes.StructType(
    [
        sqltypes.StructField("media_id", sqltypes.LongType()),
        sqltypes.StructField("content", sqltypes.BinaryType()),
        sqltypes.StructField(
            "meta",
            sqltypes.StructType(
                [
                    sqltypes.StructField("format", sqltypes.StringType()),
                    sqltypes.StructField("n_bytes", sqltypes.LongType()),
                    sqltypes.StructField("source", sqltypes.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = sqltypes.StructType(
    [
        sqltypes.StructField("media_id", sqltypes.LongType()),
        sqltypes.StructField("format", sqltypes.StringType()),
        sqltypes.StructField("n_bytes", sqltypes.LongType()),
        sqltypes.StructField(
            "features", sqltypes.ArrayType(sqltypes.DoubleType())
        ),
    ]
)

FRAME_SCHEMA = sqltypes.StructType(
    [
        sqltypes.StructField("media_id", sqltypes.LongType()),
        sqltypes.StructField("frame_idx", sqltypes.LongType()),
        sqltypes.StructField("frame_bytes", sqltypes.BinaryType()),
    ]
)


def text_as_media(df: DataFrame, id_col: str, text_col: str, source: str) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from a text table — the test fixture
    path (real pipelines ingest blobs via ``spark.read.format('binaryFile')``)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.when(F.length(content) % 2 == 0, "png").otherwise("jpg").alias("format"),
            F.length(content).cast("long").alias("n_bytes"),
            F.lit(source).alias("source"),
        ).alias("meta"),
    )


def _fake_features(content: bytes, n_bins: int = 16) -> list[float]:
    """DETERMINISTIC FAKE decode: normalized byte histogram.  Stands in
    for a real image decode + embedding; see module docstring."""
    if not content:
        return [0.0] * n_bins
    hist = [0] * n_bins
    for b in content:
        hist[b % n_bins] += 1
    total = float(len(content))
    return [h / total for h in hist]


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize media blobs via partition-preserving
    ``mapInPandas`` (Arrow batches in, Arrow batches out — no per-row
    Python overhead, no shuffle).

    With ``fake=False`` this raises at execution time: the real codec
    (PIL/ffmpeg/torchaudio) is not installed in this environment.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True for the deterministic stand-in"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": [
                        _fake_features(bytes(c)) for c in pdf["content"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """Video frame sampling as a 1->N ``mapInPandas`` (each blob yields
    ``n_frames`` rows).  FAKE mode slices the byte stream into equal
    chunks — the real path would seek keyframes via a codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs not available; pass fake=True"
                )
            out: dict[str, list[Any]] = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                step = max(len(blob) // n_frames, 1)
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(blob[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Image resize as partition-preserving ``mapInPandas``: content in,
    resized content + updated metadata out.  FAKE mode deterministically
    truncates/pads the byte stream to the target pixel budget (w*h
    bytes) — stands in for a real decode-resize-encode round trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs not available; pass fake=True"
                )
            out = []
            for c in pdf["content"]:
                blob = bytes(c)
                resized = blob[:budget].ljust(budget, b"\x00")
                out.append(resized)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "meta": [
                        {"format": m["format"], "n_bytes": len(r), "source": m["source"]}
                        for m, r in zip(pdf["meta"], out)
                    ],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def content_digest(media: DataFrame) -> DataFrame:
    """Exact-dup digest over blobs — built-in ``sha2`` on the binary
    column (JVM-side; no Python).  The multimodal analog of
    ``dedup.dedup_exact_content``."""
    return media.select(
        "media_id",
        F.sha2(F.col("content"), 256).alias("sha256"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


def python_digest(content: bytes) -> str:
    """Reference digest for tests (must equal F.sha2(content, 256))."""
    return hashlib.sha256(content).hexdigest()
