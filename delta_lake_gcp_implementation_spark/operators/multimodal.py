"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns plus a typed metadata struct —
the lakehouse pattern for training-data pipelines: keep bytes in
parquet, push decode/feature work to Arrow-batched Python only where
built-ins cannot express it.

The Spark-side plumbing here (schemas, partition-preserving
``mapInPandas``, batch shapes, UDF signatures) is real and tested.
The codec step is REAL for two formats that need no external library
(see :mod:`.codecs`): BMP 24-bit (full decode/encode/resize/pixel
features) and WAV PCM16 (full decode/encode/audio features/segment
sampling).  Formats whose decoding genuinely requires external
libraries (PNG/JPEG entropy coding, video codecs) raise
``NotImplementedError`` on the real path; ``fake=True`` substitutes a
clearly-marked deterministic stand-in (byte-histogram features,
byte-slice "frames") so downstream plan shape can be exercised with
any format.

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

from . import codecs

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


def _real_features(blob: bytes, fmt: str) -> list[float]:
    """Real decode dispatch: BMP pixels / WAV samples via the
    pure-Python codecs; anything else genuinely needs external
    libraries and raises."""
    if fmt == "bmp":
        return codecs.bmp_features(blob)
    if fmt == "wav":
        return codecs.wav_features(blob)
    raise NotImplementedError(
        f"no codec for format {fmt!r} in this environment (real path "
        f"supports bmp/wav); pass fake=True for the deterministic stand-in"
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize media blobs via partition-preserving
    ``mapInPandas`` (Arrow batches in, Arrow batches out — no per-row
    Python overhead, no shuffle).

    ``fake=False`` runs the REAL codec for BMP/WAV blobs (pure
    numpy, see :mod:`.codecs`) and raises for formats that need
    external libraries.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_features(bytes(c)) for c in pdf["content"]]
            else:
                feats = [
                    _real_features(bytes(c), m["format"])
                    for c, m in zip(pdf["content"], pdf["meta"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """Frame/segment sampling as a 1->N ``mapInPandas`` (each blob
    yields ``n_frames`` rows).

    Real path: WAV blobs are split into ``n_frames`` standalone WAV
    segments (equal sample count — the audio analog of frame
    sampling); video formats need a real codec and raise.  FAKE mode
    slices the raw byte stream into equal chunks for any format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                blob = bytes(content)
                if fake:
                    step = max(len(blob) // n_frames, 1)
                    frames = [
                        blob[i * step : (i + 1) * step] for i in range(n_frames)
                    ]
                elif meta["format"] == "wav":
                    frames = codecs.wav_segments(blob, n_frames)
                else:
                    raise NotImplementedError(
                        f"no frame sampler for format {meta['format']!r} "
                        f"(real path supports wav); pass fake=True"
                    )
                for i, fr in enumerate(frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(fr)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Image resize as partition-preserving ``mapInPandas``: content in,
    resized content + updated metadata out.

    Real path: BMP blobs go through a true decode -> nearest-neighbor
    resample -> re-encode round trip (pure numpy, see :mod:`.codecs`);
    other formats raise.  FAKE mode deterministically truncates/pads
    the byte stream to the target pixel budget (w*h bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = width * height
        for pdf in batches:
            out = []
            for c, m in zip(pdf["content"], pdf["meta"]):
                blob = bytes(c)
                if fake:
                    out.append(blob[:budget].ljust(budget, b"\x00"))
                elif m["format"] == "bmp":
                    px = codecs.decode_bmp(blob)
                    out.append(
                        codecs.encode_bmp(codecs.resize_nearest(px, width, height))
                    )
                else:
                    raise NotImplementedError(
                        f"no resize codec for format {m['format']!r} "
                        f"(real path supports bmp); pass fake=True"
                    )
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
