"""Pure-Python media codecs for the multimodal operators.

This environment has no PIL/ffmpeg/torchaudio, but two ubiquitous
container formats are simple enough to parse with ``struct`` + numpy
alone, making the ``fake=False`` path of the multimodal operators REAL
for them:

- BMP, 24-bit uncompressed BI_RGB (the standard Windows bitmap):
  full decode to an (h, w, 3) RGB array and re-encode, which is enough
  for real resize (nearest-neighbor) and real pixel features.
- WAV, PCM 16-bit (RIFF/WAVE): full decode to an (n, channels) int16
  array and re-encode, enough for real audio features and real
  segment sampling (each segment re-wrapped as a standalone WAV).

Anything else (PNG/JPEG entropy coding, video codecs) genuinely needs
external libraries and stays behind ``NotImplementedError``.

Everything here runs inside Arrow-batched ``mapInPandas`` workers —
plain numpy per blob, no Spark imports, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ BMP

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # BGR byte order, bottom-up row order — the BMP on-disk layout
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    header = _BMP_FILE_HEADER.pack(b"BM", offset + len(data), 0, 0, offset)
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(blob: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array."""
    if len(blob) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("BMP: truncated header")
    magic, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(blob, 0)
    if magic != b"BM":
        raise ValueError("BMP: bad magic")
    (
        info_size, w, h, _planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = _BMP_INFO_HEADER.unpack_from(blob, _BMP_FILE_HEADER.size)
    if info_size < _BMP_INFO_HEADER.size:
        raise ValueError("BMP: unsupported header variant")
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP: only 24-bit BI_RGB supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = offset + stride * h
    if len(blob) < need:
        raise ValueError("BMP: truncated pixel data")
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=offset)
    px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return px[::-1] if bottom_up else px


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3)."""
    h, w = px.shape[:2]
    yi = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return px[yi][:, xi]


def bmp_features(blob: bytes, n_bins: int = 8) -> list[float]:
    """Real pixel features: [width, height, mean R, mean G, mean B,
    luma std, luma histogram (n_bins, normalized)]."""
    px = decode_bmp(blob).astype(np.float64)
    h, w = px.shape[:2]
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=n_bins, range=(0.0, 255.0))
    hist = hist / max(luma.size, 1)
    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    return (
        [float(w), float(h)]
        + [float(m) for m in means]
        + [float(luma.std() / 255.0)]
        + [float(v) for v in hist]
    )


# ------------------------------------------------------------------ WAV

_RIFF = struct.Struct("<4sI4s")
_CHUNK = struct.Struct("<4sI")
_FMT_PCM = struct.Struct("<HHIIHH")


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a PCM16 WAV."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    data = s.tobytes()  # interleaved little-endian, the PCM layout
    block_align = channels * 2
    fmt = _FMT_PCM.pack(
        1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        _CHUNK.pack(b"fmt ", len(fmt)) + fmt + _CHUNK.pack(b"data", len(data)) + data
    )
    return _RIFF.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV to ((n, channels) int16 array, sample_rate)."""
    if len(blob) < _RIFF.size:
        raise ValueError("WAV: truncated header")
    magic, _, wave = _RIFF.unpack_from(blob, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError("WAV: bad magic")
    pos, fmt, data = _RIFF.size, None, None
    while pos + _CHUNK.size <= len(blob):
        cid, size = _CHUNK.unpack_from(blob, pos)
        pos += _CHUNK.size
        if cid == b"fmt ":
            if fmt is not None:
                raise ValueError("WAV: duplicate fmt chunk")
            fmt = _FMT_PCM.unpack_from(blob, pos)
        elif cid == b"data":
            if data is not None:
                raise ValueError("WAV: duplicate data chunk")
            if pos + size > len(blob):
                raise ValueError("WAV: truncated data chunk")
            data = blob[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"WAV: only PCM16 supported (fmt={audio_format}, bits={bits})")
    s = np.frombuffer(data, dtype="<i2")
    n = len(s) // channels
    return s[: n * channels].reshape(n, channels), sample_rate


def wav_features(blob: bytes) -> list[float]:
    """Real audio features: [n_samples, channels, sample_rate,
    duration_sec, rms (normalized), zero-crossing rate, peak]."""
    s, rate = decode_wav(blob)
    mono = s.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n - 1, 1)
    return [
        float(n),
        float(s.shape[1]),
        float(rate),
        n / float(rate),
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        zc,
        float(np.abs(mono).max()) if n else 0.0,
    ]


def wav_segments(blob: bytes, n_segments: int) -> list[bytes]:
    """Split a WAV into ``n_segments`` standalone WAV blobs of equal
    sample count (the audio analog of video frame sampling)."""
    s, rate = decode_wav(blob)
    n = len(s)
    step = max(n // n_segments, 1)
    out = []
    for i in range(n_segments):
        seg = s[i * step : (i + 1) * step] if i < n_segments - 1 else s[(n_segments - 1) * step :]
        out.append(encode_wav(seg, rate))
    return out


def sniff_format(blob: bytes) -> str | None:
    """Identify a blob by magic bytes; None when unrecognized."""
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    return None
