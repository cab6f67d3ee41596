"""Deterministic image codec + perceptual hashing (Arrow UDFs).

The graft pivots the reference's HTML->Markdown payload to image+caption
pairs (BASELINE.json input_hint). Real codec libraries (Pillow, libjpeg,
libwebp) are NOT installed in this sandbox, so the byte<->pixel codec here
is a deterministic stand-in with the same *shape* and the same invariants:

- ``fmt='png'``  -> lossless: zlib over raw RGB, decode == original exactly.
- ``fmt='jpeg'`` / ``'webp'`` -> lossy: uniform quantization (step 4) then
  zlib; worst-case per-channel error is 2, giving PSNR ~ 47-48 dB >= the
  40 dB invariant, which the tests verify with REAL PSNR math.

Everything data-plane is a vectorized pandas UDF over Arrow batches of
BinaryType (input_hint: no per-row Python in the engine; the codec itself
is numpy-vectorized per image). Swapping in a real codec in production
changes only ``encode_array`` / ``decode_bytes`` — the Spark plumbing
(schemas, UDF signatures, batch shapes) is identical.

Reference slot: this is where the reference converts fetched payloads
(scraper.py:222-232, HTML->Markdown via temp file + MarkItDown); here it is
in-memory decode + caption extraction, no temp files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"CMDS"
_FMT_CODES = {"png": 0, "jpeg": 1, "webp": 2}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}
_LOSSY_STEP = 4  # quantization step for lossy formats


# ---------------------------------------------------------------------------
# Pure numpy codec (used inside UDF batches and by the data generator)
# ---------------------------------------------------------------------------


def encode_array(arr: np.ndarray, fmt: str) -> bytes:
    """uint8 HxWx3 array -> deterministic encoded bytes."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 uint8 array")
    h, w = arr.shape[:2]
    code = _FMT_CODES[fmt]
    payload = arr if code == 0 else (arr // _LOSSY_STEP).astype(np.uint8)
    return (
        _MAGIC
        + struct.pack("<BHH", code, w, h)
        + zlib.compress(payload.tobytes(), level=6)
    )


def decode_bytes(data: bytes) -> tuple[np.ndarray, str]:
    """Encoded bytes -> (uint8 HxWx3 array, fmt name)."""
    if data[:4] != _MAGIC:
        raise ValueError("bad magic")
    code, w, h = struct.unpack("<BHH", data[4:9])
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
    if code != 0:
        # dequantize to bin midpoints; max abs error = _LOSSY_STEP//2
        raw = np.clip(
            raw.astype(np.int32) * _LOSSY_STEP + _LOSSY_STEP // 2, 0, 255
        ).astype(np.uint8)
    return raw, _FMT_NAMES[code]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def average_phash(arr: np.ndarray) -> int:
    """64-bit perceptual average-hash: grayscale -> 8x8 block means ->
    bit per cell (mean-of-means threshold). Deterministic, numpy-only."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # fold to signed int64 range for Spark LongType
    return val - (1 << 64) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# Arrow UDFs (batch-vectorized plumbing over BinaryType columns)
# ---------------------------------------------------------------------------

_DECODE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("mean_lum", T.DoubleType()),
    ]
)


@F.pandas_udf(_DECODE_INFO_SCHEMA)
def decode_info_udf(data: pd.Series) -> pd.DataFrame:
    """Decode each image in the Arrow batch; emit dims/fmt/mean luminance."""
    ws, hs, fmts, lums = [], [], [], []
    for buf in data:
        if buf is None:
            ws.append(None), hs.append(None), fmts.append(None), lums.append(None)
            continue
        arr, fmt = decode_bytes(bytes(buf))
        ws.append(arr.shape[1])
        hs.append(arr.shape[0])
        fmts.append(fmt)
        lums.append(float(arr.astype(np.float64).mean()))
    return pd.DataFrame({"w": ws, "h": hs, "fmt": fmts, "mean_lum": lums})


@F.pandas_udf(T.LongType())
def phash_udf(data: pd.Series) -> pd.Series:
    """Perceptual hash per image in the batch."""
    return pd.Series(
        [average_phash(decode_bytes(bytes(b))[0]) if b is not None else None
         for b in data],
        dtype="object",
    )


@F.pandas_udf(T.DoubleType())
def psnr_vs_roundtrip_udf(data: pd.Series, fmt: pd.Series) -> pd.Series:
    """PSNR of decode(bytes) against a re-encode/decode round-trip — the
    per-row invariant gate (>= 40 dB lossy, inf lossless)."""
    out = []
    for buf, f in zip(data, fmt):
        if buf is None:
            out.append(None)
            continue
        arr, _ = decode_bytes(bytes(buf))
        rt, _ = decode_bytes(encode_array(arr, f))
        v = psnr(arr, rt)
        out.append(1e9 if v == float("inf") else v)
    return pd.Series(out, dtype="float64")


def hamming64(a, b):
    """Column expr: hamming distance between two int64 phashes (JVM-side)."""
    return F.bit_count(a.bitwiseXOR(b))
