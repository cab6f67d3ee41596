"""Multimodal column processing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with typed metadata columns
(the input_hint table shape). All processing is ``mapInPandas`` over Arrow
batches — the batch shape, schema contract, and partitioning here are the
production plumbing; only the codec inside is the sandbox's deterministic
stand-in (functions/imagecodec.py — real codecs aren't installed; swap
``decode_bytes``/``encode_array`` for Pillow/libjpeg calls and nothing
else changes).

Scale notes: binary payloads are the widest columns in the table — these
operators are designed so bytes NEVER enter a shuffle: decode/resize/
feature-extract are narrow per-partition maps; downstream joins re-attach
by image_id. ``spark.sql.files.maxPartitionBytes`` governs batch memory;
decode output (w*h*3 bytes/row) dominates, so partitions should target
~128 MB of DECODED size at production image dims.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.imagecodec import average_phash, decode_bytes, encode_array, psnr

_FEATURE_SCHEMA = (
    "image_id string, w int, h int, fmt string, phash long, "
    "mean_r double, mean_g double, mean_b double, contrast double"
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract: (image_id, dims, fmt, phash, channel
    means, contrast). One Arrow pass, no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                if buf is None:
                    continue
                arr, fmt = decode_bytes(bytes(buf))
                flat = arr.reshape(-1, 3).astype(np.float64)
                rows.append(
                    dict(
                        image_id=image_id, w=arr.shape[1], h=arr.shape[0],
                        fmt=fmt, phash=average_phash(arr),
                        mean_r=flat[:, 0].mean(), mean_g=flat[:, 1].mean(),
                        mean_b=flat[:, 2].mean(), contrast=float(flat.std()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "fmt", "phash",
                         "mean_r", "mean_g", "mean_b", "contrast"],
            )

    return images.select("image_id", "bytes").mapInPandas(extract, _FEATURE_SCHEMA)


def _block_mean_resize(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Deterministic area-average resize via block means (numpy only)."""
    h, w = arr.shape[:2]
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    out = np.empty((th, tw, 3), dtype=np.float64)
    for i in range(th):
        for j in range(tw):
            out[i, j] = arr[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].reshape(-1, 3).mean(axis=0)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_images(images: DataFrame, target_w: int, target_h: int,
                  out_fmt: str = "png") -> DataFrame:
    """Resize every image to (target_w, target_h), re-encode.
    Schema: (image_id, bytes, w, h, fmt)."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for image_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                if buf is None:
                    continue
                arr, _ = decode_bytes(bytes(buf))
                small = _block_mean_resize(arr, target_w, target_h)
                ids.append(image_id)
                blobs.append(encode_array(small, out_fmt))
            yield pd.DataFrame(
                {"image_id": ids, "bytes": blobs,
                 "w": [target_w] * len(ids), "h": [target_h] * len(ids),
                 "fmt": [out_fmt] * len(ids)}
            )

    return images.select("image_id", "bytes").mapInPandas(
        rz, "image_id string, bytes binary, w int, h int, fmt string"
    )


def verify_invariants(images: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Per-row invariant check vs the stored metadata (input_hint):
    decoded dims == (w, h); phash == stored phash; PSNR of a lossy
    re-encode round-trip >= min_psnr. Returns per-image pass/fail."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr, fmt = decode_bytes(bytes(r.bytes))
                rt, _ = decode_bytes(encode_array(arr, r.fmt))
                p = psnr(arr, rt)
                rows.append(
                    dict(
                        image_id=r.image_id,
                        dims_ok=(arr.shape[1] == r.w and arr.shape[0] == r.h),
                        fmt_ok=(fmt == r.fmt),
                        phash_ok=(average_phash(arr) == r.phash),
                        psnr_db=(1e9 if p == float("inf") else float(p)),
                        psnr_ok=bool(p >= min_psnr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "dims_ok", "fmt_ok",
                               "phash_ok", "psnr_db", "psnr_ok"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        check,
        "image_id string, dims_ok boolean, fmt_ok boolean, phash_ok boolean, "
        "psnr_db double, psnr_ok boolean",
    )


def frame_sample(video_like: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-shaped rows (video_id,
    frames: array<binary>): keep every n-th frame, explode to
    (video_id, frame_idx, bytes). Pure column ops — array ops are
    JVM-side; the decode of sampled frames then uses image_features.

    frame_idx is the ORIGINAL frame position (posexplode first, then
    filter on pos % n), not the index within the sampled subset — the
    temporal position the column name implies."""
    return (
        video_like.select(
            "video_id",
            F.posexplode(F.col("frames")).alias("frame_idx", "bytes"),
        )
        .filter((F.col("frame_idx") % every_n) == 0)
    )
