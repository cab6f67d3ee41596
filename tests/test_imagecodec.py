import numpy as np
from pyspark.sql import functions as F

from crawler_to_md_spark.functions.imagecodec import (
    average_phash,
    decode_bytes,
    decode_info_udf,
    encode_array,
    hamming64,
    phash_udf,
    psnr,
    psnr_vs_roundtrip_udf,
)


def _img(seed=0, w=48, h=32):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_lossless_roundtrip():
    a = _img(1)
    out, fmt = decode_bytes(encode_array(a, "png"))
    assert fmt == "png" and np.array_equal(out, a)


def test_lossy_psnr_invariant():
    # the input_hint per-row invariant: PSNR >= 40 dB for lossy formats
    for fmt in ("jpeg", "webp"):
        a = _img(2)
        out, _ = decode_bytes(encode_array(a, fmt))
        assert psnr(a, out) >= 40.0
        assert np.abs(out.astype(int) - a.astype(int)).max() <= 2


def test_phash_stability_and_sensitivity():
    a = _img(3)
    assert average_phash(a) == average_phash(a.copy())
    lossy, _ = decode_bytes(encode_array(a, "jpeg"))
    # quantization noise must not move the perceptual hash far
    d = bin(average_phash(a) ^ average_phash(lossy)).count("1")
    assert d <= 4
    b = _img(4)
    assert average_phash(a) != average_phash(b)


def test_udf_plumbing(spark):
    rows = []
    for i, fmt in enumerate(["png", "jpeg", "webp"]):
        arr = _img(i, w=32 + 16 * i, h=32)
        rows.append((f"im{i}", encode_array(arr, fmt), fmt, average_phash(arr)))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, phash long")
    out = (
        df.withColumn("info", decode_info_udf(F.col("bytes")))
        .withColumn("ph", phash_udf(F.col("bytes")))
        .withColumn("ps", psnr_vs_roundtrip_udf(F.col("bytes"), F.col("fmt")))
        .select("image_id", "info.w", "info.h", "info.fmt", "ph", "phash", "ps")
        .collect()
    )
    for i, r in enumerate(out):
        assert r["w"] == 32 + 16 * i and r["h"] == 32
        assert r["ps"] >= 40.0
        # decoded-pixel phash: exact for png; quantization-stable for lossy
        if r["fmt"] == "png":
            assert r["ph"] == r["phash"]


def test_hamming64_expr(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b"))).collect()[0][0] == 2
