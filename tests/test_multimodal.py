import numpy as np
from pyspark.sql import functions as F

from crawler_to_md_spark.crawl.corpus import synth_images_table
from crawler_to_md_spark.functions.imagecodec import decode_bytes
from crawler_to_md_spark.operators.multimodal import (
    image_features,
    resize_images,
    verify_invariants,
)


def test_image_features(spark):
    images = synth_images_table(spark, n_images=12)
    feats = image_features(images).collect()
    assert len(feats) == 12
    by_id = {r["image_id"]: r for r in feats}
    src = {r["image_id"]: r for r in images.collect()}
    for iid, r in by_id.items():
        assert r["w"] == src[iid]["w"] and r["h"] == src[iid]["h"]
        assert r["phash"] == src[iid]["phash"]
        assert 0 <= r["mean_r"] <= 255


def test_verify_invariants_all_pass(spark):
    images = synth_images_table(spark, n_images=15)
    res = verify_invariants(images).collect()
    assert len(res) == 15
    for r in res:
        assert r["dims_ok"] and r["fmt_ok"] and r["phash_ok"] and r["psnr_ok"], r
        assert r["psnr_db"] >= 40.0


def test_resize(spark):
    images = synth_images_table(spark, n_images=6)
    out = resize_images(images, 16, 16).collect()
    assert len(out) == 6
    for r in out:
        arr, fmt = decode_bytes(bytes(r["bytes"]))
        assert arr.shape == (16, 16, 3) and fmt == "png"


def test_frame_sample(spark):
    from crawler_to_md_spark.operators.multimodal import frame_sample

    frames = [bytes([i]) for i in range(7)]
    df = spark.createDataFrame(
        [("v1", frames)], "video_id string, frames array<binary>"
    )
    out = frame_sample(df, every_n=2).collect()
    assert [bytes(r["bytes"])[0] for r in out] == [0, 2, 4, 6]
    # frame_idx keeps the ORIGINAL temporal position, not the sampled index
    assert [r["frame_idx"] for r in out] == [0, 2, 4, 6]


def test_image_fixture_in_sync_with_pipeline(spark):
    """The pinned invariant/feature literals the DuckDB image oracles
    select (_image_fixture.py) must equal what the REAL Spark queries
    compute from synthesized bytes inside mapInPandas — otherwise the
    driver value check silently degrades into literals-vs-literals.
    Regenerate with tools/gen_image_literals.py on intentional codec or
    synthesizer changes."""
    from crawler_to_md_spark._image_fixture import (
        FEATURE_ROWS,
        INVARIANT_ROWS,
    )
    from crawler_to_md_spark.queries import (
        image_feature_extract,
        image_invariants,
    )

    inv = sorted(tuple(r) for r in image_invariants(spark, None).collect())
    assert inv == sorted(INVARIANT_ROWS)
    feat = sorted(tuple(r) for r in
                  image_feature_extract(spark, None).collect())
    assert feat == sorted(FEATURE_ROWS)
