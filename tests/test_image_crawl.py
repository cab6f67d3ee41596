"""Image graft end-to-end: the crawl carries image payloads (bytes, fmt,
dims, phash from the corpus fetch) into the pages table, and every crawled
image satisfies the input_hint per-row invariants (decode dims == (w,h),
phash of decoded pixels, PSNR >= 40 dB for lossy round-trips) plus
byte-exact caption equality vs the page HTML's figcaption."""

from pyspark.sql import functions as F

from crawler_to_md_spark.crawl.corpus import synth_corpus, synth_corpus_rows
from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine
from crawler_to_md_spark.operators.multimodal import image_features, verify_invariants


def test_crawled_images_satisfy_invariants(spark, tmp_path):
    corpus = synth_corpus(spark, n_pages=60, n_hosts=3, branching=3, seed=42)
    eng = CrawlEngine(spark, str(tmp_path / "s"), CrawlConfig(use_bloom=False))
    eng.run(corpus, single_url="https://host0.example/p/0")
    pages = eng.pages_df()

    with_images = pages.filter(F.col("bytes").isNotNull()).select(
        "url", "image_id", "bytes", "w", "h", "fmt", "phash",
        "caption", "page_caption", "page_image_id",
    ).persist()
    n = with_images.count()
    assert n > 5, "fixture must carry image payloads through the crawl"

    res = verify_invariants(with_images).collect()
    assert len(res) == n
    for r in res:
        assert r["dims_ok"] and r["fmt_ok"] and r["phash_ok"] and r["psnr_ok"], r

    # caption extracted from HTML == corpus ground-truth caption, byte-exact
    mism = with_images.filter(
        F.col("page_caption") != F.col("caption")
    ).count()
    assert mism == 0
    # the <img src> id extracted from HTML matches the payload id
    mism_id = with_images.filter(
        F.col("page_image_id") != F.col("image_id")
    ).count()
    assert mism_id == 0
    with_images.unpersist()


def test_image_features_match_corpus_metadata(spark, tmp_path):
    rows = [r for r in synth_corpus_rows(60, 3, 3, 42) if r["bytes"] is not None]
    corpus = synth_corpus(spark, n_pages=60, n_hosts=3, branching=3, seed=42)
    feats = {
        r["image_id"]: r
        for r in image_features(
            corpus.filter(F.col("bytes").isNotNull())
        ).collect()
    }
    assert len(feats) == len(rows)
    for src in rows:
        f = feats[src["image_id"]]
        assert (f["w"], f["h"], f["fmt"]) == (src["w"], src["h"], src["fmt"])
        assert f["phash"] == src["phash"]
