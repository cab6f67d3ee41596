import shutil

from crawler_to_md_spark.crawl.corpus import synth_corpus
from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine
from crawler_to_md_spark.streaming import (
    crawl_stream,
    run_stream_to_memory,
    stream_events_from_dir,
    windowed_event_counts,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_windowed_stream_matches_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shutil.copy(src, in_dir / "events.parquet")

    stream = stream_events_from_dir(spark, str(in_dir), EVENTS_SCHEMA)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    run_stream_to_memory(agg, "win_counts", str(tmp_path / "ckpt"))
    got = {
        (r["window_start_epoch"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    batch = windowed_event_counts(spark.read.parquet(src))
    want = {
        (r["window_start_epoch"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_crawl_stream_wave_driver(spark, tmp_path):
    corpus = synth_corpus(spark, n_pages=40, n_hosts=3, branching=3, seed=42)
    eng = CrawlEngine(spark, str(tmp_path / "s"), CrawlConfig(use_bloom=False))
    eng.seed(single_url="https://host0.example/p/0")
    metrics = crawl_stream(eng, corpus)
    assert metrics[-1]["done"]

    # identical result to the plain driver loop
    eng2 = CrawlEngine(spark, str(tmp_path / "d"), CrawlConfig(use_bloom=False))
    eng2.run(corpus, single_url="https://host0.example/p/0")
    a = [(r["url"], r["visited"]) for r in eng.links_state().collect()]
    b = [(r["url"], r["visited"]) for r in eng2.links_state().collect()]
    assert a == b
