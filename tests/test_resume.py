"""Resume-from-checkpoint (SURVEY.md §5.2 item 3 / reference C6):
kill after wave k, restart, final state identical to an uninterrupted run.
Also crash-mid-wave recovery: tables rolled back to the last wave whose
commit MARKER landed, partial wave re-derived idempotently — including the
parallel-commit failure mode where visited is ahead of the marker, and
stores written by the previous engine version (no marker log)."""

import glob
import json
import os
import shutil

from crawler_to_md_spark.crawl.corpus import synth_corpus
from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine
from crawler_to_md_spark.tables import SnapshotTable


def _corpus(spark, n=60):
    return synth_corpus(spark, n_pages=n, n_hosts=3, branching=3, seed=42)


def _final_state(eng):
    links = [(r["url"], r["visited"]) for r in eng.links_state().collect()]
    pages = [(r["url"], r["content"]) for r in eng.pages_df().collect()]
    return links, pages


def test_resume_after_k_waves(spark, tmp_path):
    corpus = _corpus(spark)
    # uninterrupted run
    full = CrawlEngine(spark, str(tmp_path / "full"), CrawlConfig(use_bloom=False))
    full.run(corpus, single_url="https://host0.example/p/0")

    # interrupted: stop after 2 waves, then resume in a NEW engine instance
    part = CrawlEngine(
        spark, str(tmp_path / "part"),
        CrawlConfig(use_bloom=False, max_waves=2),
    )
    part.run(corpus, single_url="https://host0.example/p/0")
    resumed = CrawlEngine(spark, str(tmp_path / "part"), CrawlConfig(use_bloom=False))
    resumed.run(corpus, resume=True)

    assert _final_state(resumed) == _final_state(full)


def test_resume_with_bloom(spark, tmp_path):
    corpus = _corpus(spark, 40)
    cfg = dict(use_bloom=True, bloom_shards=4, bloom_bits_per_shard=1 << 14)
    full = CrawlEngine(spark, str(tmp_path / "full"), CrawlConfig(**cfg))
    full.run(corpus, single_url="https://host0.example/p/0")

    part = CrawlEngine(spark, str(tmp_path / "part"),
                       CrawlConfig(max_waves=1, **cfg))
    part.run(corpus, single_url="https://host0.example/p/0")
    resumed = CrawlEngine(spark, str(tmp_path / "part"), CrawlConfig(**cfg))
    resumed.run(corpus, resume=True)
    assert _final_state(resumed) == _final_state(full)


def test_crash_mid_wave_recovery(spark, tmp_path):
    """Simulate a crash between table commits: frontier/pages got wave k
    appends but visited didn't -> recover() must roll them back and replay
    wave k to the same final state."""
    corpus = _corpus(spark, 40)
    full = CrawlEngine(spark, str(tmp_path / "full"), CrawlConfig(use_bloom=False))
    full.run(corpus, single_url="https://host0.example/p/0")

    crash = CrawlEngine(spark, str(tmp_path / "crash"),
                        CrawlConfig(use_bloom=False, max_waves=1))
    crash.run(corpus, single_url="https://host0.example/p/0")

    # hand-craft the partial wave 2: append pages + frontier, but NOT visited
    eng2 = CrawlEngine(spark, str(tmp_path / "crash"),
                       CrawlConfig(use_bloom=False))
    pending = eng2.pending().limit(3).persist()
    eng2.pages.append(
        pending.selectExpr(
            "url_hash", "url", "host", "discovery_rank",
            "cast(null as string) as content",
            "map('title','junk') as metadata",
            "cast(null as string) as page_caption",
            "cast(null as string) as page_image_id",
            "cast(null as string) as image_id", "cast(null as binary) as bytes",
            "cast(null as int) as w", "cast(null as int) as h",
            "cast(null as string) as fmt", "cast(null as string) as caption",
            "cast(null as long) as phash", "cast(2 as int) as wave",
        ),
        {"wave": 2},
    )
    pending.unpersist()

    resumed = CrawlEngine(spark, str(tmp_path / "crash"),
                          CrawlConfig(use_bloom=False))
    resumed.run(corpus, resume=True)
    assert _final_state(resumed) == _final_state(full)


def test_metrics_lineage(spark, tmp_path):
    corpus = _corpus(spark, 40)
    eng = CrawlEngine(spark, str(tmp_path / "m"), CrawlConfig(use_bloom=False))
    waves = eng.run(corpus, single_url="https://host0.example/p/0")
    mdf = eng.metrics.read(spark).orderBy("wave").collect()
    assert [r["wave"] for r in mdf] == list(range(1, len(waves)))  # last wave empty
    assert all(r["seconds"] > 0 for r in mdf)
    total_pages = sum(r["pages"] for r in mdf)
    assert total_pages == eng.pages_df().count()


def test_crash_after_visited_before_marker(spark, tmp_path):
    """Parallel-commit failure mode: ALL of wave k's table appends landed
    (including visited) but the crash hit before the marker line — the
    wave is uncommitted and recovery must roll every table back, visited
    included, then replay to the same final state."""
    corpus = _corpus(spark, 40)
    full = CrawlEngine(spark, str(tmp_path / "full"), CrawlConfig(use_bloom=False))
    full.run(corpus, single_url="https://host0.example/p/0")

    crash = CrawlEngine(spark, str(tmp_path / "crash"),
                        CrawlConfig(use_bloom=False, max_waves=1))
    crash.run(corpus, single_url="https://host0.example/p/0")

    # hand-craft the partial wave 2: pages AND visited appends land, the
    # marker does not (the crash window unique to parallel commits)
    eng2 = CrawlEngine(spark, str(tmp_path / "crash"),
                       CrawlConfig(use_bloom=False))
    pending = eng2.pending().limit(3).persist()
    eng2.pages.append(
        pending.selectExpr(
            "url_hash", "url", "host", "discovery_rank",
            "cast(null as string) as content",
            "map('title','junk') as metadata",
            "cast(null as string) as page_caption",
            "cast(null as string) as page_image_id",
            "cast(null as string) as image_id", "cast(null as binary) as bytes",
            "cast(null as int) as w", "cast(null as int) as h",
            "cast(null as string) as fmt", "cast(null as string) as caption",
            "cast(null as long) as phash", "cast(2 as int) as wave",
        ),
        {"wave": 2},
    )
    eng2.visited.append(
        pending.selectExpr(
            "url_hash", "url", "cast(2 as int) as wave_visited",
            "'done' as status",
        ),
        {"wave": 2},
    )
    pending.unpersist()
    assert eng2.last_committed_wave() == 1  # marker, not visited, decides

    resumed = CrawlEngine(spark, str(tmp_path / "crash"),
                          CrawlConfig(use_bloom=False))
    resumed.run(corpus, resume=True)
    assert _final_state(resumed) == _final_state(full)


def test_resume_store_written_by_previous_version(spark, tmp_path):
    """Cross-version compatibility: a store written by the ROUND-2 engine
    (no commit-marker log; visited append as commit point) and checked in
    as a fixture must resume under the current code to the same final
    state as a fresh full crawl."""
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "store_r2")
    with open(os.path.join(fixture, "fixture_meta.json")) as f:
        meta = json.load(f)
    root = str(tmp_path / "store_r2")
    shutil.copytree(fixture, root)
    # relocate: manifests carry absolute datafile paths (as Iceberg
    # manifests carry absolute URIs); rewrite the generation root
    for mpath in glob.glob(os.path.join(root, "*", "_manifests", "*.json")):
        with open(mpath) as f:
            txt = f.read()
        with open(mpath, "w") as f:
            f.write(txt.replace(meta["root"], root))

    corpus = synth_corpus(spark, n_pages=meta["n_pages"],
                          n_hosts=meta["n_hosts"],
                          branching=meta["branching"], seed=meta["seed"])
    cfg = CrawlConfig(use_bloom=True, bloom_shards=4,
                      bloom_bits_per_shard=1 << 16)
    eng = CrawlEngine(spark, root, cfg)
    assert eng.last_committed_wave() == meta["max_waves"]  # legacy fallback
    eng.run(corpus, resume=True)

    full = CrawlEngine(spark, str(tmp_path / "full"), cfg)
    full.run(corpus, single_url="https://host0.example/p/0")
    assert _final_state(eng) == _final_state(full)
    # the resumed store is upgraded: the marker log now exists
    assert os.path.exists(os.path.join(root, "commits.jsonl"))


def test_resume_inserts_new_seeds(spark, tmp_path):
    """Reference parity: every run re-validates and INSERT-OR-IGNOREs the
    full seed list into the existing store (scraper.py:258-272) — URLs
    newly added to --urls-file on a re-run must be crawled."""
    corpus = _corpus(spark, 40)
    cfg = CrawlConfig(seed_list_mode=True, use_bloom=False)
    seeds_a = ["https://host0.example/p/0", "https://host1.example/p/1"]
    eng = CrawlEngine(spark, str(tmp_path / "s"), cfg)
    eng.run(corpus, seeds=seeds_a)

    seeds_b = seeds_a + ["https://host2.example/p/2"]
    resumed = CrawlEngine(spark, str(tmp_path / "s"), cfg)
    resumed.run(corpus, seeds=seeds_b, resume=True)
    links, pages = _final_state(resumed)
    assert ("https://host2.example/p/2", True) in links
    assert "https://host2.example/p/2" in [u for u, _ in pages]
    # idempotent: a third run with the same list crawls nothing new
    again = CrawlEngine(spark, str(tmp_path / "s"), cfg)
    again.run(corpus, seeds=seeds_b, resume=True)
    assert _final_state(again) == (links, pages)


def test_resume_store_written_by_round4_format(spark, tmp_path):
    """Forward pin of TODAY's store format (VERDICT r4 #7): a checked-in
    round-4 store — commits.jsonl marker log, visited committed BY
    REFERENCE (virtual manifest deltas), JVM-sketch bloom — must resume
    under the current code to the same final state as a fresh full crawl.
    Regenerate with tools/make_fixture_store_r4.py only from a revision
    that still writes this format."""
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "store_r4")
    with open(os.path.join(fixture, "fixture_meta.json")) as f:
        meta = json.load(f)
    root = str(tmp_path / "store_r4")
    shutil.copytree(fixture, root)
    for mpath in glob.glob(os.path.join(root, "*", "_manifests", "*.json")):
        with open(mpath) as f:
            txt = f.read()
        with open(mpath, "w") as f:
            f.write(txt.replace(meta["root"], root))

    # the fixture must actually exercise the round-4 artifacts
    assert os.path.exists(os.path.join(root, "commits.jsonl"))
    visited = SnapshotTable(os.path.join(root, "visited"))
    assert any("virtual" in m for m in visited.snapshots())
    with open(os.path.join(root, "bloom", "seen.npz"), "rb") as f:
        assert f.read(7) == b"JBLOOM1"

    corpus = synth_corpus(spark, n_pages=meta["n_pages"],
                          n_hosts=meta["n_hosts"],
                          branching=meta["branching"], seed=meta["seed"])
    cfg = CrawlConfig(use_bloom=True, bloom_shards=4,
                      bloom_bits_per_shard=1 << 16)
    eng = CrawlEngine(spark, root, cfg)
    assert eng.last_committed_wave() == meta["max_waves"]  # marker log
    eng.run(corpus, resume=True)

    full = CrawlEngine(spark, str(tmp_path / "full"), cfg)
    full.run(corpus, single_url="https://host0.example/p/0")
    assert _final_state(eng) == _final_state(full)


def test_resume_after_crash_in_lag_window(spark, tmp_path):
    """Round-5 lagged commits open a NEW crash window: the wave's pages/
    visited appends may have LANDED in table manifests while the marker
    has not — a process death there must roll the wave back (marker
    decides, not table state) and a resume must converge to the
    uninterrupted final state without duplicate pages."""
    from concurrent.futures import ThreadPoolExecutor

    corpus = _corpus(spark)
    full = CrawlEngine(spark, str(tmp_path / "full"),
                       CrawlConfig(use_bloom=False))
    full.run(corpus, single_url="https://host0.example/p/0")

    root = str(tmp_path / "crash")
    eng = CrawlEngine(spark, root, CrawlConfig(use_bloom=False))
    # emulate run()'s lag-enabled loop for two waves, then "crash" with
    # the lag outstanding: tables carry wave 2's pages/visited manifests
    # but its marker was never written
    eng._commit_pool = ThreadPoolExecutor(max_workers=5)
    eng._lag_enabled = True
    try:
        eng.seed(single_url="https://host0.example/p/0")
        m1 = eng.run_wave(1, corpus)
        m2 = eng.run_wave(2, corpus)
        assert not m1.get("done") and not m2.get("done")
        lag = eng._lag
        assert lag is not None and lag["wave"] == 2
        for fut in lag["futs"]:   # the appends complete (worst case:
            fut.result()          # all table data landed), marker does NOT
        for df in lag["caches"]:
            df.unpersist()
        eng._lag = None
    finally:
        eng._lag_enabled = False
        eng._commit_pool.shutdown(wait=True)
        eng._commit_pool = None
    assert eng.last_committed_wave() == 1  # marker decides
    # wave 2's pages physically landed ahead of the (missing) marker
    assert any(s["summary"].get("wave") == 2
               for s in SnapshotTable(os.path.join(root, "pages")).snapshots())

    resumed = CrawlEngine(spark, root, CrawlConfig(use_bloom=False))
    resumed.run(corpus, resume=True)
    assert _final_state(resumed) == _final_state(full)
    # no duplicate page rows survived the replay
    pages = resumed.pages_df().collect()
    urls = [r["url"] for r in pages]
    assert len(urls) == len(set(urls))
