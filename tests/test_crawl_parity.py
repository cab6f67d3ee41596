"""Engine-vs-reference-semantics parity (SURVEY.md §5.1).

The sequential simulator (crawl/simulator.py) re-states the reference
crawler's observable semantics line-by-line; the distributed engine must
produce the identical final URL-seen membership, visited flags, crawl
ordering (BFS waves + pinned within-wave contract), and page contents.
"""

import json

import pytest

from crawler_to_md_spark.crawl.corpus import synth_corpus, synth_corpus_rows
from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine
from crawler_to_md_spark.crawl.simulator import simulate_crawl


def run_both(spark, tmp_path, n_pages=60, cfg_kwargs=None, sim_kwargs=None,
             seeds=None, single_url=None, use_bloom=True):
    rows = synth_corpus_rows(n_pages=n_pages, n_hosts=3, branching=3, seed=42)
    corpus = synth_corpus(spark, n_pages=n_pages, n_hosts=3, branching=3, seed=42)
    cfg = CrawlConfig(use_bloom=use_bloom, bloom_shards=4,
                      bloom_bits_per_shard=1 << 16, **(cfg_kwargs or {}))
    eng = CrawlEngine(spark, str(tmp_path / "store"), cfg)
    eng.run(corpus, seeds=seeds, single_url=single_url)
    sim = simulate_crawl(rows, seeds=seeds, single_url=single_url,
                         **(sim_kwargs or {}))
    return eng, sim


def assert_parity(eng, sim):
    links = eng.links_state().collect()
    got_links = [(r["url"], r["visited"]) for r in links]
    want_links = list(sim.links.items())
    assert got_links == want_links, (
        f"links mismatch:\n got={got_links[:10]}\nwant={want_links[:10]}"
    )
    pages = eng.pages_df().select("url", "content", "metadata").collect()
    got_pages = {r["url"]: (r["content"], json.dumps(dict(r["metadata"])))
                 for r in pages}
    assert set(got_pages) == set(sim.pages)
    for url, (content, metadata) in sim.pages.items():
        gc, gm = got_pages[url]
        assert gc == content, f"content mismatch for {url}"
        assert json.loads(gm) == json.loads(metadata)
    # page processing order (insertion order == discovery_rank order)
    got_page_order = [r["url"] for r in pages]
    assert got_page_order == list(sim.pages)


def test_full_crawl_parity(spark, tmp_path):
    eng, sim = run_both(
        spark, tmp_path, n_pages=60,
        single_url="https://host0.example/p/0",
        sim_kwargs={"seed_list_mode": False},
    )
    assert_parity(eng, sim)
    # BFS wave structure: every engine frontier row's wave matches the
    # simulator's wave index
    fr = eng.frontier.read(eng.spark).orderBy("discovery_rank").collect()
    sim_wave_of = {}
    for i, wave in enumerate(sim.waves):
        for u in wave:
            sim_wave_of.setdefault(u, i)
    for r in fr:
        if r["url"] in sim_wave_of:
            assert r["wave_discovered"] == sim_wave_of[r["url"]], r["url"]


def test_seed_list_mode_no_discovery(spark, tmp_path):
    seeds = [
        "https://host0.example/p/0",
        "https://host1.example/p/1",
        "https://host0.example/p/0",   # duplicate: first-occurrence dedup
        "https://host2.example/p/999999",  # fetch-miss -> visited, no page
        "https://host0.example/p/3#frag",  # seeds are NOT defragged
    ]
    eng, sim = run_both(spark, tmp_path, seeds=seeds,
                        cfg_kwargs={"seed_list_mode": True})
    assert_parity(eng, sim)
    assert len(sim.waves) == 1  # exactly one wave, no discovery


def test_filters_parity(spark, tmp_path):
    kw = dict(
        base_url="https://host0.example/",
        include_patterns=["/p/", "/dir"],
        exclude_patterns=["logout"],
    )
    eng, sim = run_both(
        spark, tmp_path, n_pages=60,
        cfg_kwargs=kw, sim_kwargs={**kw, "seed_list_mode": False},
        single_url="https://host0.example/p/0",
    )
    assert_parity(eng, sim)


def test_selector_parity(spark, tmp_path):
    kw = dict(exclude_selectors=[".ad"])
    eng, sim = run_both(
        spark, tmp_path, n_pages=40,
        cfg_kwargs=kw, sim_kwargs={**kw, "seed_list_mode": False},
        single_url="https://host0.example/p/0",
    )
    assert_parity(eng, sim)


def test_bloom_off_same_result(spark, tmp_path):
    eng, sim = run_both(
        spark, tmp_path, n_pages=40, use_bloom=False,
        single_url="https://host0.example/p/0",
        sim_kwargs={"seed_list_mode": False},
    )
    assert_parity(eng, sim)


def test_dedup_pre_shuffle_same_result(spark, tmp_path):
    # the pre-shuffle dedup strategy is a PHYSICAL choice (where the
    # first-write-wins aggregation's exchange sits): every link, rank,
    # page and ordering must be byte-identical to the default path
    eng, sim = run_both(
        spark, tmp_path, n_pages=40,
        cfg_kwargs={"dedup_pre_shuffle": True},
        single_url="https://host0.example/p/0",
        sim_kwargs={"seed_list_mode": False},
    )
    assert_parity(eng, sim)


def test_non200_and_nonhtml_marked_visited_no_page(spark, tmp_path):
    eng, sim = run_both(
        spark, tmp_path, n_pages=60,
        single_url="https://host0.example/p/0",
        sim_kwargs={"seed_list_mode": False},
    )
    rows = {r["url"]: r for r in synth_corpus(
        eng.spark, n_pages=60, n_hosts=3, branching=3, seed=42
    ).collect()}
    page_urls = {r["url"] for r in eng.pages_df().collect()}
    for url, visited in sim.links.items():
        if visited and url in rows:
            r = rows[url]
            is_page = r["status"] == 200 and r["content_type"].startswith("text/html")
            assert (url in page_urls) == is_page, url


def test_empty_content_pages_kept_with_null(spark, tmp_path):
    eng, sim = run_both(
        spark, tmp_path, n_pages=90,
        single_url="https://host0.example/p/0",
        sim_kwargs={"seed_list_mode": False},
    )
    nulls_sim = {u for u, (c, _) in sim.pages.items() if c is None}
    nulls_eng = {r["url"] for r in eng.pages_df().collect() if r["content"] is None}
    assert nulls_sim == nulls_eng
    assert nulls_sim, "fixture must exercise the NULL-content path"


def test_live_fetch_engine_parity(spark, tmp_path):
    """--live wiring end-to-end: the engine run with corpus=None drives
    sources.http_fetch.fetch_http with an injected fetch_fn (the
    reference's own test seam, tests/test_scraper.py:239-245) and must
    match the sequential simulator exactly."""
    n_pages = 60
    rows = synth_corpus_rows(n_pages=n_pages, n_hosts=3, branching=3, seed=42)
    by_url = {
        r["url"]: (r["status"], r["content_type"], r["html"]) for r in rows
    }

    def fake_fetch(url):
        return by_url.get(url, (-1, "", None))

    cfg = CrawlConfig(use_bloom=True, bloom_shards=4,
                      bloom_bits_per_shard=1 << 16, fetch_fn=fake_fetch)
    eng = CrawlEngine(spark, str(tmp_path / "live"), cfg)
    eng.run(None, single_url="https://host0.example/p/0")
    sim = simulate_crawl(rows, single_url="https://host0.example/p/0",
                         seed_list_mode=False)
    assert_parity(eng, sim)
    # live pages carry no corpus image payload
    assert eng.pages_df().filter("bytes IS NOT NULL").count() == 0


def test_fetch_df_fn_matches_corpus_join(spark, tmp_path):
    """The column-level synthetic fetcher (bench fetch stage, O(wave) cost)
    must produce the exact same crawl as the corpus-join simulation over
    the same graph."""
    from crawler_to_md_spark.crawl.corpus import (
        synth_corpus_distributed,
        synth_fetch_df_fn,
    )

    n, hosts, b = 2000, 8, 8
    corpus = synth_corpus_distributed(spark, n, n_hosts=hosts, branching=b)
    seed = "https://host0.example/p/0"
    a = CrawlEngine(spark, str(tmp_path / "join"), CrawlConfig(use_bloom=False))
    a.run(corpus, single_url=seed)
    b_cfg = CrawlConfig(use_bloom=False,
                        fetch_df_fn=synth_fetch_df_fn(n, hosts, b))
    bb = CrawlEngine(spark, str(tmp_path / "fn"), b_cfg)
    bb.run(None, single_url=seed)

    la = [(r["url"], r["visited"]) for r in a.links_state().collect()]
    lb = [(r["url"], r["visited"]) for r in bb.links_state().collect()]
    assert la == lb and len(la) > 100
    pa = [(r["url"], r["content"]) for r in a.pages_df().collect()]
    pb = [(r["url"], r["content"]) for r in bb.pages_df().collect()]
    assert pa == pb


def test_per_source_new_links_parity(spark, tmp_path):
    """A4: per-page newly-inserted link counts match the sequential
    simulator exactly (keyed back from src_rank to the source URL)."""
    eng, sim = run_both(
        spark, tmp_path, n_pages=60,
        single_url="https://host0.example/p/0",
        sim_kwargs={"seed_list_mode": False},
    )
    rank_to_url = {r["discovery_rank"]: r["url"]
                   for r in eng.frontier.read(eng.spark).collect()}
    got = {rank_to_url[r["src_rank"]]: r["n_new_links"]
           for r in eng.per_source_new_links().collect()}
    assert got == sim.new_per_source


def test_frontier_delta_file_count_matches_npart(spark, tmp_path):
    """Every frontier wave delta must land with exactly _npart(rows) files
    (small-files contract). In particular a k==1 delta whose rank cache
    inherits a MULTI-partition shuffle must still coalesce to ONE file —
    the k>1 branch repartitions explicitly, so only the k==1 branch can
    leak the cache's partitioning (ADVICE r4, engine.py k==1 branch)."""
    from crawler_to_md_spark.crawl.engine import _npart

    eng, _ = run_both(
        spark, tmp_path, n_pages=120,
        single_url="https://host0.example/p/0",
        sim_kwargs={"seed_list_mode": False},
    )
    saw_multi_row_delta = False
    for man in eng.frontier.snapshots():
        rows = man["summary"].get("rows")
        if not man.get("delta_files") or rows is None:
            continue
        # test scale: rows << 50k so _npart == 1 for every wave delta
        assert len(man["delta_files"]) == _npart(
            rows, cap=spark.sparkContext.defaultParallelism
        ), man["summary"]
        if rows > spark.sparkContext.defaultParallelism:
            saw_multi_row_delta = True
    # the scenario must actually exercise a delta with more rows than
    # partitions (i.e. one that COULD have landed multi-file)
    assert saw_multi_row_delta


def test_needs_repartition_for_map_threshold():
    """The pending-rows shuffle before a per-row-fetch map stage only pays
    for itself when the frontier delta's file count would halve the map
    parallelism; a near-miss (7 files, 8 cores — the common steady-wave
    shape, since a rank bucket can hash empty) must NOT trigger a full
    shuffle + AQE boundary (~1 s/wave measured at 8 cores)."""
    from crawler_to_md_spark.crawl.engine import needs_repartition_for_map

    assert needs_repartition_for_map(None, 8)      # unknown -> shuffle
    assert needs_repartition_for_map(1, 8)         # 1 task for the wave
    assert needs_repartition_for_map(3, 8)         # < half the cores
    assert not needs_repartition_for_map(4, 8)     # half is enough
    assert not needs_repartition_for_map(7, 8)     # near-miss: skip
    assert not needs_repartition_for_map(8, 8)
    assert not needs_repartition_for_map(12, 8)    # more files than cores
    # tiny clusters: the floor of 2 catches the 1-file delta at
    # parallelism 2 (a whole steady wave in ONE task otherwise)
    assert needs_repartition_for_map(1, 2)
    assert not needs_repartition_for_map(2, 2)
    assert needs_repartition_for_map(None, 2)


def test_synth_fetch_plan_has_no_regexp(spark):
    """Perf contract (BENCH/evidence_r5_optimization_path.md finding 4):
    Catalyst folds the engine's scrape gate through the synthetic fetch's
    projections into a scan-level filter, substituting the _fetch_pid
    alias BY DEFINITION — 12 copies per pending row in the wave's first
    stage. The pid derivation must therefore stay cheap (substring_index
    + try_cast); a regexp here cost 2.3s of an 11.5s 8-core steady wave."""
    from crawler_to_md_spark.crawl.corpus import synth_fetch_df_fn

    pending = spark.createDataFrame(
        [("https://host0.example/p/0",)], ["url"])
    out = synth_fetch_df_fn(100, 4, 4)(pending)
    gated = out.filter(
        (out.status == 200) & out.content_type.startswith("text/html"))
    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    assert "regexp" not in plan.lower()


def test_synth_fetch_miss_forms(spark):
    """URL forms outside the synthetic graph must MISS (status null) in
    the cheap-pid fetch exactly as they did with the regexp derivation:
    no '/p/' segment, bare digits (tail==url guard), trailing segment
    after the pid, empty pid, and in-form but out-of-corpus pids."""
    from crawler_to_md_spark.crawl.corpus import synth_fetch_df_fn

    urls = [
        ("https://h.example/p/5", True),     # canonical hit
        ("https://h.example/p/5/x", False),  # trailing segment
        ("https://h.example/q/5", False),    # no /p/
        ("5", False),                        # bare digits, no /p/
        ("https://h.example/p/", False),     # empty pid
        ("https://h.example/p/99", False),   # pid >= n_pages
        ("https://h.example/p/5x", False),   # trailing garbage in pid
    ]
    pending = spark.createDataFrame([(u,) for u, _ in urls], ["url"])
    got = {r["url"]: r["status"] for r in
           synth_fetch_df_fn(50, 4, 4)(pending).collect()}
    for u, hit in urls:
        assert (got[u] == 200) == hit, u
