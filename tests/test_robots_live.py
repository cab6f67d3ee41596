"""Live-mode robots.txt handling (north_rule C7, VERDICT r3 #4): the
engine auto-fetches /robots.txt per newly-seen host, caches the parsed
rules in a TTL'd snapshot table, and never fetches disallowed paths.
All network is injected (cfg.fetch_fn for pages, cfg.robots_fetch_fn for
robots bodies) — the same seam the reference's tests use by
monkeypatching session.get (tests/test_scraper.py:239-245)."""

import os

from pyspark.sql import functions as F

from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine

ROBOTS = {
    "ha.x": "User-agent: *\nDisallow: /private/\n",
    "hb.x": "",  # permissive host
}

PAGES = {
    # /p/0 links to an allowed page, a disallowed page, and a cross-host page
    "https://ha.x/p/0": '<html><a href="/p/1"></a>'
                        '<a href="/private/1"></a>'
                        '<a href="https://hb.x/p/0"></a>'
                        '<p>zero</p></html>',
    "https://ha.x/p/1": "<html><p>one</p></html>",
    "https://ha.x/private/1": "<html><p>secret</p></html>",
    "https://hb.x/p/0": "<html><p>bee</p></html>",
}


def _page_fetch_fn(log_path):
    def fetch(url):
        with open(log_path, "a") as f:  # O_APPEND: worker-safe small writes
            f.write(url + "\n")
        body = PAGES.get(url)
        if body is None:
            return 404, "text/html", None
        return 200, "text/html; charset=utf-8", body
    return fetch


def _crawl(spark, root, log_path, robots_calls, ttl=3600.0):
    def robots_fetch(host):
        robots_calls.append(host)
        return ROBOTS.get(host)

    cfg = CrawlConfig(
        use_bloom=False,
        respect_robots=True,
        robots_ttl_s=ttl,
        robots_fetch_fn=robots_fetch,
        fetch_fn=_page_fetch_fn(log_path),
    )
    eng = CrawlEngine(spark, root, cfg)
    eng.run(None, single_url="https://ha.x/p/0")
    return eng


def test_disallowed_paths_never_fetched(spark, tmp_path):
    log = str(tmp_path / "fetched.log")
    calls: list = []
    eng = _crawl(spark, str(tmp_path / "store"), log, calls)

    fetched = set(open(log).read().split())
    assert fetched == {
        "https://ha.x/p/0", "https://ha.x/p/1", "https://hb.x/p/0"
    }
    assert "https://ha.x/private/1" not in fetched
    # the disallowed URL is DEFERRED, not dropped: it sits in the frontier
    # unvisited (reference-shape: a URL the crawler never reached)
    links = {r["url"]: r["visited"] for r in eng.links_state().collect()}
    assert links["https://ha.x/private/1"] is False
    assert links["https://ha.x/p/1"] is True
    # pages table has no disallowed row
    urls = {r["url"] for r in eng.pages.read(spark).collect()}
    assert "https://ha.x/private/1" not in urls
    # each host's robots fetched exactly once (TTL not expired)
    assert sorted(calls) == ["ha.x", "hb.x"]


def test_robots_cache_table_and_active_rules(spark, tmp_path):
    log = str(tmp_path / "fetched.log")
    calls: list = []
    eng = _crawl(spark, str(tmp_path / "store"), log, calls)
    rows = eng.robots.read(spark).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["disallow_prefix"])
    assert by_host["ha.x"] == ["/private/"]
    assert by_host["hb.x"] == [None]  # permissive marker row carries the TTL
    active = {(r["host"], r["disallow_prefix"])
              for r in eng.robots_active_rules().collect()}
    assert active == {("ha.x", "/private/")}


def test_robots_ttl_expiry_refetches(spark, tmp_path):
    log = str(tmp_path / "fetched.log")
    calls: list = []
    eng = _crawl(spark, str(tmp_path / "store"), log, calls, ttl=0.0)
    # ttl=0: every wave re-fetches every pending host; multiple waves ran
    assert calls.count("ha.x") >= 2
    # supersede semantics: active rules still collapse to the latest fetch
    active = [r for r in eng.robots_active_rules().collect()
              if r["host"] == "ha.x"]
    assert len(active) == 1 and active[0]["disallow_prefix"] == "/private/"


def test_robots_fetch_failure_is_permissive(spark, tmp_path):
    """Unreachable robots (fetch_fn -> None) = permissive (reference
    parity: it never reads robots at all)."""
    log = str(tmp_path / "fetched.log")
    calls: list = []

    def robots_fetch(host):
        calls.append(host)
        return None

    cfg = CrawlConfig(
        use_bloom=False, respect_robots=True,
        robots_fetch_fn=robots_fetch,
        fetch_fn=_page_fetch_fn(log),
    )
    eng = CrawlEngine(spark, str(tmp_path / "store"), cfg)
    eng.run(None, single_url="https://ha.x/p/0")
    fetched = set(open(log).read().split())
    assert "https://ha.x/private/1" in fetched  # nothing disallowed
    assert calls  # robots were attempted
    assert eng.robots_active_rules().count() == 0


def test_cli_respect_robots_flag(tmp_path):
    from crawler_to_md_spark.cli import build_parser

    args = build_parser().parse_args(
        ["--url", "https://ha.x/p/0", "--live", "--respect-robots",
         "--robots-ttl", "60",
         "--output-folder", str(tmp_path / "o"), "--cache-folder",
         str(tmp_path / "c")]
    )
    assert args.respect_robots is True and args.robots_ttl == 60.0
    assert os.path.basename(__file__)  # placate linters about os import


def test_robots_cold_start_distributed_single_job(spark, tmp_path):
    """A 10^3-host cold start must NOT serialize fetches on the driver
    (VERDICT r4 #5): the distributed refresh runs fetch+parse+append as
    ONE Spark job, and the cached rows match the driver-loop semantics
    (prefix rows for hosts with rules, a permissive NULL marker row for
    empty/unreachable ones)."""
    hosts = [f"h{i}.x" for i in range(1000)]

    def robots_fetch(host):
        # worker-safe (pure function of host): every 10th host disallows
        if host.endswith("0.x"):
            return "User-agent: *\nDisallow: /private/\n"
        return ""

    cfg = CrawlConfig(use_bloom=False, respect_robots=True,
                      robots_fetch_fn=robots_fetch)
    eng = CrawlEngine(spark, str(tmp_path / "store"), cfg)
    sc = spark.sparkContext
    sc.setJobGroup("robots-dist-test", "cold start refresh")
    try:
        eng._robots_refresh_distributed(hosts, robots_fetch, 123.0, 0)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("robots-dist-test")
    assert len(jobs) == 1, jobs
    rows = eng.robots.read(spark).collect()
    assert len(rows) == 1000
    pref = {r["host"]: r["disallow_prefix"] for r in rows}
    assert pref["h10.x"] == "/private/"
    assert pref["h11.x"] is None
    assert all(r["fetched_at"] == 123.0 for r in rows)


def test_robots_refresh_routes_by_threshold(spark, tmp_path):
    """_robots_refresh keeps the zero-job driver loop for small host sets
    and switches to the distributed fetcher past the threshold."""
    def robots_fetch(host):
        return ""

    cfg = CrawlConfig(use_bloom=False, respect_robots=True,
                      robots_fetch_fn=robots_fetch,
                      robots_distributed_threshold=10)
    eng = CrawlEngine(spark, str(tmp_path / "store"), cfg)
    calls: list = []
    orig = eng._robots_refresh_distributed
    eng._robots_refresh_distributed = (
        lambda *a, **k: (calls.append(len(a[0])), orig(*a, **k))[1]
    )

    def fake_pending(n):
        return spark.createDataFrame(
            [(f"p{i}.x",) for i in range(n)], "host string")

    eng.pending = lambda: fake_pending(5)
    assert eng._robots_refresh(0) == 5
    assert calls == []                      # small set -> driver loop
    eng.pending = lambda: fake_pending(40)
    assert eng._robots_refresh(1) == 35     # 5 cached, 35 new
    assert calls == [35]                    # big set -> distributed
