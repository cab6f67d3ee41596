import json
import os

import pytest

from crawler_to_md_spark.cli import main as cli_main
from crawler_to_md_spark.crawl.corpus import synth_corpus
from crawler_to_md_spark.functions.urls import sanitize_filename
from crawler_to_md_spark.sources.http_fetch import HostRateLimiter, fetch_http


def test_sanitize_filename():
    # reference utils.py:9-26
    assert sanitize_filename("My Page: v1.2!") == "My_Page_v1.2"
    assert sanitize_filename("a/b\\c") == "abc"


def test_cli_end_to_end(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    synth_corpus(spark, n_pages=30, n_hosts=3, branching=3, seed=42) \
        .write.parquet(corpus_path)
    out = str(tmp_path / "out")
    cache = str(tmp_path / "cache")
    rc = cli_main([
        "--url", "https://host0.example/p/0",
        "--corpus", corpus_path,
        "--output-folder", out,
        "--cache-folder", cache,
        "--base-url", "https://",          # permissive: all hosts
        "--export-individual",
        "--master", "local[4]",
    ])
    assert rc == 0
    # reference layout (cli.py:179-181,236-257):
    # {output}/{url_to_filename(first)}/{sanitize_filename(title)}.{md,json}
    out_dir = os.path.join(out, "host0_example_p_0")
    files = os.listdir(out_dir)
    assert "httpshost0.examplep0.md" in files     # title defaults to the URL
    assert "httpshost0.examplep0.json" in files
    data = json.load(open(os.path.join(out_dir, "httpshost0.examplep0.json")))
    assert len(data) > 0 and all("url" in d and "content" in d for d in data)
    assert os.path.isdir(os.path.join(out_dir, "files"))
    # re-run with same cache resumes (no error, same output)
    rc2 = cli_main([
        "--url", "https://host0.example/p/0",
        "--corpus", corpus_path,
        "--output-folder", out,
        "--cache-folder", cache,
        "--base-url", "https://",
        "--master", "local[4]",
    ])
    assert rc2 == 0


def test_cli_requires_seed_and_corpus(tmp_path):
    assert cli_main(["--output-folder", str(tmp_path)]) == 2
    assert cli_main(["--url", "https://x.example/"]) == 2


def test_cli_rejects_empty_urls_file(tmp_path):
    # reference cli.py:175-176: parser.error("No URL provided...") when the
    # seed list is empty — url_to_filename(None) must never run
    empty = tmp_path / "seeds.txt"
    empty.write_text("\n\n")
    assert cli_main(["--urls-file", str(empty)]) == 2


def test_cli_progress_and_resume_offset(spark, tmp_path, capsys, monkeypatch):
    """Per-wave progress lines (reference tqdm bar, scraper.py:278-283) and
    the resume offset on a second run over the same cache."""
    monkeypatch.setenv("LOG_LEVEL", "INFO")
    import logging

    logging.getLogger("crawler_to_md_spark").setLevel("INFO")
    corpus_path = str(tmp_path / "corpus")
    synth_corpus(spark, n_pages=30, n_hosts=3, branching=3, seed=42) \
        .write.parquet(corpus_path)
    common = [
        "--url", "https://host0.example/p/0",
        "--corpus", corpus_path,
        "--output-folder", str(tmp_path / "out"),
        "--cache-folder", str(tmp_path / "cache"),
        "--base-url", "https://",
        "--master", "local[4]",
    ]
    assert cli_main(common) == 0
    err = capsys.readouterr().err
    waves = [ln for ln in err.splitlines() if ln.startswith("Scraping:")]
    assert len(waves) >= 2           # multi-wave BFS crawl
    assert "wave 1:" in waves[0]
    # second run resumes: offset reported from the existing cache
    assert cli_main(common) == 0
    err2 = capsys.readouterr().err
    assert any("resuming:" in ln and "links already visited" in ln
               for ln in err2.splitlines())


def test_host_rate_limiter_paces():
    import time

    rl = HostRateLimiter(0.05)
    t0 = time.monotonic()
    for _ in range(3):
        rl.wait("a.example")
    assert time.monotonic() - t0 >= 0.09   # 2 enforced gaps
    t0 = time.monotonic()
    rl2 = HostRateLimiter(0.05)
    for h in ["a", "b", "c"]:
        rl2.wait(h)                        # distinct hosts: no pacing
    assert time.monotonic() - t0 < 0.04


def test_fetch_http_with_injected_fn(spark):
    pages = {
        "https://h0.x/p/0": (200, "text/html", "<html><body>ok</body></html>"),
        "https://h0.x/p/1": (404, "text/html", "nope"),
    }

    def fake_fetch(url):
        return pages.get(url, (-1, "", None))

    pending = spark.createDataFrame(
        [(1, "https://h0.x/p/0", "h0.x", 0, 0, 0),
         (2, "https://h0.x/p/1", "h0.x", 0, 0, 1),
         (3, "https://h0.x/p/404", "h0.x", 0, 0, 2)],
        "url_hash long, url string, host string, depth int, "
        "wave_discovered int, discovery_rank long",
    )
    rows = {r["url"]: r for r in fetch_http(pending, fetch_fn=fake_fetch).collect()}
    assert rows["https://h0.x/p/0"]["status"] == 200
    assert rows["https://h0.x/p/0"]["html"].startswith("<html>")
    assert rows["https://h0.x/p/1"]["status"] == 404
    assert rows["https://h0.x/p/404"]["status"] == -1
    assert rows["https://h0.x/p/404"]["html"] is None


@pytest.mark.parametrize("bad", ["http://127.0.0.1:1/nope"])
def test_probe_proxy_unreachable(bad):
    from crawler_to_md_spark.sources.http_fetch import probe_proxy

    with pytest.raises(ValueError):
        probe_proxy(bad, timeout_s=0.5)


@pytest.mark.parametrize("flag,proxy_url", [
    ("--proxy", "http://proxy:8080"),
    ("-p", "http://proxy:8080"),
    ("--proxy", "socks5://localhost:9050"),
])
def test_cli_proxy_url_passed_through(spark, tmp_path, monkeypatch,
                                      flag, proxy_url):
    """Reference parity (tests/test_cli.py:54-186): --proxy / -p values —
    http and socks5 URL forms alike — reach the fetcher VERBATIM (the
    reference hands the string to requests' proxies dict unchanged)."""
    import crawler_to_md_spark.sources.http_fetch as hf

    captured = {}
    monkeypatch.setattr(hf, "probe_proxy", lambda url, timeout_s=5.0:
                        captured.setdefault("probed", url))

    real_default = hf.default_fetch_fn

    def capture_default(proxy=None, timeout_s=10.0):
        captured["proxy"] = proxy
        return lambda url: (-1, "", None)  # every fetch fails -> 1 wave

    monkeypatch.setattr(hf, "default_fetch_fn", capture_default)
    rc = cli_main([
        "--url", "https://host0.example/p/0",
        "--live",
        "--output-folder", str(tmp_path / "out"),
        "--cache-folder", str(tmp_path / "cache"),
        "--master", "local[4]",
        flag, proxy_url,
    ])
    assert rc == 0
    assert captured["probed"] == proxy_url
    assert captured["proxy"] == proxy_url
    monkeypatch.setattr(hf, "default_fetch_fn", real_default)


def test_cli_unreachable_proxy_aborts(tmp_path):
    """Reference parity (tests/test_cli.py:189-208): an unreachable proxy
    aborts the run before any crawl work."""
    rc = cli_main([
        "--url", "https://host0.example/p/0",
        "--live",
        "--output-folder", str(tmp_path / "out"),
        "--cache-folder", str(tmp_path / "cache"),
        "--proxy", "http://127.0.0.1:1/nope",
    ])
    assert rc == 2


def test_cli_durable_commits_flag(spark, tmp_path):
    """--durable-commits threads through to fsync'd table commits (ADVICE
    r3: default commits are process-crash-safe only; the flag upgrades
    the guarantee to power loss). Behavioral parity: same crawl output."""
    corpus_path = str(tmp_path / "corpus")
    synth_corpus(spark, n_pages=20, n_hosts=2, branching=3, seed=7) \
        .write.parquet(corpus_path)
    cache = str(tmp_path / "cache")
    rc = cli_main([
        "--url", "https://host0.example/p/0",
        "--corpus", corpus_path,
        "--output-folder", str(tmp_path / "out"),
        "--cache-folder", cache,
        "--base-url", "https://",
        "--durable-commits",
        "--master", "local[4]",
    ])
    assert rc == 0
    # the store's tables were constructed durable (marker log + data exist)
    store_dir = [d for d in os.listdir(cache)][0]
    assert os.path.exists(os.path.join(cache, store_dir, "commits.jsonl"))
