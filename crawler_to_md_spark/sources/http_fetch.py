"""Production fetch stage: batched HTTP GET inside ``mapInPandas``.

The sandbox has no network, so tests exercise this module through an
injected ``fetch_fn`` (the same seam the reference's own tests use by
monkeypatching ``session.get`` — tests/test_scraper.py:239-245); the
sandbox engine instead joins a corpus table (crawl/engine.py J3). On a
real cluster this module IS the fetch stage: swap
``CrawlEngine.run_wave``'s corpus join for ``fetch_http(pending, cfg)``.

Reference semantics carried over:
- one shared session per executor task (connection pooling,
  scraper.py:59-62) — here one per Arrow batch iterator;
- proxy support (scraper.py:63-68) via session.proxies;
- status + content-type captured for the gate (scraper.py:333-342);
- fetch errors yield status=-1 rows (the reference logs and marks
  visited, scraper.py:145,174 — never aborts the crawl);
- politeness: a per-host token bucket enforced executor-side, the
  distributed analog of the serial delay loop (scraper.py:302-321);
  cross-task fairness comes from the wave-level host quotas
  (operators/politeness.py) — the bucket only paces within a task.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FETCH_SCHEMA = (
    "url_hash long, url string, host string, depth int, "
    "wave_discovered int, discovery_rank long, "
    "status int, content_type string, html string"
)


class HostRateLimiter:
    """Per-host min-interval pacing within one executor task."""

    def __init__(self, min_interval_s: float = 0.0):
        self.min_interval = min_interval_s
        self._last: dict[str, float] = {}

    def wait(self, host: str) -> None:
        if self.min_interval <= 0:
            return
        now = time.monotonic()
        last = self._last.get(host)
        if last is not None:
            remaining = self.min_interval - (now - last)
            if remaining > 0:
                time.sleep(remaining)
        self._last[host] = time.monotonic()


def default_fetch_fn(proxy: str | None = None, timeout_s: float = 10.0):
    """Build a requests-backed fetcher (real network; not exercisable in
    this sandbox). Returns fn(session_holder, url) -> (status, ctype, body).
    """
    import requests

    holder: dict = {}

    def fetch(url: str) -> tuple[int, str, str | None]:
        sess = holder.get("s")
        if sess is None:
            sess = requests.Session()
            if proxy:
                sess.proxies = {"http": proxy, "https": proxy}
            holder["s"] = sess
        try:
            r = sess.get(url, timeout=timeout_s)
            return r.status_code, r.headers.get("Content-Type", ""), r.text
        except Exception:  # noqa: BLE001 — fetch errors never abort (ref)
            return -1, "", None

    return fetch


def fetch_http(
    pending: DataFrame,
    fetch_fn: Callable[[str], tuple[int, str, str | None]] | None = None,
    min_interval_s: float = 0.0,
) -> DataFrame:
    """(frontier rows) -> (frontier rows + status, content_type, html).

    Arrow-batched; one fetch_fn instance per task (session reuse). Inject
    ``fetch_fn`` for tests; defaults to the requests-backed fetcher.
    """
    fetch = fetch_fn or default_fetch_fn()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiter = HostRateLimiter(min_interval_s)
        for pdf in batches:
            statuses, ctypes, bodies = [], [], []
            for host, url in zip(pdf["host"], pdf["url"]):
                limiter.wait(host)
                status, ctype, body = fetch(url)
                statuses.append(status)
                ctypes.append(ctype)
                bodies.append(body)
            out = pdf[["url_hash", "url", "host", "depth",
                       "wave_discovered", "discovery_rank"]].copy()
            out["status"] = statuses
            out["content_type"] = ctypes
            out["html"] = bodies
            yield out

    return pending.select(
        "url_hash", "url", "host", "depth", "wave_discovered", "discovery_rank"
    ).mapInPandas(run, FETCH_SCHEMA)


def probe_proxy(proxy_url: str, timeout_s: float = 5.0) -> None:
    """Driver-side proxy liveness precondition (reference scraper.py:70-80:
    HEAD to the proxy base; ValueError if unreachable)."""
    import requests

    try:
        requests.head(proxy_url, timeout=timeout_s)
    except Exception as exc:  # noqa: BLE001
        raise ValueError(f"proxy unreachable: {proxy_url}") from exc
