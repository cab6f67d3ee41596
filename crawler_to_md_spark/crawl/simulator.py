"""Sequential reference-semantics crawler — the parity oracle.

The actual reference package (/root/reference/crawler_to_md) cannot run in
this sandbox: its hard deps (bs4, markitdown, requests-on-network) are not
installed. This module is a ~150-line pure-Python re-statement of its crawl
loop's EXACT observable semantics, line-cited below, used as the oracle the
Spark engine must match (final URL-seen membership, visited flags, crawl
order, pages content, exports). It shares the pure extraction functions in
functions/html.py with the engine, so any divergence a test catches is in
the distributed orchestration — the thing under test.

Semantics reproduced (SURVEY.md §8 checklist):
 1. BFS by waves: snapshot unvisited, process all, repeat (scraper.py:290-297).
 2. Frontier order = insertion order (SQLite rowid, database_manager.py:104).
    Within one page's discoveries we pin FIRST-OCCURRENCE-IN-DOCUMENT order
    (the reference iterates a Python set, scraper.py:171/360 — order is
    PYTHONHASHSEED-dependent; SURVEY.md §8.1 pins this deterministic
    contract instead and the engine follows it).
 3. Seeds from a list are validated; a single --url seed is NOT
    (scraper.py:258-272). Seeds are NOT defragged (§8.3).
 4. Discovered links: urljoin -> defrag -> validity (scraper.py:161-168).
 5. Non-200/non-HTML marked visited, no page row (scraper.py:333-342);
    fetch-miss behaves the same (request exception path).
 6. Empty markdown -> page row with None content (scraper.py:234-236,351).
 7. INSERT OR IGNORE first-write-wins on both tables
    (database_manager.py:49,76).
 8. Seed-list mode skips discovery entirely (scraper.py:355-356).

Pinned fetch-key contract: the corpus lookup keys on the EXACT stored URL
string. A seed carrying a '#fragment' (never defragged, §8.3) therefore
misses even when the fragment-less page exists — live `requests` would
strip the fragment at the HTTP layer and fetch the page. Engine and
simulator implement the same contract, so parity holds; swap in
sources/http_fetch.py on a networked cluster for wire behavior.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from urllib.parse import urldefrag

from ..functions.html import extract_links, scrape_page


def is_valid_link(
    link: str,
    base_url: str | None,
    include_patterns: list[str] | None,
    exclude_patterns: list[str] | None,
) -> bool:
    """Reference is_valid_link (scraper.py:100-122)."""
    if base_url and not link.startswith(base_url):
        return False
    if include_patterns and not any(p in link for p in include_patterns):
        return False
    if exclude_patterns and any(p in link for p in exclude_patterns):
        return False
    return True


@dataclass
class SimResult:
    # links table in insertion (rowid) order: url -> visited
    links: dict[str, bool] = field(default_factory=dict)
    # pages in insertion order: url -> (content|None, metadata_json)
    pages: dict[str, tuple[str | None, str]] = field(default_factory=dict)
    crawl_order: list[str] = field(default_factory=list)
    waves: list[list[str]] = field(default_factory=list)
    # per-source newly-inserted link counts (reference A4: the scraper
    # logs how many of a page's links were new inserts) — url -> count,
    # only for pages that inserted at least one
    new_per_source: dict[str, int] = field(default_factory=dict)


def simulate_crawl(
    corpus_rows: list[dict],
    seeds: list[str] | None = None,
    single_url: str | None = None,
    base_url: str | None = None,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    include_selectors: list[str] | None = None,
    exclude_selectors: list[str] | None = None,
    seed_list_mode: bool | None = None,
) -> SimResult:
    """Run the sequential BFS crawl over the synthetic corpus."""
    corpus = {r["url"]: r for r in corpus_rows}
    res = SimResult()

    # --- seed insertion (scraper.py:258-272) ---
    if seeds is not None:
        if seed_list_mode is None:
            seed_list_mode = True  # urls_list given => no discovery (C2)
        for s in seeds:
            if s in res.links:
                continue
            if is_valid_link(s, base_url, include_patterns, exclude_patterns):
                res.links[s] = False
    if single_url is not None:
        # single --url seed inserted WITHOUT validation (scraper.py:270-272)
        if single_url not in res.links:
            res.links[single_url] = False
        if seed_list_mode is None:
            seed_list_mode = False

    # --- wave loop (scraper.py:290-376) ---
    while True:
        wave = [u for u, v in res.links.items() if not v]
        if not wave:
            break
        res.waves.append(wave)
        for url in wave:
            res.crawl_order.append(url)
            row = corpus.get(url)
            # fetch + gate (scraper.py:327-342); miss == request exception
            if row is None or row["status"] != 200 or not str(
                row["content_type"]
            ).startswith("text/html"):
                res.links[url] = True
                continue
            html = row["html"]
            md, title, caption, image_id = scrape_page(
                html, include_selectors, exclude_selectors
            )
            metadata = json.dumps({"title": title})
            if url not in res.pages:  # INSERT OR IGNORE (first-write-wins)
                res.pages[url] = (md, metadata)
            if not seed_list_mode:
                for link in extract_links(html, url):
                    defragged = urldefrag(link)[0]
                    if is_valid_link(
                        defragged, base_url, include_patterns, exclude_patterns
                    ):
                        if defragged not in res.links:
                            res.links[defragged] = False
                            res.new_per_source[url] = (
                                res.new_per_source.get(url, 0) + 1
                            )
            res.links[url] = True
    return res
