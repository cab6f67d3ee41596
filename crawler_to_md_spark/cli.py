"""CLI — the reference's full argument surface (cli.py:34-153) over the
distributed engine. A user of ``crawler-to-md`` can run the same flags
here; the only structural difference is the fetch source: ``--corpus``
points the fetch-join at a parquet corpus table (this sandbox has no
network), while ``--live`` switches to the real HTTP mapInPandas fetcher
(sources/http_fetch.py) on a networked cluster.

Semantics mapped from the reference:
- --url / --urls-file (stdin via '-')      cli.py:35-40, 160-170
- default base_url = dirname of --url      cli.py:192-195 (utils.py:57-89)
- --cache-folder + --overwrite-cache       cli.py:203-213 -> snapshot store
  (re-running with the same cache resumes; overwrite drops it first)
- --rate-limit requests/min                cli.py:91-104 -> per-wave global
  budget (one wave == one 60s window; scraper.py:302-314 semantics)
- --delay between requests                 -> per-host min-interval in the
  live fetcher; no-op for corpus joins
- exports + title defaulting               cli.py:229-257
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

from .crawl.engine import CrawlConfig, CrawlEngine
from .functions.urls import sanitize_filename, url_dirname, url_to_filename
from .log_setup import setup_logging
from .operators.export import (
    export_individual_markdown,
    export_json,
    export_markdown,
)
from .session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Distributed web scraper to Markdown (PySpark)"
    )
    p.add_argument("--url", "-u", help="Base URL to start scraping")
    p.add_argument("--urls-file",
                   help="File of URLs, one per line ('-' = stdin)")
    p.add_argument("--output-folder", "-o", default="./output")
    p.add_argument("--cache-folder", "-c",
                   default="~/.cache/crawler-to-md-spark")
    p.add_argument("--overwrite-cache", "-w", action="store_true")
    p.add_argument("--base-url", "-b",
                   help="Base URL for filtering links (default: URL dirname)")
    p.add_argument("--title", "-t",
                   help="Title of the compiled markdown (default: URL)")
    p.add_argument("--exclude-url", "-e", action="append", default=[])
    p.add_argument("--include-url", "-I", action="append", default=[])
    p.add_argument("--export-individual", "-ei", action="store_true")
    p.add_argument("--rate-limit", "-rl", type=int, default=0,
                   help="Max requests per minute (0 = unlimited)")
    p.add_argument("--delay", "-d", type=float, default=0,
                   help="Delay between requests in seconds (live mode)")
    p.add_argument("--proxy", "-p", default=None)
    p.add_argument("--no-markdown", action="store_true")
    p.add_argument("--no-json", action="store_true")
    p.add_argument("--include", "-i", action="append", default=[],
                   help="CSS-like selector (#id, .class, tag) to include")
    p.add_argument("--exclude", "-x", action="append", default=[],
                   help="CSS-like selector (#id, .class, tag) to exclude")
    # engine-specific
    p.add_argument("--corpus", help="Parquet corpus table for fetch-join "
                   "(sandbox mode; required unless --live)")
    p.add_argument("--live", action="store_true",
                   help="Fetch over real HTTP (networked clusters only)")
    p.add_argument("--per-host-budget", type=int, default=None,
                   help="Politeness: max fetches per host per wave")
    p.add_argument("--respect-robots", action="store_true",
                   help="Live mode: fetch+cache /robots.txt per host and "
                        "skip disallowed paths (default off — reference "
                        "parity is permissive)")
    p.add_argument("--robots-ttl", type=float, default=3600.0,
                   help="Seconds before a cached robots.txt is re-fetched")
    p.add_argument("--durable-commits", action="store_true",
                   help="fsync datafiles/manifests/marker on every wave "
                        "commit: survives power loss, not just process "
                        "kills (slower; see tables.py)")
    p.add_argument("--master", default=None, help="Spark master override")
    return p


def read_seed_list(path: str) -> list[str]:
    """File/stdin seeds, stripped, order-preserving (cli.py:160-170;
    dedup happens in CrawlEngine.seed per utils.py:93-105)."""
    fh = sys.stdin if path == "-" else open(path, encoding="utf-8")
    try:
        return [line.strip() for line in fh if line.strip()]
    finally:
        if fh is not sys.stdin:
            fh.close()


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    try:  # shell completion hook (reference cli.py:143-148)
        import argcomplete

        argcomplete.autocomplete(parser)
    except ImportError:
        pass
    args = parser.parse_args(argv)
    logger = setup_logging()  # level from LOG_LEVEL env (reference cli.py:12-13)

    seeds = read_seed_list(args.urls_file) if args.urls_file else None
    if not args.url and not seeds:
        # reference: parser.error("No URL provided...") — also catches an
        # EMPTY --urls-file (cli.py:175-176)
        print("error: No URL provided. Please provide either --url or "
              "--urls-file.", file=sys.stderr)
        return 2
    first = args.url or seeds[0]
    base_url = args.base_url
    if base_url is None and args.url:
        base_url = url_dirname(args.url)  # cli.py:192-195
    title = args.title or first

    cache_root = os.path.expanduser(args.cache_folder)
    store = os.path.join(cache_root, url_to_filename(first))
    if args.overwrite_cache and os.path.exists(store):
        shutil.rmtree(store)  # cli.py:203-213
    resume = os.path.exists(os.path.join(store, "visited", "_manifests",
                                         "CURRENT"))

    if args.proxy:
        from .sources.http_fetch import probe_proxy

        try:
            probe_proxy(args.proxy)  # scraper.py:70-80 precondition
        except ValueError as exc:
            # reference parity: an unreachable proxy aborts the run
            # (reference tests/test_cli.py:189-208 expects a SystemExit)
            print(f"error: {exc}", file=sys.stderr)
            return 2

    spark = get_spark("crawler-to-md-spark", master=args.master)
    fetch_fn = None
    if args.live:
        from .sources.http_fetch import default_fetch_fn

        fetch_fn = default_fetch_fn(proxy=args.proxy)
    cfg = CrawlConfig(
        base_url=base_url,
        include_patterns=args.include_url,
        exclude_patterns=args.exclude_url,
        include_selectors=args.include,
        exclude_selectors=args.exclude,
        seed_list_mode=seeds is not None,  # scraper.py:355-356 (C2)
        global_budget=args.rate_limit or None,
        per_host_budget=args.per_host_budget,
        fetch_fn=fetch_fn,
        min_interval_s=args.delay,
        respect_robots=args.respect_robots,
        robots_ttl_s=args.robots_ttl,
        durable_commits=args.durable_commits,
    )
    engine = CrawlEngine(spark, store, cfg)

    if args.live:
        corpus = None  # fetch stage = sources/http_fetch.fetch_http
    else:
        if not args.corpus:
            print("error: --corpus required (no network in this environment)",
                  file=sys.stderr)
            return 2
        corpus = spark.read.parquet(args.corpus)

    # progress: total/visited from manifest summaries (no Spark jobs) —
    # the reference's tqdm bar starts at the RESUME OFFSET
    # (scraper.py:278-283: initial=get_visited_links_count())
    total0, visited0 = engine.progress_counts()
    prog = {"total": total0, "visited": visited0}
    if resume:
        logger.info("resuming: %d/%d links already visited",
                    prog["visited"], prog["total"])

    def on_wave(m: dict) -> None:
        if "seeded" in m:  # wave-0 seeding: update the total, no line
            prog["total"] += m["seeded"]
            return
        if m.get("done"):
            return
        prog["visited"] += m["selected"]
        prog["total"] += m["new_links"]
        # the pages parquet commit lags one wave (engine lagged commit):
        # its exact count is unknown at print time, so progress shows the
        # selected count (== pages unless rows were gate-skipped)
        pages = m["selected"] if m["pages"] is None else m["pages"]
        print(
            f"Scraping: {prog['visited']}/{prog['total']} links "
            f"(wave {m['wave']}: {pages} pages, "
            f"{m['new_links']} new links, {m['seconds']:.1f}s)",
            file=sys.stderr,
        )

    # a seed LIST takes precedence; --url seeds only when no list is given
    # (reference scraper.py:258-272: the `elif url:` branch)
    engine.run(corpus, seeds=seeds,
               single_url=args.url if seeds is None else None, resume=resume,
               on_wave=on_wave)

    # output layout = reference contract (cli.py:179-181, 236-257):
    # {output_folder}/{url_to_filename(first)}/{sanitize_filename(title)}.md
    out_dir = os.path.join(args.output_folder, url_to_filename(first))
    os.makedirs(out_dir, exist_ok=True)
    output_name = sanitize_filename(title)
    pages = engine.pages_df()
    if not args.no_markdown:
        export_markdown(pages, title, os.path.join(out_dir, output_name + ".md"))
    if not args.no_json:
        export_json(pages, os.path.join(out_dir, output_name + ".json"))
    if args.export_individual:
        export_individual_markdown(pages, out_dir, base_url)
    n_pages = pages.count()
    print(f"crawled {n_pages} pages -> {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
