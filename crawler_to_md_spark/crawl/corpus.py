"""Deterministic synthetic web-graph corpora (FIXTURES.md §1).

The reference crawls the live web through requests.Session
(scraper.py:327); this sandbox has no network, so the fetch stage joins the
frontier against a corpus table keyed by URL — the exact pattern of the
reference's own tests (tests/test_scraper.py:239-245, DummyResp).

Two generators:

- :func:`synth_corpus` — small/rich (<= ~20k pages): driver-side seeded
  generation of real HTML exercising every reference edge case (cycles,
  duplicate links, cross-host, fragments, relative hrefs, excluded
  patterns, non-HTML content types, non-200 statuses, empty-extract pages,
  trailing-slash dirs, image+caption payloads). Used by parity tests.

- :func:`synth_corpus_distributed` — bench scale (10^5..10^7 pages):
  pure ``spark.range`` + column expressions, HTML assembled JVM-side with
  concat — zero driver loops, zero Python in generation, so the bench
  measures the ENGINE, not the generator.

Same seed => byte-identical output (generators are pure).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.imagecodec import average_phash, decode_bytes, encode_array

_WORDS = (
    "ocean ember quartz willow falcon harbor meadow cinder aspen ridge "
    "lantern drift marble sable thicket juniper cobalt summit heron vale"
).split()

CORPUS_COLUMNS = [
    "url", "host", "status", "content_type", "html",
    "image_id", "bytes", "fmt", "w", "h", "caption", "phash",
]


def _caption(rng: np.random.RandomState) -> str:
    return " ".join(rng.choice(_WORDS, size=rng.randint(3, 8)))


def _image(rng: np.random.RandomState, fmt: str) -> tuple[bytes, int, int, int]:
    w = int(rng.choice([32, 48, 64]))
    h = int(rng.choice([32, 48, 64]))
    arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_array(arr, fmt)
    # phash is defined over DECODED pixels (what a consumer of `bytes`
    # sees), so lossy formats hash the quantized image, not the original
    decoded, _ = decode_bytes(data)
    return data, w, h, average_phash(decoded)


def synth_corpus_rows(
    n_pages: int = 100,
    n_hosts: int = 3,
    branching: int = 3,
    seed: int = 42,
    image_every: int = 2,
) -> list[dict]:
    """Generate corpus rows as plain dicts (shared by the Spark generator
    and the sequential parity simulator)."""
    rng = np.random.RandomState(seed)
    hosts = [f"host{i}.example" for i in range(n_hosts)]
    rows = []
    for j in range(n_pages):
        host = hosts[j % n_hosts]
        dirlike = j % 17 == 5
        path = f"/dir{j}/" if dirlike else f"/p/{j}"
        url = f"https://{host}{path}"
        status, ctype = 200, "text/html; charset=utf-8"
        if j % 23 == 7:
            status = 404
        elif j % 29 == 11:
            status = 500
        if j % 19 == 9:
            ctype = "application/pdf"

        # out-links: tree children + adversarial extras
        hrefs: list[str] = []
        for c in range(1, branching + 1):
            child = j * branching + c
            if child < n_pages:
                ch = hosts[child % n_hosts]
                cp = f"/dir{child}/" if child % 17 == 5 else f"/p/{child}"
                if ch == host and child % 5 == 0:
                    hrefs.append(cp)  # relative href (urljoin exercise)
                else:
                    hrefs.append(f"https://{ch}{cp}")
        if j % 4 == 1 and j > 0:
            hrefs.append(f"https://{host}/p/0#frag{j}")     # fragment dup
        if j % 6 == 2:
            hrefs.append(f"https://{host}/p/{max(j - 1, 0)}")  # cycle/dup
        if j % 8 == 3:
            hrefs.append(f"https://{host}/logout/session{j}")  # excluded pat
        if j % 10 == 4:
            hrefs.append(f"https://elsewhere.example/x/{j}")   # off-base
        if j % 13 == 6:
            hrefs.append(f"https://{host}/p/{n_pages + j}")    # dangling 404

        anchors = "".join(
            f'<a href="{h}">link{i}</a>' for i, h in enumerate(hrefs)
        )
        title = f"Page {j} {_WORDS[j % len(_WORDS)]}"
        body_parts = [f"<h1>Heading {j}</h1>"]
        empty_page = j % 31 == 13
        if not empty_page:
            body_parts.append(f"<p>{_caption(rng)} body of page {j}.</p>")
            body_parts.append(f"<h2>Section {j % 7}</h2>")
            body_parts.append(f"<p>{_caption(rng)}</p>")
        if j % 9 == 0:
            body_parts.append(f'<div class="ad"><p>ad copy {j}</p></div>')
        if j % 11 == 0:
            body_parts.append(f'<div id="main"><p>main content {j}</p></div>')

        image_id, data, fmt, w, h, caption, phash = None, None, None, None, None, None, None
        if j % image_every == 0 and status == 200:
            fmt = ["png", "jpeg", "webp"][j % 3]
            image_id = f"img-{j:06d}"
            data, w, h, phash = _image(rng, fmt)
            caption = _caption(rng)
            body_parts.append(
                f'<figure><img src="{image_id}"/>'
                f"<figcaption>{caption}</figcaption></figure>"
            )
        if empty_page:
            # page whose extraction yields empty markdown (NULL-content path)
            body_parts = []

        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body>{''.join(body_parts)}{anchors}</body></html>"
        )
        rows.append(
            dict(
                url=url, host=host, status=status, content_type=ctype,
                html=html, image_id=image_id, bytes=data, fmt=fmt,
                w=w, h=h, caption=caption, phash=phash,
            )
        )
    return rows


_CORPUS_SCHEMA = (
    "url string, host string, status int, content_type string, html string, "
    "image_id string, bytes binary, fmt string, w int, h int, "
    "caption string, phash long"
)


def synth_corpus(
    spark: SparkSession,
    n_pages: int = 100,
    n_hosts: int = 3,
    branching: int = 3,
    seed: int = 42,
) -> DataFrame:
    rows = synth_corpus_rows(n_pages, n_hosts, branching, seed)
    # tuples, NOT a pandas frame: pandas coerces a nullable int64 column
    # (phash) to float64, silently destroying values above 2^53
    data = [tuple(r[c] for c in CORPUS_COLUMNS) for r in rows]
    return spark.createDataFrame(data, schema=_CORPUS_SCHEMA)


def _distributed_html(pid, n_pages: int, n_hosts: int, branching: int):
    """The bench page's HTML as a pure column expression of its page id —
    shared by the table generator and the column-level fetch function.

    The anchor list is ONE ``transform(sequence(...))`` lambda, not
    ``branching`` unrolled concat branches: the fetch expression rides in
    EVERY wave's plan, and at branching=64 the unrolled form was a
    ~1300-node tree that Catalyst re-analyzed and AQE re-optimized several
    times per wave — measured ~2-4s of driver time per wave, a fixed cost
    that cannot be parallelized away and directly caps N->4N scaling."""
    def child_anchor(c):
        cid = pid * branching + c
        return F.when(
            cid < n_pages,
            F.concat(
                F.lit('<a href="https://host'),
                (cid % n_hosts).cast("string"), F.lit(".example/p/"),
                cid.cast("string"), F.lit('">c</a>'),
            ),
        ).otherwise(F.lit(""))

    anchors = F.concat_ws(
        "", F.transform(F.sequence(F.lit(1), F.lit(branching)), child_anchor)
    )
    prev_host = F.concat(
        F.lit("host"), ((pid - 1) % n_hosts).cast("string"), F.lit(".example")
    )
    dup = F.when(
        (pid % 6 == 2) & (pid > 0),
        F.concat(
            F.lit('<a href="https://'), prev_host, F.lit("/p/"),
            (pid - 1).cast("string"), F.lit('">d</a>'),
        ),
    ).otherwise(F.lit(""))
    caption = F.when(
        pid % 2 == 0,
        F.concat(
            F.lit("<figure><img src=\"img-"), pid.cast("string"),
            F.lit("\"/><figcaption>caption "), pid.cast("string"),
            F.lit(" words</figcaption></figure>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<html><head><title>Page "), pid.cast("string"),
        F.lit("</title></head><body><h1>Heading "), pid.cast("string"),
        F.lit("</h1><p>body text "), pid.cast("string"),
        F.lit(" lorem ipsum dolor sit amet consectetur.</p><h2>Section</h2><p>more "),
        pid.cast("string"), F.lit(" text.</p>"),
        caption, anchors, dup, F.lit("</body></html>"),
    )


def _null_payload():
    return [
    F.lit(None).cast("string").alias("image_id"),
    F.lit(None).cast("binary").alias("bytes"),
    F.lit(None).cast("string").alias("fmt"),
    F.lit(None).cast("int").alias("w"),
    F.lit(None).cast("int").alias("h"),
    F.lit(None).cast("string").alias("caption"),
    F.lit(None).cast("long").alias("phash"),
    ]


def synth_corpus_distributed(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 64,
    branching: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Bench-scale corpus: generation is 100% JVM column expressions over
    spark.range — scales linearly with cores, no Python anywhere.

    Graph: b-ary tree over page ids (child = id*b + c), same-host links,
    plus one dup link (id-1) every 6th page. All pages are 200/text-html
    with a 2-header + 1-paragraph body; every 2nd page carries a caption
    figure (no real image bytes at bench scale — the fetch/extract path is
    what's measured; decode benches run on the rich corpus).
    """
    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    pid = F.col("id")
    host = F.concat(F.lit("host"), (pid % n_hosts).cast("string"), F.lit(".example"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), pid.cast("string"))
    return df.select(
        url.alias("url"),
        host.alias("host"),
        F.lit(200).alias("status"),
        F.lit("text/html; charset=utf-8").alias("content_type"),
        _distributed_html(pid, n_pages, n_hosts, branching).alias("html"),
        *_null_payload(),
    )


def synth_fetch_df_fn(n_pages: int, n_hosts: int = 64, branching: int = 3):
    """Column-level fetch function over the SAME synthetic web graph as
    :func:`synth_corpus_distributed` (byte-identical HTML per URL), for
    ``CrawlConfig.fetch_df_fn``: the response is computed from the URL with
    pure JVM expressions, so fetch cost is O(wave) — the cost shape of a
    real HTTP fetch — instead of the corpus join's O(corpus)-per-wave
    cache scan (a simulation artifact the bench must not measure)."""

    # the response Columns are pure functions of the url — build the tree
    # ONCE in the closure, not per wave: the html expression alone is a
    # multi-hundred-node tree whose py4j construction cost (~0.2-0.3s)
    # rode in EVERY wave's plan_build_py driver phase
    #
    # pid derivation must be CHEAP, not just computed once: Catalyst's
    # filter pushdown substitutes the _fetch_pid alias BY ITS DEFINITION
    # when it folds the engine's scrape gate (status=200 AND text/html)
    # into a scan-level predicate on the frontier delta — the gate
    # references pid 6 times, so the pushed filter evaluates the
    # definition 12x per pending row in the wave's FIRST stage, which
    # runs at delta-file parallelism. With the previous
    # regexp_extract(url, '/p/(\d+)$', 1) that filter alone cost
    # 14.5 JVM-CPU-core-seconds per 1M-URL wave at 8 cores vs 6.3 at 2
    # (2.3s of an 11.5s wave — a pure hi-leg scaling tax). The
    # substring_index + try_cast form is ~two orders cheaper per call,
    # so the 12x inlining is harmless. Semantics vs the regexp: the
    # tail != url guard rejects URLs with no '/p/' at all, and try_cast
    # (ANSI rules) rejects trailing garbage; the only divergence is
    # sign/whitespace forms ('/p/+12', '/p/ 12') which ANSI casts accept
    # — non-canonical URLs that the corpus-join fetch (URL-equality
    # join) never matched either, so the parity contract
    # (test_fetch_df_fn_matches_corpus_join: identical crawl from
    # canonical seeds) is unaffected.
    tail = F.substring_index(F.col("url"), "/p/", -1)
    # pid MUST be materialized as a real column first: the html tree
    # references it ~3*branching times, and inlining even this cheap
    # expression at every reference re-evaluates it per reference
    # (CollapseProject keeps multi-referenced non-trivial aliases as a
    # separate projection)
    pid_col = F.when(tail != F.col("url"), tail.try_cast("long"))
    pid = F.col("_fetch_pid")
    hit = pid.isNotNull() & (pid >= 0) & (pid < n_pages)
    response_cols = [
        F.when(hit, F.lit(200)).cast("int").alias("status"),
        F.when(hit, F.lit("text/html; charset=utf-8")).alias("content_type"),
        F.when(hit, _distributed_html(pid, n_pages, n_hosts, branching))
        .alias("html"),
        *_null_payload(),
    ]

    def fetch(pending: DataFrame) -> DataFrame:
        tmp = pending.withColumn("_fetch_pid", pid_col)
        return tmp.select(*pending.columns, *response_cols)

    return fetch


def synth_image_rows(
    n_images: int = 200, seed: int = 42
) -> list[tuple]:
    """Driver-side row synthesis for the input_hint image table —
    deterministic in (n_images, seed). Shared by ``synth_images_table``
    (the Spark queries) and tools/gen_phash_literals.py (the pinned
    oracle fixture), so the literals the DuckDB oracles brute-force over
    are BY CONSTRUCTION the rows the Spark side computes on."""
    rng = np.random.RandomState(seed)
    rows = []
    for j in range(n_images):
        fmt = ["png", "jpeg", "webp"][j % 3]
        data, w, h, phash = _image(rng, fmt)
        rows.append(
            (f"img-{j:06d}", data, w, h, fmt, _caption(rng), phash)
        )
    return rows


def synth_images_table(
    spark: SparkSession, n_images: int = 200, seed: int = 42
) -> DataFrame:
    """The input_hint table shape (image_id, bytes, w, h, fmt, caption,
    phash) — FIXTURES.md §2 / BASELINE.json:15."""
    return spark.createDataFrame(
        synth_image_rows(n_images, seed),
        schema="image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
