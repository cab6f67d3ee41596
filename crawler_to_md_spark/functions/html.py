"""HTML parsing / extraction: pure functions + Arrow UDF wrappers.

The reference parses with BeautifulSoup and converts with MarkItDown
(scraper.py:152-161, 192-232). Neither library is installed in this
sandbox, so this module implements a deterministic regex-based parser for
the RESTRICTED HTML DIALECT our synthetic corpus generator emits
(flat <div id=/class=> blocks, <a href>, <title>, <h1..6>, <p>,
<figcaption>, <img>). The pure functions here are the SINGLE source of
truth for extraction semantics: both the Spark UDFs (engine) and the
sequential parity simulator (crawl/simulator.py) call them, so
engine-vs-reference-semantics parity is byte-exact by construction.

Reference semantics preserved:
- link extraction = all a[href] values, resolved with urljoin
  (scraper.py:152-161), de-duplicated per page (set(), scraper.py:171 —
  we pin first-occurrence-in-document order as the parity ordering
  contract, SURVEY.md §8.1);
- comment / script / style spans are blanked before every extraction
  pass (sanitize_html): bs4 parses them as Comment / raw-text nodes, so
  tags inside them are never elements — a commented-out <a href> is not
  a link and a commented <h1> is not content;
- include-selector projection: matched blocks in selector-then-document
  order (scraper.py:194-211); '#id' matches FIRST id match only,
  '.class' and 'tag' match all (scraper.py:82-98);
- exclude-selector pruning applied AFTER include (scraper.py:213-215);
- title = <title> text else "" (scraper.py:218-220);
- empty markdown -> (None, None) (scraper.py:234-236).
"""

from __future__ import annotations

import re
import time
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# attribute values accept either quote style (bs4 parses both); group 1
# captures double-quoted, group 2 single-quoted
_HREF_RE = re.compile(
    r"<a\s[^>]*?href=(?:\"([^\"]*)\"|'([^']*)')[^>]*>", re.IGNORECASE
)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_CAPTION_RE = re.compile(r"<figcaption>(.*?)</figcaption>", re.IGNORECASE | re.DOTALL)
_IMG_RE = re.compile(
    r"<img\s[^>]*?src=(?:\"([^\"]*)\"|'([^']*)')[^>]*>", re.IGNORECASE
)


def _attr_group(m: re.Match) -> str:
    """The matched attribute value from a two-quote-style pattern."""
    return m.group(1) if m.group(1) is not None else m.group(2)
_TAG_RE = re.compile(r"<[^>]+>")
_HEADER_RE = re.compile(r"<h([1-6])[^>]*>(.*?)</h\1>", re.IGNORECASE | re.DOTALL)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.IGNORECASE | re.DOTALL)
_HEAD_RE = re.compile(r"<head>.*?</head>", re.IGNORECASE | re.DOTALL)
# comment / script / style spans: bs4 parses these as Comment nodes or
# raw-text elements, so tags INSIDE them are never elements (an <a href>
# in a comment is not a link, a commented <h1> is not content). An
# unterminated comment or raw-text element swallows the rest of the
# document (html.parser auto-closes at EOF) — the (?:...|$) alternates.
_NONMARKUP_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<script\b[^>]*>.*?(?:</script\s*>|$)"
    r"|<style\b[^>]*>.*?(?:</style\s*>|$)",
    re.IGNORECASE | re.DOTALL,
)
_NONMARKUP_MARK_RE = re.compile(r"<!--|<script|<style", re.IGNORECASE)


def sanitize_html(html: str) -> str:
    """Blank out comment/script/style spans with SPACES — offset-preserving
    (find_blocks spans and markdown piece ordering index into the same
    string), so every downstream regex sees the document bs4 would expose
    as markup. Text the spans contained contributes whitespace only, like
    bs4's Comment / raw-text nodes contribute nothing to get_text()."""
    doc = html or ""
    # cheap marker search first: pages without comments/script/style (the
    # common hot-path case) skip the span-replacing sub entirely — no
    # callback dispatch, no string rebuild
    if not _NONMARKUP_MARK_RE.search(doc):
        return doc
    return _NONMARKUP_RE.sub(lambda m: " " * len(m.group(0)), doc)


def extract_hrefs(html: str) -> list[str]:
    """All a[href] values in document order (duplicates kept; the caller
    dedups per the parity ordering contract).

    findall, not finditer: exactly one of the two quote-style groups
    participates per match, and a non-participating group comes back ""
    — so `a if a else b` picks the participating value (when the real
    value IS "", both are "" and the result is still correct). Saves a
    Match object + two .group() calls per href in the hot scrape path."""
    return [a if a else b for a, b in _HREF_RE.findall(html or "")]


def extract_links(html: str, page_url: str,
                  pre_sanitized: bool = False) -> list[str]:
    """Absolute out-links in first-occurrence document order, urljoined
    against the page URL (scraper.py:161) and de-duplicated.

    Already-absolute http(s) hrefs skip urljoin — identical output
    (urljoin(base, abs) == abs for http/https), and urljoin is the
    scrape stage's hottest call at ~100 links/page.

    ``pre_sanitized``: the caller already ran sanitize_html on the doc —
    the hot scrape UDF sanitizes ONCE and feeds both this and scrape_page
    (sanitize is idempotent, so double-calling is correct but wasted)."""
    seen: set[str] = set()
    out: list[str] = []
    doc = html if pre_sanitized else sanitize_html(html)
    for href in extract_hrefs(doc):
        if href.startswith("https://") or href.startswith("http://"):
            absolute = href
        else:
            absolute = urljoin(page_url, href)
        if absolute not in seen:
            seen.add(absolute)
            out.append(absolute)
    return out


def extract_title(html: str) -> str:
    m = _TITLE_RE.search(html or "")
    return m.group(1).strip() if m else ""


def extract_caption(html: str) -> str | None:
    m = _CAPTION_RE.search(html or "")
    return m.group(1).strip() if m else None


def extract_image_id(html: str) -> str | None:
    m = _IMG_RE.search(html or "")
    return _attr_group(m) if m else None


def _open_pattern(selector: str) -> re.Pattern:
    """Opening-tag pattern for a selector ('#id' | '.class' | 'tag');
    group(1) captures the tag name for close-tag balancing.

    bs4-parity details (reference _find_elements, scraper.py:82-98):
    attribute ORDER within the tag is irrelevant; values may use either
    quote style; '.class' matches a TOKEN of a multi-valued class
    attribute (soup.find_all(class_=x) semantics: x in the class list)."""
    if selector.startswith("#"):
        ident = re.escape(selector[1:])
        return re.compile(
            rf"<(\w+)[^>]*\sid=(?:\"{ident}\"|'{ident}')[^>]*>",
            re.IGNORECASE,
        )
    if selector.startswith("."):
        cls = re.escape(selector[1:])
        tok_d = rf"\"(?:[^\"]*\s)?{cls}(?:\s[^\"]*)?\""
        tok_s = rf"'(?:[^']*\s)?{cls}(?:\s[^']*)?'"
        return re.compile(
            rf"<(\w+)[^>]*\sclass=(?:{tok_d}|{tok_s})[^>]*>", re.IGNORECASE
        )
    tag = re.escape(selector)
    return re.compile(rf"<({tag})(?=[\s>])[^>]*>", re.IGNORECASE)


def find_blocks(doc: str, selector: str) -> list[tuple[int, int]]:
    """(start, end) spans of elements matching the selector, balancing
    NESTED same-tag elements by open/close depth counting — the semantics
    the reference gets from bs4's DOM (scraper.py:92-98: soup.find /
    find_all, which also return nested matches individually).

    Self-closing openers (<tag .../>) yield no span. An element whose
    close tag never appears spans to END OF DOCUMENT — bs4's html.parser
    auto-closes unclosed block tags at EOF, so the element's content is
    everything after the opener."""
    spans: list[tuple[int, int]] = []
    for m in _open_pattern(selector).finditer(doc):
        if m.group(0).endswith("/>"):
            continue
        tag = re.escape(m.group(1))
        oc = re.compile(rf"<{tag}(?=[\s>/])[^>]*>|</{tag}\s*>", re.IGNORECASE)
        depth = 1
        for t in oc.finditer(doc, m.end()):
            tok = t.group(0)
            if tok.startswith("</"):
                depth -= 1
                if depth == 0:
                    spans.append((m.start(), t.end()))
                    break
            elif not tok.endswith("/>"):
                depth += 1
        else:  # unclosed: bs4 auto-close at document end
            spans.append((m.start(), len(doc)))
    return spans


def _remove_spans(doc: str, spans: list[tuple[int, int]]) -> str:
    """Delete spans (overlaps merged — removing an outer block subsumes
    its nested matches, like decomposing a bs4 parent)."""
    out: list[str] = []
    last = 0
    for s, e in sorted(spans):
        if s >= last:
            out.append(doc[last:s])
            last = e
        elif e > last:
            last = e
    out.append(doc[last:])
    return "".join(out)


def filter_html(
    html: str,
    include_selectors: list[str] | None = None,
    exclude_selectors: list[str] | None = None,
) -> str:
    """Include-projection then exclude-pruning (scraper.py:194-215).

    Include: concatenate matched blocks in selector-then-document order;
    '#id' keeps only the first match (reference soup.find semantics);
    '.class'/'tag' keep every match including nested ones (reference
    find_all appends each element separately, scraper.py:205-211).
    Exclude: remove matching blocks from the (possibly projected) doc.
    """
    doc = html or ""
    if include_selectors:
        parts: list[str] = []
        for sel in include_selectors:
            spans = find_blocks(doc, sel)
            if sel.startswith("#"):
                spans = spans[:1]
            parts.extend(doc[s:e] for s, e in spans)
        doc = "\n".join(parts)
    if exclude_selectors:
        for sel in exclude_selectors:
            doc = _remove_spans(doc, find_blocks(doc, sel))
    return doc


def html_to_markdown(html: str) -> str:
    """Deterministic HTML->Markdown for the restricted dialect (the
    MarkItDown slot, scraper.py:222-232; in-memory, no temp files).

    <hN>x</hN> -> '#'*N + ' x'; <p>x</p> -> x; <figcaption> -> *x*;
    remaining tags stripped; blank-line separated in document order.
    """
    doc = html or ""
    # drop head section entirely (title is metadata, not content)
    doc = _HEAD_RE.sub("", doc)
    pieces: list[tuple[int, str]] = []
    for m in _HEADER_RE.finditer(doc):
        level = int(m.group(1))
        text = _TAG_RE.sub("", m.group(2)).strip()
        pieces.append((m.start(), "#" * level + " " + text))
    for m in _P_RE.finditer(doc):
        text = _TAG_RE.sub("", m.group(1)).strip()
        if text:
            pieces.append((m.start(), text))
    for m in _CAPTION_RE.finditer(doc):
        text = _TAG_RE.sub("", m.group(1)).strip()
        if text:
            pieces.append((m.start(), f"*{text}*"))
    pieces.sort(key=lambda t: t[0])
    return "\n\n".join(p for _, p in pieces)


def scrape_page(
    html: str,
    include_selectors: list[str] | None = None,
    exclude_selectors: list[str] | None = None,
    pre_sanitized: bool = False,
) -> tuple[str | None, str, str | None, str | None]:
    """(markdown|None, title, caption|None, image_id|None) — the reference's
    scrape_page contract (scraper.py:176-245): selector filtering, title
    from the ORIGINAL doc, empty markdown -> None. ``pre_sanitized`` as in
    extract_links."""
    doc = html if pre_sanitized else sanitize_html(html)
    title = extract_title(doc)
    filtered = filter_html(doc, include_selectors, exclude_selectors)
    md = html_to_markdown(filtered)
    caption = extract_caption(filtered)
    image_id = extract_image_id(filtered)
    if not md.strip():
        return None, title, caption, image_id
    return md, title, caption, image_id


# ---------------------------------------------------------------------------
# Arrow UDF wrappers (batch-vectorized; engine hot path)
# ---------------------------------------------------------------------------

_SCRAPE_SCHEMA = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def make_scrape_udf(
    include_selectors: list[str] | None = None,
    exclude_selectors: list[str] | None = None,
    extract_links_too: bool = True,
    time_acc=None,
):
    """Build the per-batch scrape UDF with selector config compiled in
    (config is closure state, broadcast with the task — no per-row branching).
    One pass produces content+metadata+links so the fetched HTML is read
    once (reference reuses the fetched body the same way,
    scraper.py:345-356), and the doc is SANITIZED once — scrape_page and
    extract_links share the blanked-span view (ADVICE r3).

    ``time_acc``: optional Spark accumulator; each batch adds its Python
    wall seconds — the bench attributes the wave's UDF CPU share with it.
    """

    @F.pandas_udf(_SCRAPE_SCHEMA)
    def scrape_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
        t0 = time.perf_counter() if time_acc is not None else 0.0
        contents, titles, captions, image_ids, links = [], [], [], [], []
        for h, u in zip(html, url):
            if h is None:
                contents.append(None)
                titles.append("")
                captions.append(None)
                image_ids.append(None)
                links.append([])
                continue
            doc = sanitize_html(h)
            md, title, caption, image_id = scrape_page(
                doc, include_selectors, exclude_selectors, pre_sanitized=True
            )
            contents.append(md)
            titles.append(title)
            captions.append(caption)
            image_ids.append(image_id)
            links.append(
                extract_links(doc, u, pre_sanitized=True)
                if extract_links_too else []
            )
        if time_acc is not None:
            time_acc.add(time.perf_counter() - t0)
        return pd.DataFrame(
            {
                "content": contents,
                "title": titles,
                "caption": captions,
                "image_id": image_ids,
                "links": links,
            }
        )

    return scrape_udf
