"""URL canonicalization, validity predicates, and hashing.

Reference semantics (cites are into /root/reference, the surveyed crawler):

- fragment strip before validity:      scraper.py:164-168
- base-url prefix filter:              scraper.py:112-113
- include/exclude substring filters:   scraper.py:114-120
- composite is_valid_link:             scraper.py:100-122
- relative URL resolution (urljoin):   scraper.py:161
- url -> filename sanitization:        utils.py:29-54
- url dirname (default base url):      utils.py:57-89
- order-preserving seed dedup:         utils.py:93-105

Spark-first design: everything row-parallel is a **column expression**
(JVM-side, whole-stage-codegen) — validity filters, defrag, host
extraction, xxhash64. Only genuine RFC-3986 relative-reference
resolution (dot-segment removal, scheme/authority inheritance) drops to a
vectorized Arrow pandas UDF, and only on the link-extraction path where
relative hrefs exist. Per-row Python is never used.
"""

from __future__ import annotations

from functools import reduce
from operator import or_
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Column-expression canonicalization (hot path, JVM-side)
# ---------------------------------------------------------------------------


def defrag(url: Column) -> Column:
    """Strip ``#fragment`` (reference: urldefrag, scraper.py:164-168).

    ``substring_index(url, '#', 1)`` == everything before the first '#';
    URLs without '#' pass through unchanged.
    """
    return F.substring_index(url, "#", 1)


def host_of(url: Column) -> Column:
    """Lowercased authority host of an absolute URL (politeness key)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def canonicalize(url: Column) -> Column:
    """Cheap RFC-3986 canonicalization as pure column expressions:

    - trim surrounding whitespace
    - strip fragment
    - lowercase scheme and authority (path stays case-sensitive)
    - drop default ports (:80 for http, :443 for https)
    - empty path on an authority-only URL -> '/'

    This is the per-candidate-link hot path at frontier scale, so it must
    stay inside whole-stage codegen; the heavier dot-segment /
    relative-reference resolution lives in :func:`resolve_links_udf`.
    """
    u = F.trim(url)
    u = defrag(u)
    # lowercase scheme://authority, preserve the rest
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*:", "")
    has_scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1) != ""
    # authority = //host[:port]; lowercase it
    auth = F.regexp_extract(rest, r"^//([^/?]*)", 1)
    tail = F.regexp_replace(rest, r"^//[^/?]*", "")
    auth_lc = F.lower(auth)
    auth_final = F.when(scheme == "http", F.regexp_replace(auth_lc, r":80$", "")).when(
        scheme == "https", F.regexp_replace(auth_lc, r":443$", "")
    ).otherwise(auth_lc)
    path_fixed = F.when(tail == "", F.lit("/")).otherwise(tail)
    rebuilt = F.concat(scheme, F.lit("://"), auth_final, path_fixed)
    return F.when(has_scheme & rest.startswith("//"), rebuilt).otherwise(u)


def url_hash(url_canon: Column) -> Column:
    """64-bit key for the seen-set / joins (north_rule: 64-bit hashing).

    xxhash64 is JVM-native and codegen'd. Collisions at 10^10 URLs:
    birthday bound ~ (10^10)^2 / 2^65 ≈ 0.27% chance of *any* collision —
    exact-parity paths therefore join on (url_hash, url) string-confirm;
    see operators/seen.py.
    """
    return F.xxhash64(url_canon)


# ---------------------------------------------------------------------------
# Validity predicates (reference scraper.py:100-122)
# ---------------------------------------------------------------------------


def valid_link_expr(
    url: Column,
    base_url: str | None = None,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
) -> Column:
    """Composite is_valid_link as ONE boolean column expression.

    - base_url set     -> url must startswith(base_url)          (F1)
    - include list set -> url must contain ANY include pattern    (F2)
    - exclude list set -> url must contain NO exclude pattern     (F3)

    Catalyst collapses the conjunction and pushes it into scans. Empty
    pattern lists mean "no constraint", matching the reference exactly.
    """
    conds: list[Column] = []
    if base_url:
        conds.append(url.startswith(F.lit(base_url)))
    if include_patterns:
        conds.append(reduce(or_, [url.contains(p) for p in include_patterns]))
    if exclude_patterns:
        conds.append(~reduce(or_, [url.contains(p) for p in exclude_patterns]))
    if not conds:
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


# ---------------------------------------------------------------------------
# Arrow UDF: full RFC-3986 relative-reference resolution
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def _resolve_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    # vectorized over the Arrow batch; urljoin implements RFC 3986 §5
    return pd.Series(
        [urljoin(b, h) if h is not None and b is not None else None
         for b, h in zip(base, href)],
        dtype="object",
    )


def resolve_href(page_url: Column, href: Column) -> Column:
    """RFC-3986 resolution of an extracted href against its page URL
    (reference: urljoin at scraper.py:161). Arrow-batched; used only on
    the link-extraction path where relative references exist.
    """
    return _resolve_udf(page_url, href)


# ---------------------------------------------------------------------------
# Order-preserving dedup (reference utils.py:93-105 / seeds cli.py:160-170)
# ---------------------------------------------------------------------------


def dedup_first_occurrence(df, key: str, order_col: str):
    """First occurrence wins, original order kept.

    Distributed shape: min(order) per key then sort — two narrow shuffles
    on the key, no window over a single partition. ``order_col`` must be a
    pre-materialized total order (file line number, discovery_rank, ...).
    """
    return (
        df.groupBy(key)
        .agg(F.min(order_col).alias(order_col))
        .orderBy(order_col)
    )


# ---------------------------------------------------------------------------
# Driver-side helpers (file naming / default base-url; small, not data-plane)
# ---------------------------------------------------------------------------


def url_to_filename(url: str) -> str:
    """netloc+path with '/' and '.' -> '_', runs of '_' collapsed
    (reference utils.py:29-54). Driver-side: names output artifacts."""
    parts = urlsplit(url)
    s = f"{parts.netloc}{parts.path}"
    out = []
    prev_us = False
    for ch in s:
        if ch in "/.":
            ch = "_"
        if ch == "_":
            if prev_us:
                continue
            prev_us = True
        else:
            prev_us = False
        out.append(ch)
    return "".join(out).strip("_")


def sanitize_filename(name: str) -> str:
    """Keep alnum and '-_.', space -> '_', drop the rest
    (reference utils.py:9-26). Driver-side: names output artifacts."""
    out = []
    for ch in str(name):
        if ch == " ":
            out.append("_")
        elif ch.isalnum() or ch in "-_.":
            out.append(ch)
    return "".join(out)


def url_dirname(url: str) -> str:
    """Drop the last path segment, ensure trailing '/'
    (reference utils.py:57-89; default base_url, cli.py:192-195)."""
    parts = urlsplit(url)
    path = parts.path
    if not path:
        path = "/"
    elif not path.endswith("/"):
        path = path.rsplit("/", 1)[0] + "/"
    return urlunsplit((parts.scheme, parts.netloc, path, "", ""))
