"""Nested-element selector contract (VERDICT r1 #8).

The reference resolves selectors against a bs4 DOM (scraper.py:92-98),
which handles nested same-tag elements; the regex dialect here must match
those semantics via depth-counted block spans. Expected strings below are
pinned to bs4 behavior: find_all returns OUTER and NESTED matches each as
full elements; decompose on the outer element removes nested ones too.
"""

from crawler_to_md_spark.functions.html import (
    filter_html,
    find_blocks,
    scrape_page,
)

NESTED = (
    '<html><body><div class="main"><p>outer</p>'
    '<div class="inner"><p>nested</p></div>'
    "</div><p>tail</p></body></html>"
)

SAME_TAG = (
    '<div id="a"><div><p>deep</p></div><p>after</p></div><div id="b"><p>x</p></div>'
)


def test_find_blocks_balances_nested_same_tag():
    spans = find_blocks(SAME_TAG, "#a")
    assert len(spans) == 1
    s, e = spans[0]
    # the block closes at ITS OWN </div>, past the nested one
    assert SAME_TAG[s:e] == '<div id="a"><div><p>deep</p></div><p>after</p></div>'


def test_include_nested_class_matches_all_like_find_all():
    # bs4 find_all(class_=...) returns outer AND inner as separate elements
    doc = ('<div class="x"><span>o</span><div class="x"><span>i</span></div>'
           "</div>")
    spans = find_blocks(doc, ".x")
    assert [doc[s:e] for s, e in spans] == [
        '<div class="x"><span>o</span><div class="x"><span>i</span></div></div>',
        '<div class="x"><span>i</span></div>',
    ]


def test_exclude_outer_removes_nested_too():
    out = filter_html(NESTED, exclude_selectors=[".main"])
    assert "outer" not in out and "nested" not in out
    assert "tail" in out


def test_include_then_markdown_nested():
    md, title, _, _ = scrape_page(NESTED, include_selectors=[".main"])
    # include keeps the whole outer block (nested <p> included) —
    # the inner block also matched nothing extra (.main only hits outer)
    assert md == "outer\n\nnested"
    assert title == ""


def test_id_selector_first_match_only():
    doc = '<div id="m"><p>one</p></div><div id="m"><p>two</p></div>'
    assert filter_html(doc, include_selectors=["#m"]) == '<div id="m"><p>one</p></div>'


def test_self_closing_skipped_unclosed_runs_to_eof():
    assert find_blocks('<img src="x"/><p>t</p>', "img") == []
    # bs4's html.parser auto-closes an unclosed block tag at document end:
    # the element's content is everything after the opener
    doc = "<div><p>never closed"
    assert [doc[s:e] for s, e in find_blocks(doc, "div")] == [doc]
    tail = '<p>before</p><div class="x"><p>inside'
    spans = find_blocks(tail, ".x")
    assert [tail[s:e] for s, e in spans] == ['<div class="x"><p>inside']


# --- dialect-contract tests vs bs4 semantics (reference _find_elements,
# --- scraper.py:82-98): attribute order, multi-valued class, quote style


def test_attribute_order_irrelevant():
    doc = '<div class="wide" id="m"><p>one</p></div>'
    assert filter_html(doc, include_selectors=["#m"]) == doc
    doc2 = '<div id="m" class="wide"><p>one</p></div>'
    assert filter_html(doc2, include_selectors=["#m"]) == doc2


def test_multi_valued_class_matches_token():
    # soup.find_all(class_='ad') matches class="ad banner" and
    # class="top ad" and class="top ad bottom", but NOT class="adx"
    doc = (
        '<div class="ad banner"><p>a</p></div>'
        '<div class="top ad"><p>b</p></div>'
        '<div class="adx"><p>c</p></div>'
    )
    spans = find_blocks(doc, ".ad")
    assert [doc[s:e] for s, e in spans] == [
        '<div class="ad banner"><p>a</p></div>',
        '<div class="top ad"><p>b</p></div>',
    ]


def test_single_quoted_attributes():
    doc = "<div id='m'><p>one</p></div><div class='ad x'><p>two</p></div>"
    assert filter_html(doc, include_selectors=["#m"]) == \
        "<div id='m'><p>one</p></div>"
    spans = find_blocks(doc, ".ad")
    assert [doc[s:e] for s, e in spans] == ["<div class='ad x'><p>two</p></div>"]


def test_single_quoted_hrefs_extracted():
    from crawler_to_md_spark.functions.html import extract_links

    doc = "<a href='/a'>x</a><a href=\"/b\">y</a>"
    assert extract_links(doc, "https://h.x/p/1") == [
        "https://h.x/a", "https://h.x/b",
    ]


def test_tag_selector_word_boundary():
    # 'p' must not match <pre> openers
    doc = "<pre>code</pre><p>text</p>"
    spans = find_blocks(doc, "p")
    assert [doc[s:e] for s, e in spans] == ["<p>text</p>"]


# --- comment / script / style sanitization (bs4 non-markup spans) ---------
# bs4 parses comments as Comment nodes and script/style as raw-text
# elements: tags inside them are NEVER elements. The regex dialect
# reproduces that by blanking those spans (offset-preserving) before any
# extraction pass (functions/html.py sanitize_html).

from crawler_to_md_spark.functions.html import (  # noqa: E402
    extract_links,
    extract_title,
    sanitize_html,
    scrape_page,
)


def test_commented_link_not_extracted():
    html = ('<html><body><a href="https://a.example/x">real</a>'
            '<!-- <a href="https://a.example/hidden">no</a> --></body></html>')
    assert extract_links(html, "https://a.example/") == ["https://a.example/x"]


def test_script_and_style_links_not_extracted():
    html = ('<html><body><script>var s = \'<a href="https://a.example/js">x</a>\';'
            '</script><style>/* <a href="https://a.example/css">y</a> */</style>'
            '<a href="https://a.example/real">r</a></body></html>')
    assert extract_links(html, "https://a.example/") == ["https://a.example/real"]


def test_commented_heading_not_in_markdown():
    html = ('<html><body><h1>Real</h1><!-- <h2>Ghost</h2> -->'
            '<p>text</p></body></html>')
    md, title, _, _ = scrape_page(html)
    assert md == "# Real\n\ntext"


def test_commented_title_ignored():
    html = ("<html><head><!-- <title>Ghost</title> --><title>Real</title>"
            "</head><body><p>x</p></body></html>")
    assert extract_title(sanitize_html(html)) == "Real"
    _, title, _, _ = scrape_page(html)
    assert title == "Real"


def test_unterminated_comment_swallows_rest():
    # html.parser auto-closes an unterminated comment at EOF: everything
    # after <!-- is comment text, not markup
    html = ('<html><body><a href="https://a.example/x">r</a>'
            '<!-- <a href="https://a.example/tail">no</a>')
    assert extract_links(html, "https://a.example/") == ["https://a.example/x"]


def test_selector_not_matched_inside_comment():
    html = ('<html><body><!-- <div class="main"><p>ghost</p></div> -->'
            '<div class="main"><p>real</p></div></body></html>')
    md, _, _, _ = scrape_page(html, include_selectors=[".main"])
    assert md == "real"


def test_sanitize_preserves_offsets():
    html = '<p>a</p><!-- xx --><p>b</p>'
    s = sanitize_html(html)
    assert len(s) == len(html)
    assert s.index("<p>b</p>") == html.index("<p>b</p>")
