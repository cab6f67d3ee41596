from pyspark.sql import functions as F

from crawler_to_md_spark.functions.urls import (
    canonicalize,
    dedup_first_occurrence,
    defrag,
    host_of,
    resolve_href,
    url_dirname,
    url_hash,
    url_to_filename,
    valid_link_expr,
)


def _vals(spark, col_fn, rows):
    df = spark.createDataFrame([(r,) for r in rows], "url string")
    return [r[0] for r in df.select(col_fn(F.col("url"))).collect()]


def test_defrag(spark):
    assert _vals(spark, defrag, [
        "https://a.example/p#frag", "https://a.example/p", "x#y#z"
    ]) == ["https://a.example/p", "https://a.example/p", "x"]


def test_canonicalize(spark):
    got = _vals(spark, canonicalize, [
        " HTTPS://Host.Example:443/Path?q=1#f ",
        "http://host.example:80/a",
        "http://host.example:8080/a",
        "https://host.example",
        "no-scheme/path",
    ])
    assert got == [
        "https://host.example/Path?q=1",
        "http://host.example/a",
        "http://host.example:8080/a",
        "https://host.example/",
        "no-scheme/path",
    ]


def test_host_of(spark):
    assert _vals(spark, host_of, ["https://A.Example:8443/x"]) == ["a.example"]


def test_url_hash_deterministic(spark):
    a = _vals(spark, url_hash, ["https://a.example/p"])
    b = _vals(spark, url_hash, ["https://a.example/p"])
    assert a == b and isinstance(a[0], int)


def test_valid_link_expr(spark):
    # reference scraper.py:100-122 semantics incl. empty-list = no constraint
    rows = [
        "https://base.example/x/ok",
        "https://base.example/x/skip-logout",
        "https://other.example/x/ok",
        "https://base.example/y/keep-me",
    ]
    df = spark.createDataFrame([(r,) for r in rows], "url string")
    expr = valid_link_expr(
        F.col("url"),
        base_url="https://base.example/",
        include_patterns=["/x/", "keep"],
        exclude_patterns=["logout"],
    )
    got = [r[0] for r in df.filter(expr).collect()]
    assert got == ["https://base.example/x/ok", "https://base.example/y/keep-me"]
    assert df.filter(valid_link_expr(F.col("url"))).count() == 4


def test_resolve_href(spark):
    df = spark.createDataFrame(
        [("https://h.example/a/b", "../c"), ("https://h.example/a/b", "https://x.example/q"),
         ("https://h.example/a/", "d")],
        "base string, href string",
    )
    got = [r[0] for r in df.select(resolve_href(F.col("base"), F.col("href"))).collect()]
    assert got == ["https://h.example/c", "https://x.example/q", "https://h.example/a/d"]


def test_dedup_first_occurrence(spark):
    df = spark.createDataFrame(
        [("b", 3), ("a", 0), ("b", 1), ("c", 2), ("a", 4)], "url string, pos long"
    )
    got = [(r["url"], r["pos"]) for r in
           dedup_first_occurrence(df, "url", "pos").collect()]
    assert got == [("a", 0), ("b", 1), ("c", 2)]


def test_url_to_filename():
    # reference utils.py:29-54: '/'/'.' -> '_', collapse runs
    assert url_to_filename("https://www.example.com/a/b.html") == \
        "www_example_com_a_b_html"
    assert url_to_filename("https://ex.com//x//") == "ex_com_x"


def test_url_dirname():
    # reference utils.py:57-89
    assert url_dirname("https://ex.com/a/b/c.html") == "https://ex.com/a/b/"
    assert url_dirname("https://ex.com/a/b/") == "https://ex.com/a/b/"
    assert url_dirname("https://ex.com") == "https://ex.com/"
