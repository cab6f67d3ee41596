"""Markdown transform parity: Spark column expressions vs the reference's
pure-Python loops (re-stated here verbatim-semantics from
export_manager.py:23-61; its own tests assert the same strings)."""

from pyspark.sql import functions as F

from crawler_to_md_spark.functions.text import (
    collapse_newlines,
    metadata_comment,
    shift_headers,
    whitespace_tokens,
)


def ref_adjust_headers(content: str, level_increment: int = 1) -> str:
    # literal reference semantics (export_manager.py:23-43)
    new_content = ""
    for line in content.split("\n"):
        if line.startswith("#"):
            hashes = len(line.split(" ")[0])
            new_hashes = min(hashes + level_increment, 6)
            line = "\n" + "#" * new_hashes + line[hashes:] + "\n"
        new_content += line + "\n"
    return new_content


def ref_cleanup(content: str) -> str:
    while "\n\n\n" in content:
        content = content.replace("\n\n\n", "\n\n")
    return content


def _apply(spark, col_fn, s):
    df = spark.createDataFrame([(s,)], "c string")
    return df.select(col_fn(F.col("c")).alias("o")).collect()[0]["o"]


CASES = [
    "# Title\nbody\n## Sub\ntext",
    "###### deep\nx",
    "#nospace\nY",
    "## a b c\n\n\n\n#last",
    "plain\nonly\ntext",
    "",
    "# t ",
    "## double # hash\n### x #y",
]


def test_shift_headers_matches_reference(spark):
    for case in CASES:
        assert _apply(spark, shift_headers, case) == ref_adjust_headers(case), case


def test_collapse_matches_reference_loop(spark):
    for case in ["a\n\n\n\nb", "a\nb", "\n\n\n\n\n", "x\n\n\ny\n\n\n\nz", ""]:
        assert _apply(spark, collapse_newlines, case) == ref_cleanup(case), repr(case)


def test_shift_then_collapse_pipeline(spark):
    # the export pipeline shape: shift then collapse, byte-equal to reference
    for case in CASES:
        expect = ref_cleanup(ref_adjust_headers(case))
        got = _apply(spark, lambda c: collapse_newlines(shift_headers(c)), case)
        assert got == expect, case


def test_metadata_comment(spark):
    df = spark.createDataFrame(
        [("https://e.x/p", {"title": "T", "junk": None})],
        "url string, metadata map<string,string>",
    )
    out = df.select(
        metadata_comment(F.col("url"), F.col("metadata")).alias("o")
    ).collect()[0]["o"]
    # reference export_manager.py:83-87 with null-valued keys dropped (:78-80)
    assert out == "<!--\nURL: https://e.x/p\ntitle: T\n-->"


def test_whitespace_tokens(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  x ",)], "t string")
    got = [r[0] for r in df.select(whitespace_tokens(F.col("t"))).collect()]
    assert got == [3, 0, 1]
