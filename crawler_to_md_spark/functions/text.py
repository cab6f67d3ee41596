"""Markdown/export text transforms as Spark column expressions.

Reference semantics:
- header-level shift (cap at 6, surround with blank lines):
  export_manager.py:23-43 (tests: tests/test_export_manager.py:46-54,80-87)
- newline collapse \\n{3,} -> \\n\\n (loop-to-fixpoint == single regex):
  export_manager.py:45-61
- metadata HTML-comment block: export_manager.py:83-87
- null-valued metadata key filter: export_manager.py:78-80

All of these run JVM-side: regexp / higher-order functions
(transform over split lines), no Python UDFs. Exactness is covered by
tests/test_text.py against the literal strings the reference's tests assert.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shift_headers(content: Column, shift: int = 1) -> Column:
    """Add ``shift`` '#'s to every markdown header line, capping the total
    at 6, and surround each header line with blank lines.

    Byte-exact reference semantics (export_manager.py:36-43):

    - header depth = ``len(line.split(" ")[0])`` — the FIRST SPACE-DELIMITED
      TOKEN's length, not the leading '#' run (so "#weird" counts 6 chars);
    - ``new = min(depth + shift, 6)``; line becomes
      "\\n" + "#"*new + line[depth:] + "\\n";
    - EVERY line (header or not) then gets a trailing "\\n" appended, so the
      output always ends with a newline.

    Spark shape: split -> transform (higher-order fn, codegen'd) -> rejoin
    with per-line "\\n" suffix; no Python UDF.
    """
    lines = F.split(content, "\n", -1)
    big = F.lit(1 << 30)

    def _one(line: Column) -> Column:
        depth = F.length(F.substring_index(line, " ", 1))
        new_hashes = F.least(depth + F.lit(shift), F.lit(6))
        shifted_line = F.concat(
            F.lit("\n"),
            F.repeat(F.lit("#"), new_hashes),
            F.substring(line, depth + F.lit(1), big),
            F.lit("\n"),
        )
        return F.concat(
            F.when(line.startswith("#"), shifted_line).otherwise(line),
            F.lit("\n"),
        )

    return F.array_join(F.transform(lines, _one), "")


def collapse_newlines(content: Column) -> Column:
    """Collapse runs of >=3 newlines to exactly 2.

    The reference loops ``replace('\\n\\n\\n','\\n\\n')`` until fixpoint
    (export_manager.py:45-61); a single '\\n{3,}' -> '\\n\\n' regex IS that
    fixpoint, proven in tests/test_text.py::test_collapse_matches_reference_loop.
    """
    return F.regexp_replace(content, r"\n{3,}", "\n\n")


def strip_blank_edges(content: Column) -> Column:
    """Trim leading/trailing newline runs (reference strips the final doc)."""
    return F.regexp_replace(F.regexp_replace(content, r"^\n+", ""), r"\n+$", "")


def drop_null_metadata(metadata: Column) -> Column:
    """map<string,string> with null-valued keys removed
    (reference export_manager.py:78-80: {k:v ... if v is not None})."""
    return F.map_filter(metadata, lambda _, v: v.isNotNull())


def metadata_comment(url: Column, metadata: Column) -> Column:
    """HTML comment block  '<!--\\nURL: {url}\\n{k}: {v}...\\n-->'
    (reference export_manager.py:83-87). Null-valued keys already dropped.

    Key order: the reference iterates dict insertion order, which for its
    single producer is always ['title']; we pin sorted(keys) for maps of
    size > 1 and document the divergence (tests/test_export.py).
    """
    kv_lines = F.array_join(
        F.transform(
            F.map_entries(drop_null_metadata(metadata)),
            lambda e: F.concat(e["key"], F.lit(": "), e["value"]),
        ),
        "\n",
    )
    body = F.concat(F.lit("URL: "), url)
    body = F.when(kv_lines == "", body).otherwise(
        F.concat(body, F.lit("\n"), kv_lines)
    )
    return F.concat(F.lit("<!--\n"), body, F.lit("\n-->"))


def whitespace_tokens(text: Column) -> Column:
    """Token count on whitespace runs (training-pipeline helper)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
