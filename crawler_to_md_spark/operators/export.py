"""Exports: compiled Markdown, compiled JSON, individual files.

Reference: export_manager.py:100-110 (markdown), :112-137 (json),
:139-175 (individual). All three consume the pages table in insertion
(rowid) order — here ``orderBy(discovery_rank)`` (SURVEY.md §2.6).

Spark shape: ALL per-row text transforms (header shift, newline collapse,
metadata comment, null-metadata filter) run distributed as column
expressions; only the final small ordered fold/serialization happens on
the driver, because the output is ONE file — a driver-side ''.join over an
ordered collect of already-transformed strings is the correct plan (the
result is bounded by output-file size, not input scale; SURVEY.md A3/S11).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    collapse_newlines,
    drop_null_metadata,
    metadata_comment,
    shift_headers,
)


def _ordered_nonnull(pages: DataFrame) -> DataFrame:
    return pages.filter(F.col("content").isNotNull()).orderBy("discovery_rank")


def compiled_markdown(pages: DataFrame, title: str) -> str:
    """Byte-exact reference compile (export_manager.py:63-98):

      '# {title}\\n' + per page: '\\n{comment}\\n\\n{shifted}\\n---'
      with the \\n{3,}->\\n\\n cleanup applied after each append.

    The reference's cleanup-inside-the-loop equals one final cleanup
    because the collapse regex is idempotent and appends start with '\\n'
    + a non-newline comment — proven in tests/test_export.py against the
    literal reference loop.
    """
    blocks = _ordered_nonnull(pages).select(
        F.concat(
            F.lit("\n"),
            metadata_comment(F.col("url"), F.col("metadata")),
            F.lit("\n\n"),
            shift_headers(F.col("content")),
            F.lit("\n---"),
        ).alias("block"),
        "discovery_rank",
    )
    parts = [r["block"] for r in blocks.collect()]
    doc = f"# {title}\n" + "".join(parts)
    # single final cleanup == reference's per-append cleanup (idempotent)
    while "\n\n\n" in doc:
        doc = doc.replace("\n\n\n", "\n\n")
    return doc


def export_markdown(pages: DataFrame, title: str, output_path: str) -> None:
    with open(output_path, "w", encoding="utf-8") as f:
        f.write(compiled_markdown(pages, title))


def compiled_json_rows(pages: DataFrame) -> list[dict]:
    """Rows for the JSON export (export_manager.py:112-137): NULL-content
    pages skipped, content newline-collapsed, null metadata keys dropped."""
    rows = (
        _ordered_nonnull(pages)
        .select(
            "url",
            collapse_newlines(F.col("content")).alias("content"),
            drop_null_metadata(F.col("metadata")).alias("metadata"),
            "discovery_rank",
        )
        .collect()
    )
    return [
        {"url": r["url"], "content": r["content"], "metadata": dict(r["metadata"])}
        for r in rows
    ]


def export_json(pages: DataFrame, output_path: str) -> None:
    """indent=4, ensure_ascii=False — byte-exact vs json.dump defaults the
    reference uses (export_manager.py:135). Spark's write.json is JSONL;
    the indented-array shape forces driver serialization of the (small)
    final result."""
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(compiled_json_rows(pages), f, ensure_ascii=False, indent=4)


def individual_paths(pages: DataFrame, base_url: str | None = None) -> DataFrame:
    """(url, relpath, content) with the reference's path derivation
    (export_manager.py:156-165) as column expressions:
    strip base_url, strip scheme, trailing-slash/empty -> index.md else +.md.

    Divergence (documented): the reference writes even NULL-content pages
    and crashes on them (file.write(None) TypeError); we filter NULLs.
    """
    url = F.col("url")
    if base_url:
        url = F.replace(url, F.lit(base_url), F.lit(""))
    parsed = F.replace(
        F.replace(url, F.lit("https://"), F.lit("")), F.lit("http://"), F.lit("")
    )
    relpath = F.when(
        (parsed == "") | parsed.endswith("/"),
        F.concat(parsed, F.lit("index.md")),
    ).otherwise(F.concat(parsed, F.lit(".md")))
    return (
        pages.filter(F.col("content").isNotNull())
        .select("url", relpath.alias("relpath"), "content", "discovery_rank")
        .orderBy("discovery_rank")
    )


def export_individual_markdown(
    pages: DataFrame, output_folder: str, base_url: str | None = None
) -> str:
    """One .md per page under {output_folder}/files (export_manager.py:139-175).
    Path derivation is distributed; the writes fan out on the driver (file
    count == page count; at real scale this becomes foreachPartition
    against a shared filesystem — same column-derived paths)."""
    root = os.path.join(output_folder, "files")
    os.makedirs(root, exist_ok=True)
    for r in individual_paths(pages, base_url).collect():
        fp = os.path.join(root, r["relpath"])
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "w", encoding="utf-8") as f:
            f.write(r["content"])
    return root
