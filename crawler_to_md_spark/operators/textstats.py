"""Text analysis for training-data pipelines — all JVM-side column
expressions (no Python in the hot path): language-ID, quality scoring,
token counting, document fingerprinting.

Every function here is deliberately expressible in ANSI SQL too, so each
has a DuckDB oracle in __spark_entry__.oracle_sql() — the correctness gate
runs them side-by-side on the documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal per-language stopword marker sets (n-gram heuristic lang-ID);
# chosen to be disjoint across languages
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with", "for"],
    "fr": ["le", "la", "les", "des", "avec"],
    "es": ["el", "los", "las", "para", "por"],
    "de": ["der", "die", "das", "und", "mit"],
    "zh": ["的", "是", "了", "在", "我"],
}

_EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with",
]


def tokens_of(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (empty -> empty array)."""
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens_of(text))


def bpe_ish_piece_count(text: Column) -> Column:
    """Sub-word-ish piece count: alnum runs + individual non-space symbols
    (a cheap proxy for BPE token counts; regexp_count is JVM-side)."""
    return (
        F.regexp_count(text, F.lit(r"[A-Za-z0-9]+"))
        + F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))
    )


def lang_id(text: Column) -> Column:
    """Marker-stopword vote: language with the most marker hits among
    tokens; 'und' (undetermined) when no marker hits at all.
    Ties break by language code order (deterministic).

    Argmax is a fold over an array of (score, code) structs so each
    per-language score expression appears in the plan EXACTLY once: the
    earlier chained when/otherwise argmax re-embedded every previous
    score inside the next comparison — ~2^5 copies of the
    tokenize+array_intersect tree — and the generated Java method blew
    past Janino's compile limits, silently disabling whole-stage codegen
    for any stage containing this column (observed on the
    curate_image_caption_pairs composite)."""
    toks = tokens_of(text)
    entries = F.array(*[
        F.struct(
            F.size(F.array_intersect(
                toks, F.array(*[F.lit(m) for m in marks]))).alias("s"),
            F.lit(code).alias("c"),
        )
        for code, marks in sorted(LANG_MARKERS.items())
    ])
    # strict > keeps the first language in sorted-code order on ties;
    # the zero-score init IS the 'und' rule (a language wins only with
    # at least one marker hit)
    best = F.aggregate(
        entries,
        F.struct(F.lit(0).alias("s"), F.lit("und").alias("c")),
        lambda acc, e: F.when(e["s"] > acc["s"], e).otherwise(acc),
    )
    return best["c"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score in [0,1]:

    - n_chars, n_tokens, mean token length
    - punct_ratio: punctuation chars / chars
    - stopword_ratio: EN stopword tokens / tokens
    - upper_ratio: uppercase chars / alpha chars
    """
    text = F.col(text_col)
    toks = tokens_of(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_EN_STOPWORDS))
    )
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    upper = F.regexp_count(text, F.lit(r"[A-Z]"))
    alpha = F.regexp_count(text, F.lit(r"[A-Za-z]"))
    mean_tok_len = F.when(n_tokens > 0,
                          (F.length(F.regexp_replace(text, r"\s+", ""))) / n_tokens
                          ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    upper_ratio = F.when(alpha > 0, upper / alpha).otherwise(F.lit(0.0))
    # composite: length sweet spot + readable punctuation; empty docs -> 0
    length_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5)
    score = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.round((length_score + punct_score) / 2, 6)
    )
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of normalized text (md5 is identical in
    Spark and DuckDB, which makes this oracle-checkable; xxhash64 is the
    cheaper engine-internal alternative used by the crawl path)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 5, window: int = 4,
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: min shingle-hash per sliding
    window over the shingle-hash sequence — the standard local document
    fingerprinting scheme; all higher-order functions, no UDF.

    Returns (id, fingerprints: array<long> distinct window minima).
    """
    toks = tokens_of(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - ngram, F.lit(0)))
    shingle_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, ngram), " "))
    )
    widx = F.sequence(
        F.lit(0),
        F.greatest(F.size(shingle_hashes) - window, F.lit(0)),
    )
    window_mins = F.transform(
        widx, lambda i: F.array_min(F.slice(shingle_hashes, i + 1, window))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(window_mins).alias("fingerprints"),
    )
