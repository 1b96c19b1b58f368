"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (split / higher-order array functions / md5) —
no Python UDFs, so they inline into whole-stage codegen and scale linearly
with input bytes. Tokenization is whitespace-based plus a BPE-ish regex
fallback; language ID is a deterministic marker heuristic (a real n-gram LM
would slot in as a pandas UDF — out of scope for this container).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to")

# BPE-ish pre-tokenizer: words / numbers / single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(_col(text), " "), lambda t: t != "")


def regex_token_count(text: Column | str) -> Column:
    """Count of BPE-ish regex tokens (JVM-side regexp_extract_all)."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(TOKEN_REGEX), 0))


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def token_char_sum(toks: Column) -> Column:
    """Total characters across tokens — exact integer arithmetic."""
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )


def normalize_text(text: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form used for
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 over the normalized text.
    (md5 rather than xxhash64 so external engines can reproduce it.)"""
    return F.md5(normalize_text(text))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns: token/char counts, stopword + distinct
    ratios, mean token length, and a routing label."""
    t = tokens(text_col)
    n_toks = F.size(t)
    n_stop = stopword_count(t)
    n_distinct = F.size(F.array_distinct(t))
    out = (
        df.withColumn("n_chars", F.length(text_col))
        .withColumn("n_tokens", n_toks)
        .withColumn("n_tokens_regex", regex_token_count(text_col))
        .withColumn("stop_ratio", n_stop.cast("double") / n_toks)
        .withColumn("distinct_ratio", n_distinct.cast("double") / n_toks)
        .withColumn("mean_token_len", token_char_sum(t).cast("double") / n_toks)
    )
    return out.withColumn(
        "quality",
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("distinct_ratio") < 0.3, "repetitive")
        .otherwise("ok"),
    )


def langid_heuristic(text: Column | str) -> Column:
    """Marker-token language guess. SUPERSEDED by the char-bigram Naive
    Bayes classifier in operators/langid.py (the catalog's `text_langid`
    uses that); kept as the trivially-auditable fallback."""
    t = tokens(text)
    return (
        F.when(F.array_contains(t, "the"), F.lit("en"))
        .when(F.array_contains(t, "data"), F.lit("en-tech"))
        .otherwise(F.lit("und"))
    )


def ngrams(t: Column, n: int = 2) -> Column:
    """All token n-grams, NOT deduplicated — repetition analysis needs the
    multiset (contrast dedup.shingles_from_tokens, which dedups for set
    semantics). Same HOF traps apply: pass a materialized token column, and
    guard the fewer-than-n case (sequence() runs descending when b < a)."""
    size = F.size(t)
    idx = F.sequence(F.lit(0), size - n)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]),
    )
    return F.when(size >= n, gram).otherwise(F.array().cast("array<string>"))
