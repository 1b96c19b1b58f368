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


# --------------------------------------------------------------------------
# Winnowing document fingerprints (rolling k-gram hashes + window minima).
# Schleimer/Wilkerson/Aiken "Winnowing: Local Algorithms for Document
# Fingerprinting" (SIGMOD'03, the MOSS algorithm): hash every character
# k-gram of the normalized text with a polynomial rolling hash, then slide
# a window of w consecutive hashes and keep each window's minimum — the
# guarantee is that any shared substring of length >= w + k - 1 between two
# documents yields at least one shared selected fingerprint, at ~2/(w+1)
# the density of the full hash stream. Unlike MinHash (a random sample of
# the shingle SET, operators/dedup.py), winnowing fingerprints are
# POSITIONAL — they support substring/plagiarism-style matching, not just
# whole-document resemblance.
#
# Everything is exact integer arithmetic in row-local Catalyst HOFs (no
# UDF, no shuffle): codepoint * base-power products stay under 2^53 by
# reducing mod a 30-bit prime, so the identical closed-form expression is
# reproducible in any engine with 64-bit integers — which is what makes
# the DuckDB oracle exact. At 100 TB this is the mapper stage of a
# fingerprint index: scan-linear, output ~2/(w+1) longs per character.

WINNOW_K = 5  # character k-gram length
WINNOW_W = 4  # winnowing window (match guarantee: w + k - 1 = 8 chars)
WINNOW_BASE = 257  # > max byte value, classic polynomial-hash base
WINNOW_MOD = 1_073_741_789  # largest 30-bit prime: code * mod < 2^53


def winnow_powers(k: int = WINNOW_K) -> list[int]:
    """B^(k-1), ..., B^1, B^0 mod M — the per-position coefficients of the
    closed-form polynomial hash (shared with the oracle SQL generator)."""
    return [pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD) for j in range(k)]


def codepoints(norm: Column) -> Column:
    """array<long> of character codepoints. Materialize this ONCE per row
    before hashing: per-position UTF8 substr() is O(position) (byte walk),
    so hashing straight off the string is O(n^2) per document — measured
    pathological at fixture scale. Array element_at is O(1)."""
    return F.transform(F.split(norm, ""), lambda c: F.ascii(c).cast("long"))


def kgram_hashes(
    codes: Column, k: int = WINNOW_K
) -> Column:
    """array<long> of polynomial hashes of every character k-gram.

    SUBSTITUTION-PROOF FORMULATION — this must not be written as
    ``transform(indices, i -> element_at(codes, i+j) * ...)``: the
    optimizer (InferFiltersFromGenerate + PushDownPredicates) freely
    substitutes a projection's defining expression into filters/lambdas,
    and an array expression inlined at an ``element_at`` site inside a
    per-element lambda is RE-EVALUATED per element — O(n) per position,
    O(n^2) per document (measured: 2 s -> >5 min on the 500-doc fixture).
    Instead the k-gram sum is built from k SHIFTED SLICES combined with
    whole-array zip_with: every reference to ``codes`` is top-level, so
    the worst any substitution can do is recompute the codepoint array k
    times per ROW. Values are identical to the rolling-hash form."""
    pw = winnow_powers(k)
    n = F.size(codes)
    span = n - (k - 1)

    # Factory closures, not default-arg lambdas: PySpark derives the HOF
    # arity from the lambda signature, so a bound constant must be captured
    # by closure.
    def scale(p: int):
        return lambda x: x * F.lit(p)

    def fma(p: int):
        return lambda x, a: a + x * F.lit(p)

    acc = F.transform(F.slice(codes, 1, span), scale(pw[0]))
    for j in range(1, k):
        acc = F.zip_with(F.slice(codes, j + 1, span), acc, fma(pw[j]))
    h = F.transform(acc, lambda x: x % WINNOW_MOD)
    return F.when(n >= k, h).otherwise(F.array().cast("array<long>"))


def winnow_select(hashes: Column, w: int = WINNOW_W) -> Column:
    """Distinct window-minimum hashes — the winnowing fingerprint set.
    Fewer than w hashes degrades to one whole-array window (the paper's
    convention for short documents).

    Same substitution-proof shape as kgram_hashes: the sliding minimum is
    w-1 whole-array zip_with(least) folds over shifted slices (zip_with
    null-pads the shorter side and least() skips nulls, which makes the
    short-document degradation automatic), never array_min(slice(...))
    inside a per-position lambda."""
    m = F.size(hashes)
    acc = hashes
    for j in range(1, w):
        acc = F.zip_with(
            acc,
            F.slice(hashes, j + 1, F.greatest(m - j, F.lit(1))),
            lambda a, b: F.least(a, b),
        )
    mins = F.slice(acc, 1, F.greatest(m - (w - 1), F.lit(1)))
    return F.when(m > 0, F.array_distinct(mins)).otherwise(
        F.array().cast("array<long>")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """One row per (doc, selected fingerprint) — the exploded posting-list
    shape a fingerprint index ingests. Docs whose normalized text is
    shorter than k produce no rows (nothing to fingerprint).

    Staged withColumns keep each intermediate (normalized string, codepoint
    array, hash array) a NAMED column: CollapseProject does not inline
    non-cheap aliases referenced k times, so each stage computes once per
    row instead of once per lambda term.

    The per-doc fingerprint ARRAY is persisted before the explode, and not
    only for reuse: ``InferFiltersFromGenerate`` adds a ``size(_fps) > 0``
    filter above any explode, ``PushDownPredicates`` then pushes it to the
    scan with the whole hash pipeline substituted in, and that inlined
    expression evaluates INTERPRETED once per row — measured 48 s of pure
    filter overhead vs 0.8 s for the actual pipeline at sf0.1. Filters
    cannot push through an InMemoryRelation, so the persist is the barrier
    that keeps the inferred filter cheap (it reads the cached column). No
    final ``distinct()``: array_distinct already dedupes within a doc, so
    (doc_id, fp) rows are unique by construction — skipping it removes the
    only exchange in the query."""
    from ..util import ensure_parallelism, tracked_persist

    fps = tracked_persist(
        ensure_parallelism(df)
        .withColumn("_s", normalize_text(_col(text_col)))
        .where(F.length("_s") >= k)
        .withColumn("_c", codepoints(F.col("_s")))
        .withColumn("_h", kgram_hashes(F.col("_c"), k))
        .select(F.col("doc_id"), winnow_select(F.col("_h"), w).alias("_fps"))
    )
    return fps.select(F.col("doc_id"), F.explode("_fps").alias("fp"))


def bigram_lm_scores(
    corpus: DataFrame,
    score_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add-one bigram language-model cross-entropy per document — the
    CCNet-style quality filter (score docs by how "ordinary" their word
    sequences are under a corpus LM; outliers in either direction are
    boilerplate or garbage) with the external KenLM swapped for a
    deterministic in-engine model: p(w2|w1) = (c(w1,w2)+1)/(ctx(w1)+V),
    all counts integers, so the score is reproducible across engines.

    Returns (id_col, n_bigrams, cross_entropy) — mean negative natural
    log-probability of the document's bigrams, each term quantized to a
    scaled long BEFORE summing (the bm25 discipline: float addition is
    order-dependent, quantized-long addition is not).

    Trains on ``corpus``; scores ``score_df`` (defaults to the corpus
    itself — the self-scoring filter pass). Unseen bigrams/contexts
    back off to the add-one floor via left joins.

    Scale shape: training is two keyed aggregations over the exploded
    corpus (one shuffle each); scoring joins the scored docs' bigrams
    against the count tables on their keys — partitioned shuffle joins,
    no broadcast of a growing side, no driver-side model object.
    """
    if score_df is None:
        score_df = corpus

    def bigrams(df: DataFrame) -> DataFrame:
        t = tokens(text_col)
        return (
            df.select(F.col(id_col), t.alias("__t"))
            .where(F.size("__t") >= 2)
            .select(
                id_col,
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(__t, 1, size(__t) - 1)").alias("w1"),
                        F.expr("slice(__t, 2, size(__t) - 1)").alias("w2"),
                    )
                ).alias("bg"),
            )
            .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        )

    train = bigrams(corpus)
    c2 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = train.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = corpus.select(
        F.explode(tokens(text_col)).alias("tok")
    ).agg(F.countDistinct("tok").alias("v"))

    scored = (
        bigrams(score_df)
        .join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))  # 1-row scalar
        .select(
            id_col,
            # DECIMAL(18,12)-then-scale quantization (the bm25 pattern):
            # both engines round the double to 12 decimals identically,
            # after which the scale-up and BIGINT cast are exact — a bare
            # double*1e9 -> long cast diverges (truncate vs round-nearest)
            (
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                ).cast("decimal(18,12)")
                * F.lit(10**12)
            )
            .cast("long")
            .alias("lpq"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            (-F.sum("lpq")).cast("double")
            / F.count(F.lit(1))
            / F.lit(float(10**12))
        ).alias("cross_entropy"),
    )
