"""Distributed BPE vocabulary induction — the classic map-reduce
formulation of byte-pair-encoding training: merges are learned from the
*word frequency table* (vocabulary-sized — ~10^5-10^6 rows even for a
100 TB corpus), never from the corpus itself, so each merge round is one
combinable aggregation over a small table plus a row-local symbol fold.

Round structure (k rounds, driver holds exactly one argmax row per
round):
  1. adjacent symbol pairs per word, weighted by word frequency — a
     row-local ``transform`` producing (left, right, freq) triples;
  2. global pair counts — one hash aggregation, map-side combinable;
  3. the best pair (count desc, then lexicographic — a total tie-break
     so every engine and partition count picks the same merge);
  4. greedy left-to-right merge of that pair inside every word's symbol
     sequence — a row-local ``aggregate`` fold (``"aaa"`` + merge (a,a)
     becomes ``[aa, a]``, the standard BPE discipline).

The corpus→vocabulary reduction happens once (one shuffle on the token);
after that, every round touches only the vocabulary table. No Python
crosses the row path; the driver-side per-round collect is a single row
(same shape as the k-means centroid loop in operators/similarity.py).

Extends the reference's surface (main.go has no text ops) as part of the
training-data pipeline set: tokenizer training is the step before token
counting, which the engine already serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAIR_T = "array<struct<l:string,r:string>>"


def _chars(col):
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda j: col.substr(j, F.lit(1))
    )


def _adjacent_pairs(syms):
    return F.when(
        F.size(syms) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.get(syms, i - 1).alias("l"), F.get(syms, i).alias("r")
            ),
        ),
    ).otherwise(F.array().cast(PAIR_T))


def _merge_fold(syms, left: str, right: str):
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the single corpus-sized shuffle."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def bpe_merge_rounds(
    spark: SparkSession, words: DataFrame, k: int
) -> DataFrame:
    """Learn ``k`` BPE merges from a (word, freq) table. Returns one row
    per round: (round, merge_l, merge_r, cnt) — the learned merge table,
    which IS the tokenizer artifact."""
    syms = words.select(
        "freq", _chars(F.col("word")).alias("syms")
    ).persist()
    syms.count()
    out: list[tuple[int, str, str, int]] = []
    try:
        for r in range(1, k + 1):
            counts = (
                syms.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("freq").cast("bigint").alias("cnt"))
            )
            best = counts.orderBy(
                F.desc("cnt"), F.asc("l"), F.asc("r")
            ).first()
            if best is None:
                break
            out.append((r, best.l, best.r, best.cnt))
            nxt = syms.select(
                "freq", _merge_fold(F.col("syms"), best.l, best.r).alias("syms")
            ).persist()
            nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return spark.createDataFrame(
        out, "round int, merge_l string, merge_r string, cnt bigint"
    ).orderBy("round")


def bpe_oracle_sql(k: int, table: str = "documents") -> str:
    """DuckDB replay of :func:`bpe_merge_rounds` as a ``k``-stage CTE
    chain (the loop unrolled — DuckDB has no driver, so each round's
    argmax is a one-row CTE cross-joined into the next merge fold)."""
    parts = [
        f"""w AS (
        SELECT t AS word, COUNT(*) AS freq
        FROM {table},
             unnest(list_filter(string_split(text, ' '), x -> x != ''))
             AS u(t)
        GROUP BY t
    ),
    s0 AS (
        SELECT freq,
               list_transform(generate_series(1, length(word)),
                              j -> substring(word, j, 1)) AS syms
        FROM w
    )"""
    ]
    for r in range(1, k + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"""p{r} AS (
        SELECT u.p.l AS l, u.p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM {prev},
             unnest(list_transform(
                 generate_series(1, len(syms) - 1),
                 i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS u(p)
        GROUP BY u.p.l, u.p.r
    ),
    b{r} AS (
        SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1
    )"""
        )
        if r < k:
            parts.append(
                f"""s{r} AS (
        SELECT freq,
               list_reduce(
                   list_transform(syms, c -> [c]),
                   (a, b) -> CASE
                       WHEN a[len(a)] = b{r}.l AND b[1] = b{r}.r
                       THEN list_append(list_slice(a, 1, len(a) - 1),
                                        b{r}.l || b{r}.r)
                       ELSE list_append(a, b[1]) END) AS syms
        FROM s{r - 1} CROSS JOIN b{r}
    )"""
            )
    union = "\n    UNION ALL ".join(
        f"SELECT {r} AS round, l AS merge_l, r AS merge_r, cnt FROM b{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH " + ",\n    ".join(parts) + "\n    " + union + "\n    ORDER BY round"
    )


# ---------------------------------------------------------------------------
# Encode: apply a learned merge table to the corpus
# ---------------------------------------------------------------------------

def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Tokenize the *vocabulary* with a learned merge table: each merge is
    applied in learned order as the same greedy left-to-right fold used
    during training (Sennrich's apply discipline — later merges see the
    symbols earlier merges produced, so ``(s,t)`` then ``(st,re)`` builds
    hierarchically). Adds a ``tokens array<string>`` column.

    The scale story is the same inversion as training: encoding runs over
    the DISTINCT-WORD table (vocabulary-sized, ~10^5-10^6 rows for a
    100 TB corpus), never the corpus, and each merge is a row-local JVM
    ``aggregate`` fold — no Python on the row path, no shuffle. Corpus
    token statistics then come from re-weighting by word frequency
    (:func:`token_stats`) or a broadcast join back to documents.
    """
    syms = _chars(F.col(word_col))
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    return words.withColumn("tokens", syms)


def token_stats(encoded: DataFrame) -> DataFrame:
    """Corpus-level token statistics from an encoded vocabulary:
    ``(token, n_words, occurrences)`` where ``occurrences`` counts token
    multiplicity weighted by word frequency. One explode + one
    map-side-combinable aggregation over the vocabulary table."""
    return (
        encoded.select("word", "freq", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(
            F.countDistinct("word").cast("bigint").alias("n_words"),
            F.sum("freq").cast("bigint").alias("occurrences"),
        )
    )


def _fold_sql(prev: str, left: str, right: str) -> str:
    """One greedy left-to-right merge fold as DuckDB SQL (literal pair) —
    the same singleton-lift ``list_reduce`` idiom as
    :func:`bpe_oracle_sql`, without the argmax CTE (the merge is given,
    not learned)."""
    la, ra, ma = left.replace("'", "''"), right.replace("'", "''"), (
        left + right
    ).replace("'", "''")
    return f"""
        SELECT word, freq,
               list_reduce(
                   list_transform(syms, c -> [c]),
                   (a, b) -> CASE
                       WHEN a[len(a)] = '{la}' AND b[1] = '{ra}'
                       THEN list_append(list_slice(a, 1, len(a) - 1), '{ma}')
                       ELSE list_append(a, b[1]) END) AS syms
        FROM {prev}"""


def bpe_encode_oracle_sql(
    merges: list[tuple[str, str]], top_n: int, table: str = "documents"
) -> str:
    """DuckDB replay of encode + :func:`token_stats`: the merge chain
    unrolled into one fold CTE per merge, then unnest + aggregate."""
    parts = [
        f"""w AS (
        SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM {table},
             unnest(list_filter(string_split(text, ' '), x -> x != ''))
             AS u(t)
        GROUP BY t
    ),
    s0 AS (
        SELECT word, freq,
               list_transform(generate_series(1, length(word)),
                              j -> substring(word, j, 1)) AS syms
        FROM w
    )"""
    ]
    for i, (left, right) in enumerate(merges, start=1):
        parts.append(f"s{i} AS ({_fold_sql(f's{i - 1}', left, right)}\n    )")
    last = f"s{len(merges)}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    tok AS (
        SELECT word, freq, u.t AS token
        FROM {last}, unnest(syms) AS u(t)
    )
    SELECT token, CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
           CAST(SUM(freq) AS BIGINT) AS occurrences
    FROM tok
    GROUP BY token
    ORDER BY occurrences DESC, token
    LIMIT {top_n}"""
    )
