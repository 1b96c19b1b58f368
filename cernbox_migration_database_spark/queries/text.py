"""Text analysis over `documents`: quality, language-ID, fingerprinting, LM scoring, BM25/hybrid retrieval, PII scrubbing.

Split out of the monolithic queries.py (round 8); registration behavior
is identical — every ``@register`` feeds the shared registry in
``._registry`` and the public names re-export through the package root.
"""

from __future__ import annotations

from ..functions.numeric import davg, dsum, dsum_decimal, dsum_expr
from ..operators import bpe as BPE
from ..operators import langid as LID
from ..operators import pii as PII
from ..operators import text as TX
from ..util import ensure_parallelism, global_rank, topk_ranked, tracked_persist
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ._registry import ORACLE, PHASED, QUERIES, _t, _versioned_scratch, register
from .similarity import _dot_sql


_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"


_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len(text) AS n_chars,
           len({_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_tokens_regex
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex pre-tokenizer (extended
    text layer). Pure codegen expressions."""
    d = _t(spark, sf_dir, "documents")
    t = TX.tokens("text")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(t).alias("n_tokens"),
        TX.regex_token_count("text").alias("n_tokens_regex"),
    )


@register(
    "text_quality",
    f"""
    SELECT doc_id, n_tokens, stop_ratio, distinct_ratio, mean_token_len,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN distinct_ratio < 0.3 THEN 'repetitive'
                ELSE 'ok' END AS quality
    FROM (
      SELECT doc_id, len(t) AS n_tokens,
             len(list_filter(t, x -> x IN ('the','a','of','and','to')))::DOUBLE / len(t) AS stop_ratio,
             len(list_distinct(t))::DOUBLE / len(t) AS distinct_ratio,
             list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t) AS mean_token_len
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents))
    """,
)
def text_quality(spark, sf_dir):
    """Quality scoring (length / stopword / repetition heuristics) with a
    routing label — the doc-filtering stage of a training-data pipeline."""
    d = TX.with_quality(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", "n_tokens", "stop_ratio", "distinct_ratio", "mean_token_len", "quality"
    )


@register("text_langid", LID.oracle_sql())
def text_langid(spark, sf_dir):
    """Char-bigram Naive Bayes language ID (operators/langid.py) — replaces
    the r1/r2 marker heuristic with a real classifier: offline-trained
    weights quantized to integers and folded into the plan as a literal
    map; scoring is a row-local Catalyst aggregate (no UDF, no shuffle,
    scan-linear). The oracle SQL is GENERATED from the same fitted model
    (unnest-bigrams + score join + argmax row_number), so both engines sum
    identical integers — exact cross-engine parity, not approximate."""
    d = _t(spark, sf_dir, "documents")
    return LID.with_langid(d).select("doc_id", "lang", "lang_pred", "lang_score")


@register("text_fluency", LID.fluency_oracle_sql())
def text_fluency(spark, sf_dir):
    """LM-based quality signal: mean English-bigram log-probability per
    document (the cheap stand-in for model-perplexity filtering in
    training-data pipelines — gibberish and non-English text score low).
    Same literal-map machinery as text_langid: the quantized LM rides in
    the plan, the per-doc sum is an exact integer on both engines, and the
    only double op is one final division — scan-linear, no shuffle, no
    UDF."""
    d = _t(spark, sf_dir, "documents")
    return LID.with_fluency(d).select(
        "doc_id", "n_bigrams", "fluency_q", "fluency"
    )


@register(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Normalized-text md5 fingerprint (engine-portable, unlike xxhash64).
    NB: DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all default."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


@register(
    "text_bigram_lm",
    f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    pos AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2),
    bg AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM pos),
    cb AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    cl AS (SELECT w1, SUM(c) AS cleft FROM cb GROUP BY w1)
    SELECT cb.w1, cb.w2, CAST(c AS BIGINT) AS c_bigram,
           CAST(cleft AS BIGINT) AS c_left,
           round(c / CAST(cleft AS DOUBLE), 9) AS p
    FROM cb JOIN cl ON cl.w1 = cb.w1
    WHERE c >= 5
    """,
)
def text_bigram_lm(spark, sf_dir):
    """Corpus-wide bigram LM statistics — the TRAINING side of the n-gram
    LM whose frozen weights power `text_fluency`/`text_langid`: count every
    token bigram across the corpus, derive conditional probabilities
    p(w2|w1) = c(w1,w2) / c(w1,·) from exact integer counts (one double
    division, 9dp round). Two aggregations: bigram counts (the big one —
    map-side combinable, shuffles compressed (w1,w2,count) partials, never
    token streams), then the per-w1 totals, joined back broadcast-style.
    The c >= 5 floor is the standard rare-ngram cutoff and keeps the
    emitted table index-sized. This is the map-reduce classic that built
    the original web-scale LMs, shaped for Catalyst."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(TX.tokens("text").alias("_t")).where(F.size("_t") >= 2)
    # bigram pairs as zipped shifted slices — whole-array ops only (the
    # substitution-proof shape; see operators/text.py:kgram_hashes), and no
    # concat-then-split round trip through strings
    span = F.size("_t") - 1
    pairs = F.arrays_zip(
        F.slice("_t", 1, span).alias("w1"),
        F.slice("_t", 2, span).alias("w2"),
    )
    bg = t.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bigram"))
    cl = cb.groupBy("w1").agg(F.sum("c_bigram").alias("c_left"))
    return (
        cb.join(cl, "w1")
        .where(F.col("c_bigram") >= 5)
        .select(
            "w1",
            "w2",
            "c_bigram",
            "c_left",
            F.round(
                F.col("c_bigram") / F.col("c_left").cast("double"), 9
            ).alias("p"),
        )
    )


def _winnow_oracle() -> str:
    """Oracle SQL generated from the SAME constants as the Spark operator
    (operators/text.py winnow_powers) so the closed-form polynomial hash
    can never drift between engines."""
    k, w, mod = TX.WINNOW_K, TX.WINNOW_W, TX.WINNOW_MOD
    pw = TX.winnow_powers(k)
    terms = " + ".join(f"c[i + {j}] * {pw[j]}" for j in range(k))
    return rf"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
      FROM documents),
    codes AS (
      SELECT doc_id, len(s) AS n,
             list_transform(string_split(s, ''),
                            ch -> CAST(ascii(ch) AS BIGINT)) AS c
      FROM norm WHERE len(s) >= {k}),
    grams AS (
      SELECT doc_id,
             list_transform(generate_series(1, n - {k - 1}),
                            i -> ({terms}) % {mod}) AS h
      FROM codes),
    wins AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(h) - {w - 1}, 1)),
                            i -> list_min(list_slice(h, i, i + {w - 1}))) AS mins
      FROM grams WHERE len(h) > 0)
    SELECT DISTINCT doc_id, CAST(unnest(mins) AS BIGINT) AS fp FROM wins
    """


def _winnow_pairs_oracle(max_df: int = 20, min_shared: int = 3) -> str:
    base = _winnow_oracle().rstrip()
    return f"""
    WITH fps AS ({base}),
    rare AS (
      SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {max_df}),
    rf AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON r.fp = f.fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM rf a JOIN rf b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {min_shared}
    """


@register("dedup_winnowing_pairs", _winnow_pairs_oracle())
def dedup_winnowing_pairs(spark, sf_dir):
    """The match step of MOSS: document pairs sharing >= 3 RARE selected
    winnowing fingerprints — substring-overlap candidates (each shared
    fingerprint witnesses a shared >= k-char region, and the winnowing
    guarantee makes >= w+k-1-char overlaps unmissable), which
    set-resemblance dedup cannot localize. Fingerprints present in more
    than max_df=20 documents are dropped first (median fixture fp sits in
    29 docs — the corpus is template-generated) — 5-char grams of common
    words are corpus-wide boilerplate; without the cap this fixture
    matches 123k of 125k possible pairs (measured), exactly the df^2
    hot-key blow-up the shingle join's max_df guard exists for, and MOSS
    itself culls over-common fingerprints. The DF count is a map-side-
    combinable groupBy (skew-immune), the rare-set join thins the
    (persisted, computed-once) posting list from `text_winnowing`, and
    the pair join runs over rare fingerprints only. The oracle nests the
    winnowing oracle as a CTE and replays cap + join."""
    fps = tracked_persist(
        TX.winnow_fingerprints(_t(spark, sf_dir, "documents"))
    )
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= 20)
        .select("fp")
    )
    rf = fps.join(rare, "fp")
    a = rf.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fa"))
    b = rf.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fb"))
    return (
        a.join(b, (F.col("fa") == F.col("fb")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= 3)
    )


@register("text_winnowing", _winnow_oracle())
def text_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (rolling-hash k-gram minima —
    operators/text.py:winnow_fingerprints, after Schleimer et al. SIGMOD'03,
    the MOSS algorithm). Positional fingerprinting: any shared substring of
    >= w+k-1 chars between two documents is guaranteed a shared selected
    hash, which md5-the-whole-doc (`text_fingerprint`) and set-resemblance
    MinHash (`dedup_minhash_lsh`) cannot promise. The whole pipeline —
    normalize, closed-form polynomial k-gram hashes, window minima,
    distinct — is row-local exact integer HOF arithmetic inside one codegen
    stage; the only exchange is the final distinct on (doc_id, fp). At
    100 TB the output is the posting list of a substring-match index, at
    ~2/(w+1) the density of the raw hash stream."""
    d = _t(spark, sf_dir, "documents")
    return TX.winnow_fingerprints(d)


_LM_SELF_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bge AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bge GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bge GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT tok) AS v
          FROM (SELECT unnest(t) AS tok FROM toks)),
    q AS (
      SELECT b.doc_id,
             CAST(CAST(ln((c2.c2 + 1)::DOUBLE / (c1.c1 + v.v))
                       AS DECIMAL(18,12)) * 1000000000000 AS BIGINT) AS lpq
      FROM bge b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(-SUM(lpq) AS DOUBLE) / COUNT(*) / 1000000000000.0
             AS cross_entropy
    FROM q GROUP BY doc_id ORDER BY doc_id
    """


def _lm_heldout_oracle() -> str:
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bge AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)),
    train AS (SELECT * FROM bge WHERE doc_id % 10 <> 0),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM train GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT tok) AS v
          FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id % 10 <> 0)),
    q AS (
      SELECT b.doc_id,
             CAST(CAST(ln((COALESCE(c2.c2, 0) + 1)::DOUBLE
                          / (COALESCE(c1.c1, 0) + v.v))
                       AS DECIMAL(18,12)) * 1000000000000 AS BIGINT) AS lpq
      FROM bge b
      LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      LEFT JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN v
      WHERE b.doc_id % 10 = 0)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(-SUM(lpq) AS DOUBLE) / COUNT(*) / 1000000000000.0
             AS cross_entropy
    FROM q GROUP BY doc_id ORDER BY doc_id
    """


@register("text_lm_score_heldout", _lm_heldout_oracle())
def text_lm_score_heldout(spark, sf_dir):
    """The LM filter's production split: train the bigram model on the
    corpus (doc_id %10 != 0), score the HELD-OUT batch (%10 == 0) —
    unseen bigrams and contexts back off to the add-one floor through
    the left joins, the path self-scoring never exercises. High-entropy
    outliers in the batch are the docs least like the corpus — exactly
    what a contamination / quality gate flags at ingest time."""
    from ..operators import text as TX2

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TX2.bigram_lm_scores(
        docs.where(F.col("doc_id") % 10 != 0),
        score_df=docs.where(F.col("doc_id") % 10 == 0),
    ).orderBy("doc_id")


@register("text_lm_cross_entropy", _LM_SELF_ORACLE)
def text_lm_cross_entropy(spark, sf_dir):
    """CCNet-style LM quality scoring without the external model: an
    add-one bigram LM trained on the corpus itself (two keyed count
    aggregations — pure integers), every document scored by the mean
    negative log-probability of its bigrams. Low cross-entropy ≈
    repetitive boilerplate, high ≈ garbled text — the two tails a
    quality filter trims. Per-bigram log-probs are quantized to scaled
    longs before summing (bm25's order-independence discipline), so the
    score is bit-reproducible and the DuckDB oracle recomputes it
    exactly. Scale: train = 2 shuffles over the exploded corpus; score =
    keyed joins against the count tables — no driver-side model, no
    broadcast of a growing side (the one broadcast is the 1-row vocab
    scalar)."""
    from ..operators import text as TX2

    return TX2.bigram_lm_scores(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    ).orderBy("doc_id")


@register(
    "token_frequencies",
    """
    SELECT token, COUNT(*) AS n FROM (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      FROM documents)
    GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
)
def token_frequencies(spark, sf_dir):
    """explode + aggregate + top-k: the corpus vocabulary histogram."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "text_tfidf",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tfc FROM toks GROUP BY doc_id, tok),
    dlen AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
    dfreq AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.tok,
           round((tfc::DOUBLE / n_tok)
                 * (ln((n_docs + 1)::DOUBLE / (df + 1)) + 1), 9) AS tfidf
    FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (tok), n
    """,
)
def text_tfidf(spark, sf_dir):
    """TF-IDF per (doc, token) — the text-pipeline feature op: term
    frequency normalized by document length, smoothed inverse document
    frequency (ln((N+1)/(df+1)) + 1). Three aggregations over one exploded
    token relation; the corpus size joins in as a broadcast scalar rather
    than a driver constant. Rounded 9 dp: ln() is the one function here
    without a cross-engine correctly-rounded guarantee."""
    d = _t(spark, sf_dir, "documents")
    toks = ensure_parallelism(d).select(
        "doc_id", F.explode(TX.tokens("text")).alias("tok")
    )
    # tf is persisted and re-aggregated for BOTH doc lengths and document
    # frequencies: the expensive tokenize + (doc, tok) shuffle runs once;
    # deriving dlen/dfreq from raw tokens instead would tokenize and
    # shuffle the corpus three times (exchange reuse is not guaranteed
    # across aggregation branches — measured as three Generate subplans).
    tf = tracked_persist(
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tfc"))
    )
    dlen = tf.groupBy("doc_id").agg(F.sum("tfc").alias("n_tok"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    out = (
        tf.join(dlen, "doc_id")
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                (F.col("tfc").cast("double") / F.col("n_tok"))
                * (
                    F.log(
                        (F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)
                    )
                    + 1
                ),
                9,
            ).alias("tfidf"),
        )
    )
    return out


@register(
    "text_redact",
    """
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[0-9]+(\\.[0-9]+)?', '<NUM>', 'g'),
             '(<NUM> ){2,}<NUM>', '<NUMSEQ>', 'g') AS redacted,
           len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
    FROM documents
    """,
)
def text_redact(spark, sf_dir):
    """Scrubbing pass of a text-cleaning pipeline: numbers masked to <NUM>,
    runs of masked numbers collapsed to <NUMSEQ>, plus a digit-count audit
    column (how much was redacted — the dead-letter-style evidence trail,
    main.go:277's audit instinct applied to corpus hygiene). Two chained
    regexp_replace passes, pure codegen, scan-linear; DuckDB needs the 'g'
    flag to match Spark's replace-all default."""
    t = F.col("text")
    masked = F.regexp_replace(t, r"[0-9]+(\.[0-9]+)?", "<NUM>")
    collapsed = F.regexp_replace(masked, r"(<NUM> ){2,}<NUM>", "<NUMSEQ>")
    n_digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        collapsed.alias("redacted"),
        n_digits.cast("long").alias("n_digits"),
    )


@register(
    "text_repetition",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i + 1])) AS gram
          FROM toks WHERE len(t) >= 2),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round(CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt), 9)
             AS dup_ratio,
           round(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 9) AS top_frac,
           (CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt)) > 0.2
             AS repetitive
    FROM c GROUP BY doc_id
    """,
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition filter: per document, the duplicate-2-gram
    ratio (1 - distinct/total) and the top single 2-gram's share of all
    2-grams — the quality signals that catch boilerplate and degenerate
    repetition before training. Uses the NON-deduplicated n-gram multiset
    (operators/text.py ngrams); one explode + two aggregations, both keyed
    by doc_id so the second agg reuses the first's hash partitioning. All
    ratios are exact-integer-derived doubles; the 0.2 flag threshold
    compares identical doubles on both engines."""
    d = _t(spark, sf_dir, "documents")
    base = ensure_parallelism(d).select(
        "doc_id", TX.tokens("text").alias("t")
    )
    ex = base.select(
        "doc_id", F.explode(TX.ngrams(F.col("t"), 2)).alias("gram")
    )
    cnt = ex.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = cnt.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    dup_ratio = (
        (F.col("n_grams") - F.col("n_distinct")).cast("double")
        / F.col("n_grams")
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.round(dup_ratio, 9).alias("dup_ratio"),
        F.round(
            F.col("top_cnt").cast("double") / F.col("n_grams"), 9
        ).alias("top_frac"),
        (dup_ratio > 0.2).alias("repetitive"),
    )


@register(
    "text_ngram_entropy",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    dl AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct FROM tf
      GROUP BY doc_id)
    SELECT tf.doc_id,
           CAST(dl.n AS BIGINT) AS n_tokens,
           CAST(dl.n_distinct AS BIGINT) AS n_distinct,
           (-CAST(SUM(CAST(CAST(
                 (c::DOUBLE / dl.n) * log2(c::DOUBLE / dl.n)
                 AS DECIMAL(18,12)) * 1000000000000 AS BIGINT)) AS DOUBLE)
                 / 1000000000000.0) AS entropy
    FROM tf JOIN dl USING (doc_id)
    GROUP BY tf.doc_id, dl.n, dl.n_distinct
    """,
)
def text_ngram_entropy(spark, sf_dir):
    """Per-document token Shannon entropy — the vocabulary-diversity
    filter (gibberish and boilerplate score low, natural text high) next
    to text_quality's ratio heuristics. Per-term contributions are rounded
    to 12 dp and summed as exact scaled longs: a float Σ p·log2(p) is
    partition-order dependent, and libm log2 differs in the last ulp
    across engines — the quantized sum makes the entropy bit-identical on
    any cluster size. One (doc, token) shuffle shared by the counts and
    the length; everything after is map-side combinable."""
    d = _t(spark, sf_dir, "documents")
    toks = ensure_parallelism(d).select(
        "doc_id", F.explode(TX.tokens("text")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    dl = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    p = F.col("c").cast("double") / F.col("n")
    # double -> DECIMAL(18,12) -> scaled long: the same exact-quantize
    # path as dsum (a round()*10^12 double product is NOT an exact
    # integer, and long casts truncate on Spark but round on DuckDB)
    term = ((p * F.log2(p)).cast("decimal(18,12)") * F.lit(10**12)).cast(
        "long"
    )
    return (
        tf.join(dl, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        # no final round: the exact-long sum / 10^12 is one correctly-
        # rounded division (bit-identical cross-engine); a round(x, 9) on
        # top can flip at half-way boundaries the quantized sum lands on
        .agg(
            (-(F.sum(term).cast("double") / F.lit(float(10**12)))).alias(
                "entropy"
            )
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "n_distinct",
            "entropy",
        )
    )


_URL_HOST_RE = "^[a-z]+://([^/?#]+)"


_URL_PATH_RE = "^[a-z]+://[^/?#]+(/[^?#]*)"


_URL_REF_RE = "[?&]ref=([^&#]*)"


@register(
    "url_functions",
    f"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || CAST(doc_id % 7 AS VARCHAR)
             || '.Example.org/' || lang || '/doc-'
             || CAST(doc_id AS VARCHAR) || '?utm=x&ref=r'
             || CAST(doc_id % 13 AS VARCHAR) AS url
      FROM documents),
    parsed AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '{_URL_HOST_RE}', 1)) AS host,
             regexp_extract(url, '{_URL_PATH_RE}', 1) AS path,
             regexp_extract(url, '{_URL_REF_RE}', 1) AS ref
      FROM u)
    SELECT doc_id, host,
           regexp_extract(host, '([^.]+[.][^.]+)$', 1) AS domain,
           path, ref,
           'https://' || host || path AS canonical
    FROM parsed
    """,
)
def url_functions(spark, sf_dir):
    """URL parsing/normalization — the dedup key derivation every crawl
    pipeline runs before anything else (CommonCrawl-style): host extract +
    lowercase, registered-domain suffix, path, query-parameter pull, and a
    canonical form with tracking parameters stripped. Pure row-local
    regexp_extract against anchored patterns shared verbatim with the
    oracle — no UDF, scan-linear, trivially partition-parallel at any
    scale."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.org/"), F.col("lang"), F.lit("/doc-"),
        F.col("doc_id").cast("string"), F.lit("?utm=x&ref=r"),
        (F.col("doc_id") % 13).cast("string"),
    )
    parsed = d.select(
        "doc_id",
        F.lower(F.regexp_extract(url, _URL_HOST_RE, 1)).alias("host"),
        F.regexp_extract(url, _URL_PATH_RE, 1).alias("path"),
        F.regexp_extract(url, _URL_REF_RE, 1).alias("ref"),
    )
    return parsed.select(
        "doc_id",
        "host",
        F.regexp_extract(F.col("host"), "([^.]+[.][^.]+)$", 1).alias("domain"),
        "path",
        "ref",
        F.concat(F.lit("https://"), F.col("host"), F.col("path")).alias(
            "canonical"
        ),
    )


_BM25_TERMS = ("merge", "window", "customer")


_BM25_K1 = 1.2


_BM25_B = 0.75


@register(
    "bm25_search",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tfc FROM toks
      WHERE tok IN {repr(tuple(_BM25_TERMS))} GROUP BY doc_id, tok),
    df AS (
      SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY tok),
    term_scores AS (
      SELECT tf.doc_id,
             ln(1.0 + (stats.n_docs - df.dfc + 0.5) / (df.dfc + 0.5))
             * (tf.tfc * ({_BM25_K1!r} + 1.0))
             / (tf.tfc + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                + {_BM25_B!r} * dl.dlen / stats.avgdl)) AS s
      FROM tf JOIN dl USING (doc_id) JOIN df USING (tok), stats),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(CAST(s AS DECIMAL(18,12)) * 1000000000000
                  AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS score
      FROM term_scores GROUP BY doc_id),
    ranked AS (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored)
    SELECT doc_id, score, rank FROM ranked WHERE rank <= 50
    """,
)
def bm25_search(spark, sf_dir):
    """Okapi BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed query over
    the corpus — the lexical half of every retrieval/RAG pipeline next to
    the embedding ANN family. Term frequencies, document lengths, and
    document frequencies come from ONE exploded token relation (the tf
    aggregate is filtered to the query terms before any join, so the
    scored relation is |matching docs| x |terms|, never corpus-sized);
    df/avgdl/N join in as broadcast scalars. Per-term scores are
    quantized to exact scaled longs before the per-doc sum, making the
    floating-point ln()/division pipeline bit-deterministic cross-engine;
    the top-50 rank uses the two-pass offset scheme (util.global_rank),
    not a single-task window."""
    d = _t(spark, sf_dir, "documents")
    toks = ensure_parallelism(d).select(
        "doc_id", F.explode(TX.tokens("text")).alias("tok")
    )
    dl = tracked_persist(
        toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.where(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tfc"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    k1, b = _BM25_K1, _BM25_B
    s = (
        F.log(
            1.0
            + (F.col("n_docs") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
        )
        * (F.col("tfc") * F.lit(k1 + 1.0))
        / (
            F.col("tfc")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dlen") / F.col("avgdl")
            )
        )
    )
    term_scores = (
        tf.join(dl, "doc_id")
        # dfreq is vocabulary-sized — Heaps-law sublinear but unbounded,
        # so no hard hint; AQE broadcasts it while measured-small.
        # stats stays hinted: it is a one-row scalar aggregate.
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("s"))
    )
    scored = term_scores.groupBy("doc_id").agg(
        (
            F.sum(
                (F.col("s").cast("decimal(18,12)") * F.lit(10**12)).cast(
                    "long"
                )
            ).cast("double")
            / F.lit(float(10**12))
        ).alias("score")
    )
    return topk_ranked(scored, [F.col("score").desc(), F.col("doc_id")], 50)


@register("search_bm25_indexed", None)
def search_bm25_indexed(spark, sf_dir):
    """BM25 through the INVERTED INDEX (operators/textindex.py): the
    corpus is tokenized once into a bucket-partitioned postings table +
    doclen + stats sidecar; the probe maps the query terms to their
    buckets row-locally and reads only those partitions via the
    manifest-planned scan — at 100 TB a query touches |terms| buckets of
    the postings table instead of shuffling the corpus. Scoring reuses
    the scan path's scaled-long quantization bit-for-bit, so this query
    shares bm25_search's oracle verbatim: indexed == scan is exactly the
    contract an index must keep."""
    return _bm25_indexed_probe(spark, _bm25_indexed_build(spark, sf_dir))


def _bm25_indexed_build(spark, sf_dir):
    """Build phase (bench-timed separately): one corpus tokenization into
    the bucket-partitioned postings table — amortized over every future
    probe, and the reason the cold headline number was dominated by
    fixture construction rather than the search operator."""
    from ..operators import textindex as TI

    base = _versioned_scratch("textidx", sf_dir)
    TI.build_text_index(spark, _t(spark, sf_dir, "documents"), base)
    return base


def _bm25_indexed_probe(spark, base):
    """Read phase: manifest-planned probe of |terms| postings buckets."""
    from ..operators import textindex as TI

    return TI.bm25_probe(
        spark, base, list(_BM25_TERMS), k1=_BM25_K1, b=_BM25_B, top_k=50
    )


PHASED["search_bm25_indexed"] = (_bm25_indexed_build, _bm25_indexed_probe)
ORACLE["search_bm25_indexed"] = ORACLE["bm25_search"]


_PHRASE = ("table", "hash")


@register(
    "search_phrase",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    occ AS (
      SELECT doc_id, COUNT(*) AS n_occ
      FROM toks,
           LATERAL (SELECT unnest(range(1, len(tk) - {len(_PHRASE)} + 2))
                    AS p)
      WHERE list_slice(tk, p, p + {len(_PHRASE) - 1}) =
            [{", ".join(repr(t) for t in _PHRASE)}]
      GROUP BY doc_id)
    SELECT doc_id, CAST(n_occ AS BIGINT) AS n_occ
    FROM occ ORDER BY doc_id
    """,
)
def search_phrase(spark, sf_dir):
    """Exact-PHRASE search through the positional postings
    (operators/textindex.py:phrase_probe) — the retrieval user's next
    query after AND. Token positions ride in the posting rows (the
    Lucene move), so the probe is the SAME manifest-planned bucket reads
    as BM25 plus a row-local adjacency check: term i's positions shift
    left by i and a document matches wherever all shifted sets
    intersect, n_occ = intersection size (overlaps counted). No document
    text is read at query time. The oracle is the scan path: every
    starting position's token slice compared against the phrase literal
    over the same whitespace tokenization."""
    return _phrase_probe_phase(spark, _phrase_index_build(spark, sf_dir))


def _phrase_index_build(spark, sf_dir):
    """Build phase (bench-timed separately): one corpus tokenization
    into the positional postings table."""
    from ..operators import textindex as TI

    base = _versioned_scratch("phraseidx", sf_dir)
    TI.build_text_index(spark, _t(spark, sf_dir, "documents"), base)
    return base


def _phrase_probe_phase(spark, base):
    """Read phase: |distinct phrase terms| bucket reads + row-local
    positional intersection."""
    from ..operators import textindex as TI

    return TI.phrase_probe(spark, base, list(_PHRASE)).orderBy("doc_id")


PHASED["search_phrase"] = (_phrase_index_build, _phrase_probe_phase)


_NEAR_SLOP = 3


@register(
    "search_near",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    p1 AS (SELECT doc_id, p FROM toks,
           LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS p)
           WHERE tk[p] = '{_PHRASE[0]}'),
    p2 AS (SELECT doc_id, p FROM toks,
           LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS p)
           WHERE tk[p] = '{_PHRASE[1]}'),
    pr AS (SELECT p1.doc_id, COUNT(*) AS n_pairs
           FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id
                          AND p2.p > p1.p
                          AND p2.p - p1.p <= {_NEAR_SLOP + 1}
           GROUP BY p1.doc_id)
    SELECT doc_id, CAST(n_pairs AS BIGINT) AS n_pairs
    FROM pr ORDER BY doc_id
    """,
)
def search_near(spark, sf_dir):
    """Ordered PROXIMITY search (Lucene span-near) through the positional
    postings: '{first} ... {second}' with at most slop intervening
    tokens. Probe = two manifest-planned bucket reads + one doc-keyed
    join of the two posting rows + a row-local nested-HOF pair count over
    the positions arrays — no document text, no corpus-sized relation.
    The oracle joins the two terms' position lists per document under the
    same ordered-window predicate over the same tokenization."""
    base = _phrase_index_build(spark, sf_dir)
    return _near_probe_phase(spark, base)


def _near_probe_phase(spark, base):
    """Read phase: two bucket reads + row-local pair counting."""
    from ..operators import textindex as TI

    return TI.near_probe(
        spark, base, _PHRASE[0], _PHRASE[1], slop=_NEAR_SLOP
    ).orderBy("doc_id")


PHASED["search_near"] = (_phrase_index_build, _near_probe_phase)


@register(
    "search_bm25_conjunctive",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tfc FROM toks
      WHERE tok IN {repr(tuple(_BM25_TERMS))} GROUP BY doc_id, tok),
    df AS (
      SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY tok),
    qual AS (
      SELECT doc_id FROM tf
      GROUP BY doc_id HAVING COUNT(DISTINCT tok) = {len(set(_BM25_TERMS))}),
    term_scores AS (
      SELECT tf.doc_id,
             ln(1.0 + (stats.n_docs - df.dfc + 0.5) / (df.dfc + 0.5))
             * (tf.tfc * ({_BM25_K1!r} + 1.0))
             / (tf.tfc + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                + {_BM25_B!r} * dl.dlen / stats.avgdl)) AS s
      FROM tf JOIN qual USING (doc_id)
              JOIN dl USING (doc_id) JOIN df USING (tok), stats),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(CAST(s AS DECIMAL(18,12)) * 1000000000000
                  AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS score
      FROM term_scores GROUP BY doc_id),
    ranked AS (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored)
    SELECT doc_id, score, rank FROM ranked WHERE rank <= 50
    """,
)
def search_bm25_conjunctive(spark, sf_dir):
    """Conjunctive (AND) retrieval through the inverted index: only
    documents containing EVERY query term are ranked (BM25 scores,
    corpus-wide idf). The qualifier is one count-distinct over the
    already-pruned postings slice, so the probe still reads |terms|
    buckets — boolean search costs nothing extra at 100 TB. The oracle
    reruns the scan-path BM25 with a HAVING-all-terms gate."""
    from ..operators import textindex as TI

    base = _versioned_scratch("textidx_and", sf_dir)
    TI.build_text_index(spark, _t(spark, sf_dir, "documents"), base)
    return TI.bm25_probe(
        spark, base, list(_BM25_TERMS),
        k1=_BM25_K1, b=_BM25_B, top_k=50, require_all=True,
    )


@register(
    "search_hybrid_rrf",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tfc FROM toks
      WHERE tok IN {repr(tuple(_BM25_TERMS))} GROUP BY doc_id, tok),
    df AS (
      SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY tok),
    term_scores AS (
      SELECT tf.doc_id,
             ln(1.0 + (stats.n_docs - df.dfc + 0.5) / (df.dfc + 0.5))
             * (tf.tfc * ({_BM25_K1!r} + 1.0))
             / (tf.tfc + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                + {_BM25_B!r} * dl.dlen / stats.avgdl)) AS s
      FROM tf JOIN dl USING (doc_id) JOIN df USING (tok), stats),
    lex_scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(CAST(s AS DECIMAL(18,12)) * 1000000000000
                  AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS score
      FROM term_scores GROUP BY doc_id),
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      FROM lex_scored),
    nv AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings),
    vpairs AS (
      SELECT c.vec_id AS doc_id,
             {_dot_sql('q.embedding', 'c.embedding')} / (q.nrm * c.nrm)
               AS cosine
      FROM nv q JOIN nv c ON c.vec_id <> q.vec_id
      WHERE q.vec_id = 0),
    vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank
      FROM vpairs),
    fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             COALESCE(1.0 / (60.0 + l.lex_rank), 0.0)
             + COALESCE(1.0 / (60.0 + v.vec_rank), 0.0) AS rrf
      FROM (SELECT * FROM lex WHERE lex_rank <= 50) l
      FULL OUTER JOIN (SELECT * FROM vec WHERE vec_rank <= 50) v
        ON l.doc_id = v.doc_id)
    SELECT doc_id, lex_rank, vec_rank, rrf,
           CAST(fused_rank AS INT) AS fused_rank
    FROM (
      SELECT doc_id, lex_rank, vec_rank, rrf,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
      FROM fused)
    WHERE fused_rank <= 20
    """,
)
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion (k=60): the lexical
    BM25 top-50 (the registered bm25_search pipeline, reused verbatim)
    and the cosine top-50 for a query embedding fuse as
    ``Σ 1/(60 + rank)`` — the standard RAG-stack combiner of sparse and
    dense retrievers, robust to their incomparable score scales because
    only RANKS enter the sum. Both ranked lists are top-k-bounded, so the
    fusion join is metadata-sized regardless of corpus scale; ranks are
    engine-stable (exact-fixed-point scores with total tie-breaks on both
    sides) and the RRF sum is two exact single-op divisions, so the fused
    ordering matches the oracle bitwise. The fused rank uses the two-pass
    offset scheme (no single-task window)."""
    from ..operators import similarity as S2

    lex = (
        QUERIES["bm25_search"](spark, sf_dir)
        .select("doc_id", F.col("rank").alias("lex_rank"))
    )
    emb = _t(spark, sf_dir, "embeddings")
    vec = (
        S2.knn_bruteforce(
            emb.where(F.col("vec_id") != 0),
            emb.where(F.col("vec_id") == 0),
            top_k=50,
        )
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("vec_rank"),
        )
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            (
                F.coalesce(1.0 / (60.0 + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60.0 + F.col("vec_rank")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    ranked = topk_ranked(
        fused, [F.col("rrf").desc(), F.col("doc_id")], 20,
        rank_col="fused_rank",
    )
    return ranked.select(
        "doc_id", "lex_rank", "vec_rank", "rrf",
        F.col("fused_rank").cast("int").alias("fused_rank"),
    )


def _pii_aug_sql() -> str:
    """The deterministic PII-bearing text both engines construct: the
    corpus is synthetic word-soup with no real PII, so the query plants
    category instances derived from doc_id (some Luhn-valid, some not)
    and the differential then tests the detection/validation/redaction
    machinery itself — regex parity, checksum fold, placeholder order."""
    return (
        "text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'"
        " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'"
        " || CASE WHEN doc_id % 2 = 0 THEN ' call 555-867-5309'"
        " ELSE ' ssn 078-05-1120' END"
        " || ' card ' || lpad(CAST((CAST(doc_id AS BIGINT) * 1234567 + 11)"
        " % 10000000000000000 AS VARCHAR), 16, '0')"
    )


def _pii_augmented(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, text) with the deterministic planted PII — shared by
    the batch and streaming scrub queries; mirrors ``_pii_aug_sql``."""
    ccn = F.lpad(
        ((F.col("doc_id").cast("bigint") * 1234567 + 11) % F.lit(10**16))
        .cast("string"),
        16,
        "0",
    )
    aug = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(" call 555-867-5309")).otherwise(
            F.lit(" ssn 078-05-1120")
        ),
        F.lit(" card "),
        ccn,
    )
    return docs.select("doc_id", "lang", aug.alias("text"))


@register(
    "text_pii_scrub",
    f"""
    WITH aug AS (
        SELECT doc_id, {_pii_aug_sql()} AS t FROM documents
    )
    SELECT
        doc_id,
        len(regexp_extract_all(t, '{PII.PII_PATTERNS["email"]}')) AS n_email,
        len(regexp_extract_all(t, '{PII.PII_PATTERNS["ssn"]}')) AS n_ssn,
        len(regexp_extract_all(t, '{PII.PII_PATTERNS["phone"]}')) AS n_phone,
        len(regexp_extract_all(t, '{PII.PII_PATTERNS["ipv4"]}')) AS n_ipv4,
        len(regexp_extract_all(t, '{PII.PII_PATTERNS["ccn"]}')) AS n_ccn,
        len(list_filter(regexp_extract_all(t, '{PII.PII_PATTERNS["ccn"]}'),
            cc -> {PII.luhn_valid_sql("cc")})) AS n_ccn_valid,
        md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(t,
            '{PII.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
            '{PII.PII_PATTERNS["ssn"]}', '<SSN>', 'g'),
            '{PII.PII_PATTERNS["phone"]}', '<PHONE>', 'g'),
            '{PII.PII_PATTERNS["ipv4"]}', '<IPV4>', 'g'),
            '{PII.PII_PATTERNS["ccn"]}', '<CCN>', 'g')) AS redacted_md5
    FROM aug
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark, sf_dir):
    """PII compliance scan: detect emails / SSN-shaped ids / phones /
    IPv4 / 16-digit card runs, Luhn-validate the card candidates, and
    hash the placeholder-redacted text. The corpus carries no PII, so
    deterministic instances are planted from doc_id (identically in the
    oracle) and the differential verifies the machinery: Java-regex vs
    RE2 parity on the shared pattern subset, the transform/aggregate
    checksum fold, and the redaction order. Pure map — no shuffle; at
    100 TB this runs at scan speed inside whole-stage codegen."""
    docs = _t(spark, sf_dir, "documents")
    scrubbed = PII.scrub(_pii_augmented(docs))
    return scrubbed.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ipv4",
        "n_ccn",
        "n_ccn_valid",
        F.md5("redacted").alias("redacted_md5"),
    ).orderBy("doc_id")


@register(
    "streaming_pii_scrub",
    f"""
    WITH aug AS (
        SELECT doc_id, lang, {_pii_aug_sql()} AS t FROM documents
    )
    SELECT
        lang,
        COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(t, '{PII.PII_PATTERNS["email"]}')))
             AS BIGINT) AS n_email,
        CAST(SUM(len(list_filter(
            regexp_extract_all(t, '{PII.PII_PATTERNS["ccn"]}'),
            cc -> {PII.luhn_valid_sql("cc")}))) AS BIGINT) AS n_ccn_valid,
        CAST(SUM(CAST('0x' || substring(md5(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(t,
            '{PII.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
            '{PII.PII_PATTERNS["ssn"]}', '<SSN>', 'g'),
            '{PII.PII_PATTERNS["phone"]}', '<PHONE>', 'g'),
            '{PII.PII_PATTERNS["ipv4"]}', '<IPV4>', 'g'),
            '{PII.PII_PATTERNS["ccn"]}', '<CCN>', 'g')), 1, 13) AS BIGINT))
            AS BIGINT) AS redact_sum
    FROM aug
    GROUP BY lang
    ORDER BY lang
    """,
)
def streaming_pii_scrub(spark, sf_dir):
    """The PII scrub as a STREAMING pipeline: the same stateless column
    expressions (regex suite + Luhn fold) applied on a readStream over
    the corpus, landed exactly-once into a versioned table through the
    txn-marked sink, then the final table aggregated per language — and
    the result must equal the batch oracle bit-for-bit (the commutative
    md5-prefix checksum over redacted text pins every byte of every
    redaction, not just the counts). This is the operational claim of
    operators/pii.py made checkable: a stateless compliance pass needs NO
    batch/stream fork — one expression tree serves both, and the
    streaming path adds only the sink's exactly-once machinery."""
    from ..operators import table_format as TF
    from ..streaming.table_sink import stream_write_table

    scratch = _versioned_scratch("piistream", sf_dir)
    dst, ckpt = scratch + "/dst", scratch + "/ckpt"
    schema = spark.read.option("pathGlobFilter", "documents.parquet").parquet(
        sf_dir
    ).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    scrubbed = PII.scrub(_pii_augmented(stream)).select(
        "doc_id", "lang", "n_email", "n_ccn_valid", "redacted"
    )
    q = stream_write_table(
        scrubbed, dst, ckpt, app_id="streaming_pii_scrub",
        key="doc_id", partition_by="lang",
    )
    q.awaitTermination(600)
    return (
        TF.read_table(spark, dst)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("n_email"),
            F.sum("n_ccn_valid").cast("bigint").alias("n_ccn_valid"),
            F.sum(
                F.conv(F.substring(F.md5("redacted"), 1, 13), 16, 10).cast(
                    "long"
                )
            )
            .cast("bigint")
            .alias("redact_sum"),
        )
        .orderBy("lang")
    )



@register(
    "streaming_text_ingest_search",
    f"""
    WITH live AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 <> 31),
    toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM live),
    dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tfc FROM toks
      WHERE tok IN {repr(tuple(_BM25_TERMS))} GROUP BY doc_id, tok),
    df AS (
      SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY tok),
    term_scores AS (
      SELECT tf.doc_id,
             ln(1.0 + (stats.n_docs - df.dfc + 0.5) / (df.dfc + 0.5))
             * (tf.tfc * ({_BM25_K1!r} + 1.0))
             / (tf.tfc + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                + {_BM25_B!r} * dl.dlen / stats.avgdl)) AS s
      FROM tf JOIN dl USING (doc_id) JOIN df USING (tok), stats),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(CAST(s AS DECIMAL(18,12)) * 1000000000000
                  AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS score
      FROM term_scores GROUP BY doc_id),
    ranked AS (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored)
    SELECT doc_id, score, rank FROM ranked WHERE rank <= 50
    """,
)
def streaming_text_ingest_search(spark, sf_dir):
    """STREAMING maintenance of the inverted text index — the Lucene
    near-real-time-ingest shape on Spark: today's crawl arrives as a
    Structured Streaming feed, lands in the corpus through the
    exactly-once txn-marked sink, and the sink's post_batch hook runs
    :func:`textindex.sync_text_index` — VERSION-DRIVEN maintenance that
    folds each microbatch's change window into the postings (replayed
    batches no-op because the corpus version didn't move). After the
    stream, an RTBF delete lands on the corpus and the next maintenance
    tick folds it through the round-9 delete path (pre-image re-tokenize,
    bounded bucket blast radius, meta scalars decrement). The probe is
    the standard BM25 search; the oracle replays the scan-path BM25 over
    the FINAL corpus membership, so the hash match proves the index
    tracked inserts-then-deletes through a live pipeline bit-for-bit —
    indexed == scan, continuously."""
    from ..operators import table_format as TF
    from ..operators import textindex as TI
    from ..sources import cbx_datasource as DS
    from ..streaming.table_sink import stream_write_table

    scratch = _versioned_scratch("textstream", sf_dir)
    src, dst = scratch + "/src", scratch + "/docs"
    base, ckpt = scratch + "/idx", scratch + "/ckpt"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    TF.create_table(docs.where(F.col("doc_id") % 10 != 9), dst)
    TI.build_text_index(spark, TF.read_table(spark, dst), base)
    TI.bind_text_index(base, dst)
    new = docs.where(F.col("doc_id") % 10 == 9)
    TF.create_table(new.where(F.col("doc_id") % 20 == 9), src)
    TF.insert_into(spark, src, new.where(F.col("doc_id") % 20 == 19))
    DS.register(spark)
    stream = (
        spark.readStream.format("cbxtable")
        .option("startingVersion", "earliest")
        .load(src)
    )
    q = stream_write_table(
        stream, dst, ckpt, app_id="ti_ingest", key="doc_id",
        post_batch=lambda sp: TI.sync_text_index(sp, base),
    )
    q.awaitTermination(600)
    # an RTBF delete lands between maintenance ticks; the next sync folds
    # it from the change feed (pre-image path — no postings-wide pass)
    TF.delete_where(spark, dst, "doc_id % 100 = 31")
    TI.sync_text_index(spark, base)
    return TI.bm25_probe(
        spark, base, list(_BM25_TERMS), k1=_BM25_K1, b=_BM25_B, top_k=50
    )
