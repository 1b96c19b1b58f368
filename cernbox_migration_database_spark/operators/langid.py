"""Character-bigram Naive Bayes language ID (real classifier, not the
marker heuristic it replaces — VERDICT r2 item 7).

Model shape chosen for a 100 TB scan:

* trained OFFLINE (import time, pure deterministic Python) on small
  embedded seed corpora; the fitted weights are QUANTIZED to integers and
  embedded as a LITERAL map in the plan — no broadcast join, no Python
  UDF, no shuffle: scoring is a row-local Catalyst higher-order aggregate
  inside whole-stage codegen, linear in input bytes;
* integer (fixed-point 1e6) log-probability scores mean the per-language
  sums are exact on any engine and any evaluation order — the DuckDB
  oracle reproduces them bit-for-bit (float log-prob sums would drift);
* weights are CENTERED per bigram (score = logP(bg|lang) - mean over
  langs), so non-discriminative bigrams score ~0 and the model keeps only
  the TOP_K most discriminative ones — unseen bigrams contribute nothing,
  exactly the same as a 0-entry, which keeps the literal map small enough
  to stay a cheap per-row lookup;
* prediction = argmax over the 4 per-language sums, ties broken by
  language code ascending (langs are stored sorted, and Spark's
  ``array_position`` of the max returns the FIRST maximal index — the
  same total order the oracle's ``ORDER BY sc DESC, l ASC`` row_number
  applies).

The embedded training corpus is a handful of original sentences per
language — enough signal for bigram statistics to separate en/de/es/fr on
real text; on the synthetic fixture corpus (whose ``lang`` column is
independent of its token-soup text) the interesting, oracle-checked part
is the exact distributed scoring mechanism.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Offline training corpus: original text, a few sentences per language.
# --------------------------------------------------------------------------
_TRAIN: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the rain keeps "
        "falling on the quiet roof and the children watch from the window "
        "with their warm cups of tea because this is what evenings are for "
        "and nobody wants to leave the house when the weather turns cold "
        "the old library keeps its doors open for everyone who loves books"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund waehrend "
        "der regen leise auf das dach faellt und die kinder aus dem fenster "
        "schauen mit ihren warmen tassen tee denn genau dafuer sind die "
        "abende gedacht und niemand moechte das haus verlassen wenn das "
        "wetter kalt wird die alte bibliothek haelt ihre tueren offen"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso mientras la "
        "lluvia cae despacio sobre el tejado y los ninos miran por la "
        "ventana con sus tazas calientes de te porque para eso son las "
        "tardes y nadie quiere salir de casa cuando el tiempo se pone frio "
        "la vieja biblioteca mantiene sus puertas abiertas para todos"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux pendant "
        "que la pluie tombe doucement sur le toit et les enfants regardent "
        "par la fenetre avec leurs tasses de the bien chaudes car les "
        "soirees sont faites pour cela et personne ne veut quitter la "
        "maison quand le temps devient froid la vieille bibliotheque garde "
        "ses portes ouvertes"
    ),
}

LANGS: tuple[str, ...] = tuple(sorted(_TRAIN))  # tie-break order: asc
SCALE = 1_000_000
TOP_K = 64
_ALPHABET = 27 * 27  # a-z + space, Laplace denominator


def _normalize_py(s: str) -> str:
    """Python twin of the SQL normalization (must stay in lockstep with
    :func:`norm_expr` and the oracle): lowercase, non-letters to spaces,
    collapse, trim."""
    out = "".join(c if "a" <= c <= "z" else " " for c in s.lower())
    return " ".join(out.split())


def _bigrams_py(s: str) -> list[str]:
    return [s[i : i + 2] for i in range(len(s) - 1)]


def _fit() -> dict[str, tuple[int, ...]]:
    """Laplace-smoothed log P(bigram|lang), centered per bigram, quantized,
    top-K by discriminative spread. Deterministic: no RNG, fixed corpus."""
    counts = {
        lang: Counter(_bigrams_py(_normalize_py(txt)))
        for lang, txt in _TRAIN.items()
    }
    totals = {lang: sum(c.values()) for lang, c in counts.items()}
    vocab = sorted(set().union(*counts.values()))
    scored: dict[str, tuple[int, ...]] = {}
    for bg in vocab:
        logps = [
            math.log((counts[lang][bg] + 1) / (totals[lang] + _ALPHABET))
            for lang in LANGS
        ]
        mean = sum(logps) / len(logps)
        scored[bg] = tuple(round((lp - mean) * SCALE) for lp in logps)
    top = sorted(
        scored, key=lambda bg: (-(max(scored[bg]) - min(scored[bg])), bg)
    )[:TOP_K]
    return {bg: scored[bg] for bg in sorted(top)}


MODEL: dict[str, tuple[int, ...]] = _fit()


def _fit_en_lm() -> tuple[dict[str, int], int]:
    """English bigram LM for FLUENCY scoring (how English-like a document
    reads — the LM-perplexity quality signal of training-data pipelines,
    here as an exact integer sum). Returns (bigram -> quantized logP,
    quantized smoothing floor for unseen bigrams)."""
    counts = Counter(_bigrams_py(_normalize_py(_TRAIN["en"])))
    total = sum(counts.values())
    lm = {
        bg: round(math.log((c + 1) / (total + _ALPHABET)) * SCALE)
        for bg, c in sorted(counts.items())
    }
    floor = round(math.log(1 / (total + _ALPHABET)) * SCALE)
    return lm, floor


EN_LM, EN_FLOOR = _fit_en_lm()


# --------------------------------------------------------------------------
# Spark-side scoring (pure Catalyst; literal-folded model)
# --------------------------------------------------------------------------
def norm_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z]+", " "))


def _bigram_expr(norm: Column) -> Column:
    # sequence(a, b) is DESCENDING when b < a, so guard short strings.
    return F.when(F.length(norm) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 1),
            lambda i: F.substring(norm, i, F.lit(2)),
        )
    )


def score_langs(text: Column | str) -> Column:
    """Array of per-language quantized log-odds sums (order = LANGS).

    Formulated as Σ_bg count(bg) · w_lang(bg) over the TOP_K model
    bigrams: one ``regexp_count`` occurrence count per model bigram (a
    lookahead pattern so self-overlapping bigrams like 'aa' in 'aaa'
    count every start position — exactly the substring-walk semantics),
    reused across the four weighted sums, all inside whole-stage codegen.
    Bit-identical to the original higher-order ``aggregate`` walk (each
    bigram occurrence contributes its weight once), but the HOF ran on
    the interpreted per-element path with a 128-entry literal-map scan
    per bigram — ~8× slower on the pipeline's langid stage. Model
    bigrams are [a-z ]² so the lookahead body needs no regex escaping."""
    return _scores_from_norm(norm_expr(text))


def _scores_from_norm(norm: Column) -> Column:
    counts = {
        bg: F.regexp_count(norm, F.lit(f"(?={bg})")).cast("long")
        for bg in MODEL
    }
    sums = []
    for li in range(len(LANGS)):
        s = F.lit(0).cast("long")
        for bg, scores in MODEL.items():
            if scores[li]:
                s = s + counts[bg] * F.lit(scores[li]).cast("long")
        sums.append(s)
    return F.array(*sums)


def _scores_sql(norm_sql: str) -> str:
    """SQL-text rendering of :func:`_scores_from_norm` over a NAMED
    column. Composing the ~320 Column operations of the score sums
    through the Python Column API costs ~2.5 s of py4j round trips per
    query BEFORE any execution (measured on the pipeline's langid stage,
    r12); generating the same expressions as one SQL string and parsing
    it with ``F.expr`` is milliseconds — the round-3 pq_encode lesson
    (PLANS.md) applied to the langid scorer. Same integer arithmetic,
    same results. Model bigrams are [a-z ]² so no SQL escaping needed."""
    sums = []
    for li in range(len(LANGS)):
        terms = ["CAST(0 AS BIGINT)"]
        for bg, scores in MODEL.items():
            if scores[li]:
                terms.append(
                    f"CAST(regexp_count({norm_sql}, '(?={bg})') AS BIGINT)"
                    f" * CAST({scores[li]} AS BIGINT)"
                )
        sums.append(" + ".join(terms))
    return "array(" + ", ".join(sums) + ")"


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred`` (argmax language) and ``lang_score`` (winning
    quantized log-odds sum, BIGINT) columns. The normalized text is
    materialized in its own projection so the 64 per-bigram counts share
    ONE regexp_replace evaluation instead of re-normalizing per count
    (measured ~1.5× on the pipeline's langid stage)."""
    scores = F.expr(_scores_sql("__lid_norm"))
    langs_lit = F.array(*[F.lit(x) for x in LANGS])
    best = F.array_max(scores)
    idx = F.array_position(scores, best)  # first max -> lang asc tie-break
    return (
        df.withColumn("__lid_norm", norm_expr(text_col))
        .withColumn("lang_pred", F.element_at(langs_lit, idx.cast("int")))
        .withColumn("lang_score", best.cast("long"))
        .drop("__lid_norm")
    )


def with_fluency(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_bigrams`` (long), ``fluency_q`` (long: exact quantized
    log-prob sum under the English bigram LM) and ``fluency`` (double:
    mean log-prob per bigram — higher = more English-like). Row-local
    aggregate over a literal map, scan-linear; n_bigrams derives from
    length(norm) rather than re-walking the bigram array (no second HOF
    pass)."""
    # same decomposition as score_langs: every bigram contributes at least
    # the smoothing floor, so tot = floor·n_bigrams + Σ count(bg)·(q−floor)
    # over the LM's known bigrams — codegen occurrence counts over one
    # materialized normalization instead of the interpreted per-element
    # HOF walk with a 280-entry literal-map scan
    # SQL-text rendering for the same reason as _scores_sql: the ~280-term
    # Column-API sum cost seconds of py4j plan-build per query; one parsed
    # SQL string is milliseconds. Identical integer arithmetic.
    norm_sql = "__flu_norm"
    norm = F.col(norm_sql)
    n = F.when(F.length(norm) >= 2, F.length(norm) - 1).otherwise(F.lit(0))
    terms = [
        f"CAST(CASE WHEN length({norm_sql}) >= 2 THEN length({norm_sql}) - 1"
        f" ELSE 0 END AS BIGINT) * CAST({EN_FLOOR} AS BIGINT)"
    ]
    for bg, q in EN_LM.items():
        if q != EN_FLOOR:
            terms.append(
                f"CAST(regexp_count({norm_sql}, '(?={bg})') AS BIGINT)"
                f" * CAST({q - EN_FLOOR} AS BIGINT)"
            )
    tot = F.expr(" + ".join(terms))
    return (
        df.withColumn("__flu_norm", norm_expr(text_col))
        .withColumn("n_bigrams", n.cast("long"))
        .withColumn("fluency_q", tot)
        .withColumn(
            "fluency",
            F.when(
                F.col("n_bigrams") > 0,
                F.col("fluency_q").cast("double")
                / (F.col("n_bigrams") * float(SCALE)),
            ),
        )
        .drop("__flu_norm")
    )


def fluency_oracle_sql(table: str = "documents") -> str:
    values = ",\n      ".join(
        f"('{bg}', {q})" for bg, q in EN_LM.items()
    )
    return f"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM {table}),
    bg AS (
      SELECT doc_id, unnest(list_transform(
               range(1, CASE WHEN length(s) >= 2 THEN length(s) ELSE 1 END),
               i -> substring(s, CAST(i AS INTEGER), 2))) AS b
      FROM norm),
    m(b, sc) AS (VALUES
      {values}),
    agg AS (
      SELECT bg.doc_id, COUNT(*) AS n_bigrams,
             SUM(COALESCE(m.sc, {EN_FLOOR})) AS tot
      FROM bg LEFT JOIN m USING (b) GROUP BY 1)
    SELECT n.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(a.tot, 0) AS BIGINT) AS fluency_q,
           CASE WHEN COALESCE(a.n_bigrams, 0) > 0
                THEN CAST(a.tot AS DOUBLE) / (a.n_bigrams * {SCALE}.0)
           END AS fluency
    FROM norm n LEFT JOIN agg a USING (doc_id)
    """


# --------------------------------------------------------------------------
# Oracle SQL, generated from the SAME fitted model (single source of truth)
# --------------------------------------------------------------------------
def oracle_sql(table: str = "documents") -> str:
    values = ",\n      ".join(
        f"('{bg}', '{lang}', {score})"
        for bg, scores in MODEL.items()
        for lang, score in zip(LANGS, scores)
    )
    lang_values = ", ".join(f"('{lang}')" for lang in LANGS)
    return f"""
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS s
      FROM {table}),
    bg AS (
      SELECT doc_id, unnest(list_transform(
               range(1, CASE WHEN length(s) >= 2 THEN length(s) ELSE 1 END),
               i -> substring(s, CAST(i AS INTEGER), 2))) AS b
      FROM norm),
    m(b, l, sc) AS (VALUES
      {values}),
    persum AS (
      SELECT bg.doc_id, m.l, SUM(m.sc) AS sc
      FROM bg JOIN m USING (b) GROUP BY 1, 2),
    langs(l) AS (VALUES {lang_values}),
    scored AS (
      SELECT n.doc_id, n.lang, langs.l, COALESCE(p.sc, 0) AS sc
      FROM norm n CROSS JOIN langs
      LEFT JOIN persum p ON p.doc_id = n.doc_id AND p.l = langs.l),
    ranked AS (
      SELECT doc_id, lang, l, sc,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY sc DESC, l ASC) AS rn
      FROM scored)
    SELECT doc_id, lang, l AS lang_pred, CAST(sc AS BIGINT) AS lang_score
    FROM ranked WHERE rn = 1
    """
