"""PII detection and redaction over text columns — the compliance pass a
training-data pipeline runs before anything ships: find personally
identifying strings (emails, phone numbers, SSN-shaped ids, IPv4
addresses, 16-digit card numbers), validate card candidates with the Luhn
checksum so a random digit run is not reported as a leaked card, count
every category per document, and emit a redacted text with typed
placeholders.

Everything is JVM-side column expressions — ``regexp_extract_all`` /
``regexp_replace`` for the patterns and a ``transform``+``aggregate``
digit fold for Luhn — zero Python UDFs, so the scan stays inside
whole-stage codegen and scales linearly with input bytes. The patterns
are written in the common subset of Java regex and RE2 (no lookbehind, no
backrefs) so the DuckDB oracle runs the very same strings.

At 100 TB this is a pure map: no shuffle, no state; redaction cost is
O(bytes) per partition and the category counts are row-local. The same
expressions drop into the streaming path unchanged (stateless projection).

Extends the reference's surface (main.go has no text ops) as part of the
large-scale training-data pipeline set; reuses the dead-letter evidence
style of the migration plan (counts travel with the redacted row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies in this order. Patterns are deliberately
# non-overlapping (SSN is 3-2-4, phone 3-3-4, CCN a bare 16-digit run),
# so order only matters for determinism, not semantics.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ccn": r"\b\d{16}\b",
}


def luhn_valid(digits: Column) -> Column:
    """True iff ``digits`` (a string of decimal digits) passes the Luhn
    mod-10 checksum. Implemented as a row-local fold: position ``j``
    (1-based from the left) is doubled when its distance from the right
    end is odd — the check digit itself is never doubled. Pure
    ``transform`` + ``aggregate``; stays in codegen."""
    n = F.length(digits)
    contrib = F.transform(
        F.sequence(F.lit(1), n),
        lambda j: F.when(
            ((n - j) % 2) == 1,
            F.when(
                digits.substr(j, F.lit(1)).cast("int") * 2 > 9,
                digits.substr(j, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(digits.substr(j, F.lit(1)).cast("int") * 2),
        ).otherwise(digits.substr(j, F.lit(1)).cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    return (F.length(digits) > 0) & (total % 10 == 0)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts, plus ``ccn_valid`` (Luhn-checked card
    candidates). Returns a dict of named int columns ready to select."""
    out: dict[str, Column] = {}
    for name, pat in PII_PATTERNS.items():
        out[f"n_{name}"] = F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("int")
    out["n_ccn_valid"] = F.size(
        F.filter(
            F.regexp_extract_all(text, F.lit(PII_PATTERNS["ccn"]), F.lit(0)),
            luhn_valid,
        )
    ).cast("int")
    return out


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder (``<EMAIL>``,
    ``<SSN>``, ...), applying the patterns in ``PII_PATTERNS`` order. All
    16-digit runs are masked regardless of Luhn validity — redaction errs
    toward removal; the ``n_ccn_valid`` count carries the precision
    signal."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-category counts and a ``redacted`` text column. The
    original text column is preserved; callers drop it after auditing."""
    c = F.col(text_col)
    cols = pii_counts(c)
    res = df
    for name, col in cols.items():
        res = res.withColumn(name, col)
    return res.withColumn("redacted", redact_pii(c))


def luhn_valid_sql(expr: str) -> str:
    """DuckDB rendering of :func:`luhn_valid` over SQL expression
    ``expr`` — used by oracle strings so both engines run the same
    checksum definition."""
    d = f"CAST(substring({expr}, j, 1) AS INT)"
    return (
        f"(length({expr}) > 0 AND list_sum(list_transform("
        f"generate_series(1, length({expr})), j -> "
        f"CASE WHEN (length({expr}) - j) % 2 = 1 THEN "
        f"CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END "
        f"ELSE {d} END)) % 10 = 0)"
    )
