"""Exact-decimal aggregation helpers.

Floating-point SUM/AVG are order-dependent, and Spark's task/partition
ordering is nondeterministic — two runs (or two engines) can disagree in the
last ulp. Every aggregate this engine exposes over double columns therefore
routes through an exact DECIMAL accumulator and casts the final value back to
double: the decimal sum is exact and commutative, so the result is
bit-identical regardless of partition count, AQE decisions, or which engine
(Spark vs the DuckDB oracle) computes it. The double->decimal cast itself is
deterministic (decimal midpoints are not representable as binary doubles, so
round-to-nearest is unambiguous).

This also matters at 100 TB: a billion-row SUM(double) is not reproducible
across retries/speculative tasks; the decimal path is.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM over a double column, returned as double.

    Implementation: quantize each row to ``scale`` decimals (exact decimal
    cast), scale to an integer, accumulate as LONG (≈3x faster than decimal
    accumulation — plain codegen'd long adds), then one double division.
    The long sum is exact; ANSI mode makes any overflow loud rather than
    silent. Capacity: ~9.2e18 / 10^scale of absolute value — e.g. 9.2e16 at
    scale 2 (good past TPC-H sf10000), 9.2e12 at scale 6 (good to ~sf100);
    use :func:`dsum_decimal` beyond that.
    """
    c = _col(col)
    q = (c.cast(f"decimal({precision},{scale})") * (10**scale)).cast("long")
    return F.sum(q).cast("double") / F.lit(float(10**scale))


def dsum_decimal(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Unbounded-capacity variant: decimal accumulator (slower)."""
    return F.sum(_col(col).cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact integer sum, one double division."""
    c = _col(col)
    q = (c.cast(f"decimal({precision},{scale})") * (10**scale)).cast("long")
    return F.sum(q).cast("double") / F.lit(float(10**scale)) / F.count(c)


def dsum_expr(sql_expr: str, scale: int = 2, precision: int = 18) -> str:
    """The SQL-text twin of :func:`dsum` for oracle queries. The BIGINT sum
    is exact; the final division is the same single double rounding on both
    engines."""
    mul = 10**scale
    return (
        f"(CAST(SUM(CAST(CAST(({sql_expr}) AS DECIMAL({precision},{scale})) "
        f"* {mul} AS BIGINT)) AS DOUBLE) / {mul}.0)"
    )
