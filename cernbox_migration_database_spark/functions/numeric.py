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
    """Order-independent SUM over a double column, returned as double."""
    return F.sum(_col(col).cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = _col(col)
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def dsum_expr(sql_expr: str, scale: int = 2, precision: int = 18) -> str:
    """The SQL-text twin of :func:`dsum` for oracle queries."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
