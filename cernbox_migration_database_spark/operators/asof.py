"""As-of (most-recent-match) join — an operator Spark has no native form of.

For each left row, find the latest right row with the same key and
``right.ts <= left.ts``. The scalable formulation is the union trick:

  1. tag both sides and union them into one stream of (key, ts, side, ...);
  2. sort within key by (ts, side) — right rows before left rows at equal ts
     so a same-timestamp right row is visible to the left row (<= semantics);
  3. last(right_value, ignoreNulls) over an unbounded-preceding window
     carries the most recent right row forward;
  4. keep only left rows.

One shuffle on the key (same cost as a regular join), no per-group pandas,
no range explosion — this is the 100 TB-safe shape. A merge_asof via
applyInPandas would be the fallback for semantics this can't express
(tolerance windows, nearest-rather-than-previous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, NumericType, TimestampNTZType, TimestampType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with ``right_cols`` from
    the most recent ``right`` row at or before its ``ts`` (NULLs when none).

    ``direction="forward"`` flips the semantics to the EARLIEST right row
    at-or-after the left ``ts`` (attribution-style "next event" lookups);
    implementation-wise only the traversal order of the same window plan
    changes (ts descending), so the cost is identical.

    ``tolerance`` invalidates a match whose ts gap exceeds it — the match
    becomes NULL, it is NOT re-searched (pandas merge_asof semantics).
    Implemented by carrying the matched right ts alongside the values and
    null-masking, still one shuffle. For timestamp/date ``ts`` pass an SQL
    interval string (e.g. ``"INTERVAL 1 DAY"``); for a numeric ``ts`` pass
    a number (or numeric string) — the gap is plain subtraction there, and
    an interval would fail analysis with an opaque error.

    ``right`` should be pre-deduplicated to one row per (key, ts) — with
    duplicates the carried row is the last under the internal sort, which is
    deterministic only if the caller makes it so.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = [c for c in left.columns]
    clash = {"__is_left", "__mts"} & set(lcols)
    if clash:
        raise ValueError(
            f"left columns {sorted(clash)} collide with asof_join's "
            "internal tag columns — rename them before the join"
        )
    tol_expr = None
    if tolerance is not None:
        ts_type = left.schema[ts].dataType
        if isinstance(ts_type, NumericType):
            try:
                num = float(tolerance)
            except (TypeError, ValueError):
                raise ValueError(
                    f"ts column {ts!r} is numeric ({ts_type.simpleString()}); "
                    f"tolerance must be a number, got {tolerance!r}"
                ) from None
            tol_expr = F.lit(num)
        elif isinstance(ts_type, (DateType, TimestampType, TimestampNTZType)):
            if not isinstance(tolerance, str):
                raise ValueError(
                    f"ts column {ts!r} is {ts_type.simpleString()}; tolerance "
                    f"must be an SQL interval string, got {tolerance!r}"
                )
            tol_expr = F.expr(tolerance)
        else:
            raise ValueError(
                f"tolerance is not supported for ts column {ts!r} of type "
                f"{ts_type.simpleString()} (timestamp/date/numeric only)"
            )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (key, ts)
        ],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    ).select(*lcols, "__is_left", *[f"{prefix}{c}" for c in right_cols])

    u = l_tagged.unionByName(r_tagged)
    order_ts = F.col(ts) if direction == "backward" else F.col(ts).desc()
    w = (
        W.partitionBy(key)
        .orderBy(order_ts, F.col("__is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = [
        F.last(F.col(f"{prefix}{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in right_cols
    ]
    if tolerance is None:
        filled = u.select(*lcols, F.col("__is_left"), *carried)
        return filled.filter(F.col("__is_left") == 1).drop("__is_left")
    mts = F.last(
        F.when(F.col("__is_left") == 0, F.col(ts)), ignorenulls=True
    ).over(w)
    filled = u.select(
        *lcols, F.col("__is_left"), mts.alias("__mts"), *carried
    )
    gap_ok = (
        F.col(ts) - F.col("__mts") <= tol_expr
        if direction == "backward"
        else F.col("__mts") - F.col(ts) <= tol_expr
    )
    valid = F.col("__mts").isNotNull() & gap_ok
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *lcols,
            *[
                F.when(valid, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
                for c in right_cols
            ],
        )
    )
