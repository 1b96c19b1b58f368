"""Column profiling — the data-quality / schema-drift stage of a pipeline.

One aggregation pass over the table produces, per column: row count, null
count, exact distinct count, and (for numeric / timestamp columns) min, max
and an exact order-independent sum (functions/numeric.dsum — float sums are
partition-order-dependent, so a profiler that re-runs on retries must not
use them). The single wide agg row is then unpivoted with ``stack`` into
one row per column, so the output is a small profile table regardless of
input width.

Plan shape: Spark evaluates the N exact COUNT(DISTINCT col) aggregates via
one Expand (xN row multiplication) feeding a single partial+final
aggregation — one scan, one shuffle of partial states, no per-column jobs.
That is the right trade at 100 TB when exact distincts are required; when
approximate distincts suffice, swap countDistinct for approx_count_distinct
and the Expand disappears (see the `approx_sketches` query for the HLL
path and its error-bound tests).

Reference scope note: the reference CLI (main.go) has no profiling surface;
this is part of the extended pipeline operator set the engine targets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum


def profile(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    ts_cols: Sequence[str] = (),
    sum_scale: int = 2,
) -> DataFrame:
    """Profile every column of ``df``.

    Output schema: ``col string, n bigint, n_null bigint, n_distinct
    bigint, min_num double, max_num double, sum_num double`` — min/max/sum
    are NULL for non-numeric columns; timestamps surface min/max as epoch
    microseconds (engine-portable, no formatting ambiguity) and no sum.
    """
    all_cols = list(df.columns)
    numeric = set(numeric_cols)
    ts = set(ts_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in all_cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__nd"))
        if c in numeric:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__mn"),
                F.max(c).cast("double").alias(f"{c}__mx"),
                dsum(c, scale=sum_scale).alias(f"{c}__sm"),
            ]
        elif c in ts:
            # .cast("timestamp") first: parquet TIMESTAMP(MICROS) columns
            # arrive as TIMESTAMP_NTZ, which unix_micros rejects; under the
            # engine's UTC session zone the cast is value-preserving.
            aggs += [
                F.unix_micros(F.min(c).cast("timestamp"))
                .cast("double")
                .alias(f"{c}__mn"),
                F.unix_micros(F.max(c).cast("timestamp"))
                .cast("double")
                .alias(f"{c}__mx"),
            ]
    row = df.agg(*aggs)
    null_d = "CAST(NULL AS DOUBLE)"
    parts = []
    for c in all_cols:
        mn = f"`{c}__mn`" if c in numeric | ts else null_d
        mx = f"`{c}__mx`" if c in numeric | ts else null_d
        sm = f"`{c}__sm`" if c in numeric else null_d
        parts.append(
            f"'{c}', __n, __n - `{c}__nn`, `{c}__nd`, {mn}, {mx}, {sm}"
        )
    stack = (
        f"stack({len(all_cols)}, {', '.join(parts)}) "
        "as (col, n, n_null, n_distinct, min_num, max_num, sum_num)"
    )
    return row.selectExpr(stack)


def profile_oracle_sql(
    table: str,
    all_cols: Sequence[str],
    numeric_cols: Sequence[str] = (),
    ts_cols: Sequence[str] = (),
    sum_scale: int = 2,
) -> str:
    """DuckDB oracle generated from the same column lists — one SELECT per
    column UNION ALL'd, mirroring the unpivoted output exactly."""
    from ..functions.numeric import dsum_expr

    numeric = set(numeric_cols)
    ts = set(ts_cols)
    selects = []
    for c in all_cols:
        if c in numeric:
            mn = f"CAST(MIN({c}) AS DOUBLE)"
            mx = f"CAST(MAX({c}) AS DOUBLE)"
            sm = dsum_expr(c, scale=sum_scale)
        elif c in ts:
            mn = f"CAST(epoch_us(MIN({c})) AS DOUBLE)"
            mx = f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
            sm = "CAST(NULL AS DOUBLE)"
        else:
            mn = mx = sm = "CAST(NULL AS DOUBLE)"
        selects.append(
            f"SELECT '{c}' AS col, COUNT(*) AS n,"
            f" COUNT(*) - COUNT({c}) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num, {sm} AS sum_num"
            f" FROM {table}"
        )
    return "\nUNION ALL\n".join(selects)
