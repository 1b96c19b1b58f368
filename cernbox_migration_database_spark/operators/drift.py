"""Distribution-drift profiling between two populations of one schema.

The training-pipeline question this answers: did this week's crawl (or
this snapshot of a versioned table vs the one a model trained on) shift
in a way that should gate ingestion? Population Stability Index is the
standard production monitor: bin a reference population, drop the
comparison population through the SAME bins, and sum
``(p_cur - p_ref) * ln(p_cur / p_ref)`` per bin (≥ 0, with > 0.2
conventionally "significant drift", > 0.25 "act").

Spark-first shape: the profile for ANY number of columns is ONE pass
over each population — columns melt into (column, value) rows via a
row-local ``explode(array(struct(...)))`` generator, then a single
groupBy(column, bin) counts everything. No per-column scans, no UDFs,
no driver loops over data; the only driver-side values are the 2·k
reference min/max scalars that define the bin grids (k = #columns —
metadata-sized, the same posture as similarity.py's centroid collects).

Determinism contract (what lets the DuckDB oracle pin it): fixed-width
bins over the REFERENCE min/max (never quantile sketches, which are
engine-approximate), Laplace smoothing ``(n + 0.5) / (N + 0.5 * bins)``
so empty bins stay finite, exact integer counts, one terminal
``round(.., 6)`` on the PSI term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _melt(df: DataFrame, cols: list[str]) -> DataFrame:
    """(colname, x) rows — one generator per input row, single scan."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("colname"), F.col(c).cast("double").alias("x")
            )
            for c in cols
        ]
    )
    return df.select(F.explode(pairs).alias("p")).select("p.colname", "p.x")


def psi_profile(
    spark: SparkSession,
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    bins: int = 10,
) -> DataFrame:
    """Per-(column, bin) drift profile of ``cur`` against ``ref``:
    ``(colname, bin, n_ref, n_cur, psi_term)``; ``sum(psi_term) GROUP BY
    colname`` is the column's PSI. Bin grid = ``bins`` equal-width cells
    over the reference min/max; values outside (new cur extremes) clamp
    into the edge cells, null values are excluded from both populations
    (they carry no position in a numeric grid — monitor them with a
    separate null-rate check)."""
    # 2k scalars defining the grid — the one driver-side step
    bounds = ref.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    # an empty reference or an all-null column has no min/max — fail with
    # the column's name, not a NoneType comparison deep in the grid math
    dead = [
        c for c in cols
        if bounds[f"lo_{c}"] is None or bounds[f"hi_{c}"] is None
    ]
    if dead:
        raise ValueError(
            f"psi_profile: reference population has no non-null values for "
            f"column(s) {dead} — no bin grid can be derived (drop them or "
            f"monitor their null rate separately)"
        )

    def binned(df: DataFrame, name: str) -> DataFrame:
        m = _melt(df, cols).where(F.col("x").isNotNull())
        # per-column literal grid folded into ONE chained expression —
        # stays in whole-stage codegen
        b = F.lit(None).cast("int")
        for c in cols:
            lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
            w = (hi - lo) / float(bins) if hi > lo else 1.0
            idx = F.floor((F.col("x") - F.lit(lo)) / F.lit(w)).cast("int")
            idx = F.least(F.greatest(idx, F.lit(0)), F.lit(bins - 1))
            b = F.when(F.col("colname") == c, idx).otherwise(b)
        return (
            m.groupBy("colname", b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    nr = binned(ref, "n_ref")
    nc = binned(cur, "n_cur")
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin")).crossJoin(
        spark.createDataFrame([(c,) for c in cols], "colname string")
    )
    joined = (
        grid.join(nr, ["colname", "bin"], "left")
        .join(nc, ["colname", "bin"], "left")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    tot = joined.groupBy("colname").agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    half_bins = F.lit(0.5 * bins)
    p_ref = (F.col("n_ref") + 0.5) / (F.col("tot_ref") + half_bins)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("tot_cur") + half_bins)
    return (
        joined.join(tot, "colname")
        .select(
            "colname",
            "bin",
            "n_ref",
            "n_cur",
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
                "psi_term"
            ),
        )
    )
