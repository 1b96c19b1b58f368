"""SCD2 (slowly-changing-dimension type 2) apply — the CDC-shaped extension
of the merge sink.

Without a transactional table format (Delta/Iceberg jars aren't in this
environment) SCD2 is emulated purely relationally, the pattern the PySpark
guide calls anti-join + union + window:

  changed   = updates joined to current rows where any tracked attr differs
  closed    = those current rows with valid_to set to the update ts
  new_rows  = changed updates (+ brand-new keys) opened at the update ts
  untouched = everything else, bit-for-bit

One equi-join + one union; no per-row logic; the output is the full new
dimension table (idempotent overwrite — with Delta this becomes MERGE INTO).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Open-ended "current version" sentinel. NOT 9999-12-31: nanosecond-epoch
# systems (pandas/Arrow datetime64[ns] — including differential harnesses
# that canonicalize through pandas — and most ns-based stores) overflow
# past 2262-04-11, turning the conventional sentinel into a crash.
OPEN_END = "2261-12-31 00:00:00"


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim`` columns: key, attrs..., valid_from timestamp,
    valid_to timestamp (OPEN_END when current).
    ``updates`` columns: key, attrs..., ts (effective time). One row per key
    per batch (enforce upstream with a window if needed).
    """
    open_end = F.lit(OPEN_END).cast("timestamp")
    cur = dim.filter(F.col("valid_to") == open_end)
    hist = dim.filter(F.col("valid_to") != open_end)

    u = updates.select(
        F.col(key),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(ts_col).alias("__u_ts"),
    )
    j = cur.join(u, key, "left")

    changed: Column = F.col("__u_ts").isNotNull()
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
    changed = changed & differs

    # current rows: closed out if changed, untouched otherwise
    kept_cur = j.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("valid_from"),
        F.when(changed, F.col("__u_ts")).otherwise(F.col("valid_to")).alias("valid_to"),
    )

    # new versions for changed keys
    opened = j.filter(changed).select(
        F.col(key),
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__u_ts").alias("valid_from"),
        open_end.alias("valid_to"),
    )

    # brand-new keys (anti join against current)
    brand_new = u.join(cur.select(key), key, "left_anti").select(
        F.col(key),
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__u_ts").alias("valid_from"),
        open_end.alias("valid_to"),
    )

    return hist.unionByName(kept_cur).unionByName(opened).unionByName(brand_new)
