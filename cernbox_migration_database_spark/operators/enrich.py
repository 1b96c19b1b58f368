"""Enrichment (lookup) joins + dead-letter split (SURVEY.md §2.3 J1/J2, §2.1 S9).

The reference does one `eos file info` subprocess per row (main.go:120-137) —
~2-3 network round-trips per row, the dominant cost. The Spark-first
restructuring is set-at-a-time: join the whole shares DataFrame against a
metadata DataFrame once. When the metadata side is small it broadcasts (no
shuffle at all); at 100 TB-scale metadata the join shuffles both sides on the
key, which AQE re-plans and skew-handles.

A left join + null-check replaces the reference's per-row error path
(main.go:272-275): rows whose key found no match become the dead-letter
DataFrame instead of killing the job (per-row error isolation, X4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_join(
    df: DataFrame,
    lookup: DataFrame,
    on: Column,
    required_col: str,
    broadcast: bool = True,
    stage: str = "lookup",
) -> tuple[DataFrame, DataFrame]:
    """Left-join ``df`` against ``lookup``; split matched vs dead-letter.

    Returns ``(matched, dead)`` where ``dead`` rows had no match
    (``required_col`` NULL after the join), tagged with the failing stage —
    the Spark shape of the reference's "stderr + continue" (main.go:274).
    """
    right = F.broadcast(lookup) if broadcast else lookup
    joined = df.join(right, on, "left")
    matched = joined.filter(F.col(required_col).isNotNull())
    dead = (
        joined.filter(F.col(required_col).isNull())
        .select(*df.columns)
        .withColumn("error_stage", F.lit(stage))
    )
    return matched, dead


def external_service_lookup(df: DataFrame, fetch_batch, schema: str) -> DataFrame:
    """Template for a *live* external catalog (the true EOS shape): batch the
    keys per partition and call the service once per batch via mapInPandas —
    Arrow-vectorized, bounded by partition count (the X1 concurrency bound:
    `df.repartition(n)` before this call is the semaphore analogue).

    ``fetch_batch(pdf) -> pdf`` must be idempotent; retries happen at task
    granularity. Kept as plumbing here — fixtures exercise the join path.
    """

    def _iter(batches):
        for pdf in batches:
            yield fetch_batch(pdf)

    return df.mapInPandas(_iter, schema=schema)
