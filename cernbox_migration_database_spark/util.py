"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# DataFrames persisted by operators for intra-query reuse (shingle sets,
# scaled vectors). A long-lived session running the catalog repeatedly
# (driver / bench / selfcheck loops) would otherwise accumulate cached
# partitions until the block manager evicts under pressure — harnesses call
# release_persisted() between queries.
_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() with lifecycle tracking so harness loops can reclaim."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns the count."""
    n = len(_PERSISTED)
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist(blocking=False)
        except Exception:
            pass
    return n


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input has fewer partitions than the session's
    parallelism. A small parquet file arrives as 1 partition, which serializes
    every downstream compute-heavy projection (shingling, hashing, vector
    math) onto one core; a 100 TB table already has thousands of partitions
    and must NOT be gratuitously reshuffled — hence the conditional.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
