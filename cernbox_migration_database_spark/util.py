"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
