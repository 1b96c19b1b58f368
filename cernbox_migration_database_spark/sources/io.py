"""Generic readers/writers beyond parquet: CSV, JSON-lines, ORC, and
partitioned parquet layouts.

Readers always take an explicit schema (never inferSchema — a second pass
over 100 TB just to guess types). Writers expose the two layout levers that
matter at scale: `partition_by` (directory partitioning -> partition-pruned
scans) and `target_partitions` (output file count via repartition/coalesce —
the small-files defense).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """Write with explicit layout control.

    `target_partitions` uses coalesce when shrinking (no shuffle) and
    repartition when growing; with `partition_by` it repartitions ON the
    partition columns so each output directory is written by few tasks
    (otherwise every task writes a file into every partition directory —
    the classic small-files explosion).
    """
    out = df
    if target_partitions is not None:
        if partition_by:
            out = df.repartition(target_partitions, *partition_by)
        elif target_partitions < df.rdd.getNumPartitions():
            out = df.coalesce(target_partitions)
        else:
            out = df.repartition(target_partitions)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
