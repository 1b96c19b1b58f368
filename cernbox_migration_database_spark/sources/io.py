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


def dbapi_parallel_scan(
    spark: SparkSession,
    connect,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    schema: str,
    columns: list[str] | None = None,
    num_partitions: int = 8,
    placeholder: str = "?",
) -> DataFrame:
    """Partitioned parallel read from a live DBAPI database — the executable
    twin of `catalog.jdbc_scan` (which needs a JDBC driver jar): split
    [lower_bound, upper_bound] into `num_partitions` disjoint ranges, run
    one bounded `SELECT ... WHERE pc BETWEEN ? AND ?` per range inside
    mapInPandas, executor-side. This is exactly how the reference's single
    full-table SELECT (main.go:86-97) becomes a parallel scan without a
    coordinator bottleneck: the driver ships only range bounds; each task
    opens its own connection and pulls only its slice.

    `connect` runs on executors (import the driver inside it). Identifiers
    are interpolated (caller-owned, like Spark's own dbtable option); range
    VALUES always travel as bind parameters. Further filters/projection
    belong in the per-range SELECT via `columns` — after the load they are
    Spark-side only (no automatic pushdown, unlike the JDBC source).
    """
    import pandas as pd  # noqa: F401 (executor-side import kept explicit)

    cols = ", ".join(columns) if columns else "*"
    # placeholder follows the driver's paramstyle: '?' (qmark — sqlite3),
    # '%s' (format — pymysql / mysql-connector / psycopg2)
    sql = (
        f"SELECT {cols} FROM {table} "  # noqa: S608 — caller-owned identifiers
        f"WHERE {partition_column} BETWEEN {placeholder} AND {placeholder}"
    )
    span = upper_bound - lower_bound + 1
    step = max(1, (span + num_partitions - 1) // num_partitions)
    bounds = [
        (lower_bound + i * step, min(upper_bound, lower_bound + (i + 1) * step - 1))
        for i in range(num_partitions)
        if lower_bound + i * step <= upper_bound
    ]
    # repartitionByRange on 'lo' guarantees ONE range per task: the range
    # values are distinct, so range partitioning into len(bounds) partitions
    # is a bijection. A hash repartition("lo") could collide 2+ ranges into
    # one task and leave others empty, silently serializing the scan.
    ranges = spark.createDataFrame(bounds, "lo long, hi long").repartitionByRange(
        len(bounds), "lo"
    )

    def _scan(batches):
        import pandas as pd

        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                conn = connect()
                try:
                    cur = conn.cursor()
                    cur.execute(sql, (int(lo), int(hi)))
                    names = [d[0] for d in cur.description]
                    rows = cur.fetchall()
                finally:
                    conn.close()
                yield pd.DataFrame(rows, columns=names)

    return ranges.mapInPandas(_scan, schema=schema)
