"""Table catalog over the fixture parquet directories.

The reference scans one MySQL table with filter/projection/sort pushed into
the SQL text (main.go:86-97). Here the scan surface is columnar parquet read
through Spark's vectorized reader; Catalyst pushes predicates and prunes
columns automatically, which `.explain()` shows as ``PushedFilters`` /
``ReadSchema``. A JDBC source (`jdbc_scan`) mirrors the reference's actual
source shape for deployments that read a live database.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Resolved-DataFrame cache. Every spark.read.parquet(path) re-lists the path
# and re-reads footers for the schema (~85 ms measured locally, per call,
# per table) — pure fixed overhead when the catalog serves the same 10
# immutable fixture tables to 80 queries in one session. DataFrames are
# immutable plans, so handing the same object back is safe; keyed by
# applicationId so a new SparkContext never sees another context's plans.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# events.ts footer-probe memo, keyed by sf_dir (see events_ts_unit).
_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """Probe the physical type of `events.ts` from the parquet footer.

    The fixture generator has shipped the column both ways across driver
    versions — TIMESTAMP(NANOS) (which Spark's vectorized reader only
    accepts via the nanosAsLong legacy conf) and TIMESTAMP(MICROS)
    (read natively as TIMESTAMP_NTZ). A footer probe is a driver-side
    metadata read (no data IO) and lets one loader serve either layout.
    Returns 'ns' or 'us'. The probe result is memoized per sf_dir for the
    process lifetime (fixtures are immutable within a run; a fresh process
    re-probes, which is what guards against the driver regenerating them
    between rounds) — without the memo every cache-HIT load_table('events')
    still paid a footer read.
    """
    hit = _TS_UNIT_CACHE.get(sf_dir)
    if hit is not None:
        return hit

    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        # Spark-style directory table (e.g. the scale-check k-fold
        # replicas): probe the first part file — one table, one schema.
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(
                f"events table directory {path} contains no part files — "
                "was the fixture write interrupted?"
            )
        path = parts[0]
    t = pq.ParquetFile(path).schema_arrow.field("ts").type
    unit = "ns" if "ns" in str(t) or str(t) == "int64" else "us"
    _TS_UNIT_CACHE[sf_dir] = unit
    return unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table. Schemas come from the parquet footer (written by
    the driver with fixed schemas — no inference involved).

    `events.ts` is normalized to a session-zone TIMESTAMP regardless of the
    on-disk unit: TIMESTAMP(NANOS) is read as long (legacy conf, settable at
    session runtime) and truncated to microseconds — the same ns->us
    truncation DuckDB applies; TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ
    and is cast to TIMESTAMP, an identity on values under the engine's UTC
    session time zone (session.py).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    app_id = spark.sparkContext.applicationId
    # Single-app cache: a long-lived process cycling SparkSessions would
    # otherwise accumulate DataFrames pinned to dead SparkContexts (the key
    # includes applicationId, so stale entries could never be hit — only
    # leak). Evict anything from a different app before serving.
    stale = [k for k in _DF_CACHE if k[0] != app_id]
    for k in stale:
        del _DF_CACHE[k]
    nanos = name == "events" and events_ts_unit(sf_dir) == "ns"
    if nanos:
        # Set UNCONDITIONALLY (not only on cache miss): the cached plan
        # captures the conf at build, but a session that unset it after the
        # miss would fail at EXECUTION of the cached plan — execution reads
        # the live session conf. Runtime-settable, idempotent, cheap.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (app_id, sf_dir, name)
    hit = _DF_CACHE.get(key)
    if hit is not None:
        return hit
    if name == "events":
        from pyspark.sql import functions as F

        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts = (
            F.timestamp_micros(F.expr("ts div 1000"))
            if nanos
            else F.col("ts").cast("timestamp")
        )
        df = raw.withColumn("ts", ts).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    _DF_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    columns: list[str] | None = None,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 20,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan mirroring the reference's pushed-down SELECT
    (main.go:86-97: projection to 6/15 columns, two equi-predicates, ORDER BY).

    Filters/projection applied on the returned DataFrame are pushed into the
    remote SQL by Spark's JDBC source. ``partition_column`` splits the scan
    into ``num_partitions`` parallel range queries — the set-at-a-time
    replacement for the reference's 20-goroutine semaphore (main.go:260-271).
    User-supplied values are passed via options, never interpolated into SQL
    text (the reference's Sprintf at main.go:89-91 is an injection hazard we
    deliberately do not reproduce).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("numPartitions", str(num_partitions))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    if columns:
        df = df.select(*columns)
    for p in predicates or []:
        df = df.filter(p)
    return df
