"""LIVE PostgreSQL integration: a private server is booted for the test
session (initdb + pg_ctl as the unprivileged 'nobody' user over a unix
socket — postgres refuses root) and the psql-subprocess scan/sink paths
run against it end-to-end. This is the REAL-server exercise of the
reference's connect/scan/update-sink contract (main.go:78-97, 217-240)
that the DBAPI twins could only simulate; the whole module skips itself
where the postgres binaries are absent."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

from cernbox_migration_database_spark.sources import pgsql as PG

pytestmark = pytest.mark.skipif(
    not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql")),
    reason="postgres binaries not installed",
)

_PORT = 54331
_NOBODY_UID, _NOBODY_GID = 65534, 65534


def _as_nobody():
    os.setgid(_NOBODY_GID)
    os.setuid(_NOBODY_UID)


@pytest.fixture(scope="module")
def pg_dsn():
    # NOT pytest's tmp_path: its parents are 0700 root-owned and the
    # unprivileged server process could not traverse into them
    import pathlib
    import tempfile

    base = pathlib.Path(tempfile.mkdtemp(prefix="cbx_pg_", dir="/tmp"))
    data = base / "data"
    data.mkdir()
    os.chmod(base, 0o755)
    os.chown(base, _NOBODY_UID, _NOBODY_GID)
    os.chown(data, _NOBODY_UID, _NOBODY_GID)
    run = dict(
        preexec_fn=_as_nobody, capture_output=True, check=True, cwd="/tmp"
    )
    subprocess.run(
        ["initdb", "-D", str(data), "-A", "trust", "-U", "pguser"],
        timeout=180, **run,
    )
    subprocess.run(
        [
            "pg_ctl", "-D", str(data),
            "-o", f"-k {base} -h '' -p {_PORT}",
            "-l", str(base / "log"), "start",
        ],
        timeout=120, **run,
    )
    dsn = {"host": str(base), "port": _PORT, "user": "pguser", "dbname": "postgres"}
    try:
        yield dsn
    finally:
        subprocess.run(
            ["pg_ctl", "-D", str(data), "stop", "-m", "immediate"],
            preexec_fn=_as_nobody, capture_output=True, timeout=60, cwd="/tmp",
        )
        shutil.rmtree(base, ignore_errors=True)


def test_live_parallel_scan_roundtrip(spark, pg_dsn):
    """Seed a reference-shaped table server-side, scan it back through
    FOUR concurrent psql range slices, and match the aggregate; NULLs and
    quoted strings survive the CSV boundary."""
    PG.psql_exec(
        pg_dsn,
        """
        DROP TABLE IF EXISTS files;
        CREATE TABLE files (
            id BIGINT PRIMARY KEY,
            path TEXT,
            size_bytes BIGINT,
            owner_uid INT
        );
        INSERT INTO files
        SELECT i, CASE WHEN i % 50 = 0 THEN NULL
                       ELSE '/eos/user/u' || i || '/it''s data.txt' END,
               i * 37, (i % 7)
        FROM generate_series(0, 999) AS g(i);
        """,
    )
    df = PG.pg_scan(
        spark, pg_dsn, "files",
        "id bigint, path string, size_bytes bigint, owner_uid int",
        partition_col="id", lo=0, hi=1000, num_partitions=4,
    )
    assert df.count() == 1000
    agg = df.agg(
        F.sum("size_bytes").alias("s"),
        F.sum(F.when(F.col("path").isNull(), 1).otherwise(0)).alias("nulls"),
    ).collect()[0]
    assert agg["s"] == 37 * sum(range(1000))
    assert agg["nulls"] == 20
    row = df.where("id = 7").collect()[0]
    assert row["path"] == "/eos/user/u7/it's data.txt"  # quoting survived
    # unpartitioned (dimension) scan agrees
    assert (
        PG.pg_scan(
            spark, pg_dsn, "files",
            "id bigint, path string, size_bytes bigint, owner_uid int",
        ).count()
        == 1000
    )


def test_live_upsert_sink_idempotent(spark, pg_dsn):
    """The S6 update-sink contract against the live server: Spark rows
    upsert via batched INSERT ... ON CONFLICT DO UPDATE; re-running the
    same write is a no-op (task-retry safety), and an updated frame
    overwrites in place — verified by scanning the table back."""
    PG.psql_exec(
        pg_dsn,
        """
        DROP TABLE IF EXISTS quotas;
        CREATE TABLE quotas (
            uid BIGINT PRIMARY KEY,
            quota_gb DOUBLE PRECISION,
            note TEXT
        );
        INSERT INTO quotas VALUES (1, 10.0, 'seed'), (2, 20.0, 'seed');
        """,
    )
    df = spark.range(0, 100).select(
        F.col("id").alias("uid"),
        (F.col("id") * 1.5).alias("quota_gb"),
        F.concat(F.lit("mig-"), F.col("id")).alias("note"),
    )
    n = PG.pg_upsert_sink(df, pg_dsn, "quotas", key_cols=["uid"], batch_size=32)
    assert n == 100

    def snap():
        return {
            r["uid"]: (r["quota_gb"], r["note"])
            for r in PG.pg_scan(
                spark, pg_dsn, "quotas",
                "uid bigint, quota_gb double, note string",
            ).collect()
        }

    got = snap()
    assert len(got) == 100  # seeds 1,2 overwritten, 0..99 present
    assert got[1] == (1.5, "mig-1")
    assert got[50] == (75.0, "mig-50")

    PG.pg_upsert_sink(df, pg_dsn, "quotas", key_cols=["uid"], batch_size=32)
    assert snap() == got  # idempotent replay

    df2 = df.withColumn("quota_gb", F.col("quota_gb") * 2)
    PG.pg_upsert_sink(df2, pg_dsn, "quotas", key_cols=["uid"])
    assert snap()[50] == (150.0, "mig-50")
