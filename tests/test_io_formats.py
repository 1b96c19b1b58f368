"""Multi-format IO: roundtrips preserve values; partitioned layouts prune."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cernbox_migration_database_spark.sources.catalog import load_table
from cernbox_migration_database_spark.sources.io import (
    read_csv,
    read_jsonl,
    read_orc,
    write_table,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="cbx-io-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_csv_roundtrip(spark, sf_dir, tmp):
    d = _docs(spark, sf_dir)
    write_table(d, f"{tmp}/csv", fmt="csv", target_partitions=2)
    back = read_csv(spark, f"{tmp}/csv", DOC_SCHEMA, header=False)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_jsonl_roundtrip(spark, sf_dir, tmp):
    d = _docs(spark, sf_dir)
    write_table(d, f"{tmp}/json", fmt="json", target_partitions=2)
    back = read_jsonl(spark, f"{tmp}/json", DOC_SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_orc_roundtrip(spark, sf_dir, tmp):
    d = _docs(spark, sf_dir)
    write_table(d, f"{tmp}/orc", fmt="orc", target_partitions=2)
    back = read_orc(spark, f"{tmp}/orc")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_partitioned_write_prunes(spark, sf_dir, tmp):
    d = _docs(spark, sf_dir)
    write_table(d, f"{tmp}/bylang", partition_by=["lang"], target_partitions=1)
    # layout: one directory per lang, 1 file each (no small-files explosion)
    langs = [x for x in os.listdir(f"{tmp}/bylang") if x.startswith("lang=")]
    assert len(langs) == 5
    for sub in langs:
        files = [f for f in os.listdir(f"{tmp}/bylang/{sub}") if f.endswith(".parquet")]
        assert len(files) == 1

    back = spark.read.parquet(f"{tmp}/bylang").where(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan
    # pruned scan reads only the en partition
    assert back.count() == d.where("lang = 'en'").count()
    scan_line = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_line, plan[:1500]


def test_dbapi_parallel_scan_live_sqlite(spark, tmp):
    """Live partitioned DB read: 10k rows pulled through 4 disjoint range
    queries against a real sqlite database, executor-side connections."""
    import os
    import sqlite3

    from cernbox_migration_database_spark.sources.io import dbapi_parallel_scan

    db = os.path.join(tmp, "src.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"v{i}") for i in range(10_000)]
    )
    con.commit()
    con.close()

    df = dbapi_parallel_scan(
        spark,
        lambda: __import__("sqlite3").connect(db),
        "t",
        partition_column="id",
        lower_bound=0,
        upper_bound=9_999,
        schema="id long, v string",
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    got = {r["id"]: r["v"] for r in df.collect()}
    assert len(got) == 10_000 and got[1234] == "v1234"
    # ranges are disjoint and complete: re-aggregate proves no dup/loss
    assert df.groupBy().count().collect()[0][0] == 10_000


def test_zorder_layout_prunes_both_dims(spark, sf_dir, tmp_path):
    """Files written z-ordered on (partkey, suppkey) have tight min/max
    footer ranges on BOTH keys, so a point predicate on either key rules
    out most files; a single-key sort layout only prunes its own key."""
    import pyarrow.parquet as pq

    from cernbox_migration_database_spark.operators.layout import (
        write_z_ordered,
    )
    from cernbox_migration_database_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "partkey_sorted")
    n_files = 16
    write_z_ordered(li, "l_partkey", "l_suppkey", zdir, num_files=n_files)
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def files_matching(directory: str, col: str, value: int) -> tuple[int, int]:
        import glob

        hit, total = 0, 0
        for f in glob.glob(f"{directory}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            total += 1
            hit += lo <= value <= hi
        return hit, total

    # probe keys that exist in the data
    probe = li.limit(1).collect()[0]
    pk, sk = probe["l_partkey"], probe["l_suppkey"]

    z_pk, z_total = files_matching(zdir, "l_partkey", pk)
    z_sk, _ = files_matching(zdir, "l_suppkey", sk)
    s_pk, s_total = files_matching(sdir, "l_partkey", pk)
    s_sk, _ = files_matching(sdir, "l_suppkey", sk)

    assert z_total == n_files and s_total == n_files
    # single-key layout: perfect on its own key, useless on the other
    assert s_pk <= 2
    assert s_sk >= n_files - 1
    # z-order: prunes a substantial share of files on BOTH keys
    assert z_pk <= n_files // 2
    assert z_sk <= n_files // 2


def test_events_ts_unit_memoized_and_empty_dir_error(tmp_path):
    """ADVICE r3: the footer probe is memoized per sf_dir (no re-read on
    every cache-hit load) and an empty directory table raises a
    descriptive error, not bare IndexError."""
    import os

    import pytest

    from cernbox_migration_database_spark.sources import catalog as C

    unit = C.events_ts_unit(str(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")))
    assert unit in ("ns", "us")

    empty = tmp_path / "sf_empty"
    (empty / "events.parquet").mkdir(parents=True)
    with pytest.raises(FileNotFoundError, match="no part files"):
        C.events_ts_unit(str(empty))

    # memo: second call must not touch the filesystem
    sf = "/root/testdata/sf0.001"
    C.events_ts_unit(sf)
    import unittest.mock as mock

    with mock.patch("os.path.isdir", side_effect=AssertionError("re-probed")):
        assert C.events_ts_unit(sf) in ("ns", "us")


def test_format_paramstyle_dialect_scan_and_sink(spark, tmp):
    """The MySQL-family drivers (pymysql / mysql-connector / psycopg2)
    speak paramstyle 'format' ('%s'), not qmark. Drive BOTH the parallel
    scan and the upsert sink through '%s' against a format-paramstyle
    DBAPI shim over sqlite — the dialect plumbing test_mysql_live.py
    exercises against a real server where one is installed."""
    import os
    import sqlite3

    from cernbox_migration_database_spark.operators.merge import (
        dbapi_upsert_writer,
    )
    from cernbox_migration_database_spark.sources.io import (
        dbapi_parallel_scan,
    )

    db = os.path.join(tmp, "fmt.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE s (id INTEGER PRIMARY KEY, val TEXT, n INTEGER)"
    )
    con.executemany(
        "INSERT INTO s VALUES (?, ?, ?)",
        [(i, f"v{i}", i) for i in range(200)],
    )
    con.commit()
    con.close()

    def connect():
        # executor-side format-paramstyle shim: every SQL statement the
        # engine emits must contain ONLY '%s' placeholders (a leftover
        # '?' makes sqlite bind-count mismatch -> loud failure), translated
        # here exactly once like a real format-style driver would accept
        import sqlite3 as sq

        class _Cur:
            def __init__(self, cur):
                self._c = cur

            def execute(self, sql, params=()):
                assert "?" not in sql, f"qmark leaked into '%s' dialect: {sql}"
                return self._c.execute(sql.replace("%s", "?"), params)

            def executemany(self, sql, seq):
                assert "?" not in sql, f"qmark leaked into '%s' dialect: {sql}"
                return self._c.executemany(sql.replace("%s", "?"), seq)

            def __getattr__(self, name):
                return getattr(self._c, name)

        class _Conn:
            def __init__(self, conn):
                self._conn = conn

            def cursor(self):
                return _Cur(self._conn.cursor())

            def __getattr__(self, name):
                return getattr(self._conn, name)

        return _Conn(sq.connect(db, timeout=60.0))

    df = dbapi_parallel_scan(
        spark, connect, "s",
        partition_column="id", lower_bound=0, upper_bound=199,
        schema="id long, val string, n long",
        num_partitions=3, placeholder="%s",
    )
    assert df.count() == 200
    assert df.where("id = 42").collect()[0]["val"] == "v42"

    updates = spark.createDataFrame(
        [(i, f"upd{i}", i * 10) for i in range(0, 200, 2)],
        "id long, val string, n long",
    )
    updates.foreachPartition(
        dbapi_upsert_writer(connect, "s", "id", ["val", "n"], placeholder="%s")
    )
    back = {r["id"]: (r["val"], r["n"]) for r in
            dbapi_parallel_scan(
                spark, connect, "s",
                partition_column="id", lower_bound=0, upper_bound=199,
                schema="id long, val string, n long",
                num_partitions=2, placeholder="%s",
            ).collect()}
    assert back[4] == ("upd4", 40) and back[5] == ("v5", 5)
