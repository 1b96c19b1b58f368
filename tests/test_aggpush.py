"""Aggregate pushdown into manifest metadata (operators/aggpush.py)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import aggpush as AP
from cernbox_migration_database_spark.operators import table_format as TF


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _want(spark, root, cols=(), count_cols=()):
    df = TF.read_table(spark, root)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    aggs += [F.count(c).alias(f"cnt_{c}") for c in count_cols]
    pcols = [e for e in TF.history(root) if e.get("partition_by")]
    pb = pcols[-1]["partition_by"] if pcols else None
    keys = [pb] if pb else []
    return df.groupBy(*keys).agg(*aggs)


def test_metadata_only_answer_reads_no_data_rows(spark, tmp_path):
    """Clean partitions are answered without reading data rows: swap
    every data file for an EMPTY parquet of the same schema (any
    accidental scan now sees zero rows) and the aggregate still comes
    back right. The one thing the planner may touch is a footer for
    schema discovery — data pages never."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(id=i, grp="ab"[i % 2], val=float(i)) for i in range(100)]
    )
    TF.create_table(df.repartition(4), root, partition_by="grp")
    want = _rows(_want(spark, root, cols=("val",), count_cols=("id",)))
    report: dict = {}
    got = AP.partition_agg(
        spark, root, cols=("val",), count_cols=("id",), report=report
    )
    assert _rows(got) == want
    assert report["scanned"] == [] and len(report["metadata"]) == 2
    # hollow out the data files; the manifest alone must still answer
    vdir = TF._vdir(root, TF.current_version(root))
    hollowed = 0
    for dirpath, dirnames, filenames in os.walk(vdir):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for fn in filenames:
            if fn.endswith(".crc"):  # stale hadoop checksums would fail reads
                os.remove(os.path.join(dirpath, fn))
            elif not fn.startswith(("_", ".")):
                p = os.path.join(dirpath, fn)
                schema = pq.ParquetFile(p).schema_arrow
                pq.write_table(schema.empty_table(), p)
                hollowed += 1
    assert hollowed >= 2
    got2 = AP.partition_agg(spark, root, cols=("val",), count_cols=("id",))
    assert _rows(got2) == want


def test_tombstoned_partition_scans_min_max_but_counts_from_metadata(
    spark, tmp_path
):
    """A MOR delete leaves tombstones: count(*) stays metadata-exact
    (dv counts are exact), min/max of that partition must scan — and the
    hybrid union equals the full-scan GROUP BY."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(id=i, grp="ab"[i % 2], val=float(i)) for i in range(100)]
    )
    TF.create_table(df.repartition(4), root, partition_by="grp")
    # delete the CURRENT max of partition a (id 98, val 98.0): a stale
    # metadata answer would report 98.0
    TF.delete_where(spark, root, F.col("id") == 98, mode="mor")
    report: dict = {}
    got = AP.partition_agg(spark, root, cols=("val",), report=report)
    assert report["scanned"] == ["grp=a"] and report["metadata"] == ["grp=b"]
    assert _rows(got) == _rows(_want(spark, root, cols=("val",)))
    ga = {r["grp"]: r for r in got.collect()}
    assert ga["a"]["n_rows"] == 49 and ga["a"]["max_val"] == 96.0


def test_nulls_and_all_null_files_fold_like_sql(spark, tmp_path):
    """count(col) subtracts footer null counts; a file that is all-null
    for a column contributes nothing to MIN/MAX (exactly SQL semantics);
    partitions holding only nulls report NULL min/max metadata-only."""
    root = str(tmp_path / "t")
    rows = [Row(id=i, grp="a", val=(None if i % 3 else float(i))) for i in range(30)]
    rows += [Row(id=100 + i, grp="b", val=None) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, grp string, val double")
    TF.create_table(df.repartition(3), root, partition_by="grp")
    report: dict = {}
    got = AP.partition_agg(
        spark, root, cols=("val",), count_cols=("val",), report=report
    )
    assert report["scanned"] == []
    assert _rows(got) == _rows(_want(spark, root, cols=("val",), count_cols=("val",)))
    gb = {r["grp"]: r for r in got.collect()}
    assert gb["b"]["min_val"] is None and gb["b"]["cnt_val"] == 0


def test_nan_floats_never_served_from_metadata(spark, tmp_path):
    """Spark's MAX returns NaN when a NaN exists; footer bounds ignore
    NaN (or are omitted per PARQUET-1246). Either way the partition must
    take the scan path and agree with the full scan."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(id=1, grp="a", val=1.0),
            Row(id=2, grp="a", val=float("nan")),
            Row(id=3, grp="b", val=3.0),
        ]
    )
    TF.create_table(df, root, partition_by="grp")
    report: dict = {}
    got = AP.partition_agg(spark, root, cols=("val",), report=report)
    assert "grp=a" in report["scanned"]
    ga = {r["grp"]: r for r in got.collect()}
    import math

    assert math.isnan(ga["a"]["max_val"]) and ga["b"]["max_val"] == 3.0


def test_unpartitioned_global_aggregate(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(
        spark.createDataFrame([Row(id=i, v=i * 2) for i in range(10)]), root
    )
    got = AP.partition_agg(spark, root, cols=("v",), count_cols=("id",))
    assert got.collect() == [Row(n_rows=10, min_v=0, max_v=18, cnt_id=10)]


def test_oversize_string_min_falls_back_to_scan(spark, tmp_path):
    """An ''-min bound is undecidable (genuine empty string vs omitted
    oversize value) — exact MIN must scan, and both cases come back
    right."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(id=1, grp="a", s=""),        # genuine '' min
            Row(id=2, grp="a", s="zz"),
            Row(id=3, grp="b", s="b" * 5000),  # oversize: stats omitted
            Row(id=4, grp="b", s="a"),
        ]
    )
    TF.create_table(df.coalesce(1), root, partition_by="grp")
    report: dict = {}
    got = AP.partition_agg(spark, root, cols=("s",), report=report)
    assert set(report["scanned"]) >= {"grp=a"}
    assert _rows(got) == _rows(_want(spark, root, cols=("s",)))
