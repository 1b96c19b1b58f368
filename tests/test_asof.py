"""as-of join unit semantics (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 100)],
        "lid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 100, 7.0), (10, 200, 8.0), (20, 150, 9.0)],
        "k long, t long, v double",
    )
    out = asof_join(left, right, key="k", ts="t", right_cols=["v"])
    got = {r["lid"]: r["asof_v"] for r in out.collect()}
    # lid=1: right at t=100 counts (<= semantics); lid=2: latest is t=200;
    # lid=4: right t=150 is AFTER left t=100 -> no match
    assert got == {1: 7.0, 2: 8.0, 3: 8.0, 4: None}


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(50).select(
        F.col("id").alias("lid"), (F.col("id") % 5).alias("k"), (F.col("id") * 10).alias("t")
    )
    right = spark.range(10).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 37).alias("t"), F.col("id").alias("v")
    ).groupBy("k", "t").agg(F.max("v").alias("v"))
    out = asof_join(left, right, key="k", ts="t", right_cols=["v"])
    assert out.count() == 50
