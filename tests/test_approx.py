"""Approximate-aggregate error bounds (the sketch family has no cross-engine
oracle; its contract is the bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark.sources.catalog import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("n"))
        .collect()
    }
    for k, a in approx.items():
        assert abs(a - exact[k]) / exact[k] < 0.1  # 5x the nominal rsd


def test_approx_median_between_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("m"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    assert row["lo"] <= row["m"] <= row["hi"]
    assert abs(row["m"] - row["exact"]) / row["exact"] < 0.05
