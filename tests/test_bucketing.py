"""Bucketed co-located join: pre-bucketing both sides on the join key must
eliminate the shuffle (no Exchange above either scan) — the 100 TB lever for
repeated joins on the same key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped afterwards
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)

    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    expected = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n == expected

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_catalog_query_plan_and_exchanges(spark, sf_dir):
    """The catalog query itself: the ONLY exchange in the plan must be the
    final aggregation's — the join runs on bucketed scans (merge hint), so
    no shuffle sits between the scans and the SortMergeJoin."""
    from cernbox_migration_database_spark import queries as Q

    df = Q.QUERIES["bucketed_join_priority_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:2000]
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, join_part[:2000]
    rows = {r["o_orderpriority"]: r["n_items"] for r in df.collect()}
    import pyspark.sql.functions as F

    expected = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert rows == {r["o_orderpriority"]: r["count"] for r in expected}
