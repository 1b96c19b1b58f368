"""AQE skew-join evidence: the 100 TB hot-key story for JOINS (salting
covers aggregations — operators/skew.py; AQE handles the join side at
runtime, which this test forces at fixture scale by lowering thresholds)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    """An adversarial key holding 250k of 300k fact rows must be SPLIT by
    AQE's skew-join handling: the executed (final) plan shows
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead instead of one
    reducer dragging the hot partition."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # broadcast off (a broadcast join would sidestep skew entirely) and
        # thresholds scaled down so fixture-sized data trips the same logic
        # that 100 TB partitions trip at defaults
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

        fact = spark.range(300_000).select(
            F.when(F.col("id") < 250_000, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("d").alias("name")
        )
        j = fact.join(dim, "k")
        assert len(j.collect()) == 300_000  # correctness unaffected by split

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the hot partition"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
