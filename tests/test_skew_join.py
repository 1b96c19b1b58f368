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


def test_salted_join_row_identical_to_plain_join(spark):
    from cernbox_migration_database_spark.operators.skew import salted_join

    # adversarial skew: key 0 holds 50k of 60k probe rows
    probe = spark.range(60_000).select(
        F.when(F.col("id") < 50_000, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    build = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    salted = salted_join(probe, build, on=["k"], n_salts=8)
    plain = probe.join(build, on=["k"])
    assert salted.count() == plain.count() == 60_000
    # exact multiset equality via sorted collect of the whole result
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # left join with unmatched probe keys also preserved
    probe2 = probe.withColumn("k", F.col("k") + 50)  # keys 50..149, half unmatched
    s2 = salted_join(probe2, build, on=["k"], how="left")
    p2 = probe2.join(build, on=["k"], how="left")
    assert sorted(map(tuple, s2.collect())) == sorted(map(tuple, p2.collect()))
