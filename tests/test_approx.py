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


def test_cms_estimate_dominates_exact(spark, sf_dir):
    """One-sided CMS error: for EVERY token, estimate >= exact count (hash
    collisions only ever add)."""
    from cernbox_migration_database_spark.operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    counts = SK.token_counts(docs).cache()
    sketch = SK.count_min_sketch(counts, depth=4, width=256)
    est = SK.cms_estimate(sketch, counts.select("token"), depth=4, width=256)
    bad = (
        counts.join(est, "token")
        .where(F.col("cms_est") < F.col("cnt"))
        .count()
    )
    counts.unpersist()
    assert bad == 0


def test_cms_is_mergeable(spark, sf_dir):
    """CMS is linear: counter-wise addition of two half-corpus sketches must
    equal the whole-corpus sketch — the property that lets 1000 executors
    sketch independently and merge."""
    from cernbox_migration_database_spark.operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    merged = (
        SK.count_min_sketch(SK.token_counts(half_a))
        .unionByName(SK.count_min_sketch(SK.token_counts(half_b)))
        .groupBy("row", "bucket")
        .agg(F.sum("counter").alias("counter"))
    )
    whole = SK.count_min_sketch(SK.token_counts(docs))
    diff = merged.join(
        whole.withColumnRenamed("counter", "w"), ["row", "bucket"], "full"
    ).where(
        F.coalesce("counter", F.lit(-1)) != F.coalesce("w", F.lit(-1))
    )
    assert diff.count() == 0
