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


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every member probes True (the Bloom one-sided guarantee), and the
    false-positive rate on a disjoint probe set stays near the analytic
    (1 - e^(-kn/m))^k for the chosen geometry."""
    from cernbox_migration_database_spark.operators import sketches as SK

    m_bits, k = 1 << 14, 4
    members = spark.range(1000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("g")
    )
    bits = SK.bloom_build(members, "g", m_bits=m_bits, k=k)
    assert isinstance(bits, bytes) and len(bits) == m_bits // 8
    hit = members.where(SK.bloom_contains(F.col("g"), bits, m_bits, k)).count()
    assert hit == 1000  # no false negatives, ever
    probes = spark.range(20000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("g")
    )
    fp = probes.where(SK.bloom_contains(F.col("g"), bits, m_bits, k)).count()
    # analytic fpr ~ (1 - e^(-4*1000/16384))^4 ~ 0.0023 -> expect ~46 of 20k
    assert fp < 200


def test_bloom_assume_distinct_bitset_byte_identical(spark):
    """r13: ``assume_distinct=True`` (the caller already holds a distinct
    key relation — the pipeline's persisted eval-shingle set) must produce
    the byte-identical bitset the default distincting path builds, even
    when the flag is (wrongly but harmlessly) set on input WITH
    duplicates — the bit_or word fold is idempotent."""
    from cernbox_migration_database_spark.operators import sketches as SK

    m_bits, k = 1 << 14, 4
    members = spark.range(500).select(
        F.concat(F.lit("m-"), F.col("id")).alias("g")
    )
    dup = members.unionAll(members)
    ref = SK.bloom_build(members, "g", m_bits=m_bits, k=k)
    assert SK.bloom_build(
        members, "g", m_bits=m_bits, k=k, assume_distinct=True
    ) == ref
    assert SK.bloom_build(
        dup, "g", m_bits=m_bits, k=k, assume_distinct=True
    ) == ref


def test_bloom_positions_match_duckdb(spark):
    """The md5-derived position arithmetic is bit-identical across engines —
    the property the bloom_decontaminate oracle rests on."""
    import duckdb

    from cernbox_migration_database_spark.operators import sketches as SK

    vals = ["alpha beta", "x", "ünïcødé", ""]
    con = duckdb.connect()
    for v in vals:
        for i in range(4):
            ddb = con.execute(
                "SELECT CAST('0x' || substring(md5(? || '#' || CAST(? AS VARCHAR)), 1, 13)"
                " AS BIGINT) % 262144",
                [v, i],
            ).fetchone()[0]
            sp = (
                spark.range(1)
                .select(SK.bloom_pos(F.lit(v), i, 1 << 18).alias("p"))
                .collect()[0]["p"]
            )
            assert sp == ddb, (v, i, sp, ddb)


def test_bloom_rejects_bad_geometry(spark):
    from cernbox_migration_database_spark.operators import sketches as SK

    import pytest

    with pytest.raises(ValueError, match="multiple of 8"):
        SK.bloom_build(spark.range(1).selectExpr("CAST(id AS STRING) g"), "g", m_bits=100)
