"""Tests for the array-HOF pipeline, stratified hash sampling, and the
price-band range join (queries package extended set)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cernbox_migration_database_spark.queries import QUERIES
from cernbox_migration_database_spark.sources.catalog import load_table


def test_hof_array_pipeline_matches_python(spark, sf_dir):
    out = QUERIES["hof_array_pipeline"](spark, sf_dir)
    rows = {r["vec_id"]: r for r in out.limit(2000).collect()}
    src = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    for r in src.limit(20).collect():
        emb = r["embedding"]
        got = rows[r["vec_id"]]
        pos = [v for v in emb if v > 0]
        assert got["n_pos"] == len(pos)
        # fixed-point path: quantize each element to 7dp before summing
        q = [int(round(float(v) * 1e7)) for v in pos]
        assert math.isclose(got["sum_pos"], sum(q) / 1e7, abs_tol=1e-6)
        qa = [int(round(float(v) * 1e7)) for v in emb]
        rd = sum(x * y for x, y in zip(qa, reversed(qa))) / 1e14
        assert math.isclose(got["rev_dot"], rd, abs_tol=1e-6)


def test_stratified_hash_sample_rates_and_determinism(spark, sf_dir):
    out = QUERIES["stratified_hash_sample"](spark, sf_dir)
    counts = {
        r["o_orderstatus"]: r["n"]
        for r in out.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # md5 first hex digit is uniform: observed rate within a loose band of
    # the target (sf0.001 strata are small, so the band is wide)
    for status, target in (("O", 0.25), ("F", 0.125), ("P", 0.0625)):
        rate = counts.get(status, 0) / totals[status]
        assert abs(rate - target) < 0.08, (status, rate)
    # deterministic: a rerun samples the identical row set
    a = {r["o_orderkey"] for r in out.collect()}
    b = {r["o_orderkey"] for r in QUERIES["stratified_hash_sample"](spark, sf_dir).collect()}
    assert a == b


def test_range_join_broadcasts_and_partitions_all_orders(spark, sf_dir):
    out = QUERIES["range_join_price_bands"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the 4-row band dim must be the broadcast side (nested-loop, no shuffle
    # of the fact table)
    assert "BroadcastNestedLoopJoin" in plan
    total_orders = load_table(spark, sf_dir, "orders").count()
    got = out.collect()
    # bands partition [0, inf): every order lands in exactly one band
    assert sum(r["n"] for r in got) == total_orders
    assert len(got) <= 4


def test_weighted_sample_is_biased_toward_heavy_docs(spark, sf_dir):
    """Efraimidis-Spirakis selection probability is proportional to weight
    (1 + tokens/64 here): on the fixed fixture, the sampled docs' mean
    token count must exceed the corpus mean — and per-stratum counts are
    exactly min(20, |stratum|) with dense ranks."""
    from cernbox_migration_database_spark.queries import QUERIES
    from cernbox_migration_database_spark.sources.catalog import load_table

    sel = QUERIES["train_weighted_sample"](spark, sf_dir)
    rows = sel.collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["rank"])
    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, ranks in per_lang.items():
        assert sorted(ranks) == list(range(1, min(20, sizes[lang]) + 1))
    tc = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    d = docs.withColumn("tc", tc)
    corpus_avg = d.agg(F.avg("tc")).collect()[0][0]
    sel_avg = d.join(sel, "doc_id").agg(F.avg("tc")).collect()[0][0]
    assert sel_avg > corpus_avg
