"""Snapshot-keyed query result cache (operators/resultcache.py)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import resultcache as RC
from cernbox_migration_database_spark.operators import table_format as TF


def _build(spark, dfs):
    return (
        dfs["t"]
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_hit_miss_invalidate_cycle(spark, tmp_path):
    root, cache = str(tmp_path / "t"), str(tmp_path / "cache")
    TF.create_table(
        spark.createDataFrame(
            [Row(id=i, grp="ab"[i % 2], val=float(i)) for i in range(10)]
        ),
        root,
    )
    rep: dict = {}
    r1 = _rows(RC.cached(spark, cache, "agg", {"t": root}, _build, report=rep))
    assert rep["hit"] is False
    r2 = _rows(RC.cached(spark, cache, "agg", {"t": root}, _build, report=rep))
    assert rep["hit"] is True and r2 == r1
    # any commit moves the pointer -> miss, fresh result
    TF.delete_where(spark, root, F.col("id") == 0)
    r3 = _rows(RC.cached(spark, cache, "agg", {"t": root}, _build, report=rep))
    assert rep["hit"] is False and r3 != r1
    want = _rows(_build(spark, {"t": TF.read_table(spark, root)}))
    assert r3 == want
    # stale slot pruned, current kept
    assert RC.prune(cache, {"agg": {"t": root}}) == 1
    rep2: dict = {}
    RC.cached(spark, cache, "agg", {"t": root}, _build, report=rep2)
    assert rep2["hit"] is True


def test_build_is_snapshot_pinned_against_concurrent_commits(spark, tmp_path):
    root, cache = str(tmp_path / "t"), str(tmp_path / "cache")
    TF.create_table(
        spark.createDataFrame(
            [Row(id=i, grp="a", val=1.0) for i in range(5)]
        ),
        root,
    )

    def racing_build(spark_, dfs):
        # a writer lands WHILE the query builds: the result must reflect
        # the pinned snapshot, not the concurrent commit
        TF.merge_into(
            spark_, root,
            spark_.createDataFrame([Row(id=99, grp="a", val=100.0)]),
            on="id", when_matched=None,
        )
        return dfs["t"].groupBy("grp").agg(F.count(F.lit(1)).alias("n"))

    got = RC.cached(spark, cache, "q", {"t": root}, racing_build).collect()
    assert got == [Row(grp="a", n=5)]  # not 6
    # and the NEXT call misses (the concurrent commit moved the pointer)
    rep: dict = {}
    got2 = RC.cached(spark, cache, "q", {"t": root}, _count_build, report=rep)
    assert rep["hit"] is False and got2.collect() == [Row(grp="a", n=6)]


def _count_build(spark, dfs):
    return dfs["t"].groupBy("grp").agg(F.count(F.lit(1)).alias("n"))


def test_losing_a_publish_race_serves_the_winner(spark, tmp_path):
    root, cache = str(tmp_path / "t"), str(tmp_path / "cache")
    TF.create_table(spark.createDataFrame([Row(id=1, grp="a", val=2.0)]), root)

    def build_and_squat(spark_, dfs):
        # the "winner" publishes the slot while we are still building
        out = _build(spark_, dfs)
        slot = RC._slot(cache, "q", {"t": TF.current_version(root)})
        out.write.parquet(os.path.join(slot, "data"))
        return out

    got = RC.cached(spark, cache, "q", {"t": root}, build_and_squat)
    assert _rows(got) == [("a", 1, 2.0)]
    # our staging temp was cleaned up
    qdir = os.path.join(cache, "q")
    assert all(".tmp-" not in e for e in os.listdir(qdir))


def test_prune_spares_live_staging_dirs(spark, tmp_path):
    """ADVICE r6: prune used to rmtree a concurrent builder's live
    '<key>.tmp-<pid>' staging dir (and count it as a removed slot),
    making the racer's publish rename fail."""
    root, cache = str(tmp_path / "t"), str(tmp_path / "cache")
    TF.create_table(
        spark.createDataFrame([Row(id=1, grp="a", val=1.0)]), root
    )
    RC.cached(spark, cache, "agg", {"t": root}, _build)
    qdir = os.path.join(cache, "agg")
    staging = os.path.join(qdir, "deadbeef00000000.tmp-12345")
    os.makedirs(staging)
    # a stale published slot that SHOULD be pruned
    stale = os.path.join(qdir, "0123456789abcdef")
    os.makedirs(stale)
    assert RC.prune(cache, {"agg": {"t": root}}) == 1
    assert os.path.isdir(staging) and not os.path.isdir(stale)
    rep: dict = {}
    RC.cached(spark, cache, "agg", {"t": root}, _build, report=rep)
    assert rep["hit"] is True


def test_prune_reaps_orphaned_staging_dirs_after_grace(spark, tmp_path):
    """ADVICE r7: sparing every '.tmp-' entry unconditionally turned
    crashed builders' orphaned staging dirs into an unbounded disk leak.
    Prune now mirrors the lock module's stale-after discipline: young
    staging dirs (live builders mid-publish) are spared, old ones are
    reaped."""
    import time

    root, cache = str(tmp_path / "t"), str(tmp_path / "cache")
    TF.create_table(
        spark.createDataFrame([Row(id=1, grp="a", val=1.0)]), root
    )
    RC.cached(spark, cache, "agg", {"t": root}, _build)
    qdir = os.path.join(cache, "agg")
    young = os.path.join(qdir, "deadbeef00000000.tmp-12345")
    os.makedirs(young)
    orphan = os.path.join(qdir, "cafebabe00000000.tmp-99999")
    os.makedirs(orphan)
    old = time.time() - 3600
    os.utime(orphan, (old, old))
    assert RC.prune(cache, {"agg": {"t": root}}, tmp_grace_seconds=900) == 1
    assert os.path.isdir(young) and not os.path.exists(orphan)
    # the published current slot is untouched
    rep: dict = {}
    RC.cached(spark, cache, "agg", {"t": root}, _build, report=rep)
    assert rep["hit"] is True
