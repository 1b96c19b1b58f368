"""Versioned parquet table: snapshot isolation, time travel, COW MERGE INTO."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import table_format as TF


def _base(spark):
    return spark.createDataFrame(
        [
            Row(id=1, grp="a", val=10.0),
            Row(id=2, grp="a", val=20.0),
            Row(id=3, grp="b", val=30.0),
            Row(id=4, grp="c", val=40.0),
        ]
    )


def test_create_read_roundtrip_and_history(spark, tmp_path):
    root = str(tmp_path / "t")
    v = TF.create_table(_base(spark), root, partition_by="grp")
    assert v == 1
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
    (entry,) = TF.history(root)
    assert entry["action"] == "create" and entry["partition_by"] == "grp"


def test_merge_update_insert_matches_sql_semantics(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame(
        [
            Row(id=2, grp="a", val=99.0),   # matched -> update
            Row(id=5, grp="d", val=50.0),   # not matched -> insert (new partition)
        ]
    )
    v = TF.merge_into(spark, root, src, on="id")
    assert v == 2
    got = {r["id"]: (r["grp"], r["val"]) for r in TF.read_table(spark, root).collect()}
    assert got == {
        1: ("a", 10.0),
        2: ("a", 99.0),
        3: ("b", 30.0),
        4: ("c", 40.0),
        5: ("d", 50.0),
    }
    # time travel: version 1 is untouched
    old = {r["id"]: r["val"] for r in TF.read_table(spark, root, version=1).collect()}
    assert old == {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
    # commit log records the copy-on-write partition set: only a (matched)
    # and d (insert) rewritten
    assert TF.history(root)[-1]["touched_partitions"] == ["grp=a", "grp=d"]


def test_untouched_partitions_are_hardlinked_not_rewritten(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, grp="a", val=11.0)])
    TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    v1 = os.path.join(root, "_versions", "v00000001")
    v2 = os.path.join(root, "_versions", "v00000002")

    def inodes(vdir, part):
        d = os.path.join(vdir, f"grp={part}")
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    # b and c carried forward as hardlinks (same inodes); a rewritten (disjoint)
    assert inodes(v1, "b") == inodes(v2, "b")
    assert inodes(v1, "c") == inodes(v2, "c")
    assert inodes(v1, "a").isdisjoint(inodes(v2, "a"))


def test_merge_delete_and_matched_none(spark, tmp_path):
    root = str(tmp_path / "d")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=3, grp="b", val=0.0)])
    TF.merge_into(spark, root, src, on="id", when_matched="delete", when_not_matched=None)
    assert {r["id"] for r in TF.read_table(spark, root).collect()} == {1, 2, 4}

    root2 = str(tmp_path / "n")
    TF.create_table(_base(spark), root2)
    src2 = spark.createDataFrame(
        [Row(id=1, grp="a", val=77.0), Row(id=9, grp="z", val=9.0)]
    )
    TF.merge_into(spark, root2, src2, on="id", when_matched=None)
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root2).collect()}
    # matched row NOT updated (when_matched=None); new row inserted
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0, 9: 9.0}


def test_duplicate_source_keys_raise_before_any_write(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=2, grp="a", val=1.0), Row(id=2, grp="a", val=2.0)])
    with pytest.raises(ValueError, match="duplicate keys"):
        TF.merge_into(spark, root, src, on="id")
    assert TF.current_version(root) == 1  # nothing committed


def test_vacuum_keeps_current_and_recent(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    for i in range(3):
        src = spark.createDataFrame([Row(id=1, grp="a", val=float(i))])
        TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    assert TF.current_version(root) == 4
    removed = TF.vacuum(root, keep_last=2)
    assert removed == [1, 2]
    with pytest.raises(FileNotFoundError):
        TF.read_table(spark, root, version=1)
    assert TF.read_table(spark, root, version=3).count() == 4


def test_create_twice_rejected(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root)
    with pytest.raises(FileExistsError):
        TF.create_table(_base(spark), root)


def test_merge_equals_full_outer_oracle_on_fixture(spark, sf_dir):
    """Differential: COW merge over a partitioned orders slice equals the
    plain full-outer-join MERGE expression computed directly."""
    import tempfile

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src = (
        orders.where(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "t")
        TF.create_table(orders, root, partition_by="o_orderpriority")
        TF.merge_into(spark, root, src, on="o_orderkey", when_not_matched=None)
        got = TF.read_table(spark, root)
        expect = orders.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2).otherwise(
                F.col("o_totalprice")
            ),
        )
        sym_diff = got.exceptAll(expect).union(expect.exceptAll(got))
        assert sym_diff.count() == 0


def test_compact_partitioned_reduces_files_keeps_data(spark, tmp_path):
    root = str(tmp_path / "t")
    # many small files: 4 input partitions per grp value at create time
    df = _base(spark).union(_base(spark).withColumn("id", F.col("id") + 10)).repartition(8)
    TF.create_table(df, root, partition_by="grp")

    def files(v):
        vdir = os.path.join(root, "_versions", f"v{v:08d}")
        return [
            os.path.join(d, f)
            for d, _, fs in os.walk(vdir)
            for f in fs
            if f.endswith(".parquet")
        ]

    before = TF.read_table(spark, root).collect()
    v = TF.compact(spark, root)
    assert v == 2
    assert len(files(2)) < len(files(1))
    # one file per partition directory
    vdir = os.path.join(root, "_versions", "v00000002")
    for entry in os.listdir(vdir):
        if entry.startswith("grp="):
            n = len([f for f in os.listdir(os.path.join(vdir, entry)) if f.endswith(".parquet")])
            assert n == 1, f"{entry} has {n} files"
    assert sorted(map(tuple, TF.read_table(spark, root).collect())) == sorted(
        map(tuple, before)
    )
    assert TF.history(root)[-1]["action"] == "compact"


def test_compact_zorder_unpartitioned(spark, tmp_path):
    root = str(tmp_path / "t")
    rows = [Row(id=i, grp="g", val=float(i % 13), x=i % 50, y=(i * 7) % 50) for i in range(500)]
    TF.create_table(spark.createDataFrame(rows).repartition(6), root)
    before = sorted(r["id"] for r in TF.read_table(spark, root).collect())
    TF.compact(spark, root, zorder=("x", "y"))
    assert sorted(r["id"] for r in TF.read_table(spark, root).collect()) == before
    # partitioned variant: per-partition Z-order (OPTIMIZE ZORDER BY) —
    # data identical, one file per partition, rows inside each file sorted
    # by Morton value of (id, x)
    root2 = str(tmp_path / "p")
    TF.create_table(
        spark.createDataFrame(
            [Row(id=i, grp="g" + str(i % 2), val=1.0, x=(i * 13) % 50) for i in range(200)]
        ).repartition(5),
        root2,
        partition_by="grp",
    )
    before2 = sorted(
        (r["id"], r["grp"]) for r in TF.read_table(spark, root2).collect()
    )
    TF.compact(spark, root2, zorder=("id", "x"))
    assert (
        sorted((r["id"], r["grp"]) for r in TF.read_table(spark, root2).collect())
        == before2
    )
    vdir2 = os.path.join(root2, "_versions", f"v{TF.current_version(root2):08d}")
    for entry in os.listdir(vdir2):
        if entry.startswith("grp="):
            files = [f for f in os.listdir(os.path.join(vdir2, entry)) if f.endswith(".parquet")]
            assert len(files) == 1


def test_merge_matched_condition_gates_update_and_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    # conditional update: only apply where source val is GREATER
    src = spark.createDataFrame(
        [Row(id=1, grp="a", val=5.0), Row(id=2, grp="a", val=50.0)]
    )
    TF.merge_into(
        spark, root, src, on="id", when_not_matched=None,
        matched_condition=lambda t, s: s["val"] > t["val"],
    )
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: 10.0, 2: 50.0, 3: 30.0, 4: 40.0}  # id=1 untouched
    # conditional delete
    src2 = spark.createDataFrame([Row(id=3, grp="b", val=0.0), Row(id=4, grp="c", val=100.0)])
    TF.merge_into(
        spark, root, src2, on="id", when_matched="delete", when_not_matched=None,
        matched_condition=lambda t, s: t["val"] < s["val"],
    )
    ids = {r["id"] for r in TF.read_table(spark, root).collect()}
    assert ids == {1, 2, 3}  # only id=4 (40 < 100) deleted


def test_stream_merge_into_equals_batch_latest_and_is_idempotent(spark, sf_dir, tmp_path):
    """Streaming MERGE INTO the versioned table == batch keep-latest-per-user,
    seeded from a prefix snapshot (so the stream exercises BOTH matched
    updates and not-matched inserts); a full replay is a no-op."""
    from cernbox_migration_database_spark import streaming as ST
    from cernbox_migration_database_spark.sources.catalog import load_table
    from pyspark.sql import Window as W2

    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    w = W2.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = lambda df: (
        df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    )
    seed = latest(ev.where(F.col("user_id") % 2 == 0))  # half the users
    root = str(tmp_path / "t")
    TF.create_table(seed, root)

    def run_once():
        q = TF.stream_merge_into(
            ST.read_event_stream(spark, sf_dir).select(*cols),
            root,
            on="user_id",
            order_cols=["ts", "event_id"],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    want = {
        r["user_id"]: (r["ts"], r["event_id"]) for r in latest(ev).collect()
    }
    got = {
        r["user_id"]: (r["ts"], r["event_id"])
        for r in TF.read_table(spark, root).collect()
    }
    assert got == want
    v_after = TF.current_version(root)

    run_once()  # replay: matched_condition gates every stale update out
    again = {
        r["user_id"]: (r["ts"], r["event_id"])
        for r in TF.read_table(spark, root).collect()
    }
    assert again == want
    assert TF.current_version(root) > v_after  # new version committed...
    # ...but byte-equal data (idempotent merge)


def test_stream_merge_mor_with_inline_optimize(spark, sf_dir, tmp_path):
    """Streaming MERGE INTO with write_mode='mor': every micro-batch lands
    as tombstones + appends (no partition rewrites on the ingest path) and
    the in-line OPTIMIZE both collapses small files and materializes the
    accumulated deletion vectors. End state must equal batch
    keep-latest-per-user exactly — same contract as the COW stream."""
    from cernbox_migration_database_spark import streaming as ST
    from cernbox_migration_database_spark.sources.catalog import load_table
    from pyspark.sql import Window as W2

    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    w = W2.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = lambda df: (
        df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    )
    # seed with each user's EARLIEST row so the stream genuinely updates
    # every seeded user (tombstone + append in every bucket)
    w_first = W2.partitionBy("user_id").orderBy("ts", "event_id")
    seed = (
        ev.withColumn("_rn", F.row_number().over(w_first))
        .where("_rn = 1")
        .drop("_rn")
        .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(4)).cast("int"))
    )
    root = str(tmp_path / "t")
    TF.create_table(seed, root, partition_by="bucket")
    q = TF.stream_merge_into(
        ST.read_event_stream(spark, sf_dir)
        .select(*cols)
        .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(4)).cast("int")),
        root,
        on="user_id",
        order_cols=["ts", "event_id"],
        write_mode="mor",
        # the fixture stream arrives as ONE micro-batch: run maintenance
        # after every batch, flagging any partition with >1 file (seed +
        # MOR appends) so the compaction also materializes the tombstones
        optimize_every=1,
        optimize_max_files=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = {
        r["user_id"]: (r["ts"], r["event_id"]) for r in latest(ev).collect()
    }
    got = {
        r["user_id"]: (r["ts"], r["event_id"])
        for r in TF.read_table(spark, root).collect()
    }
    assert got == want
    # at least one merge_mor commit landed, and the inline maintenance ran
    actions = [e["action"] for e in TF.history(root)]
    assert "merge_mor" in actions
    assert "compact_partitions" in actions


def test_schema_evolution_merge_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    # source with a NEW column and an OMITTED one (val)
    src = spark.createDataFrame(
        [Row(id=2, grp="a", score=0.9), Row(id=5, grp="d", score=0.5)]
    )
    with pytest.raises(ValueError, match="evolve_schema"):
        TF.merge_into(spark, root, src, on="id")
    TF.merge_into(spark, root, src, on="id", evolve_schema=True)
    got = {
        r["id"]: (r["grp"], r["val"], r["score"])
        for r in TF.read_table(spark, root).collect()
    }
    assert got == {
        1: ("a", 10.0, None),      # hardlink-carried row: new col reads null
        2: ("a", 20.0, 0.9),       # omitted col keeps target value, new col set
        3: ("b", 30.0, None),
        4: ("c", 40.0, None),
        5: ("d", None, 0.5),       # insert: omitted col null
    }
    # logical column order: new column appended
    assert TF.read_table(spark, root).columns == ["id", "grp", "val", "score"]
    # time travel to v1 keeps the ORIGINAL schema
    assert TF.read_table(spark, root, version=1).columns == ["id", "grp", "val"]


def test_read_changes_insert_update_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=2, grp="a", val=99.0), Row(id=5, grp="d", val=50.0)]),
        on="id",
    )
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=3, grp="b", val=0.0)]),
        on="id", when_matched="delete", when_not_matched=None,
    )
    ch = {
        r["id"]: (r["_change_type"], r["val"])
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {
        2: ("update", 99.0),   # post-image
        3: ("delete", 30.0),   # pre-image
        5: ("insert", 50.0),
    }
    # intermediate window: v2 -> v3 sees only the delete
    ch23 = {
        r["id"]: r["_change_type"]
        for r in TF.read_changes(spark, root, key="id", from_version=2, to_version=3).collect()
    }
    assert ch23 == {3: "delete"}


def test_read_changes_catches_partition_moving_update(spark, tmp_path):
    """An update that changes the partition column must surface as ONE
    update (not a delete + insert, and not be pruned away)."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, grp="z", val=10.0)])  # a -> z
    TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    ch = {
        r["id"]: (r["_change_type"], r["grp"])
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {1: ("update", "z")}
    got = {r["id"]: r["grp"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: "z", 2: "a", 3: "b", 4: "c"}


def test_update_set_on_partition_column_touches_destination(spark, tmp_path):
    """ADVICE r4: a merge whose update_set EXPRESSION rewrites a partition
    column moves rows to a destination the raw source partition values
    never mention; the commit log must still record it or CDF pruning
    reports the move as a bare delete."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    # source carries the OLD partition value; the move comes from update_set
    src = spark.createDataFrame([Row(id=1, grp="a", val=11.0)])
    TF.merge_into(
        spark, root, src, on="id", when_not_matched=None,
        update_set={"grp": lambda t, s: F.concat(t["grp"], F.lit("_moved"))},
    )
    assert "grp=a_moved" in TF.history(root)[-1]["touched_partitions"]
    ch = {
        r["id"]: (r["_change_type"], r["grp"])
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {1: ("update", "a_moved")}
    got = {r["id"]: r["grp"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: "a_moved", 2: "a", 3: "b", 4: "c"}


def test_partial_source_hierarchical_move_touches_combined_destination(
    spark, tmp_path
):
    """ADVICE r4: with hierarchical partitioning, a source providing only
    SOME partition columns moves a row to (source value, target-kept
    value) — a tuple neither the raw source partitions (padded nulls) nor
    the matched-row source partitions contain."""
    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [
            Row(id=1, region="eu", day="d1", val=1.0),
            Row(id=2, region="us", day="d2", val=2.0),
        ]
    )
    TF.create_table(base, root, partition_by=["region", "day"])
    # source omits `day` (keeps target d1) but moves region eu -> ap
    src = spark.createDataFrame([Row(id=1, region="ap", val=9.0)])
    TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    touched = TF.history(root)[-1]["touched_partitions"]
    assert "region=ap/day=d1" in touched
    ch = {
        r["id"]: (r["_change_type"], r["region"], r["day"])
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {1: ("update", "ap", "d1")}
    got = {
        r["id"]: (r["region"], r["day"], r["val"])
        for r in TF.read_table(spark, root).collect()
    }
    assert got == {1: ("ap", "d1", 9.0), 2: ("us", "d2", 2.0)}


def test_mixed_merge_does_not_phantom_touch_matched_source_partitions(
    spark, tmp_path
):
    """A mixed update+insert merge whose matched rows keep their target
    partition must not count the matched SOURCE rows' raw partition tuples
    as touched (only actual insert rows open partitions)."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame(
        [
            Row(id=2, grp="a", val=99.0),  # matched, stays in a
            Row(id=9, grp="d", val=50.0),  # insert -> opens d
        ]
    )
    TF.merge_into(spark, root, src, on="id")
    assert TF.history(root)[-1]["touched_partitions"] == ["grp=a", "grp=d"]


def test_composite_key_merge_and_changes(spark, tmp_path):
    """Composite merge keys (on=[...]) across merge_into and read_changes."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(k1=1, k2="x", grp="a", val=10.0),
            Row(k1=1, k2="y", grp="a", val=20.0),
            Row(k1=2, k2="x", grp="b", val=30.0),
        ]
    )
    TF.create_table(df, root, partition_by="grp")
    src = spark.createDataFrame(
        [
            Row(k1=1, k2="y", grp="a", val=99.0),   # matched on (1, y)
            Row(k1=2, k2="y", grp="b", val=50.0),   # new (2, y) -> insert
        ]
    )
    TF.merge_into(spark, root, src, on=["k1", "k2"])
    got = {
        (r["k1"], r["k2"]): r["val"] for r in TF.read_table(spark, root).collect()
    }
    assert got == {(1, "x"): 10.0, (1, "y"): 99.0, (2, "x"): 30.0, (2, "y"): 50.0}
    ch = {
        (r["k1"], r["k2"]): r["_change_type"]
        for r in TF.read_changes(
            spark, root, key=["k1", "k2"], from_version=1
        ).collect()
    }
    assert ch == {(1, "y"): "update", (2, "y"): "insert"}
    # duplicate composite keys still rejected
    dup = spark.createDataFrame(
        [Row(k1=3, k2="z", grp="c", val=1.0), Row(k1=3, k2="z", grp="c", val=2.0)]
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        TF.merge_into(spark, root, dup, on=["k1", "k2"])


def test_check_constraints_and_version_at(spark, tmp_path):
    import time as _time

    root = str(tmp_path / "t")
    checks = {"val_nonneg": "val >= 0", "grp_not_null": "grp IS NOT NULL"}
    # create-time enforcement
    bad = spark.createDataFrame([Row(id=1, grp="a", val=-5.0)])
    with pytest.raises(ValueError, match="val_nonneg"):
        TF.create_table(bad, str(tmp_path / "bad"), checks=checks)
    TF.create_table(_base(spark), root, partition_by="grp", checks=checks)
    t_v1 = _time.time()

    # merge-time enforcement: a violating source aborts pre-commit, base
    # version stays live
    with pytest.raises(ValueError, match="val_nonneg"):
        TF.merge_into(
            spark, root,
            spark.createDataFrame([Row(id=2, grp="a", val=-1.0)]),
            on="id",
        )
    # NULL predicate results count as violations, not silent passes
    with pytest.raises(ValueError, match="grp_not_null"):
        TF.merge_into(
            spark, root,
            spark.createDataFrame(
                [(9, None, 1.0)], "id bigint, grp string, val double"
            ),
            on="id",
        )
    assert TF.current_version(root) == 1
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=2, grp="a", val=99.0)]),
        on="id",
    )
    assert TF.current_version(root) == 2

    # AS OF timestamp resolves to the version current at that moment
    assert TF.version_at(root, t_v1) == 1
    assert TF.version_at(root, _time.time()) == 2
    with pytest.raises(ValueError, match="no version"):
        TF.version_at(root, 0.0)
    # read_table(timestamp=) is the composed AS OF TIMESTAMP read
    assert TF.read_table(spark, root, timestamp=t_v1).count() == 4
    with pytest.raises(ValueError, match="at most one of version, timestamp, tag"):
        TF.read_table(spark, root, version=1, timestamp=t_v1)


def test_null_partition_values_cow_and_cdf(spark, tmp_path):
    """A null partition value lands in __HIVE_DEFAULT_PARTITION__; the COW
    touched-set must match it in BOTH the rewrite filter and the hardlink
    skip (a mismatch would duplicate the partition), and CDF pruning must
    not drop null-partition changes through three-valued isin."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "b", 30.0)],
        "id bigint, grp string, val double",
    )
    TF.create_table(df, root, partition_by="grp")
    src = spark.createDataFrame(
        [(1, None, 11.0)], "id bigint, grp string, val double"
    )
    TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    rows = sorted(
        (r["id"], r["grp"], r["val"]) for r in TF.read_table(spark, root).collect()
    )
    assert rows == [(1, None, 11.0), (2, None, 20.0), (3, "b", 30.0)]  # no dupes
    assert TF.history(root)[-1]["touched_partitions"] == [
        "grp=__HIVE_DEFAULT_PARTITION__"
    ]
    ch = {
        r["id"]: r["_change_type"]
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {1: "update"}


def test_compact_resets_schema_merge_need(spark, tmp_path):
    """After an evolving merge the version dir mixes footer schemas
    (mergeSchema required); a compact rewrites every row under one schema,
    so later reads must see the full schema even WITHOUT footer merging."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=2, grp="a", score=0.5)]),
        on="id", evolve_schema=True,
    )
    TF.compact(spark, root)
    # plain read (no mergeSchema) of the compacted dir sees all 4 columns
    vdir = os.path.join(root, "_versions", f"v{TF.current_version(root):08d}")
    raw = spark.read.parquet(vdir)
    assert set(raw.columns) == {"id", "grp", "val", "score"}
    got = {r["id"]: r["score"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: None, 2: 0.5, 3: None, 4: None}


def test_failed_write_does_not_burn_version_claim(spark, tmp_path):
    """A merge whose WRITE fails (after the claim) must clean up its
    claimed version dir so the next merge can claim base_v+1 — otherwise
    one transient executor failure bricks the table."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    # source whose evaluation raises at write time (lazy assert_true)
    poison = spark.createDataFrame([Row(id=2, grp="a", val=1.0)]).withColumn(
        "val", F.assert_true(F.lit(False)).cast("double")
    )
    with pytest.raises(Exception):
        TF.merge_into(spark, root, poison, on="id", when_not_matched=None)
    assert TF.current_version(root) == 1  # pointer untouched
    # the version number is NOT burned: a valid merge succeeds as v2
    ok = spark.createDataFrame([Row(id=2, grp="a", val=21.0)])
    assert TF.merge_into(spark, root, ok, on="id", when_not_matched=None) == 2
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got[2] == 21.0
    # failed create cleans its claim too (bad partition column fails fast)
    with pytest.raises(ValueError, match="partition_by"):
        TF.create_table(_base(spark), str(tmp_path / "c"), partition_by="nope")


def test_read_changes_key_only_table(spark, tmp_path):
    """A table with no non-key columns diffs by membership alone."""
    root = str(tmp_path / "t")
    TF.create_table(
        spark.createDataFrame([(1,), (2,), (3,)], "id bigint"), root
    )
    TF.merge_into(
        spark, root, spark.createDataFrame([(4,)], "id bigint"), on="id"
    )
    TF.merge_into(
        spark, root, spark.createDataFrame([(1,)], "id bigint"),
        on="id", when_matched="delete", when_not_matched=None,
    )
    ch = {
        r["id"]: r["_change_type"]
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {4: "insert", 1: "delete"}


def test_partition_evolution(spark, tmp_path):
    """repartition_table changes the physical scheme mid-history: later
    merges COW against the NEW scheme, old snapshots keep their layout,
    and a change feed crossing the boundary stays row-correct."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(id=i, grp="g" + str(i % 3), region="r" + str(i % 2), val=float(i)) for i in range(30)]
    )
    TF.create_table(df, root, partition_by="grp")
    assert TF.partition_scheme(root) == "grp"
    v2 = TF.repartition_table(spark, root, "region")
    assert TF.partition_scheme(root) == "region"
    assert TF.partition_scheme(root, version=1) == "grp"
    # layout change only: identical rows
    assert sorted(r["id"] for r in TF.read_table(spark, root).collect()) == list(range(30))
    # new-scheme COW: merge touching only region r0 hardlinks r1 forward
    src = spark.createDataFrame([Row(id=4, grp="g1", region="r0", val=400.0)])
    v3 = TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    assert TF.history(root)[-1]["touched_partitions"] == ["region=r0"]
    vdirs = [os.path.join(root, "_versions", f"v{v:08d}") for v in (v2, v3)]
    ino = lambda d, p: {
        os.stat(os.path.join(d, p, f)).st_ino
        for f in os.listdir(os.path.join(d, p))
        if f.endswith(".parquet")
    }
    assert ino(vdirs[0], "region=r1") == ino(vdirs[1], "region=r1")  # carried
    # CDF across the repartition boundary: only the real row change
    ch = {
        r["id"]: r["_change_type"]
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {4: "update"}
    # same-scheme request rejected
    with pytest.raises(ValueError, match="already partitioned"):
        TF.repartition_table(spark, root, "region")


def test_multi_column_partitioning_cow_and_cdf(spark, tmp_path):
    """Hierarchical partitioning (day/region): COW rewrites only the
    touched LEAF partitions, carries the rest as hardlinks, logs relative
    paths, and the change feed prunes on the nested dir string."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(id=i, day=f"d{i % 2}", region=f"r{i % 3}", val=float(i))
            for i in range(60)
        ]
    )
    TF.create_table(df, root, partition_by=["day", "region"])
    assert TF.partition_scheme(root) == ["day", "region"]
    # update one row living in leaf d1/r2 (id=5 -> day=d1, region=r2)
    src = spark.createDataFrame([Row(id=5, day="d1", region="r2", val=500.0)])
    TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    assert TF.history(root)[-1]["touched_partitions"] == ["day=d1/region=r2"]
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got[5] == 500.0 and len(got) == 60

    # hardlink carry: every OTHER leaf keeps its inodes
    v1 = os.path.join(root, "_versions", "v00000001")
    v2 = os.path.join(root, "_versions", "v00000002")

    def inodes(vdir, rel):
        d = os.path.join(vdir, rel)
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    assert inodes(v1, "day=d0/region=r0") == inodes(v2, "day=d0/region=r0")
    assert inodes(v1, "day=d1/region=r1") == inodes(v2, "day=d1/region=r1")
    assert inodes(v1, "day=d1/region=r2").isdisjoint(inodes(v2, "day=d1/region=r2"))

    ch = {
        r["id"]: r["_change_type"]
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {5: "update"}
    # compact preserves data under the nested scheme
    TF.compact(spark, root)
    assert {
        r["id"]: r["val"] for r in TF.read_table(spark, root).collect()
    } == got


def test_merge_with_retry_race_and_orphan(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")

    # RACE: first claim attempt loses to a competing writer that commits
    # v2 out from under us; the retry must re-run against v2 and land v3
    real_claim = TF._claim_version
    state = {"raced": False}

    def racing_claim(r, version):
        if not state["raced"]:
            state["raced"] = True
            # competing writer commits v2 first
            TF.merge_into(
                spark, r,
                spark.createDataFrame([Row(id=3, grp="b", val=33.0)]),
                on="id", when_not_matched=None,
            )
            raise FileExistsError("lost the claim")
        return real_claim(r, version)

    monkeypatch.setattr(TF, "_claim_version", racing_claim)
    v = TF.merge_with_retry(
        spark, root,
        spark.createDataFrame([Row(id=1, grp="a", val=11.0)]),
        on="id", when_not_matched=None,
    )
    monkeypatch.setattr(TF, "_claim_version", real_claim)
    assert v == 3
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got[1] == 11.0 and got[3] == 33.0  # both merges landed

    # ORPHAN: a leftover claim dir with an unmoved pointer and NO
    # filesystem activity past the in-flight grace raises with the vacuum
    # hint instead of spinning (grace shrunk so the test doesn't wait —
    # a live writer's claim shows fresh mtimes and is waited on instead)
    os.mkdir(os.path.join(root, "_versions", f"v{v + 1:08d}"))
    import time as _time

    _time.sleep(1.2)
    with pytest.raises(FileExistsError, match="orphaned claim"):
        TF.merge_with_retry(
            spark, root,
            spark.createDataFrame([Row(id=2, grp="a", val=2.0)]),
            on="id", when_not_matched=None, inflight_grace_s=1.0,
        )


def test_mor_commit_degrades_to_copy_carry(spark, tmp_path, monkeypatch):
    """Merge-on-read commits carry the ENTIRE base snapshot, so the
    no-hardlink degradation (object-store stand-in) must hold there too:
    byte-copied carry, correct reads, flagged commit."""

    def no_link(_s, _d):
        raise OSError("EXDEV: cross-device link simulated")

    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    monkeypatch.setattr(TF.os, "link", no_link)
    TF.delete_where(spark, root, "id = 2", mode="mor")
    monkeypatch.undo()
    assert TF.history(root)[-1].get("carry_copied_files", 0) > 0
    got = {r["id"] for r in TF.read_table(spark, root).collect()}
    assert got == {1, 3, 4}
    # tombstones still subtract against the COPIED files (relative paths,
    # not inodes, are the identity)
    assert TF.table_stats(root)["deleted_rows"] == 1


def test_concurrent_writers_all_land_with_retry(spark, tmp_path):
    """REAL concurrency (not monkeypatched): two threads — one committing
    COPY-ON-WRITE, one MERGE-ON-READ — each push five sequential keyed
    merges through merge_with_retry against one table. Optimistic claims
    collide for real ACROSS write protocols; every one of the 10 commits
    must land, the final state must contain every writer's rows, and the
    version chain must be gapless."""
    import threading

    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    errors: list[Exception] = []

    def writer(offset: int) -> None:
        try:
            for i in range(5):
                k = 100 + offset * 10 + i
                TF.merge_with_retry(
                    spark, root,
                    spark.createDataFrame(
                        [(k, "ab"[k % 2], float(k))],
                        "id long, grp string, val double",
                    ),
                    on="id",
                    retries=20,
                    write_mode="mor" if offset else "cow",
                )
        except Exception as e:  # surface into the main thread
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(o,)) for o in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    got = {r["id"] for r in TF.read_table(spark, root).collect()}
    assert got == {1, 2, 3, 4} | {100 + o * 10 + i for o in (0, 1) for i in range(5)}
    versions = [e["version"] for e in TF.history(root)]
    assert versions == list(range(1, 12))  # create + 10 merges, gapless


def test_mor_merge_retry_races_cow_writer(spark, tmp_path, monkeypatch):
    """Optimistic concurrency across write PROTOCOLS: a merge-on-read
    merge that loses its version claim to a racing COW update must re-run
    against the winner's snapshot — its tombstones then reference the
    winner's REWRITTEN files (the raced partition's old files are gone),
    and both writers' effects land."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")

    real_claim = TF._claim_version
    state = {"raced": False}

    def racing_claim(r, version):
        if not state["raced"]:
            state["raced"] = True
            # competing COW writer rewrites partition 'a' first
            TF.update_where(spark, r, "id = 2", {"val": "222.0"})
            raise FileExistsError("lost the claim")
        return real_claim(r, version)

    monkeypatch.setattr(TF, "_claim_version", racing_claim)
    v = TF.commit_with_retry(
        root,
        lambda: TF.merge_into(
            spark, root,
            spark.createDataFrame([Row(id=1, grp="a", val=111.0)]),
            on="id", when_not_matched=None, write_mode="mor",
        ),
        what="mor-merge",
    )
    monkeypatch.setattr(TF, "_claim_version", real_claim)
    assert v == 3
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: 111.0, 2: 222.0, 3: 30.0, 4: 40.0}
    # the MOR commit's tombstone points into the COW winner's v2 file set
    assert TF.history(root)[-1]["action"] == "merge_mor"
    assert TF._dv_counts(TF._vdir(root, 3)) == {"grp=a": 1}


def test_delete_where_cow_null_semantics_and_pruning(spark, tmp_path):
    root = str(tmp_path / "del")
    base = spark.createDataFrame(
        [
            Row(id=1, grp="a", val=10.0),
            Row(id=2, grp="a", val=None),  # NULL predicate -> survives
            Row(id=3, grp="b", val=30.0),
            Row(id=4, grp="c", val=40.0),
        ]
    )
    TF.create_table(base, root, partition_by="grp")
    v = TF.delete_where(spark, root, "val >= 30")
    assert v == 2
    got = {r["id"] for r in TF.read_table(spark, root).collect()}
    assert got == {1, 2}  # NULL-val row kept (three-valued DELETE semantics)
    entry = TF.history(root)[-1]
    assert entry["action"] == "delete"
    # only b and c contained matches -> a is carried forward as hardlinks
    assert sorted(entry["touched_partitions"]) == ["grp=b", "grp=c"]

    def inodes(ver, part):
        d = os.path.join(root, "_versions", f"v{ver:08d}", f"grp={part}")
        if not os.path.isdir(d):
            return set()
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    assert inodes(1, "a") == inodes(2, "a")
    # time travel: the pre-delete snapshot still shows all four rows
    assert TF.read_table(spark, root, version=1).count() == 4


def test_update_where_pre_update_semantics_and_partition_move(spark, tmp_path):
    root = str(tmp_path / "upd")
    base = spark.createDataFrame(
        [
            Row(id=1, grp="a", x=1.0, y=100.0),
            Row(id=2, grp="b", x=2.0, y=200.0),
            Row(id=3, grp="c", x=3.0, y=300.0),
        ]
    )
    TF.create_table(base, root, partition_by="grp")
    # swap x and y on the matched row: both SET expressions must see the
    # PRE-update values (standard UPDATE semantics)
    TF.update_where(spark, root, "id = 2", {"x": "y", "y": "x"})
    got = {r["id"]: (r["x"], r["y"]) for r in TF.read_table(spark, root).collect()}
    assert got[2] == (200.0, 2.0) and got[1] == (1.0, 100.0)

    # partition-moving update: row 1 moves a -> z; a (source) and z (dest)
    # are rewritten, b and c hardlink forward
    v = TF.update_where(spark, root, "id = 1", {"grp": "'z'"})
    entry = TF.history(root)[-1]
    assert entry["action"] == "update"
    assert sorted(entry["touched_partitions"]) == ["grp=a", "grp=z"]
    rows = {r["id"]: r["grp"] for r in TF.read_table(spark, root, version=v).collect()}
    assert rows == {1: "z", 2: "b", 3: "c"}

    with pytest.raises(ValueError, match="not in"):
        TF.update_where(spark, root, "id = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="non-empty"):
        TF.update_where(spark, root, "id = 1", {})


def test_update_where_enforces_check_constraints(spark, tmp_path):
    root = str(tmp_path / "chk")
    TF.create_table(_base(spark), root, checks={"val_nonneg": "val >= 0"})
    with pytest.raises(ValueError, match="val_nonneg"):
        TF.update_where(spark, root, "id = 1", {"val": "-5.0"})
    assert TF.current_version(root) == 1  # aborted pre-claim, nothing committed
    TF.update_where(spark, root, "id = 1", {"val": "val + 1"})
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got[1] == 11.0


def test_restore_is_metadata_only_rollback(spark, tmp_path):
    root = str(tmp_path / "res")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.delete_where(spark, root, "grp = 'b'")
    assert TF.read_table(spark, root).count() == 3
    v = TF.restore(root, 1)
    assert v == 3
    # restored snapshot equals version 1 exactly
    assert {r["id"] for r in TF.read_table(spark, root).collect()} == {1, 2, 3, 4}
    entry = TF.history(root)[-1]
    assert entry["action"] == "restore" and entry["restored_version"] == 1
    # metadata-only: every restored file is a hardlink of the v1 file
    v1 = os.path.join(root, "_versions", "v00000001")
    v3 = os.path.join(root, "_versions", "v00000003")

    def all_inodes(vdir):
        out = set()
        for dp, _dn, fns in os.walk(vdir):
            out |= {os.stat(os.path.join(dp, f)).st_ino for f in fns if f.endswith(".parquet")}
        return out

    assert all_inodes(v3) == all_inodes(v1)
    # the bad version stays readable for forensics until vacuumed
    assert TF.read_table(spark, root, version=2).count() == 3
    # CDF across the restore boundary reports the rows coming back
    chg = TF.read_changes(spark, root, "id", from_version=2, to_version=3)
    assert {(r["id"], r["_change_type"]) for r in chg.collect()} == {(3, "insert")}
    with pytest.raises(ValueError, match="already current"):
        TF.restore(root, 3)
    with pytest.raises(FileNotFoundError):
        TF.restore(root, 99)


def test_restore_carries_schema_evolution_state(spark, tmp_path):
    root = str(tmp_path / "rse")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, grp="a", val=11.0, extra="X")])
    TF.merge_into(spark, root, src, on="id", when_not_matched=None, evolve_schema=True)
    TF.delete_where(spark, root, "id = 4")  # v3, still mixed footers
    TF.compact(spark, root)  # v4: uniform footers again
    v = TF.restore(root, 3)  # back to a MIXED-footer snapshot
    df = TF.read_table(spark, root, version=v)
    got = {r["id"]: r["extra"] for r in df.collect()}
    # hardlink-carried partitions read the evolved column as null
    assert got == {1: "X", 2: None, 3: None}


def test_vacuum_collects_orphans_with_grace(spark, tmp_path):
    root = str(tmp_path / "vac")
    TF.create_table(_base(spark), root, partition_by="grp")
    vroot = os.path.join(root, "_versions")
    # debris from a crashed writer: a claimed-but-never-committed version
    # and a staging leftover
    os.mkdir(os.path.join(vroot, "v00000002"))
    os.mkdir(os.path.join(vroot, "v00000003.staging"))
    # default grace: fresh orphans are NOT collected (in-flight writer guard)
    TF.vacuum(root, keep_last=2, remove_orphans=True)
    assert os.path.isdir(os.path.join(vroot, "v00000002"))
    TF.vacuum(root, keep_last=2, remove_orphans=True, orphan_grace_s=0.0)
    assert not os.path.exists(os.path.join(vroot, "v00000002"))
    assert not os.path.exists(os.path.join(vroot, "v00000003.staging"))
    # the table itself is intact and the next merge can claim v2 again
    src = spark.createDataFrame([Row(id=1, grp="a", val=99.0)])
    assert TF.merge_into(spark, root, src, on="id", when_not_matched=None) == 2


def test_fully_emptied_snapshot_stays_readable(spark, tmp_path):
    """A DELETE matching every row leaves a version with zero data files;
    reads must synthesize the empty frame from the commit log's recorded
    schema (hypothesis found the bare parquet read failing with
    UNABLE_TO_INFER_SCHEMA), and the table must accept later merges and
    produce a coherent change feed across the empty epoch."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.delete_where(spark, root, "val >= 0")
    df = TF.read_table(spark, root)
    assert df.count() == 0
    assert df.columns == ["id", "grp", "val"]
    # time travel to the populated version still works
    assert TF.read_table(spark, root, version=1).count() == 4
    # the empty table accepts a merge and the feed shows delete+insert
    TF.merge_into(
        spark, root, spark.createDataFrame([Row(id=9, grp="z", val=9.0)]),
        on="id",
    )
    got = [(r["id"], r["grp"]) for r in TF.read_table(spark, root).collect()]
    assert got == [(9, "z")]
    ch = {
        r["id"]: r["_change_type"]
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {1: "delete", 2: "delete", 3: "delete", 4: "delete", 9: "insert"}


def test_partition_values_with_escaped_characters(spark, tmp_path):
    """Partition values containing Hive-escaped characters ('#', ':', '%')
    must round-trip through the COW carry: before the escape fix,
    touched_rels recorded 'p=Brand#9' while the writer created
    'p=Brand%239', so the carry matched nothing and hardlinked every base
    partition ON TOP of the rewrite — silently duplicating the table."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            Row(id=1, grp="Brand#9", val=1.0),
            Row(id=2, grp="Brand#9", val=2.0),
            Row(id=3, grp="a:b%c", val=3.0),
            Row(id=4, grp="plain", val=4.0),
        ]
    )
    TF.create_table(df, root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, grp="Brand#9", val=11.0)])
    v = TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    got = sorted(
        (r["id"], r["grp"], r["val"])
        for r in TF.read_table(spark, root, v).collect()
    )
    assert got == [
        (1, "Brand#9", 11.0),
        (2, "Brand#9", 2.0),
        (3, "a:b%c", 3.0),
        (4, "plain", 4.0),
    ]
    assert TF.history(root)[-1]["touched_partitions"] == ["grp=Brand%239"]
    # CDF pruning compares in the same space: exactly one update surfaces
    ch = {
        r["id"]: r["_change_type"]
        for r in TF.read_changes(spark, root, key="id", from_version=1).collect()
    }
    assert ch == {1: "update"}
    # partition-scoped OPTIMIZE accepts the value form and the rel form
    TF.compact_partitions(spark, root, ["a:b%c"])
    got2 = sorted(r["id"] for r in TF.read_table(spark, root).collect())
    assert got2 == [1, 2, 3, 4]


def test_failed_commit_never_deletes_competing_writers_data(
    spark, tmp_path, monkeypatch
):
    """ADVICE r4: if vacuum freed writer A's claim mid-write and writer B
    re-claimed the version and renamed its staging onto it, A's rename
    fails — and A's cleanup must NOT rmtree the now non-empty version dir
    (that is B's committed, possibly pointer-published data). The
    empty-only _unclaim guard is the invariant under test."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, grp="a", val=99.0)])

    real_rename = os.rename
    winner = {}

    def racy_rename(a, b):
        if b.endswith("v00000002") and not winner:
            # B wins between A's staging write and A's rename: the claim
            # dir A created is replaced by B's renamed (non-empty) data
            os.rmdir(b)
            os.makedirs(b)
            winner["file"] = os.path.join(b, "part-winner.parquet")
            with open(winner["file"], "w", encoding="utf-8") as fh:
                fh.write("B's data")
        return real_rename(a, b)

    monkeypatch.setattr(TF.os, "rename", racy_rename)
    with pytest.raises(OSError):
        TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    monkeypatch.setattr(TF.os, "rename", real_rename)
    # the winner's data survived the loser's cleanup
    assert os.path.exists(winner["file"])
    # and the loser's staging debris is gone
    assert not os.path.exists(
        os.path.join(root, "_versions", "v00000002.staging")
    )


def test_vacuum_grace_keyed_to_staging_activity(spark, tmp_path):
    """ADVICE r4: a bare claim dir stays empty (and its mtime frozen) for
    the whole duration of a long staging write — orphan collection must
    key its age to the newest activity in the .staging sibling, not the
    claim dir's own creation time."""
    import time as _time

    root = str(tmp_path / "vac")
    TF.create_table(_base(spark), root, partition_by="grp")
    vroot = os.path.join(root, "_versions")
    claim = os.path.join(vroot, "v00000002")
    staging = claim + ".staging"
    os.mkdir(claim)
    os.mkdir(staging)
    # age the claim dir and staging dir themselves far past any grace
    old = _time.time() - 7200
    os.utime(claim, (old, old))
    # ...but the writer is ACTIVE: a file inside staging was just written
    with open(os.path.join(staging, "part-0.parquet"), "w") as fh:
        fh.write("in flight")
    os.utime(staging, (old, old))
    TF.vacuum(root, keep_last=2, remove_orphans=True, orphan_grace_s=3600.0)
    assert os.path.isdir(claim), "active writer's claim was vacuumed"
    assert os.path.isdir(staging), "active writer's staging was vacuumed"
    # once the activity itself is old, both are collected
    os.utime(os.path.join(staging, "part-0.parquet"), (old, old))
    TF.vacuum(root, keep_last=2, remove_orphans=True, orphan_grace_s=3600.0)
    assert not os.path.exists(claim)
    assert not os.path.exists(staging)


def test_change_feed_cursor_consumption(spark, tmp_path):
    """Exactly-once downstream consumption: bootstrap load, per-merge
    deltas, crash-replay before commit, caught-up None — and an ahead
    cursor (stale pointer to a recreated table) fails loudly."""
    root = str(tmp_path / "t")
    cur = str(tmp_path / "consumer.cursor")
    TF.create_table(_base(spark), root, partition_by="grp")

    # bootstrap: every current row as an insert
    df, target = TF.read_changes_since(spark, root, "id", cur)
    assert target == 1
    rows = df.collect()
    assert len(rows) == 4 and all(r["_change_type"] == "insert" for r in rows)
    TF.commit_cursor(cur, target)

    # caught up -> None
    df, target = TF.read_changes_since(spark, root, "id", cur)
    assert df is None and target == 1

    # a merge produces exactly its delta
    src = spark.createDataFrame([Row(id=1, grp="a", val=99.0), Row(id=9, grp="z", val=9.0)])
    TF.merge_into(spark, root, src, on="id")
    df, target = TF.read_changes_since(spark, root, "id", cur)
    got = {(r["id"], r["_change_type"]) for r in df.collect()}
    assert got == {(1, "update"), (9, "insert")} and target == 2

    # crash BEFORE commit: the same delta replays
    df2, target2 = TF.read_changes_since(spark, root, "id", cur)
    assert {(r["id"], r["_change_type"]) for r in df2.collect()} == got
    TF.commit_cursor(cur, target2)

    # two more commits consumed as ONE combined increment
    TF.delete_where(spark, root, "id = 2")
    TF.update_where(spark, root, "id = 3", {"val": "val + 1"})
    df, target = TF.read_changes_since(spark, root, "id", cur)
    got = {(r["id"], r["_change_type"]) for r in df.collect()}
    assert got == {(2, "delete"), (3, "update")} and target == 4
    TF.commit_cursor(cur, target)

    # ahead cursor (table recreated behind the consumer's back) -> loud error
    TF.commit_cursor(cur, 99)
    with pytest.raises(ValueError, match="ahead"):
        TF.read_changes_since(spark, root, "id", cur)


def test_cdf_cursor_feeds_incremental_dedup_index(spark, sf_dir, tmp_path):
    """Lakehouse -> dedup-pipeline integration: a corpus fingerprint index
    (the structure dedup_incremental_ingest anti-joins against) maintained
    purely from cursor-consumed change-feed increments must equal one
    recomputed from the table head — across inserts, text updates, and
    RTBF deletes, consumed in separate increments."""
    from pyspark.sql import functions as SF

    from cernbox_migration_database_spark.operators.text import fingerprint
    from cernbox_migration_database_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    root = str(tmp_path / "corpus")
    cur = str(tmp_path / "fp.cursor")
    TF.create_table(docs.where(SF.col("doc_id") < 300), root, partition_by="lang")

    index: dict = {}  # doc_id -> fingerprint, applied idempotently per key

    def consume():
        df, target = TF.read_changes_since(spark, root, "doc_id", cur)
        if df is None:
            return
        for r in df.withColumn("fp", fingerprint("text")).collect():
            if r["_change_type"] == "delete":
                index.pop(r["doc_id"], None)
            else:
                index[r["doc_id"]] = r["fp"]
        TF.commit_cursor(cur, target)

    consume()  # bootstrap
    # increment 1: new docs arrive + one doc's text is rewritten
    batch = docs.where((SF.col("doc_id") >= 300) & (SF.col("doc_id") < 350))
    upd = (
        TF.read_table(spark, root)
        .where(SF.col("doc_id") == 5)
        .withColumn("text", SF.lit("rewritten body"))
    )
    TF.merge_into(spark, root, batch.unionByName(upd), on="doc_id")
    consume()
    # increment 2: an RTBF purge
    TF.delete_where(spark, root, "doc_id % 97 = 0")
    consume()

    truth = {
        r["doc_id"]: r["fp"]
        for r in TF.read_table(spark, root)
        .withColumn("fp", fingerprint("text"))
        .select("doc_id", "fp")
        .collect()
    }
    assert index == truth and truth  # identical, and non-trivial


def test_update_only_merge_with_omitted_partition_column(spark, tmp_path):
    """A when_matched-only merge whose source OMITS the partition column
    cannot move rows, so only the matched partitions are touched — no
    phantom null partition in the log, and unmatched partitions hardlink
    forward."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, val=111.0)])  # no grp column
    TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    entry = TF.history(root)[-1]
    assert entry["touched_partitions"] == ["grp=a"]
    got = {r["id"]: (r["grp"], r["val"]) for r in TF.read_table(spark, root).collect()}
    assert got[1] == ("a", 111.0) and got[3] == ("b", 30.0)

    def inodes(ver, part):
        d = os.path.join(root, "_versions", f"v{ver:08d}", f"grp={part}")
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    assert inodes(1, "b") == inodes(2, "b") and inodes(1, "c") == inodes(2, "c")
    # an INSERTING merge with an omitted partition column lands in the
    # null partition — the padded null IS the destination there
    src2 = spark.createDataFrame([Row(id=99, val=9.0)])
    TF.merge_into(spark, root, src2, on="id")
    assert sorted(TF.history(root)[-1]["touched_partitions"]) == [
        f"grp={TF._HIVE_NULL}"
    ]
    rows = {r["id"]: r["grp"] for r in TF.read_table(spark, root).collect()}
    assert rows[99] is None and len(rows) == 5


def test_bucket_partitioned_merge_touches_only_key_buckets(spark, sf_dir, tmp_path):
    """bucket(n, key) partitioning: a k-key merge rewrites at most k
    buckets regardless of value skew — every other bucket hardlinks
    forward — and the bucket column round-trips consistently so later
    merges keep pruning."""
    from pyspark.sql import functions as SF

    root = str(tmp_path / "b")
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .limit(5000)
    )
    TF.create_table(
        TF.with_bucket(orders, "o_orderkey", 16), root, partition_by="bucket"
    )
    keys = [r["o_orderkey"] for r in orders.limit(3).collect()]
    src = TF.with_bucket(
        orders.where(SF.col("o_orderkey").isin(keys)).withColumn(
            "o_totalprice", SF.col("o_totalprice") * 2
        ),
        "o_orderkey",
        16,
    )
    TF.merge_into(spark, root, src, on="o_orderkey", when_not_matched=None)
    touched = TF.history(root)[-1]["touched_partitions"]
    assert 1 <= len(touched) <= 3  # at most one bucket per merged key
    # untouched buckets carried as hardlinks
    v1 = os.path.join(root, "_versions", "v00000001")
    v2 = os.path.join(root, "_versions", "v00000002")
    untouched = [
        d for d in os.listdir(v1)
        if d.startswith("bucket=") and d not in {t for t in touched}
    ]
    assert untouched
    for d in untouched:
        i1 = {os.stat(os.path.join(v1, d, f)).st_ino for f in os.listdir(os.path.join(v1, d)) if f.endswith(".parquet")}
        i2 = {os.stat(os.path.join(v2, d, f)).st_ino for f in os.listdir(os.path.join(v2, d)) if f.endswith(".parquet")}
        assert i1 == i2, d
    got = {r["o_orderkey"]: r["o_totalprice"] for r in TF.read_table(spark, root).collect()}
    base = {r["o_orderkey"]: r["o_totalprice"] for r in orders.collect()}
    for k, v in base.items():
        assert got[k] == (v * 2 if k in keys else v)


def test_compact_partitions_scoped_layout_only(spark, sf_dir, tmp_path):
    """OPTIMIZE ... WHERE: churned partitions collapse to one file each,
    untouched partitions hardlink forward, data is byte-identical, and the
    change feed ignores the layout-only commit."""
    from pyspark.sql import functions as SF

    root = str(tmp_path / "t")
    # a multi-task write leaves several small files per partition dir
    many = spark.createDataFrame(
        [Row(id=i, grp="abc"[i % 3], val=float(i)) for i in range(60)]
    ).repartition(4)
    TF.create_table(many, root, partition_by="grp")
    v_before = TF.current_version(root)

    def files(ver, part):
        d = os.path.join(root, "_versions", f"v{ver:08d}", f"grp={part}")
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )

    assert len(files(v_before, "a")) > 1
    with pytest.raises(ValueError, match="do not exist"):
        TF.compact_partitions(spark, root, ["zzz"])
    v = TF.compact_partitions(spark, root, ["a"])
    assert len(files(v, "a")) == 1
    # b and c hardlinked, not rewritten
    for part in ("b", "c"):
        i_old = {os.stat(os.path.join(root, "_versions", f"v{v_before:08d}", f"grp={part}", f)).st_ino for f in files(v_before, part)}
        i_new = {os.stat(os.path.join(root, "_versions", f"v{v:08d}", f"grp={part}", f)).st_ino for f in files(v, part)}
        assert i_old == i_new
    before = sorted(map(tuple, TF.read_table(spark, root, v_before).collect()))
    after = sorted(map(tuple, TF.read_table(spark, root, v).collect()))
    assert before == after
    # CDF across the layout commit: no row changes, and pruning still works
    assert TF.read_changes(spark, root, "id", v_before, v).count() == 0
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=1, grp="a", val=42.0)]),
        on="id", when_not_matched=None,
    )
    ch = TF.read_changes(spark, root, "id", v_before)
    assert {(r["id"], r["_change_type"]) for r in ch.collect()} == {(1, "update")}


def test_manifest_written_per_commit_and_walk_fallback(spark, sf_dir, tmp_path):
    """Every commit writes a _manifest.jsonl sidecar listing exactly the
    snapshot's data files; pre-manifest snapshots fall back to the walk."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=9, grp="b", val=9.0)]),
        on="id",
    )
    for v in (1, 2):
        vdir = os.path.join(root, "_versions", f"v{v:08d}")
        mpath = os.path.join(vdir, "_manifest.jsonl")
        assert os.path.exists(mpath)
        listed = TF.manifest(root, v)
        walked = sorted(
            (
                os.path.relpath(os.path.join(dp, fn), vdir)
                for dp, _dn, fns in os.walk(vdir)
                for fn in fns
                if not fn.startswith(("_", "."))
            )
        )
        assert [e["path"] for e in listed] == walked
        assert all(e["size"] > 0 for e in listed)
        assert all(e["rows"] > 0 for e in listed)
        # fallback path (a snapshot committed before manifests existed):
        # same files, no cached footer stats
        os.remove(mpath)
        assert [(e["path"], e["size"]) for e in TF.manifest(root, v)] == [
            (e["path"], e["size"]) for e in listed
        ]


def test_pruned_scan_keeps_evolved_column_absent_from_pruned_files(
    spark, tmp_path
):
    """ADVICE r4: a pruned read whose file list contains NO file carrying
    an evolved column must still surface it (as typed nulls, in the
    recorded column order) — column-identical to read_table().where()."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    # evolve the schema by touching ONLY partition a
    src = spark.createDataFrame([Row(id=1, grp="a", val=10.0, extra=7)])
    TF.merge_into(
        spark, root, src, on="id", when_not_matched=None, evolve_schema=True
    )
    full_cols = TF.read_table(spark, root).columns
    # partition b's files were hardlink-carried: none carries `extra`
    got = TF.scan_partitions(spark, root, ["grp=b"])
    assert got.columns == full_cols
    (row,) = got.collect()
    assert row["id"] == 3 and row["extra"] is None
    # dtype matches the evolved column's type, not a bare null
    assert dict(got.dtypes)["extra"] == dict(
        TF.read_table(spark, root).dtypes
    )["extra"]
    # stats-pruned range scan takes the same path
    rng = TF.scan_files_where(spark, root, "id", lo=3, hi=3)
    assert rng.columns == full_cols
    (r2,) = rng.collect()
    assert r2["id"] == 3 and r2["extra"] is None


def test_scan_partitions_reads_only_manifest_chosen_files(spark, sf_dir, tmp_path):
    """Manifest-planned scan == partition-filtered snapshot read, and the
    executed files all come from the named partitions."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=5, grp="a", val=50.0)]),
        on="id",
    )
    got = TF.scan_partitions(spark, root, ["grp=a"])
    want = TF.read_table(spark, root).where(F.col("grp") == "a")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == TF.read_table(spark, root).columns
    files = {
        r[0]
        for r in TF.scan_partitions(spark, root, ["grp=a"])
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert files and all("grp=a" in f for f in files)
    # empty selection and multi-partition selection
    assert TF.scan_partitions(spark, root, []).count() == 0
    both = TF.scan_partitions(spark, root, ["grp=b", "grp=c"])
    assert {r["grp"] for r in both.collect()} == {"b", "c"}


def test_small_file_partitions_feeds_compact(spark, sf_dir, tmp_path):
    """small_file_partitions plans OPTIMIZE targets from the manifest alone
    and compact_partitions(rels=...) repairs exactly those partitions."""
    root = str(tmp_path / "t")
    many = spark.createDataFrame(
        [Row(id=i, grp="ab"[i % 2], val=float(i)) for i in range(40)]
    ).repartition(6)
    TF.create_table(many, root, partition_by="grp")
    worst = TF.small_file_partitions(root, max_files=1)
    assert set(worst) == {"grp=a", "grp=b"}
    assert TF.small_file_partitions(root, max_files=64) == []
    v = TF.compact_partitions(spark, root, rels=worst)
    assert TF.small_file_partitions(root, max_files=1, version=v) == []
    before = sorted(map(tuple, TF.read_table(spark, root, 1).collect()))
    after = sorted(map(tuple, TF.read_table(spark, root, v).collect()))
    assert before == after
    with pytest.raises(ValueError, match="exactly one"):
        TF.compact_partitions(spark, root, ["a"], rels=["grp=a"])


def test_stream_merge_auto_optimize_repairs_small_files(spark, sf_dir, tmp_path):
    """optimize_every: the streaming merge sink runs manifest-planned
    partition-scoped compaction in-line, so a merge-heavy stream ends with
    <=1 file per hot partition while data still equals batch keep-latest."""
    from cernbox_migration_database_spark import streaming as ST
    from cernbox_migration_database_spark.sources.catalog import load_table
    from pyspark.sql import Window as W2

    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    w = W2.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = lambda df: (
        df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    )
    bucketize = lambda df: df.withColumn(
        "bucket", (F.col("user_id") % 4).cast("int")
    )
    seed = bucketize(latest(ev.where(F.col("user_id") % 2 == 0))).repartition(6)
    root = str(tmp_path / "t")
    TF.create_table(seed, root, partition_by="bucket")
    assert TF.small_file_partitions(root, max_files=1)  # seed IS fragmented
    # the stream touches ONLY bucket 0 — buckets 1-3 carry the fragmented
    # seed layout forward via the hardlink, so maintenance must repair them
    q = TF.stream_merge_into(
        bucketize(
            ST.read_event_stream(spark, sf_dir)
            .select(*cols)
            .where(F.col("user_id") % 4 == 0)
        ),
        root,
        on="user_id",
        order_cols=["ts", "event_id"],
        optimize_every=1,
        optimize_max_files=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert TF.small_file_partitions(root, max_files=1) == []
    actions = [e["action"] for e in TF.history(root)]
    assert "compact_partitions" in actions
    want = {
        r["user_id"]: (r["ts"], r["event_id"])
        for r in latest(ev.where(F.col("user_id") % 2 == 0)).collect()
    }
    got = {
        r["user_id"]: (r["ts"], r["event_id"])
        for r in TF.read_table(spark, root).collect()
    }
    assert got == want


def test_scan_files_where_stats_pruning_and_correctness(spark, sf_dir, tmp_path):
    """File-granularity data skipping: a range-clustered layout gives files
    disjoint manifest bounds, so a narrow range opens few files; results
    stay identical to the full-scan filter, stats survive hardlink carries
    without footer re-reads, and statless columns degrade to IO only."""
    root = str(tmp_path / "t")
    df = (
        spark.range(0, 1000)
        .select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 4).cast("int").alias("grp"),
            (F.col("id") * 2.0).alias("val"),
        )
        .repartitionByRange(8, "id")
    )
    TF.create_table(df, root)
    m = TF.manifest(root)
    assert sum(e["rows"] for e in m) == 1000
    assert all("id" in e["stats"] for e in m)
    got = TF.scan_files_where(spark, root, "id", 100, 140)
    want = TF.read_table(spark, root).where(F.col("id").between(100, 140))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    opened = {
        r[0] for r in got.select(F.input_file_name()).distinct().collect()
    }
    assert 0 < len(opened) < len(m)  # skipped most files
    # half-open ranges
    assert TF.scan_files_where(spark, root, "id", lo=990).count() == 10
    assert TF.scan_files_where(spark, root, "id", hi=9).count() == 10
    with pytest.raises(ValueError, match="lo/hi"):
        TF.scan_files_where(spark, root, "id")


def test_manifest_stats_reuse_requires_matching_mtime(spark, tmp_path):
    """VERDICT r4: the stats-reuse key must include mtime — a rewritten
    file with the same relative path and a coincidentally equal byte size
    must get FRESH stats, never inherit the previous manifest's bounds."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    vdir = os.path.join(root, "_versions", "v00000001")
    real = {e["path"]: e for e in TF.manifest(root, 1)}
    assert all("mtime_ns" in e for e in real.values())

    # same (path, size), POISONED stats, mismatched mtime -> re-read wins
    poisoned = [
        {**e, "stats": {"id": [999999, 999999]}, "mtime_ns": e["mtime_ns"] - 1}
        for e in real.values()
    ]
    TF._write_manifest(vdir, poisoned)
    for e in TF.manifest(root, 1):
        assert e["stats"] == real[e["path"]]["stats"]

    # matching mtime -> the reuse path is taken (poison visibly carried),
    # proving carried files skip the footer read
    poisoned2 = [
        {**e, "stats": {"id": [999999, 999999]}} for e in real.values()
    ]
    TF._write_manifest(vdir, poisoned2)
    try:
        for e in TF.manifest(root, 1):
            assert e["stats"] == {"id": [999999, 999999]}
    finally:
        TF._write_manifest(vdir)  # restore true stats for other assertions

    # legacy manifest entries without mtime_ns are conservatively re-read
    legacy = [
        {k: v for k, v in e.items() if k != "mtime_ns"} | {
            "stats": {"id": [999999, 999999]}
        }
        for e in real.values()
    ]
    TF._write_manifest(vdir, legacy)
    for e in TF.manifest(root, 1):
        assert e["stats"] == real[e["path"]]["stats"]


def test_carry_degrades_to_copy_when_hardlinks_unavailable(
    spark, tmp_path, monkeypatch
):
    """VERDICT r4 item 6: on filesystems without hardlinks (the local
    stand-in for an object store), the carry must degrade to byte-copies —
    correct result, flagged in the commit log as carry_copied_files."""

    def no_link(_s, _d):
        raise OSError("EXDEV: cross-device link simulated")

    monkeypatch.setattr(TF.os, "link", no_link)
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, grp="a", val=99.0)])
    v = TF.merge_into(spark, root, src, on="id", when_not_matched=None)
    monkeypatch.undo()
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root, v).collect()}
    assert got == {1: 99.0, 2: 20.0, 3: 30.0, 4: 40.0}
    entry = TF.history(root)[-1]
    assert entry.get("carry_copied_files", 0) > 0  # b and c carried by copy
    # carried-by-copy files get FRESH manifest stats (mtime changed), and
    # they are still correct
    for e in TF.manifest(root, v):
        assert e["rows"] > 0
    # an ordinary (linking) merge does not flag the commit
    v2 = TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=2, grp="a", val=5.0)]),
        on="id", when_not_matched=None,
    )
    assert "carry_copied_files" not in TF.history(root)[-1]
    got2 = {r["id"]: r["val"] for r in TF.read_table(spark, root, v2).collect()}
    assert got2[2] == 5.0


def test_pooled_stat_gather_identical_to_serial(spark, tmp_path):
    """The fork-pool stat path (taken for >= _STATS_POOL_MIN fresh files)
    must produce byte-identical entries to the serial loop, in order."""
    import glob

    root = str(tmp_path / "t")
    df = spark.range(10_000).selectExpr(
        "id", "cast(id * 1.5 as double) as val", "concat('u', id % 97) as name"
    )
    TF.create_table(df.repartition(80), root)
    vdir = os.path.join(root, "_versions", "v00000001")
    files = sorted(glob.glob(vdir + "/**/*.parquet", recursive=True))
    assert len(files) >= TF._STATS_POOL_MIN  # the pool path is exercised
    assert TF._gather_stats(files) == [TF._file_stats(f) for f in files]
    # and the committed manifest carries real stats for every file
    for e in TF.manifest(root, 1):
        assert e["rows"] > 0 and "id" in e["stats"]


def test_oversize_string_stats_never_recorded_as_bounds(spark, tmp_path):
    """Parquet writers OMIT a min/max value over their stats size cap
    (4096 bytes) and pyarrow surfaces the omitted side as ''. An ''-max
    recorded as a bound would let scan_files_where skip a file whose real
    values sort ABOVE the query range — wrong results. _file_stats must
    drop such bounds; '' stays acceptable as a min (valid lower bound)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # poisoned footer: max omitted ('' surfaced), min kept
    f = str(tmp_path / "poison.parquet")
    pq.write_table(pa.table({"s": ["b" * 10, "z" * 5000], "id": [1, 2]}), f)
    st = pq.ParquetFile(f).metadata.row_group(0).column(0).statistics
    assert st.has_min_max and st.max == ""  # the hazard this test pins
    stats = TF._file_stats(f)["stats"]
    assert "s" not in stats and stats["id"] == [1, 2]
    # genuine empty-string min survives as a (slack but safe) lower bound
    f2 = str(tmp_path / "ok.parquet")
    pq.write_table(pa.table({"s": ["", "b"]}), f2)
    assert TF._file_stats(f2)["stats"]["s"] == ["", "b"]
    # end-to-end: a table holding >4 KiB strings still range-scans exactly
    root = str(tmp_path / "t")
    rows = [Row(id=i, s=chr(97 + i % 26) * 5000) for i in range(20)]
    TF.create_table(spark.createDataFrame(rows).repartition(4), root)
    got = TF.scan_files_where(spark, root, "s", lo="y")
    want = TF.read_table(spark, root).where(F.col("s") >= "y")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_manifest_stats_reused_across_hardlink_carry(spark, sf_dir, tmp_path):
    """Carried files keep identical manifest entries (stats copied from the
    parent manifest, no footer re-read); rewritten partitions get fresh
    entries; an evolved-in column without stats is read everywhere but
    still filters correctly."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    m1 = {e["path"]: e for e in TF.manifest(root, 1)}
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=1, grp="a", val=11.0)]),
        on="id", when_not_matched=None,
    )
    m2 = {e["path"]: e for e in TF.manifest(root, 2)}
    carried = [p for p in m2 if not p.startswith("grp=a")]
    assert carried and all(m2[p] == m1[p] for p in carried)
    assert all(p in m1 for p in carried)
    # evolved column: no stats anywhere -> every file read, result exact
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=9, grp="b", score=0.5)]),
        on="id", evolve_schema=True,
    )
    got = TF.scan_files_where(spark, root, "val", 20.0, 40.0)
    want = TF.read_table(spark, root).where(F.col("val").between(20.0, 40.0))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_shallow_clone_independent_and_zero_copy(spark, sf_dir, tmp_path):
    """SHALLOW CLONE: v1 of the clone hardlinks the source snapshot (inode
    proof), stats manifest carried without footer re-reads, CHECK
    constraints inherited, and merges into either table never affect the
    other."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    TF.create_table(
        _base(spark), src, partition_by="grp",
        checks={"val_nonneg": "val >= 0"},
    )
    TF.merge_into(
        spark, src,
        spark.createDataFrame([Row(id=5, grp="b", val=50.0)]), on="id",
    )
    assert TF.clone_table(src, dst) == 1
    # data identical at clone time
    s0 = sorted(map(tuple, TF.read_table(spark, src).collect()))
    assert sorted(map(tuple, TF.read_table(spark, dst).collect())) == s0
    # zero-copy: same inodes
    src_v = os.path.join(src, "_versions", "v00000002")
    dst_v = os.path.join(dst, "_versions", "v00000001")
    ino = lambda d: {
        f: os.stat(os.path.join(dp, f)).st_ino
        for dp, _dn, fs in os.walk(d) for f in fs if f.endswith(".parquet")
    }
    assert ino(src_v) == ino(dst_v)
    # manifest stats carried (same entries incl. footer stats)
    m_src = {e["path"]: e for e in TF.manifest(src, 2)}
    m_dst = {e["path"]: e for e in TF.manifest(dst, 1)}
    assert m_src == m_dst and all("stats" in e for e in m_dst.values())
    # checks inherited: a violating merge into the clone aborts
    with pytest.raises(ValueError, match="val_nonneg"):
        TF.merge_into(
            spark, dst,
            spark.createDataFrame([Row(id=1, grp="a", val=-1.0)]), on="id",
        )
    # divergence: writes to one never show in the other
    TF.merge_into(
        spark, dst,
        spark.createDataFrame([Row(id=1, grp="a", val=99.0)]), on="id",
    )
    TF.merge_into(
        spark, src,
        spark.createDataFrame([Row(id=2, grp="a", val=77.0)]), on="id",
    )
    got_src = {r["id"]: r["val"] for r in TF.read_table(spark, src).collect()}
    got_dst = {r["id"]: r["val"] for r in TF.read_table(spark, dst).collect()}
    assert got_src[1] == 10.0 and got_src[2] == 77.0
    assert got_dst[1] == 99.0 and got_dst[2] == 20.0
    with pytest.raises(FileExistsError):
        TF.clone_table(src, dst)
    # time-travel clone of the pre-merge snapshot
    old = str(tmp_path / "old")
    TF.clone_table(src, old, version=1)
    assert {r["id"] for r in TF.read_table(spark, old).collect()} == {1, 2, 3, 4}


def test_table_stats_from_manifest(spark, sf_dir, tmp_path):
    """ANALYZE from the sidecar alone: rows/bytes/files, per-partition
    breakdown, and per-column global bounds (None once any file lacks the
    column's stats)."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    st = TF.table_stats(root)
    assert st["rows"] == 4 and st["files"] >= 3 and st["bytes"] > 0
    assert set(st["partitions"]) == {"grp=a", "grp=b", "grp=c"}
    assert st["partitions"]["grp=a"]["rows"] == 2
    assert st["columns"]["id"] == [1, 4]
    assert st["columns"]["val"] == [10.0, 40.0]
    # evolved column: files without 'score' stats -> unknown bounds
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=9, grp="a", score=0.5)]),
        on="id", evolve_schema=True,
    )
    st2 = TF.table_stats(root)
    assert st2["rows"] == 5
    assert st2["columns"]["score"] is None
    assert st2["columns"]["id"] == [1, 9]


def test_compact_partitions_zorder_clusters_rows(spark, sf_dir, tmp_path):
    """Incremental OPTIMIZE ... WHERE ... ZORDER BY: the repaired partition's
    file comes out Morton-sorted (so row-group stats prune on either key),
    data stays byte-identical, and the commit records the clustering."""
    from cernbox_migration_database_spark.operators.layout import Z_BITS, z_value

    root = str(tmp_path / "t")
    rows = [
        Row(id=i, grp="ab"[i % 2], x=(i * 13) % 50, y=(i * 7) % 50)
        for i in range(200)
    ]
    TF.create_table(
        spark.createDataFrame(rows).repartition(5), root, partition_by="grp"
    )
    v = TF.compact_partitions(spark, root, ["a"], zorder=("x", "y"))
    assert TF.history(root)[-1]["zorder"] == ["x", "y"]
    before = sorted(map(tuple, TF.read_table(spark, root, 1).collect()))
    after = sorted(map(tuple, TF.read_table(spark, root, v).collect()))
    assert before == after
    # the single repaired file is sorted by the same scaled Morton value
    adir = os.path.join(root, "_versions", f"v{v:08d}", "grp=a")
    (fname,) = [f for f in os.listdir(adir) if f.endswith(".parquet")]
    fdf = spark.read.parquet(os.path.join(adir, fname))
    lim = (1 << Z_BITS) - 1
    sub = [r for r in rows if r.grp == "a"]
    xlo, xhi = min(r.x for r in sub), max(r.x for r in sub)
    ylo, yhi = min(r.y for r in sub), max(r.y for r in sub)
    sc = lambda c, lo, hi: (
        (F.col(c).cast("long") - F.lit(lo)) * F.lit(lim) / F.lit(hi - lo)
    ).cast("long")
    zs = [
        r[0]
        for r in fdf.select(
            z_value(sc("x", xlo, xhi), sc("y", ylo, yhi)).alias("z")
        ).collect()
    ]
    assert zs == sorted(zs)


def test_vacuum_source_never_breaks_clone(spark, sf_dir, tmp_path):
    """Hardlink reference semantics: vacuuming every old source version
    (and even deleting the whole source table) leaves the clone readable —
    a version dir removal drops one reference, not the shared inodes."""
    import shutil

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    TF.create_table(_base(spark), src, partition_by="grp")
    TF.merge_into(
        spark, src,
        spark.createDataFrame([Row(id=5, grp="d", val=50.0)]), on="id",
    )
    TF.clone_table(src, dst)
    want = sorted(map(tuple, TF.read_table(spark, dst).collect()))
    TF.merge_into(
        spark, src,
        spark.createDataFrame([Row(id=6, grp="e", val=60.0)]), on="id",
    )
    TF.vacuum(src, keep_last=1)
    assert sorted(map(tuple, TF.read_table(spark, dst).collect())) == want
    shutil.rmtree(src)
    assert sorted(map(tuple, TF.read_table(spark, dst).collect())) == want


def test_commit_with_retry_replans_maintenance_after_race(spark, tmp_path, monkeypatch):
    """OPTIMIZE racing ingest: the maintenance op loses the claim to a
    competing merge, and the retry RE-PLANS from the new manifest — the
    partition the merge just rewrote no longer needs compacting, so the
    second attempt repairs only what is still fragmented."""
    root = str(tmp_path / "t")
    many = spark.createDataFrame(
        [Row(id=i, grp="abc"[i % 3], val=float(i)) for i in range(60)]
    ).repartition(4)
    TF.create_table(many, root, partition_by="grp")
    assert set(TF.small_file_partitions(root, max_files=1)) == {
        "grp=a", "grp=b", "grp=c"
    }

    real_claim = TF._claim_version
    state = {"raced": False}

    def racing_claim(r, version):
        if not state["raced"]:
            state["raced"] = True
            # ingest wins: a merge rewrites grp=a (collapsing it) first
            TF.merge_into(
                spark, r,
                spark.createDataFrame([Row(id=0, grp="a", val=999.0)]),
                on="id", when_not_matched=None,
            )
            raise FileExistsError("lost the claim")
        return real_claim(r, version)

    monkeypatch.setattr(TF, "_claim_version", racing_claim)

    def attempt():
        worst = TF.small_file_partitions(root, max_files=1)
        return (
            TF.compact_partitions(spark, root, rels=worst) if worst else None
        )

    v = TF.commit_with_retry(root, attempt, what="optimize")
    monkeypatch.setattr(TF, "_claim_version", real_claim)
    assert v == 3  # merge took v2, the re-planned optimize took v3
    # second attempt compacted only what was STILL fragmented
    assert sorted(TF.history(root)[-1]["touched_partitions"]) == [
        "grp=b", "grp=c"
    ]
    assert TF.small_file_partitions(root, max_files=1) == []
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got[0] == 999.0 and len(got) == 60


def test_mor_delete_rewrites_no_data_files(spark, tmp_path):
    """Merge-on-read DELETE: the commit adds only ``_dv/`` tombstones — the
    data-file set of the new version is IDENTICAL to the base (that is the
    whole point: O(deleted rows) write cost, zero rewrite amplification).
    Readers subtract tombstones; stacked MOR deletes compose; time travel
    and table_stats stay exact."""
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("grp"),
        (F.col("id") * 2).alias("val"),
    )
    root = str(tmp_path / "t")
    TF.create_table(df, root, partition_by="grp")
    TF.delete_where(spark, root, "id % 10 = 1", mode="mor")

    assert {e["path"] for e in TF.manifest(root, 2)} == {
        e["path"] for e in TF.manifest(root, 1)
    }
    assert TF.read_table(spark, root).count() == 180
    assert TF.read_table(spark, root).where("id % 10 = 1").count() == 0
    assert TF.read_table(spark, root, version=1).count() == 200

    TF.delete_where(spark, root, "id % 10 = 2", mode="mor")
    assert TF.read_table(spark, root).count() == 160
    st = TF.table_stats(root)
    assert st["rows"] == 160 and st["deleted_rows"] == 40
    # per-partition counts subtract too (grp carries ids ≡ grp mod 4)
    assert sum(p["rows"] for p in st["partitions"].values()) == 160
    # tombstoned partitions recorded for change-feed pruning: ids ≡ 2
    # (mod 10) land in grp ∈ {0, 2} (id mod 4 alternates 2, 0)
    assert set(TF.history(root)[-1]["touched_partitions"]) == {"grp=0", "grp=2"}
    ch = TF.read_changes(spark, root, "id", 1, 3)
    assert ch.count() == 40
    assert ch.select("_change_type").distinct().collect()[0][0] == "delete"


def test_mor_update_is_delete_plus_append_with_partition_move(spark, tmp_path):
    """Merge-on-read UPDATE: matched rows are tombstoned in place and their
    post-SET images land in freshly APPENDED files — cross-partition SET
    moves land in the destination partition's appended file. SET
    expressions see pre-update values (single projection)."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    base_files = {e["path"] for e in TF.manifest(root, 1)}
    TF.update_where(
        spark, root, "grp = 'a'",
        {"grp": "'z'", "val": "val + id"},  # val reads PRE-update id/val
        mode="mor",
    )
    got = {r["id"]: (r["grp"], r["val"]) for r in TF.read_table(spark, root).collect()}
    assert got == {
        1: ("z", 11.0), 2: ("z", 22.0), 3: ("b", 30.0), 4: ("c", 40.0)
    }
    # every base file carried; appended files add the destination partition
    m2 = {e["path"] for e in TF.manifest(root, 2)}
    assert base_files <= m2
    assert any(p.startswith("grp=z/") for p in m2 - base_files)
    touched = set(TF.history(root)[-1]["touched_partitions"])
    assert touched == {"grp=a", "grp=z"}


def test_mor_merge_equals_cow_merge(spark, tmp_path):
    """Differential: the SAME mixed merge (update two keys, insert two,
    matched_condition gating one, update_set on a value column) committed
    with write_mode='mor' and write_mode='cow' must produce byte-equal
    tables — MOR changes the physical protocol, never the semantics."""
    src = spark.createDataFrame(
        [
            Row(id=1, grp="a", val=100.0),   # matched, passes condition
            Row(id=3, grp="b", val=1.0),     # matched, FAILS condition
            Row(id=9, grp="d", val=90.0),    # insert (new partition)
            Row(id=10, grp="a", val=55.0),   # insert
        ]
    )
    roots = {}
    for mode in ("cow", "mor"):
        root = str(tmp_path / mode)
        TF.create_table(_base(spark), root, partition_by="grp")
        TF.merge_into(
            spark, root, src, on="id",
            matched_condition=lambda t, s: s["val"] > t["val"],
            update_set={"val": lambda t, s: t["val"] + s["val"]},
            write_mode=mode,
        )
        roots[mode] = {
            r["id"]: (r["grp"], r["val"])
            for r in TF.read_table(spark, root).collect()
        }
    assert roots["mor"] == roots["cow"]
    assert roots["mor"][1] == ("a", 110.0)   # gated update applied additively
    assert roots["mor"][3] == ("b", 30.0)    # condition failed → untouched
    assert roots["mor"][9] == ("d", 90.0)


def test_cow_rewrite_retires_only_touched_partition_tombstones(spark, tmp_path):
    """COW after MOR: rewriting partition P materializes P's deletes into
    the rewrite (tombstones retire with the files they reference); OTHER
    partitions keep their tombstones and their carried files. The
    interleaving must stay exact — stale tombstones resurrecting deleted
    rows or dropped tombstones deleting live rows are the failure modes."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("grp"),
        (F.col("id") * 3).alias("val"),
    )
    root = str(tmp_path / "t")
    TF.create_table(df, root, partition_by="grp")
    TF.delete_where(spark, root, "id IN (0, 1, 2, 3)", mode="mor")  # both grps
    # COW update rewrites ONLY grp=0 (even ids)
    TF.update_where(spark, root, "id = 10", {"val": "999"})
    vdir = TF._vdir(root, 3)
    assert os.path.isdir(os.path.join(vdir, "_dv", "grp=1"))  # kept
    assert not os.path.isdir(os.path.join(vdir, "_dv", "grp=0"))  # retired
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert len(got) == 96 and 0 not in got and 1 not in got
    assert got[10] == 999
    counts = TF._dv_counts(vdir)
    assert counts == {"grp=1": 2}
    # compaction of the remaining partition retires the rest
    TF.compact_partitions(spark, root, rels=["grp=1"])
    assert TF._dv_counts(TF._vdir(root, 4)) == {}
    assert TF.read_table(spark, root).count() == 96


def test_mor_merge_schema_evolution(spark, tmp_path):
    """MOR merge with evolve_schema: appended files carry the new column,
    carried files read it as null via footer merging, tombstones still
    subtract correctly from the mixed-schema scan."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=2, grp="a", val=21.0, note="x")])
    TF.merge_into(spark, root, src, on="id", evolve_schema=True, write_mode="mor")
    got = {r["id"]: r["note"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: None, 2: "x", 3: None, 4: None}
    # the pre-merge image of id=2 is tombstoned, not duplicated
    assert TF.read_table(spark, root).where("id = 2").count() == 1


def test_mor_fully_emptied_partition_stays_consistent(spark, tmp_path):
    """A MOR delete that tombstones EVERY row of a partition leaves the
    files in place but the reader must see zero rows from it; a later full
    delete of the whole table via MOR keeps the snapshot readable (the
    files still provide the schema)."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.delete_where(spark, root, "grp = 'a'", mode="mor")
    assert TF.read_table(spark, root).count() == 2
    TF.delete_where(spark, root, "TRUE", mode="mor")
    out = TF.read_table(spark, root)
    assert out.count() == 0
    assert set(out.columns) == {"id", "grp", "val"}


def test_mor_ops_on_zero_file_snapshot(spark, tmp_path):
    """Regression (found by the model-based property test): a COW delete
    that wipes EVERY row leaves a zero-data-file snapshot; a following
    merge-on-read op must synthesize the empty frame from the recorded
    schema instead of failing parquet schema inference — and the MOR
    insert must repopulate the table."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    TF.delete_where(spark, root, "val >= 0")  # COW full wipe
    assert TF.read_table(spark, root).count() == 0
    src = spark.createDataFrame([Row(id=9, grp="z", val=1.0)])
    TF.merge_into(spark, root, src, on="id", write_mode="mor")
    got = TF.read_table(spark, root).collect()
    assert [(r["id"], r["grp"], r["val"]) for r in got] == [(9, "z", 1.0)]
    # MOR delete/update on an (again) empty snapshot are no-op commits
    TF.delete_where(spark, root, "TRUE", mode="mor")
    TF.update_where(spark, root, "val > 0", {"val": "val + 1"}, mode="mor")
    assert TF.read_table(spark, root).count() == 0


def test_drop_column_metadata_only_with_time_travel(spark, tmp_path):
    """Logical DROP COLUMN: metadata-only commit (files carried), the
    column vanishes from reads, pre-drop versions still show it, a full
    compact physically retires it, partition columns are protected, and
    merges after the drop operate on the narrowed schema."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    files_v1 = {e["path"] for e in TF.manifest(root, 1)}
    v2 = TF.drop_column(spark, root, "val")
    assert {e["path"] for e in TF.manifest(root, v2)} == files_v1  # carried
    assert TF.read_table(spark, root).columns == ["id", "grp"]
    assert "val" in TF.read_table(spark, root, version=1).columns
    with pytest.raises(ValueError, match="partition column"):
        TF.drop_column(spark, root, "grp")
    with pytest.raises(ValueError, match="not in table"):
        TF.drop_column(spark, root, "nope")
    # merge on the narrowed schema
    TF.merge_into(
        spark, root,
        spark.createDataFrame([(9, "z")], "id long, grp string"),
        on="id",
    )
    assert {r["id"] for r in TF.read_table(spark, root).collect()} == {
        1, 2, 3, 4, 9,
    }
    # physical retirement at the next full rewrite
    TF.compact(spark, root)
    vdir = TF._vdir(root, TF.current_version(root))
    import pyarrow.parquet as pq

    for dp, dn, fs in os.walk(vdir):
        dn[:] = [d for d in dn if not d.startswith(("_", "."))]
        for f in fs:
            if f.endswith(".parquet"):
                names = pq.ParquetFile(os.path.join(dp, f)).schema_arrow.names
                assert "val" not in names


def test_drop_column_survives_mor_writes(spark, tmp_path):
    """Regression (round-5 advice): a merge-on-read write AFTER a logical
    DROP COLUMN must not resurrect the dropped column. The MOR writers all
    start from _snapshot_with_rowid, which projected the logical columns
    only when they EQUALLED the physical set — after a metadata-only drop
    the physical files are a superset, the projection was skipped, and the
    writer committed the dropped column's name and old data back into the
    log. create(id,p,secret) → drop('secret') → MOR delete/update/merge
    must each keep 'secret' gone, in the live read AND the commit log."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "s1"), (2, "b", "s2"), (3, "a", "s3"), (4, "b", "s4")],
        "id long, p string, secret string",
    )
    TF.create_table(df, root, partition_by="p")
    TF.drop_column(spark, root, "secret")

    TF.delete_where(spark, root, "id = 2", mode="mor")
    out = TF.read_table(spark, root)
    assert out.columns == ["id", "p"]
    assert {r["id"] for r in out.collect()} == {1, 3, 4}

    TF.update_where(spark, root, "id = 3", {"p": "'b'"}, mode="mor")
    out = TF.read_table(spark, root)
    assert out.columns == ["id", "p"]
    assert {(r["id"], r["p"]) for r in out.collect()} == {
        (1, "a"), (3, "b"), (4, "b"),
    }

    TF.merge_into(
        spark, root,
        spark.createDataFrame([(9, "a"), (1, "b")], "id long, p string"),
        on="id", write_mode="mor",
    )
    out = TF.read_table(spark, root)
    assert out.columns == ["id", "p"]
    assert {r["id"] for r in out.collect()} == {1, 3, 4, 9}
    # the commit log must agree with the reads: no entry at-or-after the
    # drop may record the dropped column
    drop_v = next(
        e["version"] for e in TF.history(root) if e["action"] == "drop_column"
    )
    for e in TF.history(root):
        if e["version"] >= drop_v and e.get("columns"):
            assert "secret" not in e["columns"], e


def test_rename_column_metadata_only_mixed_files(spark, tmp_path):
    """Logical RENAME COLUMN: metadata-only commit; a later merge writes
    NEW-name files while carried files keep the old physical name — the
    coalesce mapping reconstructs the logical column exactly across the
    mixed snapshot. CDF across the rename window reports only real row
    changes; restore across the rename keeps the mapping; compact
    materializes the new name physically."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    files_v1 = {e["path"] for e in TF.manifest(root, 1)}
    v2 = TF.rename_column(spark, root, "val", "amount")
    assert {e["path"] for e in TF.manifest(root, v2)} == files_v1  # carried
    got = {r["id"]: r["amount"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
    assert TF.read_table(spark, root).columns == ["id", "grp", "amount"]
    # pre-rename version still shows the old name (time travel)
    assert "val" in TF.read_table(spark, root, version=1).columns

    with pytest.raises(ValueError, match="already exists"):
        TF.rename_column(spark, root, "id", "grp")
    with pytest.raises(ValueError, match="partition column"):
        TF.rename_column(spark, root, "grp", "g2")

    # mixed snapshot: merge writes new-name files into partition 'a';
    # partitions b/c keep old-name files
    src = spark.createDataFrame([Row(id=1, grp="a", amount=11.0)])
    TF.merge_into(spark, root, src, on="id")
    got = {r["id"]: r["amount"] for r in TF.read_table(spark, root).collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0, 4: 40.0}

    # CDF across the rename: only the real update reports
    ch = TF.read_changes(spark, root, "id", 1, TF.current_version(root))
    rows = {(r["id"], r["_change_type"]) for r in ch.collect()}
    assert rows == {(1, "update")}

    # MOR write through the mapping
    TF.delete_where(spark, root, "amount = 30.0", mode="mor")
    assert TF.read_table(spark, root).count() == 3

    # restore to the mixed epoch keeps the mapping
    TF.restore(root, 3)
    assert {r["id"]: r["amount"] for r in TF.read_table(spark, root).collect()} == {
        1: 11.0, 2: 20.0, 3: 30.0, 4: 40.0
    }
    # compact materializes the new physical name everywhere
    TF.compact(spark, root)
    import pyarrow.parquet as pq

    vdir = TF._vdir(root, TF.current_version(root))
    for dp, dn, fs in os.walk(vdir):
        dn[:] = [d for d in dn if not d.startswith(("_", "."))]
        for f in fs:
            if f.endswith(".parquet"):
                names = pq.ParquetFile(os.path.join(dp, f)).schema_arrow.names
                assert "val" not in names and "amount" in names


def test_insert_into_appends_without_rewrite(spark, tmp_path):
    """INSERT INTO: zero rewrite (base file set strictly carried), new
    partitions created on demand, CDF reports the appends as inserts,
    schema mismatch and CHECK violations rejected pre-commit."""
    root = str(tmp_path / "t")
    TF.create_table(
        _base(spark), root, partition_by="grp",
    )
    TF.set_checks(spark, root, {"val_pos": "val > 0"})
    base_files = {e["path"] for e in TF.manifest(root)}
    TF.insert_into(
        spark,
        root,
        spark.createDataFrame(
            [Row(id=9, grp="z", val=9.0), Row(id=10, grp="a", val=1.5)]
        ),
    )
    m = {e["path"] for e in TF.manifest(root)}
    assert base_files < m
    assert any(p.startswith("grp=z/") for p in m - base_files)
    got = {r["id"] for r in TF.read_table(spark, root).collect()}
    assert got == {1, 2, 3, 4, 9, 10}
    ch = TF.read_changes(spark, root, "id", 2, 3)
    assert {(r["id"], r["_change_type"]) for r in ch.collect()} == {
        (9, "insert"), (10, "insert"),
    }
    with pytest.raises(ValueError, match="val_pos"):
        TF.insert_into(
            spark, root, spark.createDataFrame([Row(id=11, grp="a", val=-1.0)])
        )
    with pytest.raises(ValueError, match="columns"):
        TF.insert_into(
            spark, root, spark.createDataFrame([Row(id=12, grp="a")])
        )


def test_write_audit_publish_flow(spark, tmp_path):
    """Write-audit-publish: a merge staged with publish=False is fully
    materialized and auditable by version, INVISIBLE to readers/history/
    CDF until published; publish is one atomic pointer swap; a failed
    audit abandons the stage and releases the version number. Applies to
    both COW and MOR staging."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame([Row(id=1, grp="a", val=-999.0)])
    v = TF.merge_into(
        spark, root, src, on="id", when_not_matched=None, publish=False
    )
    assert v == 2
    # readers and history see ONLY v1
    assert TF.current_version(root) == 1
    assert [e["version"] for e in TF.history(root)] == [1]
    assert TF.read_table(spark, root).where("id = 1").collect()[0]["val"] == 10.0
    # the auditor reads the staged snapshot explicitly
    staged = {r["id"]: r["val"] for r in TF.read_table(spark, root, version=2).collect()}
    assert staged[1] == -999.0
    # audit fails (negative value) → abandon: version number released
    TF.abandon_staged(root, 2)
    assert not os.path.isdir(TF._vdir(root, 2))
    v2 = TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=1, grp="a", val=111.0)]),
        on="id", when_not_matched=None, publish=False, write_mode="mor",
    )
    assert v2 == 2  # the abandoned claim was reusable
    # audit passes → publish: one atomic swap makes it current
    assert TF.publish_staged(root, v2) == 2
    assert TF.current_version(root) == 2
    assert TF.read_table(spark, root).where("id = 1").collect()[0]["val"] == 111.0
    assert [e["version"] for e in TF.history(root)] == [1, 2]
    ch = TF.read_changes(spark, root, "id", 1, 2)
    assert {(r["id"], r["_change_type"]) for r in ch.collect()} == {(1, "update")}
    # double-publish and stale-publish are rejected
    with pytest.raises(FileNotFoundError, match="no staged commit"):
        TF.publish_staged(root, 2)
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=2, grp="a", val=5.0)]),
        on="id", when_not_matched=None, publish=False,
    )
    with pytest.raises(ValueError, match="published; restore instead"):
        TF.abandon_staged(root, 2)
    # a stage whose version DIRECTORY was vacuumed (orphan grace elapsed)
    # must refuse to publish rather than point readers at nothing
    import shutil as _sh

    _sh.rmtree(TF._vdir(root, 3))
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        TF.publish_staged(root, 3)
    assert TF.current_version(root) == 2


def test_set_checks_alter_validate_and_time_travel(spark, tmp_path):
    """ALTER TABLE constraints: set_checks validates the current snapshot
    before committing (an ALTER the data violates must fail), later
    writes enforce the NEW set, dropping a constraint re-permits writes,
    and the constraint set is version-resolved (time travel semantics)."""
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    assert TF.table_checks(root) == {}

    # adding a constraint the existing data violates fails pre-commit
    with pytest.raises(ValueError, match="val_small"):
        TF.set_checks(spark, root, {"val_small": "val < 20"})
    assert TF.current_version(root) == 1  # nothing committed

    v2 = TF.set_checks(spark, root, {"val_pos": "val > 0"})
    assert TF.table_checks(root) == {"val_pos": "val > 0"}
    assert TF.table_checks(root, version=1) == {}

    # the new constraint gates writes through every path
    bad = spark.createDataFrame([Row(id=9, grp="a", val=-1.0)])
    with pytest.raises(ValueError, match="val_pos"):
        TF.merge_into(spark, root, bad, on="id")
    with pytest.raises(ValueError, match="val_pos"):
        TF.merge_into(spark, root, bad, on="id", write_mode="mor")
    with pytest.raises(ValueError, match="val_pos"):
        TF.update_where(spark, root, "id = 1", {"val": "-5.0"})

    # dropping it re-permits; the metadata commit carried data untouched
    TF.set_checks(spark, root, {})
    TF.update_where(spark, root, "id = 1", {"val": "-5.0"})
    assert (
        TF.read_table(spark, root).where("id = 1").collect()[0]["val"] == -5.0
    )
    # set_checks commits are metadata-only for the change feed
    ch = TF.read_changes(spark, root, "id", 1, v2)
    assert ch.count() == 0
    # clone inherits the constraints in effect AT the cloned version
    TF.set_checks(spark, root, {"val_any": "val IS NOT NULL"})
    clone = str(tmp_path / "c")
    TF.clone_table(root, clone)
    with pytest.raises(ValueError, match="val_any"):
        TF.merge_into(
            spark,
            clone,
            spark.createDataFrame(
                [(77, "a", None)], "id long, grp string, val double"
            ),
            on="id",
        )


def test_tombstone_heavy_partitions_feeds_compaction(spark, tmp_path):
    """MOR maintenance trigger: partitions past the tombstone-ratio
    threshold are flagged (sidecar-planned, worst first) and a
    partition-scoped compaction retires exactly their vectors."""
    df = spark.range(100).select(
        "id", (F.col("id") % 2).cast("int").alias("grp"),
        (F.col("id") * 2).alias("val"),
    )
    root = str(tmp_path / "t")
    TF.create_table(df, root, partition_by="grp")
    # grp=0: 40% tombstoned; grp=1: 2% — only grp=0 crosses 10%
    TF.delete_where(spark, root, "grp = 0 AND id % 5 < 2", mode="mor")
    TF.delete_where(spark, root, "id = 1", mode="mor")
    assert TF.tombstone_heavy_partitions(root, max_ratio=0.1) == ["grp=0"]
    assert TF.tombstone_heavy_partitions(root, max_ratio=0.5) == []
    TF.compact_partitions(
        spark, root, rels=TF.tombstone_heavy_partitions(root, max_ratio=0.1)
    )
    assert TF._dv_counts(TF._vdir(root, TF.current_version(root))) == {
        "grp=1": 1
    }
    assert TF.read_table(spark, root).count() == 79
    assert TF.tombstone_heavy_partitions(root, max_ratio=0.1) == []


def test_pruned_scans_apply_partition_scoped_tombstones(spark, tmp_path):
    """Manifest-planned pruned reads on a MOR table must subtract exactly
    the scanned partitions' tombstones (the DV read prunes WITH the scan)
    and stay result-identical to the filtered full read."""
    df = spark.range(60).select(
        "id", (F.col("id") % 3).cast("int").alias("grp"),
        (F.col("id") * 2).alias("val"),
    )
    root = str(tmp_path / "t")
    TF.create_table(df, root, partition_by="grp")
    TF.delete_where(spark, root, "id % 4 = 1", mode="mor")
    want = {
        r["id"]
        for r in TF.read_table(spark, root).where("grp = 2").collect()
    }
    got = {r["id"] for r in TF.scan_partitions(spark, root, ["grp=2"]).collect()}
    assert got == want and got  # non-empty and identical
    # the pruned DV file list is a strict subset of the full one
    vdir = TF._vdir(root, TF.current_version(root))
    assert set(TF._dv_files(vdir, ["grp=2"])) < set(TF._dv_files(vdir))
    # stats-pruned range scan composes with tombstones too
    sw = TF.scan_files_where(spark, root, "id", lo=10, hi=30)
    assert {r["id"] for r in sw.collect()} == {
        r["id"]
        for r in TF.read_table(spark, root).where("id BETWEEN 10 AND 30").collect()
    }


def test_purge_where_physically_removes_bytes(spark, tmp_path):
    """RTBF purge: after purge_where, the purged rows' bytes exist in NO
    remaining version directory — including the case where they were
    previously only TOMBSTONED (merge-on-read), which a logical delete
    alone would leave on disk."""
    root = str(tmp_path / "t")
    df = spark.range(100).select(
        "id",
        (F.col("id") % 4).cast("int").alias("grp"),
        F.concat(F.lit("SECRET-"), F.col("id"), F.lit("-X")).alias("payload"),
    )
    TF.create_table(df, root, partition_by="grp")
    # a MOR delete first: rows masked but bytes still in current files
    TF.delete_where(spark, root, "id = 7", mode="mor")

    def secret_on_disk(needle: bytes) -> bool:
        for dp, _dn, fs in os.walk(os.path.join(root, "_versions")):
            for f in fs:
                if f.endswith(".parquet"):
                    with open(os.path.join(dp, f), "rb") as fh:
                        if needle in fh.read():
                            return True
        return False

    assert secret_on_disk(b"SECRET-7-X")  # MOR delete is logical only

    out = TF.purge_where(spark, root, "id IN (7, 13)", keep_last=1)
    assert not secret_on_disk(b"SECRET-7-X")
    assert not secret_on_disk(b"SECRET-13-X")
    assert secret_on_disk(b"SECRET-14-X")  # untouched rows intact
    assert out["residual_versions"] == []
    got = TF.read_table(spark, root)
    assert got.count() == 98
    assert got.where("id IN (7, 13)").count() == 0


def test_replicate_changes_cdc_replica_converges_and_is_idempotent(
    spark, tmp_path
):
    """CDC replication: a downstream replica built purely from the change
    feed must equal the upstream snapshot after every increment — across
    COW updates, MOR deletes, inserts, and a differently-partitioned
    replica layout. Crash replay (apply without advancing the cursor, then
    re-apply) must converge to the same state (exactly-once via
    idempotent keyed merges + commit-cursor-last)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cursor = str(tmp_path / "cursor")
    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 5).cast("int").alias("grp"),
        (F.col("id") * 7).alias("val"),
    )
    TF.create_table(df, src, partition_by="grp")

    def snap(root):
        return {
            r["id"]: (r["grp"], r["val"])
            for r in TF.read_table(spark, root).collect()
        }

    # bootstrap — replica partitions DIFFERENTLY (by val parity via grp col
    # reuse is fine; just use unpartitioned to prove layout independence)
    n = TF.replicate_changes(spark, src, dst, "id", cursor)
    assert n == 50 and snap(dst) == snap(src)

    # caught up → no-op
    assert TF.replicate_changes(spark, src, dst, "id", cursor) == 0

    # upstream mutations: COW update, MOR delete, merge insert
    TF.update_where(spark, src, "id < 5", {"val": "val + 1000"})
    TF.delete_where(spark, src, "id % 10 = 9", mode="mor")
    TF.merge_into(
        spark, src,
        spark.createDataFrame([(100, 0, 1), (101, 1, 2)], "id long, grp int, val long"),
        on="id",
    )
    n = TF.replicate_changes(spark, src, dst, "id", cursor)
    assert n == 5 + 5 + 2  # 5 updates, 5 deletes, 2 inserts
    assert snap(dst) == snap(src)

    # crash replay: rewind the cursor to simulate a crash after apply but
    # before the cursor commit; re-applying the same delta must be a no-op
    # in effect (replica still equals upstream)
    TF.update_where(spark, src, "id = 10", {"val": "0"})
    pre = TF.cursor_version(cursor)
    TF.replicate_changes(spark, src, dst, "id", cursor)
    TF.commit_cursor(cursor, pre)  # rewind = the crash window
    TF.replicate_changes(spark, src, dst, "id", cursor)
    assert snap(dst) == snap(src)

    # MOR-applied replication: next increment lands as tombstones/appends
    TF.delete_where(spark, src, "id BETWEEN 20 AND 24", mode="cow")
    before = {e["path"] for e in TF.manifest(dst)}
    TF.replicate_changes(spark, src, dst, "id", cursor, write_mode="mor")
    assert snap(dst) == snap(src)
    assert before <= {e["path"] for e in TF.manifest(dst)}  # no dst rewrite


def test_model_based_random_op_sequences_match_dict_oracle(spark, tmp_path):
    """Model-based property test: random sequences of table operations
    (keyed merge upsert / merge delete / predicate delete / restore /
    OPTIMIZE / append-only INSERT / RENAME COLUMN / DROP COLUMN — each
    mutation in BOTH copy-on-write and merge-on-read form where
    applicable, so random interleavings of rewrites, tombstones, appends,
    logical renames, logical drops, compactions and rollbacks are
    exercised; the model tracks the value column's logical NAME so
    rename→restore→rename chains must keep old-name carried files
    readable, and tracks whether the droppable 'extra' column is live so
    drop→MOR-write→restore chains must keep a dropped column dropped and
    a restored one restored) applied to the versioned table AND to a
    plain dict model;
    after every op the committed snapshot must equal the model, and at the
    end EVERY historical version must equal the model's recorded history
    (time travel is part of the contract, not an afterthought)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op = st.one_of(
        st.tuples(
            st.sampled_from(["upsert", "mor_upsert"]),
            st.lists(
                st.tuples(st.integers(0, 14), st.integers(0, 99)),
                min_size=1, max_size=4, unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(
            st.sampled_from(["mdelete", "mor_mdelete"]),
            st.lists(st.integers(0, 14), min_size=1, max_size=3, unique=True),
        ),
        st.tuples(st.sampled_from(["pdelete", "mor_pdelete"]), st.integers(0, 99)),
        st.tuples(st.just("restore"), st.integers(1, 3)),
        st.tuples(st.just("optimize"), st.none()),
        st.tuples(
            st.just("insert"),
            st.lists(
                st.tuples(st.integers(20, 34), st.integers(0, 99)),
                min_size=1, max_size=3, unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(st.just("rename"), st.none()),
        st.tuples(st.just("drop"), st.none()),
    )

    counter = {"n": 0}

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(st.lists(op, min_size=1, max_size=5))
    def run(ops):
        counter["n"] += 1
        root = str(tmp_path / f"t{counter['n']}")
        seed = {i: i * 10 for i in range(0, 8)}
        vcol = "val"  # renames toggle the VALUE column's logical name
        has_extra = True  # the droppable column; its value is always id*100

        def mk(d, col=None):
            col = col or vcol
            if has_extra:
                return spark.createDataFrame(
                    [
                        (k, "ab"[k % 2], v, k * 100)
                        for k, v in sorted(d.items())
                    ],
                    f"id long, grp string, {col} long, extra long",
                )
            return spark.createDataFrame(
                [(k, "ab"[k % 2], v) for k, v in sorted(d.items())],
                f"id long, grp string, {col} long",
            )

        TF.create_table(mk(seed), root, partition_by="grp")
        model = dict(seed)
        hist = {1: (dict(model), vcol, has_extra)}
        for kind, arg in ops:
            if kind in ("upsert", "mor_upsert"):
                TF.merge_into(
                    spark, root,
                    mk({k: v for k, v in arg}), on="id",
                    write_mode="mor" if kind == "mor_upsert" else "cow",
                )
                model.update({k: v for k, v in arg})
            elif kind in ("mdelete", "mor_mdelete"):
                TF.merge_into(
                    spark, root, mk({k: 0 for k in arg}), on="id",
                    when_matched="delete", when_not_matched=None,
                    write_mode="mor" if kind == "mor_mdelete" else "cow",
                )
                for k in arg:
                    model.pop(k, None)
            elif kind in ("pdelete", "mor_pdelete"):
                TF.delete_where(
                    spark, root, f"{vcol} >= {arg}",
                    mode="mor" if kind == "mor_pdelete" else "cow",
                )
                model = {k: v for k, v in model.items() if not v >= arg}
            elif kind == "insert":
                # append-only: only genuinely NEW keys (INSERT has no key
                # semantics — appending an existing key would duplicate)
                rows = {k: v for k, v in arg if k not in model}
                TF.insert_into(spark, root, mk(rows))
                model.update(rows)
            elif kind == "rename":
                new = "v2" if vcol == "val" else "val"
                TF.rename_column(spark, root, vcol, new)
                vcol = new
            elif kind == "drop":
                if has_extra:
                    TF.drop_column(spark, root, "extra")
                    has_extra = False
                else:
                    with pytest.raises(ValueError, match="not in table"):
                        TF.drop_column(spark, root, "extra")
                    continue
            elif kind == "restore":
                v = min(arg, TF.current_version(root))
                if v == TF.current_version(root):
                    with pytest.raises(ValueError, match="already current"):
                        TF.restore(root, v)
                    continue
                TF.restore(root, v)
                model, vcol, has_extra = (
                    dict(hist[v][0]), hist[v][1], hist[v][2]
                )
            else:
                TF.compact(spark, root)
            cur = TF.current_version(root)
            hist[cur] = (dict(model), vcol, has_extra)
            snap_df = TF.read_table(spark, root)
            assert ("extra" in snap_df.columns) == has_extra, (
                f"after {kind}: extra live={has_extra} cols={snap_df.columns}"
            )
            rows = snap_df.collect()
            got = {r["id"]: r[vcol] for r in rows}
            assert got == model, f"after {kind}: {got} != {model}"
            if has_extra:
                assert {r["id"]: r["extra"] for r in rows} == {
                    k: k * 100 for k in model
                }, f"after {kind}: extra values"
        for v, (snap, col, hx) in hist.items():
            df_v = TF.read_table(spark, root, version=v)
            assert ("extra" in df_v.columns) == hx, f"time travel v{v} extra"
            rows = df_v.collect()
            got = {r["id"]: r[col] for r in rows}
            assert got == snap, f"time travel v{v}"
            if hx:
                assert {r["id"]: r["extra"] for r in rows} == {
                    k: k * 100 for k in snap
                }, f"time travel v{v} extra values"

    run()


def test_auto_optimize_repairs_then_noops(spark, tmp_path):
    """auto_optimize: fragmented + tombstone-heavy partitions are planned
    from the sidecars, repaired worst-first under max_targets, history
    vacuums, and a CLEAN table commits nothing (idempotent schedule
    safety). Unpartitioned tables full-compact when past thresholds."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(id=i, grp="abc"[i % 3], val=float(i)) for i in range(60)]
    ).repartition(6)
    TF.create_table(df, root, partition_by="grp")  # 6 files per partition
    # tombstone one partition heavily via MOR delete
    TF.delete_where(spark, root, "grp = 'a' AND id < 30", mode="mor")

    rep = TF.auto_optimize(
        spark, root, max_files=2, max_tombstone_ratio=0.05,
        vacuum_keep_last=2,
    )
    assert rep["targets"] and rep["compacted_version"] == 3
    assert set(rep["vacuumed"]) == {1}
    # every partition now one file, tombstones materialized away
    counts = {}
    for e in TF.manifest(root):
        counts[e["path"].split("/")[0]] = counts.get(e["path"].split("/")[0], 0) + 1
    assert all(n == 1 for n in counts.values())
    assert TF._dv_counts(TF._vdir(root, 3)) == {}
    assert TF.read_table(spark, root).count() == 50

    # clean table: nothing to do, nothing committed
    rep2 = TF.auto_optimize(spark, root, max_files=2, max_tombstone_ratio=0.05)
    assert rep2 == {"targets": [], "compacted_version": None, "vacuumed": []}
    assert TF.current_version(root) == 3

    # unpartitioned: full-compact path
    u = str(tmp_path / "u")
    TF.create_table(spark.range(40).repartition(8), u)
    rep3 = TF.auto_optimize(spark, u, max_files=4)
    assert rep3["targets"] == [""] and rep3["compacted_version"] == 2
    assert len(TF.manifest(u)) <= 4  # at most the trigger threshold
    # idempotent: the repaired table no longer trips its own trigger
    assert TF.auto_optimize(spark, u, max_files=4)["compacted_version"] is None


@pytest.mark.parametrize("seed", [11, 47])
def test_randomized_k_writer_mix_is_linearizable(spark, tmp_path, seed):
    """r11 verdict item 3: the two-party races are proven; compose a
    randomized K-thread writer mix — keyed merges (COW and MOR),
    deletes, OPTIMIZE, VACUUM, and a concurrent branch fork+merge-back —
    against ONE table, asserting a linearizable history (gapless,
    duplicate-free version chain; every committed version distinct) and
    zero lost commits (the final state is exactly the union of every
    thread's last write per key — computable because each thread owns a
    disjoint key namespace)."""
    import random
    import threading

    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    K, ROUNDS = 4, 5
    errors: list[Exception] = []
    committed: dict[int, list[int]] = {t: [] for t in range(K)}
    expected: dict[int, dict[int, float]] = {t: {} for t in range(K)}
    lock = threading.Lock()

    def writer(t: int) -> None:
        try:
            rng = random.Random(seed * 1000 + t)
            mine = expected[t]
            for r in range(ROUNDS):
                op = rng.choices(
                    ["upsert", "delete", "compact", "vacuum"],
                    weights=[6, 2, 1, 1],
                )[0]
                if op == "upsert" or not mine:
                    ks = [1000 * (t + 1) + rng.randrange(8)
                          for _ in range(3)]
                    rows = [(k, "ab"[k % 2], float(100 * r + k % 97))
                            for k in sorted(set(ks))]
                    v = TF.merge_with_retry(
                        spark, root,
                        spark.createDataFrame(
                            rows, "id long, grp string, val double"
                        ),
                        on="id", retries=40,
                        write_mode="mor" if t % 2 else "cow",
                    )
                    committed[t].append(v)
                    for k, _, val in rows:
                        mine[k] = val
                elif op == "delete":
                    # literal source row (no table read): a retried
                    # attempt must not depend on a snapshot VACUUM may
                    # have reclaimed; delete matches on the key alone
                    k = rng.choice(sorted(mine))
                    v = TF.merge_with_retry(
                        spark, root,
                        spark.createDataFrame(
                            [(k, "ab"[k % 2], 0.0)],
                            "id long, grp string, val double",
                        ),
                        on="id", retries=40,
                        when_matched="delete", when_not_matched=None,
                    )
                    committed[t].append(v)
                    mine.pop(k, None)
                elif op == "compact":
                    v = TF.commit_with_retry(
                        root, lambda: TF.compact(spark, root),
                        retries=40, what="compact",
                    )
                    committed[t].append(v)
                else:
                    # headroom >> plausible reader lag: an in-flight
                    # merge plans against a snapshot at most a few
                    # versions behind current
                    TF.vacuum(root, keep_last=12)
            if t == 0:
                # one concurrent branch cycle on a disjoint key range
                br = TF.commit_with_retry(
                    root,
                    lambda: TF.create_branch(root, f"side{seed}"),
                    retries=40, what="branch",
                )
                TF.merge_with_retry(
                    spark, br,
                    spark.createDataFrame(
                        [(5000 + i, "ab"[i % 2], 5000.0 + i)
                         for i in range(4)],
                        "id long, grp string, val double",
                    ),
                    on="id", retries=40,
                )
                TF.commit_with_retry(
                    root,
                    lambda: TF.merge_branch(
                        spark, root, f"side{seed}", key="id"
                    ),
                    retries=40, what="branch-merge",
                )
                with lock:
                    for i in range(4):
                        mine[5000 + i] = 5000.0 + i
        except Exception as e:  # surface into the main thread
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(K)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=900)
    assert not errors, errors

    # zero lost commits: the final state is every thread's last write
    want = {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
    for t in range(K):
        want.update(expected[t])
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    assert got == want

    # linearizable history: one gapless, duplicate-free version chain
    versions = [e["version"] for e in TF.history(root)]
    assert versions == sorted(set(versions))
    assert versions == list(range(versions[0], versions[-1] + 1))
    recorded = [v for vs in committed.values() for v in vs]
    assert len(recorded) == len(set(recorded)), "two ops claimed one version"
    assert set(recorded) <= set(versions)
    # guard against a vacuous pass (writers dying before committing)
    assert len(recorded) >= 2 * K, committed
    assert any(k >= 5000 for k in want), "branch merge-back never landed"
