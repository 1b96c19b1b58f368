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
    assert TF.history(root)[-1]["touched_partitions"] == ["a", "d"]


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
