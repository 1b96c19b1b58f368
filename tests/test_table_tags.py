from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from cernbox_migration_database_spark.operators import table_format as TF


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 2).cast("int").alias("p"),
        (F.col("id") * 10).cast("double").alias("v"),
    )
    TF.create_table(df, root, partition_by="p")  # v1
    TF.merge_into(
        spark, root,
        df.where(F.col("id") < 5).withColumn("v", F.lit(0.0)),
        on="id",
    )  # v2
    TF.merge_into(
        spark, root,
        df.where(F.col("id") >= 5).withColumn("v", F.lit(99.0)),
        on="id",
    )  # v3
    return root


def test_tag_resolves_and_reads_pinned_snapshot(spark, table):
    TF.create_tag(table, "rel-1", version=2)
    assert TF.resolve_tag(table, "rel-1") == 2
    got = {
        r.id: r.v for r in TF.read_table(spark, table, tag="rel-1").collect()
    }
    assert got[0] == 0.0 and got[7] == 70.0  # v2 state, not v3


def test_tag_pins_version_across_vacuum(spark, table):
    TF.create_tag(table, "keep", version=1)
    removed = TF.vacuum(table, keep_last=1)
    assert 1 not in removed and 2 in removed
    # the pinned snapshot still reads; the vacuumed one fails loudly
    assert TF.read_table(spark, table, tag="keep").count() == 10
    with pytest.raises(FileNotFoundError):
        TF.read_table(spark, table, version=2).count()
    # dropping the tag releases the pin
    TF.delete_tag(table, "keep")
    removed2 = TF.vacuum(table, keep_last=1)
    assert 1 in removed2


def test_tag_validation_and_immutability(spark, table):
    with pytest.raises(ValueError):
        TF.create_tag(table, "bad name!")
    with pytest.raises(ValueError):
        TF.create_tag(table, "ghost", version=42)
    TF.create_tag(table, "rel", version=2)
    with pytest.raises(FileExistsError):
        TF.create_tag(table, "rel", version=3)
    TF.create_tag(table, "rel", version=3, replace=True)
    assert TF.resolve_tag(table, "rel") == 3
    tags = TF.list_tags(table)
    assert [t["name"] for t in tags] == ["rel"]
    with pytest.raises(KeyError):
        TF.resolve_tag(table, "nope")
    with pytest.raises(ValueError):
        TF.read_table(spark, table, version=1, tag="rel")


def test_untagged_table_lists_empty(spark, tmp_path):
    root = str(tmp_path / "t2")
    TF.create_table(
        spark.range(3).select(F.col("id").cast("int").alias("id")), root
    )
    assert TF.list_tags(root) == []
    assert not os.path.exists(os.path.join(root, "_tags"))
