"""Zero-copy CONVERT of existing parquet into the versioned format."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import table_format as TF


def test_convert_single_file_is_zero_copy_and_fully_featured(
    spark, sf_dir, tmp_path
):
    src = os.path.join(sf_dir, "region.parquet")
    root = str(tmp_path / "t")
    assert TF.convert_to_table(spark, src, root) == 1
    got = sorted(map(tuple, TF.read_table(spark, root).collect()))
    want = sorted(map(tuple, spark.read.parquet(src).collect()))
    assert got == want
    # zero copy: the converted file shares the source inode
    vdir = TF._vdir(root, 1)
    (linked,) = [
        os.path.join(vdir, f) for f in os.listdir(vdir) if f.endswith(".parquet")
    ]
    assert os.stat(linked).st_ino == os.stat(src).st_ino
    # manifest stats landed -> data skipping works immediately
    assert all("rows" in e for e in TF.manifest(root, 1))
    sub = TF.scan_files_where(spark, root, "r_regionkey", lo=1, hi=2)
    assert sub.count() == 2


def test_convert_partitioned_tree_then_merge(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [Row(id=i, grp="ab"[i % 2], val=float(i)) for i in range(20)]
    )
    df.write.partitionBy("grp").parquet(src)
    root = str(tmp_path / "t")
    TF.convert_to_table(spark, src, root)
    ent = TF.history(root)[0]
    assert ent["action"] == "convert" and ent["partition_by"] == "grp"
    assert sorted(map(tuple, TF.read_table(spark, root).collect())) == sorted(
        map(tuple, df.select(*TF.read_table(spark, root).columns).collect())
    )
    # the converted table is a full citizen: COW merge leaves the SOURCE
    # directory untouched (legacy readers keep working)
    before = sorted(map(tuple, spark.read.parquet(src).collect()))
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=1, grp="b", val=111.0)]),
        on="id", when_not_matched=None,
    )
    assert TF.read_table(spark, root).where("id = 1").first()["val"] == 111.0
    assert sorted(map(tuple, spark.read.parquet(src).collect())) == before


def test_convert_rejects_ragged_layout_and_double_convert(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, grp="a")]).write.partitionBy("grp").parquet(
        src
    )
    # a stray non-hive subdir makes the layout ambiguous
    extra = os.path.join(src, "not_hive")
    os.makedirs(extra)
    spark.createDataFrame([Row(id=2)]).write.mode("overwrite").parquet(
        os.path.join(extra, "x.parquet")
    )
    with pytest.raises(ValueError, match="non-hive|inconsistent"):
        TF.convert_to_table(spark, src, str(tmp_path / "t1"))
    ok = os.path.join(sf_dir_file := str(tmp_path / "ok.parquet"))
    spark.createDataFrame([Row(id=1)]).coalesce(1).write.parquet(ok)
    root = str(tmp_path / "t2")
    TF.convert_to_table(spark, ok, root)
    with pytest.raises(FileExistsError):
        TF.convert_to_table(spark, ok, root)
