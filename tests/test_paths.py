"""Path function parity with Go's path package semantics (main.go:141-146,278-279)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark.functions.paths import (
    path_base,
    path_clean,
    path_dir,
    path_parent_name,
    versions_path,
)


def _eval(spark, col, rows):
    df = spark.createDataFrame([(r,) for r in rows], ["p"])
    return [r[0] for r in df.select(col).collect()]


def test_path_base(spark):
    got = _eval(spark, path_base("p"), ["/a/b/c.txt", "/a", "name", "/a/b/.sys.v#.f"])
    assert got == ["c.txt", "a", "name", ".sys.v#.f"]


def test_path_dir(spark):
    got = _eval(spark, path_dir("p"), ["/a/b/c.txt", "/a", "name", "/eos/u/x/f"])
    assert got == ["/a/b", "/", ".", "/eos/u/x"]


def test_path_clean(spark):
    got = _eval(spark, path_clean("p"), ["//a//b/", "/a/b", "/", "a//b"])
    assert got == ["/a/b", "/a/b", "/", "a/b"]


def test_parent_name(spark):
    got = _eval(spark, path_parent_name("p"), ["/a/b/c.txt", "/eos/u/.sys.v#.d/f"])
    assert got == ["b", ".sys.v#.d"]


def test_versions_path(spark):
    got = _eval(
        spark,
        versions_path("p"),
        ["/eos/user/j/jdoe/file.txt", "/f.txt", "/a/my doc.txt"],
    )
    assert got == [
        "/eos/user/j/jdoe/.sys.v#.file.txt",
        "/.sys.v#.f.txt",
        "/a/.sys.v#.my doc.txt",
    ]
