"""Branch-aware RTBF purge (operators/purge.py purge_table_tree): deletes
propagate to main and every branch, retention of older snapshots is
reported and reclaimable, pinned tags surface as compliance blockers, and
merge-on-read purges are flagged non-physical."""

from __future__ import annotations

import os

import pytest

from cernbox_migration_database_spark.operators import purge as P
from cernbox_migration_database_spark.operators import table_format as T


def _mk(spark, tmp_path, name="tbl"):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, p long, v double"
    )
    T.create_table(df, root, partition_by="p")
    return root


def test_purge_propagates_to_branches_and_reports_retention(spark, tmp_path):
    root = _mk(spark, tmp_path)
    T.create_branch(root, "b1")
    b1 = T.branch_root(root, "b1")
    # b1 diverges: one extra matching row
    T.merge_into(
        spark, b1,
        spark.createDataFrame([(105, 0, 1.0)], "id long, p long, v double"),
        on="id",
    )
    T.create_branch(root, "empty")  # will have zero matches after main purge
    rep = P.purge_table_tree(spark, root, "id % 10 = 5")
    assert rep["physical"] is True
    assert rep["targets"]["main"]["n_deleted"] == 3  # 5, 15, 25
    assert rep["targets"]["branch:b1"]["n_deleted"] == 4  # + id=105
    assert rep["targets"]["branch:empty"]["n_deleted"] == 3
    for name, troot in [("main", root), ("branch:b1", b1)]:
        assert (
            T.read_table(spark, troot).where("id % 10 = 5").count() == 0
        )
        assert rep["retained_versions"][name]  # old snapshots still hold them
    # zero-match second pass: no new commits, retention still reported
    cur = T.current_version(root)
    rep2 = P.purge_table_tree(spark, root, "id % 10 = 5")
    assert rep2["targets"]["main"] == {"n_deleted": 0, "version": None}
    assert T.current_version(root) == cur
    assert rep2["retained_versions"]["main"]  # pre-purge versions remain


def test_purge_vacuum_reclaims_and_tags_block(spark, tmp_path):
    root = _mk(spark, tmp_path)
    T.create_tag(root, "release", version=1)
    rep = P.purge_table_tree(spark, root, "id % 10 = 5", vacuum_after=True)
    # the tag pins v1: reported as a compliance blocker, never auto-deleted
    assert rep["pinned_tags"]["main"] == ["release"]
    assert 1 not in rep["vacuumed"]["main"]
    assert os.path.isdir(T._vdir(root, 1))  # still physically present
    assert T.read_table(spark, root, tag="release").where(
        "id % 10 = 5"
    ).count() == 3
    # release the tag; the next purge pass reclaims the pinned snapshot
    T.delete_tag(root, "release")
    rep2 = P.purge_table_tree(spark, root, "id % 10 = 5", vacuum_after=True)
    assert 1 in rep2["vacuumed"]["main"]
    assert not os.path.isdir(T._vdir(root, 1))
    assert T.read_table(spark, root).where("id % 10 = 5").count() == 0


def test_purge_mor_is_flagged_non_physical(spark, tmp_path):
    root = _mk(spark, tmp_path)
    rep = P.purge_table_tree(spark, root, "id % 10 = 5", mode="mor")
    assert rep["physical"] is False
    assert rep["targets"]["main"]["n_deleted"] == 3
    # logically gone, but the bytes still sit in the current version's
    # files behind deletion vectors until OPTIMIZE
    assert T.read_table(spark, root).where("id % 10 = 5").count() == 0
    vdir = T._vdir(root, T.current_version(root))
    assert os.path.isdir(os.path.join(vdir, "_dv"))


def test_purge_recurses_into_nested_branches(spark, tmp_path):
    """A branch is a full table root, so branches-of-branches exist; the
    purge must walk the WHOLE tree or the nested branch keeps the purged
    rows live (r9 ADVICE)."""
    root = _mk(spark, tmp_path)
    T.create_branch(root, "child")
    child = T.branch_root(root, "child")
    T.create_branch(child, "grandchild")
    gchild = T.branch_root(child, "grandchild")
    rep = P.purge_table_tree(spark, root, "id % 10 = 5")
    assert rep["targets"]["branch:child"]["n_deleted"] == 3
    assert rep["targets"]["branch:child/branch:grandchild"]["n_deleted"] == 3
    assert T.read_table(spark, gchild).where("id % 10 = 5").count() == 0


def test_retained_versions_lists_only_existing_dirs(spark, tmp_path):
    """history() log entries survive vacuum; the compliance report must
    not claim already-reclaimed version dirs still hold the purged rows
    (r9 ADVICE)."""
    root = _mk(spark, tmp_path)
    T.delete_where(spark, root, "id = 1")  # v2
    T.vacuum(root, keep_last=1)  # physically drops v1
    assert not os.path.isdir(T._vdir(root, 1))
    rep = P.purge_table_tree(spark, root, "id % 10 = 5")
    assert 1 not in rep["retained_versions"].get("main", [])
    # the surviving pre-purge version (v2) IS still reported
    assert rep["retained_versions"]["main"] == [2]


def test_purge_mor_compact_after_is_physical(spark, tmp_path):
    """compact_after=True settles the MOR debt in the same call: the
    OPTIMIZE commit materializes the deletion vectors, so the purged
    BYTES leave the current snapshot's data files (asserted by reading
    the raw parquet, bypassing DV subtraction) — r9 verdict item 6."""
    root = _mk(spark, tmp_path)
    T.create_branch(root, "b1")
    rep = P.purge_table_tree(
        spark, root, "id % 10 = 5", mode="mor", compact_after=True
    )
    assert rep["physical"] is True
    assert rep["targets"]["main"]["n_deleted"] == 3
    assert set(rep["compacted"]) == {"main", "branch:b1"}
    for name, troot in [("main", root), ("branch:b1", T.branch_root(root, "b1"))]:
        vdir = T._vdir(troot, T.current_version(troot))
        raw = (
            spark.read.parquet(os.path.join(vdir, "data"))
            if os.path.isdir(os.path.join(vdir, "data"))
            else spark.read.parquet(vdir)
        )
        assert raw.where("id % 10 = 5").count() == 0  # bytes gone
    # second pass: zero matches, nothing committed, nothing re-compacted
    cur = T.current_version(root)
    rep2 = P.purge_table_tree(
        spark, root, "id % 10 = 5", mode="mor", compact_after=True
    )
    assert rep2["targets"]["main"]["n_deleted"] == 0
    assert rep2["compacted"] == {}
    assert T.current_version(root) == cur
