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


def test_branch_tree_random_op_property(spark, tmp_path):
    """r10 verdict item 6: purge propagation, vacuum tag-pins, tags, and
    the maintenance planner were each hand-tested on branch trees but
    never COMPOSED — this drives random op sequences over a depth-2 tree
    (main -> b1 -> b2) against a per-target dict model, the
    test_table_format model-based discipline. Invariants after every op:
    each target's current snapshot equals its model; every tagged version
    directory still physically exists (a tag is a reproducibility
    promise no vacuum may break); purge reports count exactly what the
    models say each target held; apply_maintenance never changes
    contents and is idempotent."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cernbox_migration_database_spark.operators import (
        maintenance as MN,
    )

    op = st.one_of(
        st.tuples(
            st.just("upsert"),
            st.integers(0, 2),
            st.lists(
                st.tuples(st.integers(0, 19), st.integers(1, 99)),
                min_size=1, max_size=3, unique_by=lambda t: t[0],
            ),
            st.sampled_from(["cow", "mor"]),
        ),
        st.tuples(
            st.just("delete"),
            st.integers(0, 2),
            st.integers(0, 19),
            st.sampled_from(["cow", "mor"]),
        ),
        st.tuples(st.just("tag"), st.integers(0, 2)),
        st.tuples(
            st.just("purge"),
            st.integers(0, 19),
            st.sampled_from(["cow", "mor"]),
            st.booleans(),  # vacuum_after
            st.booleans(),  # compact_after
        ),
        st.tuples(st.just("maintain"), st.none()),
    )

    counter = {"n": 0}

    def mk(d):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(d.items())], "id long, v long"
        )

    @settings(
        max_examples=4, deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow, HealthCheck.data_too_large,
        ],
    )
    @given(st.lists(op, min_size=2, max_size=5))
    def run(ops):
        counter["n"] += 1
        root = str(tmp_path / f"pt{counter['n']}")
        seed = {i: i * 10 for i in range(10)}
        T.create_table(mk(seed), root)
        b1 = T.create_branch(root, "b1")
        # b1 diverges before its own child forks, so the three targets
        # carry genuinely different histories
        T.merge_into(spark, b1, mk({50: 1}), on="id")
        b2 = T.create_branch(b1, "b2")
        names = ["main", "b1", "b2"]
        roots = {"main": root, "b1": b1, "b2": b2}
        models = {
            "main": dict(seed),
            "b1": {**seed, 50: 1},
            "b2": {**seed, 50: 1},
        }
        tags = {n: [] for n in names}
        tagn = {"n": 0}

        def check():
            for n in names:
                got = {
                    r["id"]: r["v"]
                    for r in T.read_table(spark, roots[n]).collect()
                }
                assert got == models[n], (n, got, models[n])
                for v in tags[n]:
                    assert os.path.isdir(T._vdir(roots[n], v)), (n, v)

        for kind, *arg in ops:
            if kind == "upsert":
                t, rows, mode = arg
                n = names[t]
                T.merge_into(
                    spark, roots[n], mk(dict(rows)), on="id",
                    write_mode=mode,
                )
                models[n].update(dict(rows))
            elif kind == "delete":
                t, k, mode = arg
                n = names[t]
                if k in models[n]:
                    T.delete_where(spark, roots[n], f"id = {k}", mode=mode)
                    models[n].pop(k)
            elif kind == "tag":
                n = names[arg[0]]
                tagn["n"] += 1
                v = T.current_version(roots[n])
                T.create_tag(roots[n], f"tg{tagn['n']}", version=v)
                tags[n].append(v)
            elif kind == "purge":
                k, mode, vac, comp = arg
                rep = P.purge_table_tree(
                    spark, root, f"id = {k}", mode=mode,
                    vacuum_after=vac, compact_after=comp,
                    orphan_grace_s=0.0,
                )
                label = {
                    "main": "main",
                    "b1": "branch:b1",
                    "b2": "branch:b1/branch:b2",
                }
                for n in names:
                    want = 1 if k in models[n] else 0
                    assert (
                        rep["targets"][label[n]]["n_deleted"] == want
                    ), (n, k, rep["targets"])
                    models[n].pop(k, None)
                    # every retained version the report names must exist
                    for v in rep["retained_versions"].get(label[n], []):
                        assert os.path.isdir(T._vdir(roots[n], v))
            elif kind == "maintain":
                plan = MN.plan_maintenance(root)
                MN.apply_maintenance(spark, root, plan)
                res2 = MN.apply_maintenance(spark, root)
                for n, out in res2.items():
                    assert out["compacted"] is None, (n, out)
            check()

    run()
