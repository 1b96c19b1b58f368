"""Table branching (operators/table_format.py, round 9): zero-copy named
branches with fast-forward and rebase merge-back, write-write conflict
detection, crash-idempotent two-phase rebase, and branch isolation."""

from __future__ import annotations

import os

import pytest

from cernbox_migration_database_spark.operators import table_format as T


def _mk(spark, tmp_path, n=12, name="tbl"):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(n)], "id long, p long, v double"
    )
    T.create_table(df, root, partition_by="p")
    return root


def _state(spark, root, version=None):
    return {r.id: r.v for r in T.read_table(spark, root, version).collect()}


def test_branch_is_isolated_and_zero_copy(spark, tmp_path):
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    # zero-copy: the branch's v1 files share inodes with main's snapshot
    main_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _, fs in os.walk(T._vdir(root, 1))
        for f in fs
        if f.endswith(".parquet")
    }
    br_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _, fs in os.walk(T._vdir(br, 1))
        for f in fs
        if f.endswith(".parquet")
    }
    assert br_inodes and br_inodes <= main_inodes
    # writes on the branch are invisible on main (and vice versa)
    T.update_where(spark, br, "id = 3", {"v": "v + 100"})
    T.delete_where(spark, root, "id = 8")
    assert _state(spark, br)[3] == 103.0 and 8 in _state(spark, br)
    assert _state(spark, root)[3] == 3.0 and 8 not in _state(spark, root)
    # a branch is a full table: time travel works on it
    assert _state(spark, br, version=1)[3] == 3.0
    assert [b["name"] for b in T.list_branches(root)] == ["exp"]
    assert T.list_branches(br) == []


def test_fast_forward_merge_hardlinks_and_carries_checks(spark, tmp_path):
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 3", {"v": "v + 100"})
    T.delete_where(spark, br, "id = 7")
    T.set_checks(spark, br, {"v_nonneg": "v >= 0"})
    r = T.merge_branch(spark, root, "exp", key="id")
    assert r == {"mode": "ff", "version": 2}
    got = _state(spark, root)
    assert got[3] == 103.0 and 7 not in got and len(got) == 11
    # FF is a hardlink carry: main's new version shares inodes with the
    # branch head (zero data IO)
    head = T._vdir(br, T.current_version(br))
    head_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _, fs in os.walk(head)
        for f in fs
        if f.endswith(".parquet")
    }
    new_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _, fs in os.walk(T._vdir(root, 2))
        for f in fs
        if f.endswith(".parquet")
    }
    assert new_inodes == head_inodes
    # the branch's constraint state rides the FF commit
    assert T.table_checks(root) == {"v_nonneg": "v >= 0"}
    # and history records the merge as a first-class action
    assert T.history(root)[-1]["action"] == "merge_branch"


def test_rebase_merge_disjoint_keys(spark, tmp_path):
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 0", {"v": "v + 1000"})
    ins = spark.createDataFrame([(99, 0, 9.9)], "id long, p long, v double")
    T.merge_into(spark, br, ins, on="id")
    T.delete_where(spark, br, "id = 11")
    T.update_where(spark, root, "id = 5", {"v": "v + 5"})  # main moves
    r = T.merge_branch(spark, root, "exp", key="id")
    assert r["mode"] == "rebase" and len(r["versions"]) == 2
    got = _state(spark, root)
    assert got[0] == 1000.0 and got[99] == 9.9 and 11 not in got
    assert got[5] == 10.0  # main's independent change survives


def test_rebase_conflict_raises_with_samples(spark, tmp_path):
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 1", {"v": "v + 1"})
    T.update_where(spark, root, "id = 1", {"v": "v + 2"})
    with pytest.raises(T.BranchMergeConflict, match=r"\(1,\)"):
        T.merge_branch(spark, root, "exp", key="id")
    # main untouched by the failed merge
    assert _state(spark, root)[1] == 3.0


def test_rebase_crash_between_phases_resumes_idempotently(
    spark, tmp_path, monkeypatch
):
    """Crash after the delete phase commits but before the upsert phase:
    re-running merge_branch applies ONLY the missing upserts (txn
    markers), converging to the same final state with no double-apply."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.delete_where(spark, br, "id = 2")
    T.update_where(spark, br, "id = 4", {"v": "v + 40"})
    T.update_where(spark, root, "id = 9", {"v": "v + 90"})  # force rebase

    real_merge = T.merge_into
    calls = {"n": 0}

    def crashing(spark_, root_, source, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before upsert phase")
        return real_merge(spark_, root_, source, **kw)

    monkeypatch.setattr(T, "merge_into", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        T.merge_branch(spark, root, "exp", key="id")
    # delete landed, upsert did not
    mid = _state(spark, root)
    assert 2 not in mid and mid[4] == 4.0
    monkeypatch.setattr(T, "merge_into", real_merge)
    r = T.merge_branch(spark, root, "exp", key="id")
    assert r["mode"] == "rebase" and len(r["versions"]) == 1
    got = _state(spark, root)
    assert 2 not in got and got[4] == 44.0 and got[9] == 99.0
    # a third run is a full no-op (the successful merge advanced the
    # branch meta's fork point, so there is nothing left to diff)
    r2 = T.merge_branch(spark, root, "exp", key="id")
    assert r2["mode"] == "noop"
    assert _state(spark, root) == got


def test_merge_unmoved_branch_is_noop_and_schema_divergence_rules(
    spark, tmp_path
):
    root = _mk(spark, tmp_path)
    T.create_branch(root, "idle")
    assert T.merge_branch(spark, root, "idle", key="id")["mode"] == "noop"
    # a schema-changing branch CAN fast-forward: the hardlink commit
    # carries the branch's columns + rename chain, so main adopts them
    br = T.create_branch(root, "ren")
    T.rename_column(spark, br, "v", "val")
    T.update_where(spark, br, "id = 1", {"val": "val + 1"})
    r = T.merge_branch(spark, root, "ren", key="id")
    assert r["mode"] == "ff"
    main_now = T.read_table(spark, root)
    assert main_now.columns == ["id", "p", "val"]
    assert {x.id: x.val for x in main_now.collect()}[1] == 2.0
    # and it can REBASE too (r10): the branch rename carries onto main
    # as a metadata commit and the feed replays under the new name,
    # while main's own post-fork data change survives
    br2 = T.create_branch(root, "ren2")
    T.rename_column(spark, br2, "val", "v2")
    T.update_where(spark, br2, "id = 3", {"v2": "v2 + 1"})
    T.update_where(spark, root, "id = 5", {"val": "val + 5"})
    r2 = T.merge_branch(spark, root, "ren2", key="id")
    assert r2["mode"] == "rebase"
    main2 = T.read_table(spark, root)
    assert main2.columns == ["id", "p", "v2"]
    got = {x.id: x.v2 for x in main2.collect()}
    assert got[3] == 4.0  # branch change, under the renamed column
    assert got[5] == 10.0  # main's independent change survives


def test_merge_conflict_resolution_policies(spark, tmp_path):
    """on_conflict='main-wins' drops the conflicted keys from the branch
    feed; 'branch-wins' replays the branch over main — including
    re-inserting a row main deleted."""
    root = _mk(spark, tmp_path, name="mw")
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 1", {"v": "v + 1"})     # conflicted
    T.update_where(spark, br, "id = 4", {"v": "v + 40"})    # clean
    T.update_where(spark, root, "id = 1", {"v": "v + 2"})   # main's side
    r = T.merge_branch(spark, root, "exp", key="id", on_conflict="main-wins")
    assert r["mode"] == "rebase" and r["conflicts"] == 1
    assert r["resolution"] == "main-wins"
    got = _state(spark, root)
    assert got[1] == 3.0       # main's change survives on the conflict
    assert got[4] == 44.0      # clean branch change still applies

    root2 = _mk(spark, tmp_path, name="bw")
    T.create_branch(root2, "exp")
    b2 = T.branch_root(root2, "exp")
    T.update_where(spark, b2, "id = 1", {"v": "v + 1"})
    T.delete_where(spark, root2, "id = 1")                  # main deletes it
    r2 = T.merge_branch(spark, root2, "exp", key="id", on_conflict="branch-wins")
    assert r2["conflicts"] == 1
    got2 = _state(spark, root2)
    assert got2[1] == 2.0      # branch's post-image re-inserted

    with pytest.raises(ValueError, match="on_conflict"):
        T.merge_branch(spark, root2, "exp", key="id", on_conflict="ours")


def test_create_branch_recovers_from_crashed_fork(spark, tmp_path):
    """A crash between the clone commit and the meta write leaves a
    committed branch root without its ref: create_branch ADOPTS it (the
    clone entry records the fork version); a partial clone (no pointer)
    is replaced; a crashed delete's meta-less orphan is cleanable."""
    root = _mk(spark, tmp_path)
    broot = os.path.join(root, "_branches", "exp")
    # crashed fork: clone committed, meta never written
    T.clone_table(root, broot, 1)
    assert T.list_branches(root) == []  # invisible without the ref
    got = T.create_branch(root, "exp")
    assert got == broot
    assert T.list_branches(root)[0]["base_version"] == 1
    # adopting under a DIFFERENT requested version refuses
    T.delete_branch(root, "exp")
    T.delete_where(spark, root, "id = 0")  # main at v2 now
    T.clone_table(root, broot, 1)
    with pytest.raises(FileExistsError, match="crashed fork"):
        T.create_branch(root, "exp", version=2)
    T.delete_branch(root, "exp")  # orphan cleanup path
    # partial clone (no pointer): replaced by a fresh fork
    os.makedirs(os.path.join(broot, "_versions", "v00000001.staging"))
    br = T.create_branch(root, "exp")
    assert T.current_version(br) == 1
    assert 0 not in _state(spark, br)  # forked from CURRENT main (v2)


def test_delete_branch_crash_leaves_no_live_looking_ref(spark, tmp_path):
    root = _mk(spark, tmp_path)
    T.create_branch(root, "exp")
    # simulate the crash AFTER the meta removal, BEFORE the rmtree
    os.remove(os.path.join(root, "_branches", "exp", "_branch.json"))
    assert T.list_branches(root) == []
    with pytest.raises(KeyError):
        T.branch_root(root, "exp")
    T.delete_branch(root, "exp")  # cleans the orphan dir
    assert not os.path.isdir(os.path.join(root, "_branches", "exp"))


def test_branch_survives_main_vacuum_and_vice_versa(spark, tmp_path):
    """Retention on either side never breaks the other: vacuuming main
    down past the fork point leaves the branch fully readable (hardlinked
    inodes live until their last referent), and vacuuming the branch
    leaves main untouched."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    # advance main twice so the fork-point version ages out of retention
    T.update_where(spark, root, "id = 1", {"v": "v + 1"})
    T.update_where(spark, root, "id = 2", {"v": "v + 2"})
    removed = T.vacuum(root, keep_last=1)
    assert 1 in removed  # the fork-point snapshot is gone from MAIN
    assert _state(spark, br)[1] == 1.0  # branch v1 still reads exactly
    T.update_where(spark, br, "id = 3", {"v": "v + 3"})
    assert T.vacuum(br, keep_last=1) == [1]
    assert _state(spark, root)[3] == 3.0  # main unaffected


def test_branch_admin_edges(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="invalid branch name"):
        T.create_branch(root, "bad/name")
    T.create_branch(root, "exp")
    with pytest.raises(FileExistsError):
        T.create_branch(root, "exp")
    with pytest.raises(KeyError, match="no branch"):
        T.branch_root(root, "ghost")
    with pytest.raises(KeyError, match="no branch"):
        T.delete_branch(root, "ghost")
    T.delete_branch(root, "exp")
    assert T.list_branches(root) == []
    # branching a historical version pins the fork point
    T.delete_where(spark, root, "id = 0")
    br = T.create_branch(root, "old", version=1)
    assert 0 in _state(spark, br)


def test_delete_branch_rejects_escaping_names(spark, tmp_path):
    """delete_branch must apply the same name gate as create_branch: a
    name with '/' or '..' would resolve outside _branches/ and rmtree
    the table root itself (r9 ADVICE)."""
    root = _mk(spark, tmp_path)
    T.create_branch(root, "exp")
    for bad in ("..", "../..", "a/../..", "exp/../../_versions"):
        with pytest.raises(ValueError, match="invalid branch name"):
            T.delete_branch(root, bad)
    # table intact, branch intact
    assert T.current_version(root) == 1
    assert [b["name"] for b in T.list_branches(root)] == ["exp"]


def test_merge_branch_twice_advances_fork_point(spark, tmp_path):
    """A kept branch that commits again after a merge must re-merge
    cleanly: without advancing base_version/feed_base the second merge
    diffs from the ORIGINAL fork and sees its own merged keys in main's
    feed as write-write conflicts (r9 ADVICE)."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 0", {"v": "v + 1000"})
    T.update_where(spark, root, "id = 5", {"v": "v + 5"})  # force rebase
    r1 = T.merge_branch(spark, root, "exp", key="id")
    assert r1["mode"] == "rebase"
    # branch keeps working: a NEW change on a previously merged key
    T.update_where(spark, br, "id = 0", {"v": "v + 1"})
    r2 = T.merge_branch(spark, root, "exp", key="id")  # must not conflict
    assert r2["mode"] == "rebase"
    assert _state(spark, root)[0] == 1001.0
    # and with no further branch commits, a third merge is a no-op
    assert T.merge_branch(spark, root, "exp", key="id")["mode"] == "noop"


def test_merge_branch_twice_after_ff(spark, tmp_path):
    """Same discipline on the fast-forward path: after an FF merge the
    branch meta advances, so the next merge diffs only the new branch
    commits (and fast-forwards again if main hasn't moved since)."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 3", {"v": "v + 100"})
    r1 = T.merge_branch(spark, root, "exp", key="id")
    assert r1["mode"] == "ff"
    T.update_where(spark, br, "id = 3", {"v": "v + 1"})
    r2 = T.merge_branch(spark, root, "exp", key="id")
    assert r2["mode"] in ("ff", "rebase")
    assert _state(spark, root)[3] == 104.0


def test_rebase_with_main_side_rename(spark, tmp_path):
    """Main renamed a column after the fork; the branch's feed (fork
    names) must map forward through MAIN's rename chain."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 2", {"v": "v + 20"})
    T.rename_column(spark, root, "v", "val")
    T.update_where(spark, root, "id = 7", {"val": "val + 70"})
    r = T.merge_branch(spark, root, "exp", key="id")
    assert r["mode"] == "rebase"
    main = T.read_table(spark, root)
    assert main.columns == ["id", "p", "val"]
    got = {x.id: x.val for x in main.collect()}
    assert got[2] == 22.0 and got[7] == 77.0


def test_rebase_with_branch_added_column_evolves_main(spark, tmp_path):
    """A column added on the branch lands on main via merge schema
    evolution; pre-existing main rows read it as null."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    add = spark.createDataFrame(
        [(100, 0, 1.0, "x"), (101, 1, 2.0, "y")],
        "id long, p long, v double, tag string",
    )
    T.merge_into(spark, br, add, on="id", evolve_schema=True)
    T.update_where(spark, root, "id = 5", {"v": "v + 5"})  # main moves
    r = T.merge_branch(spark, root, "exp", key="id")
    assert r["mode"] == "rebase"
    main = T.read_table(spark, root)
    assert "tag" in main.columns
    rows = {x.id: x for x in main.collect()}
    assert rows[100].tag == "x" and rows[101].tag == "y"
    assert rows[1].tag is None and rows[5].v == 10.0


def test_rebase_with_branch_dropped_column(spark, tmp_path):
    """A drop on the branch carries onto main as a metadata commit; the
    replay is a partial-schema feed (main keeps what the feed omits)."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.drop_column(spark, br, "v")
    T.update_where(spark, br, "id = 4", {"p": "p + 10"})
    T.merge_into(
        spark, root,
        spark.createDataFrame([(200, 2, 9.0)], "id long, p long, v double"),
        on="id",
    )  # main moves
    r = T.merge_branch(spark, root, "exp", key="id")
    assert r["mode"] == "rebase"
    main = T.read_table(spark, root)
    assert main.columns == ["id", "p"]
    got = {x.id: x.p for x in main.collect()}
    assert got[4] == 11 and 200 in got


def test_rebase_conflicting_renames_raise(spark, tmp_path):
    """The same fork column renamed differently on both sides is a
    write-write conflict on the schema — no on_conflict policy can
    resolve it row-wise."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.rename_column(spark, br, "v", "v_branch")
    T.update_where(spark, br, "id = 1", {"v_branch": "v_branch + 1"})
    T.rename_column(spark, root, "v", "v_main")
    with pytest.raises(T.BranchMergeConflict, match="renamed fork column"):
        T.merge_branch(spark, root, "exp", key="id", on_conflict="branch-wins")
    # main untouched by the refused merge
    assert T.read_table(spark, root).columns == ["id", "p", "v_main"]


def test_rebase_main_dropped_column_wins(spark, tmp_path):
    """Main dropped a column the branch still carries: the drop wins and
    the branch feed's values for it are stripped."""
    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    T.update_where(spark, br, "id = 6", {"v": "v + 60"})
    T.drop_column(spark, root, "v")
    T.update_where(spark, root, "id = 8", {"p": "p + 8"})
    r = T.merge_branch(spark, root, "exp", key="id")
    assert r["mode"] == "rebase"
    main = T.read_table(spark, root)
    assert main.columns == ["id", "p"]
    assert {x.id for x in main.collect()} == set(range(12))


def test_ff_crash_before_meta_write_heals(spark, tmp_path):
    """Crash between the FF's commit and the branch-meta write: a re-run
    must ADOPT the committed FF (mode='ff', healed) instead of taking
    the rebase path and conflicting with its own merge commit."""
    import json

    root = _mk(spark, tmp_path)
    br = T.create_branch(root, "exp")
    mpath = T._branch_meta_path(root, "exp")
    with open(mpath, encoding="utf-8") as fh:
        pre_meta = fh.read()
    T.update_where(spark, br, "id = 3", {"v": "v + 100"})
    r1 = T.merge_branch(spark, root, "exp", key="id")
    assert r1["mode"] == "ff"
    got = _state(spark, root)
    # simulate the crash: the merge committed but the meta write was lost
    with open(mpath, "w", encoding="utf-8") as fh:
        fh.write(pre_meta)
    r2 = T.merge_branch(spark, root, "exp", key="id")
    assert r2["mode"] == "ff" and r2.get("healed") is True
    assert _state(spark, root) == got  # nothing re-applied
    assert T.merge_branch(spark, root, "exp", key="id")["mode"] == "noop"
