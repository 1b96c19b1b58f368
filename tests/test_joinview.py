"""Incrementally-maintained join views (operators/joinview.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import joinview as JV
from cernbox_migration_database_spark.operators import table_format as TF


def _a(spark):
    # oid is the (unique) CDF key; oid 5 and 12 collapse onto the same
    # PROJECTED view tuple (k=1, amt=50.0) -> bag multiplicity 2
    rows = [Row(oid=i, k=i % 4, amt=float(10 * i)) for i in range(12)]
    rows.append(Row(oid=12, k=1, amt=50.0))
    return spark.createDataFrame(rows)


def _b(spark):
    return spark.createDataFrame(
        [Row(k=i, seg=chr(97 + i)) for i in range(4)]
    )


def _recompute(spark, a_root, b_root):
    return (
        TF.read_table(spark, a_root)
        .select("k", "amt")
        .join(TF.read_table(spark, b_root).select("k", "seg"), "k")
    )


def _rows(df):
    return sorted(map(tuple, df.select("k", "amt", "seg").collect()))


@pytest.fixture()
def roots(spark, tmp_path):
    a_root, b_root, mv = (
        str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "mv")
    )
    TF.create_table(_a(spark), a_root)
    TF.create_table(_b(spark), b_root)
    JV.create_join_view(
        spark, a_root, b_root, mv,
        on="k", a_key="oid", b_key="k",
        a_cols=["amt"], b_cols=["seg"],
    )
    return a_root, b_root, mv


def test_create_matches_full_join_with_multiplicities(spark, roots):
    a_root, b_root, mv = roots
    got = JV.read_join_view(spark, mv, expand=True)
    assert _rows(got) == _rows(_recompute(spark, a_root, b_root))
    dup = (
        JV.read_join_view(spark, mv)
        .where((F.col("k") == 1) & (F.col("amt") == 50.0))
        .collect()
    )
    assert len(dup) == 1 and dup[0]["n_dup"] == 2


def test_refresh_tracks_both_sides_and_key_changes(spark, roots):
    a_root, b_root, mv = roots
    # A: delete, insert, and an update that MOVES a row's join key
    TF.delete_where(spark, a_root, F.col("oid") % 5 == 0)
    TF.merge_into(
        spark, a_root,
        spark.createDataFrame([Row(oid=7, k=2, amt=777.0)]),  # was k=3
        on="oid", when_not_matched=None,
    )
    TF.merge_into(
        spark, a_root,
        spark.createDataFrame([Row(oid=100, k=3, amt=1.5)]),
        on="oid", when_matched=None,
    )
    # B: delete one dim row (its joined rows must vanish), update another
    TF.delete_where(spark, b_root, F.col("k") == 2)
    TF.merge_into(
        spark, b_root,
        spark.createDataFrame([Row(k=3, seg="Z")]),
        on="k", when_not_matched=None,
    )
    JV.refresh_join_view(spark, mv)
    got = JV.read_join_view(spark, mv, expand=True)
    assert _rows(got) == _rows(_recompute(spark, a_root, b_root))
    # a second refresh with no base movement is a no-op version-wise
    v = TF.current_version(mv)
    JV.refresh_join_view(spark, mv)
    assert TF.current_version(mv) == v


def test_multiplicity_decrement_and_prune_to_zero(spark, roots):
    a_root, b_root, mv = roots
    # drop ONE of the two base rows behind the n_dup=2 tuple
    TF.delete_where(spark, a_root, F.col("oid") == 12)
    JV.refresh_join_view(spark, mv)
    dup = (
        JV.read_join_view(spark, mv)
        .where((F.col("k") == 1) & (F.col("amt") == 50.0))
        .collect()
    )
    assert len(dup) == 1 and dup[0]["n_dup"] == 1
    assert _rows(JV.read_join_view(spark, mv, expand=True)) == _rows(
        _recompute(spark, a_root, b_root)
    )
    # now delete every k=1 order: the view's k=1 tuples prune to zero rows
    TF.delete_where(spark, a_root, F.col("k") == 1)
    JV.refresh_join_view(spark, mv)
    assert JV.read_join_view(spark, mv).where(F.col("k") == 1).isEmpty()
    assert _rows(JV.read_join_view(spark, mv, expand=True)) == _rows(
        _recompute(spark, a_root, b_root)
    )


def test_double_apply_raises_instead_of_corrupting(spark, roots):
    a_root, b_root, mv = roots
    TF.delete_where(spark, a_root, F.col("oid") == 3)
    JV.refresh_join_view(spark, mv)
    # simulate a second maintainer replaying the same window
    sp = os.path.join(mv, JV._STATE)
    st = json.load(open(sp))
    st["a_version"] -= 1
    json.dump(st, open(sp, "w"))
    with pytest.raises(ValueError, match="negative multiplicity"):
        JV.refresh_join_view(spark, mv)


def test_crash_between_fold_commit_and_state_write_is_recovered(spark, roots):
    """ADVICE r6 (medium): an insert-only window replayed after a crash
    between the additive merge commit and the state-file write used to
    silently double n_dup (no negative to trip). The fold commit's txn
    marker + recorded window now make the replay a recovered no-op."""
    a_root, b_root, mv = roots
    sp = os.path.join(mv, JV._STATE)
    before = open(sp).read()
    # insert-only change: one more base row behind the (k=1, amt=50.0)
    # tuple -> its multiplicity becomes 3; a double-apply would make it 4
    TF.merge_into(
        spark, a_root,
        spark.createDataFrame([Row(oid=200, k=1, amt=50.0)]),
        on="oid", when_matched=None,
    )
    JV.refresh_join_view(spark, mv)
    # simulate the crash: the fold commit landed, the state write did not
    open(sp, "w").write(before)
    JV.refresh_join_view(spark, mv)  # replayed window -> recovery, no fold
    dup = (
        JV.read_join_view(spark, mv)
        .where((F.col("k") == 1) & (F.col("amt") == 50.0))
        .collect()
    )
    assert len(dup) == 1 and dup[0]["n_dup"] == 3  # not 4
    assert _rows(JV.read_join_view(spark, mv, expand=True)) == _rows(
        _recompute(spark, a_root, b_root)
    )
    assert json.load(open(sp))["fold_seq"] == 1
    # and the view keeps advancing normally after recovery
    TF.delete_where(spark, a_root, F.col("oid") == 200)
    JV.refresh_join_view(spark, mv)
    assert _rows(JV.read_join_view(spark, mv, expand=True)) == _rows(
        _recompute(spark, a_root, b_root)
    )
    assert json.load(open(sp))["fold_seq"] == 2


def test_crash_recovery_with_delete_window_does_not_false_positive(
    spark, roots
):
    """A replayed DELETE window must not trip the negative-multiplicity
    check after recovery (pre-fix it raised; the correct outcome is a
    no-op)."""
    a_root, b_root, mv = roots
    sp = os.path.join(mv, JV._STATE)
    before = open(sp).read()
    TF.delete_where(spark, a_root, F.col("oid") == 3)
    JV.refresh_join_view(spark, mv)
    open(sp, "w").write(before)
    JV.refresh_join_view(spark, mv)  # must NOT raise
    assert _rows(JV.read_join_view(spark, mv, expand=True)) == _rows(
        _recompute(spark, a_root, b_root)
    )


def test_crash_recovery_with_further_movement_prunes_crashed_window(
    spark, roots, monkeypatch
):
    """ADVICE r8 (medium): a replayed refresh that adopts a committed
    window (recovered=True) while the bases have ALSO moved further used
    to run its prune with touched=this-fold's-delta only — so zero-
    multiplicity rows from the CRASHED window (whose prune never ran)
    escaped pruning forever and non-expand reads served phantom n_dup=0
    tuples. A recovered refresh must pay the full-view pass on the
    moved-further path too."""
    a_root, b_root, mv = roots
    sp = os.path.join(mv, JV._STATE)
    before = open(sp).read()
    # window 1: delete every k=1 base row -> its view tuples fold to 0
    TF.delete_where(spark, a_root, F.col("k") == 1)
    # simulate dying between the fold commit and BOTH the prune and the
    # state write: the commit lands, zero rows stay physical
    monkeypatch.setattr(JV, "_check_and_prune", lambda *a, **k: None)
    JV.refresh_join_view(spark, mv)
    monkeypatch.undo()
    open(sp, "w").write(before)
    zeros = TF.read_table(spark, mv).where(F.col("n_dup") == 0)
    assert not zeros.isEmpty()  # the crashed window left phantoms
    # the bases move FURTHER before the replay (k=3 insert: its delta
    # cannot touch the k=1 phantoms)
    TF.merge_into(
        spark, a_root,
        spark.createDataFrame([Row(oid=300, k=3, amt=3.25)]),
        on="oid", when_matched=None,
    )
    JV.refresh_join_view(spark, mv)  # recovery + further movement
    assert TF.read_table(spark, mv).where(F.col("n_dup") == 0).isEmpty()
    assert JV.read_join_view(spark, mv).where(F.col("n_dup") == 0).isEmpty()
    assert _rows(JV.read_join_view(spark, mv, expand=True)) == _rows(
        _recompute(spark, a_root, b_root)
    )


def test_check_and_prune_is_delta_scoped(spark, roots):
    """ADVICE r7: the post-fold invariant check regressed to a full-view
    aggregate per refresh. It must be scoped to the fold's touched rows —
    pinned here by planting an (invalid) negative multiplicity on an
    UNTOUCHED tuple: a refresh whose delta doesn't touch it must not see
    it (delta-scoped => no raise), while the crash-recovery full pass
    (touched=None) still does."""
    a_root, b_root, mv = roots
    # corrupt one settled row directly in the view's storage
    victim = TF.read_table(spark, mv).where(
        (F.col("k") == 2) & (F.col("amt") == 20.0)
    ).withColumn("n_dup", F.lit(-5).cast("long"))
    TF.merge_into(
        spark, mv, victim, on="__row",
        update_set={"n_dup": lambda t, s: s["n_dup"]},
        when_not_matched=None, check_cardinality=False,
    )
    # a fold touching only k=3 tuples must not scan the corrupt k=2 row
    TF.merge_into(
        spark, a_root,
        spark.createDataFrame([Row(oid=100, k=3, amt=999.0)]),
        on="oid",
    )
    JV.refresh_join_view(spark, mv)  # delta-scoped: no raise
    # the recovery-branch full pass still surfaces the corruption
    with pytest.raises(ValueError, match="negative multiplicity"):
        JV._check_and_prune(spark, mv, touched=None)
