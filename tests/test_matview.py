"""Incremental aggregate-view maintenance from the versioned-table CDF."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import matview as MV
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


def _view_dict(spark, mv_root):
    return {
        r["grp"]: (r["n_rows"], r["sum_val"])
        for r in MV.read_aggregate_view(spark, mv_root).collect()
    }


def test_incremental_refresh_equals_recompute(spark, tmp_path):
    root, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    TF.create_table(_base(spark), root, partition_by="grp")
    MV.create_aggregate_view(
        spark, root, mv, key="id", group_cols=["grp"], sum_cols=["val"]
    )
    assert _view_dict(spark, mv) == {"a": (2, 30.0), "b": (1, 30.0), "c": (1, 40.0)}

    # update (value), update (GROUP MOVE a->b), insert (new group), then
    # refresh once over both commits
    TF.merge_into(
        spark, root,
        spark.createDataFrame(
            [Row(id=1, grp="a", val=15.0), Row(id=2, grp="b", val=20.0)]
        ),
        on="id",
    )
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=9, grp="d", val=9.0)]),
        on="id",
    )
    MV.refresh_aggregate_view(spark, mv)
    assert _view_dict(spark, mv) == {
        "a": (1, 15.0),
        "b": (2, 50.0),
        "c": (1, 40.0),
        "d": (1, 9.0),
    }

    # delete the only row of a group -> group pruned from the view
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=4, grp="c", val=0.0)]),
        on="id", when_matched="delete", when_not_matched=None,
    )
    MV.refresh_aggregate_view(spark, mv)
    got = _view_dict(spark, mv)
    assert "c" not in got and got["b"] == (2, 50.0)

    # full-recompute differential: the maintained view equals an aggregate
    # of the CURRENT base, exactly
    direct = {
        r["grp"]: (r["n"], r["s"])
        for r in TF.read_table(spark, root)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == direct

    # no-op refresh: same base version back, view version unchanged
    v_mv = TF.current_version(mv)
    MV.refresh_aggregate_view(spark, mv)
    assert TF.current_version(mv) == v_mv


def test_multi_group_cols_and_null_groups(spark, tmp_path):
    root, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    df = spark.createDataFrame(
        [
            Row(id=1, g1="x", g2=None, val=1.0),
            Row(id=2, g1="x", g2="u", val=2.0),
            Row(id=3, g1=None, g2="u", val=4.0),
        ]
    )
    TF.create_table(df, root)
    MV.create_aggregate_view(
        spark, root, mv, key="id", group_cols=["g1", "g2"], sum_cols=["val"]
    )
    TF.merge_into(
        spark, root,
        spark.createDataFrame(
            [(4, "x", None, 8.0)], "id bigint, g1 string, g2 string, val double"
        ),
        on="id",
    )
    MV.refresh_aggregate_view(spark, mv)
    got = {
        (r["g1"], r["g2"]): (r["n_rows"], r["sum_val"])
        for r in MV.read_aggregate_view(spark, mv).collect()
    }
    assert got == {
        ("x", None): (2, 9.0),
        ("x", "u"): (1, 2.0),
        (None, "u"): (1, 4.0),
    }


def test_update_set_arithmetic_merge(spark, tmp_path):
    root = str(tmp_path / "t")
    TF.create_table(_base(spark), root, partition_by="grp")
    src = spark.createDataFrame(
        [Row(id=2, grp="a", val=5.0), Row(id=7, grp="b", val=7.0)]
    )
    TF.merge_into(
        spark, root, src, on="id",
        update_set={"val": lambda t, s: t["val"] + s["val"]},
    )
    got = {r["id"]: r["val"] for r in TF.read_table(spark, root).collect()}
    # matched id=2: 20+5; inserted id=7 takes the plain source value
    assert got == {1: 10.0, 2: 25.0, 3: 30.0, 4: 40.0, 7: 7.0}


def test_streaming_merge_feeds_incremental_view(spark, sf_dir, tmp_path):
    """End-to-end lakehouse flow: a streaming MERGE INTO maintains the
    versioned base table, then one CDF-driven refresh brings the aggregate
    view to parity with a batch recompute — no base rescan anywhere."""
    from cernbox_migration_database_spark import streaming as ST
    from cernbox_migration_database_spark.sources.catalog import load_table
    from pyspark.sql import Window as W2

    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    w = W2.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = lambda df: (
        df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    )
    root, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    TF.create_table(latest(ev.where(F.col("user_id") % 2 == 0)), root)
    MV.create_aggregate_view(
        spark, root, mv,
        key="user_id", group_cols=["event_type"], sum_cols=["value"],
    )
    q = TF.stream_merge_into(
        ST.read_event_stream(spark, sf_dir).select(*cols),
        root, on="user_id", order_cols=["ts", "event_id"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    MV.refresh_aggregate_view(spark, mv)
    got = {
        r["event_type"]: (r["n_rows"], round(r["sum_value"], 2))
        for r in MV.read_aggregate_view(spark, mv).collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["s"], 2))
        for r in latest(ev)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).cast("double") / 100.0).alias("s"),
        )
        .collect()
    }
    assert got == want and len(got) > 1


def test_refresh_across_partition_evolution(spark, tmp_path):
    """A base-table repartition between refreshes is layout-only: the CDF
    window crossing it falls back to a full diff and the view still lands
    exactly on the recompute."""
    root, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    df = spark.createDataFrame(
        [Row(id=i, grp="g" + str(i % 3), region="r" + str(i % 2), val=float(i)) for i in range(30)]
    )
    TF.create_table(df, root, partition_by="grp")
    MV.create_aggregate_view(
        spark, root, mv, key="id", group_cols=["grp"], sum_cols=["val"]
    )
    from cernbox_migration_database_spark.operators.table_format import repartition_table

    repartition_table(spark, root, "region")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=4, grp="g1", region="r0", val=400.0)]),
        on="id",
    )
    MV.refresh_aggregate_view(spark, mv)
    got = {
        r["grp"]: (r["n_rows"], r["sum_val"])
        for r in MV.read_aggregate_view(spark, mv).collect()
    }
    want = {
        r["grp"]: (r["n"], r["s"])
        for r in TF.read_table(spark, root)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want


def test_weighted_view_folds_bag_multiplicities(spark, tmp_path):
    """weight_col: the view aggregates a bag-form base (one row per tuple
    + n_dup) counting each tuple with its multiplicity, and a refresh
    folds multiplicity CHANGES exactly — an update raising n_dup 2→3
    must contribute -2·v + 3·v, not replace-with-source."""
    root, mv = str(tmp_path / "bag"), str(tmp_path / "wmv")
    bag = spark.createDataFrame(
        [
            Row(tup="t1", grp="g0", val=10.0, n_dup=2),
            Row(tup="t2", grp="g0", val=5.5, n_dup=1),
            Row(tup="t3", grp="g1", val=7.25, n_dup=3),
        ]
    )
    TF.create_table(bag, root)
    MV.create_aggregate_view(
        spark, root, mv, key="tup", group_cols=["grp"],
        sum_cols=["val"], weight_col="n_dup",
    )
    got = {
        r["grp"]: (r["n_rows"], r["sum_val"])
        for r in MV.read_aggregate_view(spark, mv).collect()
    }
    assert got == {"g0": (3, 25.5), "g1": (3, 21.75)}
    # multiplicity bump t1 2→3, a tuple delete, and a new tuple — one fold
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(tup="t1", grp="g0", val=10.0, n_dup=3)]),
        on="tup", when_not_matched=None,
    )
    TF.delete_where(spark, root, "tup = 't3'")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(tup="t4", grp="g1", val=2.0, n_dup=4)]),
        on="tup", when_matched=None,
    )
    MV.refresh_aggregate_view(spark, mv)
    got = {
        r["grp"]: (r["n_rows"], r["sum_val"])
        for r in MV.read_aggregate_view(spark, mv).collect()
    }
    assert got == {"g0": (4, 35.5), "g1": (4, 8.0)}


def test_crash_between_fold_commit_and_state_write_is_recovered(
    spark, tmp_path
):
    """The joinview recovery discipline applied to aggregate views: the
    fold merge carries txn=(mv, fold_seq) + the folded window, so a crash
    before the state write (simulated by restoring the pre-fold state
    file) is healed — the replayed refresh adopts the committed window
    and folds only what came after; its full-view zero-prune also reaps
    groups the crashed run emptied."""
    import json
    import os

    root, mv = str(tmp_path / "t"), str(tmp_path / "mv")
    df = spark.createDataFrame(
        [Row(id=i, grp="g" + str(i % 3), val=float(i)) for i in range(12)]
    )
    TF.create_table(df, root)
    MV.create_aggregate_view(
        spark, root, mv, key="id", group_cols=["grp"], sum_cols=["val"]
    )
    pre_fold_state = open(os.path.join(mv, MV._STATE)).read()
    # the window EMPTIES group g2 (ids 2,5,8,11) — its zero row must not
    # survive recovery
    TF.delete_where(spark, root, "grp = 'g2'")
    MV.refresh_aggregate_view(spark, mv)
    with open(os.path.join(mv, MV._STATE), "w", encoding="utf-8") as fh:
        fh.write(pre_fold_state)
    # base moves further; replayed refresh must adopt, fold, full-prune
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=20, grp="g0", val=100.0)]),
        on="id", when_matched=None,
    )
    MV.refresh_aggregate_view(spark, mv)
    got = {
        r["grp"]: (r["n_rows"], r["sum_val"])
        for r in MV.read_aggregate_view(spark, mv).collect()
    }
    want = {
        r["grp"]: (r["n"], r["s"])
        for r in TF.read_table(spark, root)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want and "g2" not in got
