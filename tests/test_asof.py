"""as-of join unit semantics (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 100)],
        "lid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 100, 7.0), (10, 200, 8.0), (20, 150, 9.0)],
        "k long, t long, v double",
    )
    out = asof_join(left, right, key="k", ts="t", right_cols=["v"])
    got = {r["lid"]: r["asof_v"] for r in out.collect()}
    # lid=1: right at t=100 counts (<= semantics); lid=2: latest is t=200;
    # lid=4: right t=150 is AFTER left t=100 -> no match
    assert got == {1: 7.0, 2: 8.0, 3: 8.0, 4: None}


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(50).select(
        F.col("id").alias("lid"), (F.col("id") % 5).alias("k"), (F.col("id") * 10).alias("t")
    )
    right = spark.range(10).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 37).alias("t"), F.col("id").alias("v")
    ).groupBy("k", "t").agg(F.max("v").alias("v"))
    out = asof_join(left, right, key="k", ts="t", right_cols=["v"])
    assert out.count() == 50


def test_asof_forward_and_tolerance_hand_traced(spark):
    import datetime as dt

    from cernbox_migration_database_spark.operators.asof import asof_join

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, 10, ts(0)), (2, 10, ts(50)), (3, 10, ts(200)), (4, 20, ts(0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, ts(40)), (101, 10, ts(60))],
        "r_id long, user_id long, ts timestamp",
    )
    fwd = {
        r["event_id"]: r["asof_r_id"]
        for r in asof_join(
            left, right, key="user_id", ts="ts", right_cols=["r_id"],
            direction="forward",
        ).collect()
    }
    # event 1 -> next right at +40; event 2 (t=50) -> right at +60;
    # event 3 (t=200) -> nothing after; user 20 -> no rights at all
    assert fwd == {1: 100, 2: 101, 3: None, 4: None}

    tol = {
        r["event_id"]: r["asof_r_id"]
        for r in asof_join(
            left, right, key="user_id", ts="ts", right_cols=["r_id"],
            direction="forward", tolerance="INTERVAL 15 MINUTES",
        ).collect()
    }
    # 15-minute window: event 1's match at +40 is now too far -> NULL;
    # event 2's match at +10 survives
    assert tol == {1: None, 2: 101, 3: None, 4: None}

    back_tol = {
        r["event_id"]: r["asof_r_id"]
        for r in asof_join(
            left, right, key="user_id", ts="ts", right_cols=["r_id"],
            tolerance="INTERVAL 15 MINUTES",
        ).collect()
    }
    # backward with tolerance: event 2 (t=50) sees right at t=40 (gap 10,
    # ok); event 3 (t=200) sees t=60 but gap 140 > 15 -> NULL
    assert back_tol == {1: None, 2: 100, 3: None, 4: None}


def test_asof_numeric_tolerance_and_validation(spark):
    """ADVICE r3: tolerance on a numeric ts takes a numeric gap; interval
    strings on numeric ts (and internal-name collisions) raise descriptive
    errors instead of opaque analysis failures."""
    import pytest

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 300)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(
        [(10, 90, 7.0), (10, 150, 8.0)], "k long, t long, v double"
    )
    out = asof_join(
        left, right, key="k", ts="t", right_cols=["v"], tolerance=50
    )
    got = {r["lid"]: r["asof_v"] for r in out.collect()}
    # lid=1 matches t=90 (gap 10 <= 50); lid=2's latest is t=150, gap 150 > 50
    assert got == {1: 7.0, 2: None}

    with pytest.raises(ValueError, match="must be a number"):
        asof_join(
            left, right, key="k", ts="t", right_cols=["v"],
            tolerance="INTERVAL 1 DAY",
        )
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumn("__mts", F.lit(1)), right,
            key="k", ts="t", right_cols=["v"],
        )
