"""SCD2 apply unit semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators.scd2 import OPEN_END, scd2_apply

T0 = dt.datetime(2020, 1, 1)
T1 = dt.datetime(2024, 6, 1)
END = dt.datetime(2261, 12, 31)


def _dim(spark):
    rows = [
        (1, "A", 10.0, T0, END),          # will change
        (2, "B", 20.0, T0, END),          # update arrives but identical -> no-op
        (3, "C", 30.0, T0, END),          # no update
        (1, "OLD", 5.0, dt.datetime(2019, 1, 1), T0),  # existing history row
    ]
    return spark.createDataFrame(
        rows, "k long, seg string, bal double, valid_from timestamp, valid_to timestamp"
    )


def _updates(spark):
    rows = [
        (1, "A", 11.0, T1),   # changed bal
        (2, "B", 20.0, T1),   # identical -> must NOT create a version
        (9, "N", 99.0, T1),   # brand-new key
    ]
    return spark.createDataFrame(rows, "k long, seg string, bal double, ts timestamp")


def test_scd2_apply(spark):
    out = scd2_apply(_dim(spark), _updates(spark), key="k", attrs=["seg", "bal"])
    rows = {(r["k"], r["valid_from"]): r.asDict() for r in out.collect()}
    assert len(rows) == 6  # 4 original + 1 new version + 1 brand-new key

    closed = rows[(1, T0)]
    assert closed["valid_to"] == T1 and closed["bal"] == 10.0
    opened = rows[(1, T1)]
    assert opened["valid_to"] == END and opened["bal"] == 11.0
    assert rows[(2, T0)]["valid_to"] == END        # identical update: no-op
    assert rows[(3, T0)]["valid_to"] == END        # untouched
    assert rows[(1, dt.datetime(2019, 1, 1))]["valid_to"] == T0  # history kept
    assert rows[(9, T1)]["bal"] == 99.0            # brand-new key opened


def test_scd2_current_view(spark):
    out = scd2_apply(_dim(spark), _updates(spark), key="k", attrs=["seg", "bal"])
    current = out.filter(F.col("valid_to") == F.lit(OPEN_END).cast("timestamp"))
    got = {r["k"]: r["bal"] for r in current.collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0, 9: 99.0}
