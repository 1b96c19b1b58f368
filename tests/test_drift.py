"""PSI drift profiling (operators/drift.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import drift as DR


def _psi(df):
    return {
        r["colname"]: r["psi"]
        for r in df.groupBy("colname")
        .agg(F.round(F.sum("psi_term"), 6).alias("psi"))
        .collect()
    }


def test_identical_populations_have_zero_psi(spark):
    df = spark.createDataFrame([Row(x=float(i), y=i * 2.0) for i in range(100)])
    out = DR.psi_profile(spark, df, df, ["x", "y"])
    assert out.count() == 20  # 2 cols x 10 bins, empty bins included
    psi = _psi(out)
    assert abs(psi["x"]) < 1e-9 and abs(psi["y"]) < 1e-9


def test_shift_detected_and_out_of_range_values_clamp(spark):
    ref = spark.createDataFrame([Row(x=float(i % 50)) for i in range(500)])
    cur = spark.createDataFrame(
        [Row(x=float(40 + i % 30)) for i in range(500)]  # shifted, some > ref max
    )
    out = DR.psi_profile(spark, ref, cur, ["x"])
    psi = _psi(out)["x"]
    assert psi > 0.25  # conventional "act" threshold
    # clamped: every cur row landed in a bin, none dropped
    assert (
        out.agg(F.sum("n_cur")).first()[0] == 500
        and out.agg(F.max("bin")).first()[0] == 9
    )


def test_nulls_excluded_and_constant_column_stable(spark):
    ref = spark.createDataFrame(
        [Row(x=1.0, c=5.0), Row(x=2.0, c=5.0), Row(x=None, c=5.0)]
    )
    cur = spark.createDataFrame([Row(x=1.5, c=5.0), Row(x=None, c=None)])
    out = DR.psi_profile(spark, ref, cur, ["x", "c"])
    sums = {
        r["colname"]: (r["sr"], r["sc"])
        for r in out.groupBy("colname")
        .agg(F.sum("n_ref").alias("sr"), F.sum("n_cur").alias("sc"))
        .collect()
    }
    assert sums["x"] == (2, 1)  # nulls carried no bin
    assert sums["c"] == (3, 1)  # hi == lo grid width guard: no div-by-zero


def test_empty_or_all_null_reference_raises_named_error(spark):
    """ADVICE r6: an empty reference population (or an all-null column)
    used to surface as an opaque NoneType '>' TypeError from the grid
    math; it now raises a ValueError naming the dead column(s)."""
    import pytest
    from pyspark.sql.types import StructType

    empty = spark.createDataFrame([], "x double, y double")
    cur = spark.createDataFrame([Row(x=1.0, y=2.0)])
    with pytest.raises(ValueError, match=r"psi_profile.*\['x', 'y'\]"):
        DR.psi_profile(spark, empty, cur, ["x", "y"])
    allnull = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "x double, y double"
    )
    with pytest.raises(ValueError, match=r"\['y'\]"):
        DR.psi_profile(spark, allnull, cur, ["x", "y"])
    assert StructType  # silence unused-import if fixtures change
