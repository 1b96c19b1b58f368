from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cernbox_migration_database_spark.operators import expectations as EX
from cernbox_migration_database_spark.operators import table_format as TF


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "a"), (3, 0.0, "b"), (4, 7.0, "zz")],
        "id int, v double, cat string",
    )


RULES = [
    EX.Expectation("v_nonneg", "v >= 0", "drop"),
    EX.Expectation("cat_known", "cat IN ('a', 'b')", "warn"),
]


def test_metrics_counts_and_clean_rows(spark):
    m = {r.rule: r for r in EX.metrics(_df(spark), RULES).collect()}
    assert m["v_nonneg"].n_fail == 1 and m["v_nonneg"].action == "drop"
    assert m["cat_known"].n_fail == 1 and m["cat_known"].action == "warn"
    assert m["rows_clean"].n_fail == 2  # ids 1 and 3


def test_split_warn_rules_never_quarantine(spark):
    clean, bad = EX.split(_df(spark), RULES)
    assert sorted(r.id for r in clean.collect()) == [1, 3, 4]  # 4: warn only
    badrows = bad.collect()
    assert [r.id for r in badrows] == [2]
    assert badrows[0]._violations == ["v_nonneg"]


def test_enforce_raises_with_counts(spark):
    rules = RULES + [EX.Expectation("id_small", F.col("id") < 3, "fail")]
    with pytest.raises(EX.ExpectationError) as ei:
        EX.enforce(_df(spark), rules)
    assert ei.value.counts == {"id_small": 2}
    EX.enforce(_df(spark), RULES)  # no fail rules -> no-op


def test_zero_rules_passes_everything(spark):
    clean, bad = EX.split(_df(spark), [])
    assert clean.count() == 4 and bad.count() == 0


def test_guarded_write_routes_and_aborts(spark, tmp_path):
    root, quar = str(tmp_path / "t"), str(tmp_path / "q")
    m = EX.guarded_write(
        spark, _df(spark), root, RULES, quarantine_root=quar, partition_by="cat"
    )
    assert {r.rule: r.n_fail for r in m.collect()}["v_nonneg"] == 1
    assert sorted(
        r.id for r in TF.read_table(spark, root).collect()
    ) == [1, 3, 4]
    q = TF.read_table(spark, quar).collect()
    assert [r.id for r in q] == [2] and q[0]._violations == "v_nonneg"

    # a fail rule aborts BOTH writes: table versions unchanged
    v_before = TF.current_version(root)
    with pytest.raises(EX.ExpectationError):
        EX.guarded_write(
            spark,
            _df(spark),
            root,
            [EX.Expectation("all_pos", F.col("v") > 0, "fail")],
            quarantine_root=quar,
            key="id",
        )
    assert TF.current_version(root) == v_before

    # merge path: re-running the clean write with a key upserts idempotently
    EX.guarded_write(spark, _df(spark), root, RULES, key="id")
    assert sorted(
        r.id for r in TF.read_table(spark, root).collect()
    ) == [1, 3, 4]
