from __future__ import annotations

import pytest

from cernbox_migration_database_spark.operators import expectations as EX
from cernbox_migration_database_spark.operators import table_format as TF
from cernbox_migration_database_spark.streaming.table_sink import (
    exactly_once_batch_writer,
)

RULES = [
    EX.Expectation("v_nonneg", "v >= 0", "drop"),
]


def test_expectation_gated_batches_route_to_quarantine(spark, tmp_path):
    root, quar = str(tmp_path / "t"), str(tmp_path / "q")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    apply = exactly_once_batch_writer(
        root, "app1", key="k", expectations=RULES, quarantine_root=quar
    )
    apply(mk([(1, 10), (2, -1)]), 0)  # creates both tables
    apply(mk([(2, 20), (3, -3)]), 1)
    assert {
        (r.k, r.v) for r in TF.read_table(spark, root).collect()
    } == {(1, 10), (2, 20)}
    q = {(r.k, r.v, r._violations) for r in TF.read_table(spark, quar).collect()}
    assert q == {(2, -1, "v_nonneg"), (3, -3, "v_nonneg")}


def test_quarantine_replay_is_exactly_once(spark, tmp_path):
    root, quar = str(tmp_path / "t"), str(tmp_path / "q")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    apply = exactly_once_batch_writer(
        root, "app1", key="k", expectations=RULES, quarantine_root=quar
    )
    apply(mk([(1, 10), (2, -1)]), 0)
    apply(mk([(3, 30), (4, -4)]), 1)
    vq = TF.current_version(quar)
    vt = TF.current_version(root)
    # crash between quarantine commit and main commit: the replayed batch
    # must no-op on BOTH tables independently
    apply(mk([(3, 30), (4, -4)]), 1)
    assert TF.current_version(quar) == vq
    assert TF.current_version(root) == vt
    assert TF.read_table(spark, quar).count() == 2


def test_fail_rule_aborts_batch_before_any_commit(spark, tmp_path):
    root, quar = str(tmp_path / "t"), str(tmp_path / "q")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    rules = RULES + [EX.Expectation("k_known", "k < 100", "fail")]
    apply = exactly_once_batch_writer(
        root, "app1", key="k", expectations=rules, quarantine_root=quar
    )
    apply(mk([(1, 10)]), 0)
    v = TF.current_version(root)
    with pytest.raises(EX.ExpectationError):
        apply(mk([(999, 5), (2, -2)]), 1)
    # nothing committed anywhere: the failed batch replays after restart
    assert TF.current_version(root) == v
    import os

    assert not os.path.exists(os.path.join(quar, "_latest"))
    # the corrected batch then applies normally under the same id
    apply(mk([(2, -2), (3, 30)]), 1)
    assert TF.read_table(spark, root).count() == 2  # k=1, k=3
    assert TF.read_table(spark, quar).count() == 1  # k=2


def test_all_bad_batch_commits_only_quarantine(spark, tmp_path):
    root, quar = str(tmp_path / "t"), str(tmp_path / "q")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    apply = exactly_once_batch_writer(
        root, "app1", key="k", expectations=RULES, quarantine_root=quar
    )
    apply(mk([(1, 10)]), 0)
    v = TF.current_version(root)
    apply(mk([(7, -7)]), 1)  # every row quarantined; main table untouched
    assert TF.current_version(root) == v
    assert TF.read_table(spark, quar).count() == 1
