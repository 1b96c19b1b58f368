"""The plan-hygiene audit rules themselves (tools/plan_audit.py) — the
unpartitioned-window detector must separate the four WindowExec
simple-string shapes (see round-2 verdict: `train_shuffle` shipped a
single-task window and nothing flagged it)."""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "plan_audit", "/root/repo/tools/plan_audit.py"
)
plan_audit = importlib.util.module_from_spec(spec)
sys.modules["plan_audit"] = plan_audit
spec.loader.exec_module(plan_audit)


UNPART_ORDERED = (
    "+- Window [row_number() windowspecdefinition(x#1L ASC NULLS FIRST, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
    "AS r#2], [x#1L ASC NULLS FIRST]"
)
PART_ORDERED = (
    "   +- Window [sum(n#3L) windowspecdefinition(lang#0, k#1 ASC NULLS "
    "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "currentrow$())) AS cum#4L], [lang#0], [k#1 ASC NULLS FIRST]"
)
PART_UNORDERED = (
    "+- Window [sum(qs#5L) windowspecdefinition(l_partkey#2L, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "unboundedfollowing$())) AS tq#6L], [l_partkey#2L]"
)


def test_flags_unpartitioned_ordered_window():
    assert plan_audit.unpartitioned_windows(UNPART_ORDERED)
    assert "UnpartitionedWindow" in plan_audit.audit_plan(UNPART_ORDERED)


def test_passes_partitioned_windows():
    assert not plan_audit.unpartitioned_windows(PART_ORDERED)
    # q20's shape: partition spec only, no order — two bracket groups but OK
    assert not plan_audit.unpartitioned_windows(PART_UNORDERED)


def test_mixed_plan_flags_only_bad_node():
    plan = "\n".join([PART_ORDERED, UNPART_ORDERED, PART_UNORDERED])
    hits = plan_audit.unpartitioned_windows(plan)
    assert len(hits) == 1 and "row_number" in hits[0]


def test_fixed_training_windows_have_no_unpartitioned_window(spark, sf_dir):
    """VERDICT r2's two scale-weak plans, pinned fixed: train_shuffle and
    train_token_packing must never again ship a single-task window (and
    the whole audit must pass them)."""
    from cernbox_migration_database_spark import queries as Q

    for name in ("train_shuffle", "train_token_packing", "pipeline_end_to_end"):
        df = Q.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert not plan_audit.audit_plan(plan), (name, plan[:1500])
