"""Data-quality expectations — declarative row-level contracts enforced
in ONE pass over the data, the Delta-Live-Tables / Great-Expectations
idea reduced to its engine core: each expectation is a named boolean
predicate rows must satisfy, with an action class —

  * ``warn``  — count violations, keep the rows;
  * ``drop``  — route violating rows to quarantine (with the list of
                rules they failed — the dead-letter evidence style of the
                migration plan, plans/migration.py);
  * ``fail``  — any violation aborts the write before anything commits.

Scale shape: the violation vector is a single row-local array expression
(one ``CASE`` per rule folded into ``array_compact``) — no per-rule
passes, no UDFs, no shuffle; the metrics are one combinable aggregation
over exploded rule names. ``clean``/``quarantine`` are two filters over
the SAME computed column, so Spark evaluates the rule set once per row
whichever outputs are consumed. At 100 TB an expectation sweep costs
exactly one scan.

``guarded_write`` composes with the versioned table: clean rows commit,
quarantined rows land in a sibling table with their reasons — atomic per
table, auditable, and a ``fail`` rule prevents BOTH commits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")
VIOLATIONS_COL = "_violations"


class ExpectationError(RuntimeError):
    """Raised when a ``fail``-action expectation is violated; carries the
    per-rule violation counts."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(f"failed expectations: {counts}")


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column | str  # rows must SATISFY this
    action: str = "drop"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(f"action must be one of {_ACTIONS}")

    def col(self) -> Column:
        p = self.predicate
        return F.expr(p) if isinstance(p, str) else p


def _violation_array(rules: list[Expectation]) -> Column:
    return F.array_compact(
        F.array(
            *[
                F.when(~r.col(), F.lit(r.name)).otherwise(
                    F.lit(None).cast("string")
                )
                for r in rules
            ]
        )
    )


def check(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Attach ``_violations``: the names of every rule the row fails.
    One row-local expression — downstream filters share it."""
    if not rules:
        return df.withColumn(
            VIOLATIONS_COL, F.array().cast("array<string>")
        )
    return df.withColumn(VIOLATIONS_COL, _violation_array(rules))


def metrics(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """(rule, action, n_fail) per rule plus a ``rows_clean`` row counting
    rows that violated nothing — one aggregation, rule set evaluated
    once."""
    checked = check(df, rules)
    actions = {r.name: r.action for r in rules}
    per_rule = (
        checked.select(F.explode(VIOLATIONS_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fail"))
    )
    # rules with zero violations still get a row — the report must show
    # every contract that was checked, not just the broken ones
    names = df.sparkSession.createDataFrame(
        [(r.name, actions[r.name]) for r in rules], "rule string, action string"
    )
    clean = checked.where(F.size(VIOLATIONS_COL) == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fail")
    ).select(
        F.lit("rows_clean").alias("rule"),
        F.lit("info").alias("action"),
        "n_fail",
    )
    return (
        names.join(per_rule, "rule", "left")
        .select("rule", "action", F.coalesce("n_fail", F.lit(0)).alias("n_fail"))
        .unionByName(clean)
        .orderBy("rule")
    )


def split(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): quarantine holds rows violating any
    ``drop``/``fail`` rule, with their ``_violations`` evidence; ``warn``
    violations never quarantine a row (they only show in metrics)."""
    gating = [r for r in rules if r.action in ("drop", "fail")]
    checked = check(df, rules)
    gate = _violation_array(gating) if gating else F.array().cast(
        "array<string>"
    )
    checked = checked.withColumn("_gate", gate)
    clean = checked.where(F.size("_gate") == 0).drop("_gate")
    bad = checked.where(F.size("_gate") > 0).drop("_gate")
    return clean, bad


def enforce(df: DataFrame, rules: list[Expectation]) -> None:
    """Raise :class:`ExpectationError` if any ``fail``-action rule is
    violated. One aggregation over the shared violation vector."""
    failing = [r for r in rules if r.action == "fail"]
    if not failing:
        return
    counts = {
        row.rule: row.n_fail
        for row in metrics(df, failing).where(
            (F.col("rule") != "rows_clean") & (F.col("n_fail") > 0)
        ).collect()
    }
    if counts:
        raise ExpectationError(counts)


def guarded_write(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    rules: list[Expectation],
    quarantine_root: str | None = None,
    key: str | None = None,
    partition_by: str | list[str] | None = None,
) -> DataFrame:
    """Expectation-gated table write: ``fail`` rules abort before any
    commit; clean rows create-or-merge into ``root``; dropped rows land
    in ``quarantine_root`` (create-or-append) with their ``_violations``
    evidence. Returns the metrics frame. The input is persisted around
    the two writes so the rule set is not recomputed per sink."""
    from . import table_format as TF

    cached = df.persist()
    try:
        enforce(cached, rules)
        clean, bad = split(cached, rules)
        import os

        clean_out = clean.drop(VIOLATIONS_COL)
        if os.path.exists(os.path.join(root, "_latest")):
            if key is None:
                TF.insert_into(spark, root, clean_out)
            else:
                TF.merge_into(spark, root, clean_out, on=key)
        else:
            TF.create_table(clean_out, root, partition_by=partition_by)
        if quarantine_root is not None and bad.limit(1).count() > 0:
            q = bad.withColumn(
                "_violations", F.array_join(VIOLATIONS_COL, ",")
            )
            if os.path.exists(os.path.join(quarantine_root, "_latest")):
                TF.insert_into(spark, quarantine_root, q)
            else:
                TF.create_table(q, quarantine_root)
        return metrics(cached, rules)
    finally:
        cached.unpersist()
