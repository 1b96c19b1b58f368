"""Enrichment (lookup) joins + dead-letter split (SURVEY.md §2.3 J1/J2, §2.1 S9).

The reference does one `eos file info` subprocess per row (main.go:120-137) —
~2-3 network round-trips per row, the dominant cost. The Spark-first
restructuring is set-at-a-time: join the whole shares DataFrame against a
metadata DataFrame once. When the metadata side is small it broadcasts (no
shuffle at all); at 100 TB-scale metadata the join shuffles both sides on the
key, which AQE re-plans and skew-handles.

A left join + null-check replaces the reference's per-row error path
(main.go:272-275): rows whose key found no match become the dead-letter
DataFrame instead of killing the job (per-row error isolation, X4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_join(
    df: DataFrame,
    lookup: DataFrame,
    on: Column,
    required_col: str,
    broadcast: bool = True,
    stage: str = "lookup",
) -> tuple[DataFrame, DataFrame]:
    """Left-join ``df`` against ``lookup``; split matched vs dead-letter.

    Returns ``(matched, dead)`` where ``dead`` rows had no match
    (``required_col`` NULL after the join), tagged with the failing stage —
    the Spark shape of the reference's "stderr + continue" (main.go:274).
    """
    right = F.broadcast(lookup) if broadcast else lookup
    joined = df.join(right, on, "left")
    matched = joined.filter(F.col(required_col).isNotNull())
    dead = (
        joined.filter(F.col(required_col).isNull())
        .select(*df.columns)
        .withColumn("error_stage", F.lit(stage))
    )
    return matched, dead


def external_service_lookup(df: DataFrame, fetch_batch, schema: str) -> DataFrame:
    """Template for a *live* external catalog (the true EOS shape): batch the
    keys per partition and call the service once per batch via mapInPandas —
    Arrow-vectorized, bounded by partition count (the X1 concurrency bound:
    `df.repartition(n)` before this call is the semaphore analogue).

    ``fetch_batch(pdf) -> pdf`` must be idempotent; retries happen at task
    granularity. Kept as plumbing here — fixtures exercise the join path.
    """

    def _iter(batches):
        for pdf in batches:
            yield fetch_batch(pdf)

    return df.mapInPandas(_iter, schema=schema)


def subprocess_batch_fetch(argv_for_batch, parse_stdout):
    """A ``fetch_batch`` for :func:`external_service_lookup` that REALLY
    shells out — one subprocess per Arrow batch, executor-side. This is the
    set-at-a-time restructuring of the reference's per-row ``executeCMD``
    (main.go:107-117, invoked 2-3x per row): the process/RTT cost is paid
    once per batch of keys instead of per key, which is the difference
    between ~20 rows/s and saturating the external service's real limit.

    ``argv_for_batch(pdf) -> list[str]`` builds the command for a batch of
    keys; ``parse_stdout(pdf, stdout) -> pdf`` parses the tool's output back
    onto the batch. Non-zero exit raises -> task retry -> per-task error
    isolation (the fetch must be idempotent, as main.go's reads are).
    """
    import subprocess

    def fetch(pdf):
        proc = subprocess.run(
            argv_for_batch(pdf), capture_output=True, text=True, check=True
        )
        return parse_stdout(pdf, proc.stdout)

    return fetch


def run_create_commands(df, build_argv, log_path: str | None = None) -> None:
    """Side-effecting create pass (S10): foreachPartition over the misses,
    ONE subprocess per row via ``build_argv(row)`` — matching the
    reference's createVersionsFolder which must run privilege-dropped per
    file owner (`eos -r uid gid file version path`, main.go:208-216), so
    rows cannot batch into one process the way reads can. Bounded
    parallelism = partition count (repartition(n) upstream is the
    20-semaphore analogue, main.go:260-271)."""
    import subprocess

    def _run(rows) -> None:
        for row in rows:
            argv = build_argv(row)
            proc = subprocess.run(argv, capture_output=True, text=True)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"create failed ({argv[0]}): {proc.stderr.strip()}"
                )

    df.foreachPartition(_run)
