"""Exactly-once streaming writes into the versioned table.

Structured Streaming's foreachBatch gives at-least-once batch delivery:
after a crash between "sink applied batch N" and "checkpoint recorded
batch N", the restarted query REPLAYS batch N. The lakehouse answer
(Delta's ``txn`` action / Iceberg's WAP id) is to make the sink itself
deduplicate: every commit records ``(app_id, batch_id)`` INSIDE the
commit-log entry — atomically with the data it describes — and the batch
function consults :func:`...table_format.last_txn_version` before
applying. A replayed batch id is at or below the recorded high-water
mark and becomes a no-op, so the pipeline is exactly-once end-to-end
without any sink-side state file that could itself tear.

Composed with :mod:`..sources.cbx_datasource` this closes the loop: a
versioned table is a streaming SOURCE (the commit log as microbatches)
and a streaming SINK (idempotent commits), so table→stream→table
pipelines run on checkpointed offsets with replay safety at both ends —
the Structured Streaming re-expression of the reference's
scan→transform→update-sink pipeline (main.go:86-240) as a standing
incremental job.

At scale: each microbatch commits once (O(batch) IO, hardlink-carried
history), the txn lookup is one commit-log scan (driver metadata), and
skew/shuffle behavior inside the batch is whatever the merge/append
path already does — the streaming wrapper adds no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import table_format as TF


def exactly_once_batch_writer(
    root: str,
    app_id: str,
    key: str | list[str] | None = None,
    partition_by: str | list[str] | None = None,
    write_mode: str = "cow",
    order_by: str | None = None,
    drop_order_col: bool = True,
    expectations: list | None = None,
    quarantine_root: str | None = None,
    post_batch=None,
):
    """The foreachBatch function: apply a microbatch to the versioned
    table at ``root`` exactly once per ``(app_id, batch_id)``.

    ``post_batch(spark)`` — when given — runs after EVERY applied batch
    (including replay-skipped ones): the hook for derived-state
    maintenance such as ``lshindex.refresh_lsh_index`` /
    ``ivfindex.refresh_ivf_index``, whose refreshes are idempotent by
    construction (driven by the table's version, not the batch id). The
    replay-inclusive contract closes the crash window between "batch
    committed" and "index refreshed": the replayed batch's merge is a
    txn-marked no-op, but its post_batch still folds the missed window.

    ``key`` set → keyed MERGE (upsert) per batch, so a stream of row
    VERSIONS converges to last-write-wins state; ``key`` None → append
    (insert-only feeds). The first batch creates the table. Returns the
    callable to hand to ``writeStream.foreachBatch`` — also usable
    directly in tests to simulate crash-replay.

    ``order_by`` names the column that defines "last" when one microbatch
    carries SEVERAL images of a key (availableNow catch-up runs compress
    a whole backlog into one batch, erasing batch-boundary ordering): the
    reduce keeps the max-``order_by`` row per key as one map-side-
    combinable struct-max aggregation — no window, no per-key state. The
    cbxtable streaming source's ``withCommitVersion`` option exists
    precisely to supply this column; ``drop_order_col`` (default) removes
    it before the merge so it never becomes a table column. Without
    ``order_by``, in-batch duplicates collapse ARBITRARILY (documented:
    only safe when a batch cannot carry two images of a key).

    ``expectations`` gates every microbatch through the data-quality
    contracts of :mod:`..operators.expectations`: a ``fail`` rule raises
    and FAILS the streaming query before anything commits (restart
    replays the batch — nothing was recorded, so nothing is lost);
    ``drop``-rule violations divert to ``quarantine_root`` — a sibling
    versioned table carrying the ``_violations`` evidence — under the
    SAME (app_id, batch_id) txn discipline, so a crash between the
    quarantine commit and the main commit replays into two independent
    no-op checks and each table still applies the batch exactly once."""

    keys = [key] if isinstance(key, str) else list(key or [])

    def reduce_last_wins(batch_df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        if order_by is None:
            return batch_df.dropDuplicates(keys)
        rest = [c for c in batch_df.columns if c not in keys]
        # struct-max orders by the FIRST field: (order_by, payload...)
        reduced = (
            batch_df.groupBy(*keys)
            .agg(
                F.max(F.struct(order_by, *[c for c in rest if c != order_by]))
                .alias("__s")
            )
            .select(*keys, "__s.*")
            .select(*batch_df.columns)
        )
        return reduced.drop(order_by) if drop_order_col else reduced

    def quarantine(bad: DataFrame, batch_id: int) -> None:
        import os

        from pyspark.sql import functions as F

        from ..operators.expectations import VIOLATIONS_COL

        if bad.isEmpty():
            return
        spark = bad.sparkSession
        flat = bad.withColumn(
            VIOLATIONS_COL, F.array_join(VIOLATIONS_COL, ",")
        )
        if not os.path.exists(os.path.join(quarantine_root, "_latest")):
            TF.create_table(flat, quarantine_root, txn=(app_id, batch_id))
            return
        last = TF.last_txn_version(quarantine_root, app_id)
        if last is not None and batch_id <= last:
            return
        TF.insert_into(spark, quarantine_root, flat, txn=(app_id, batch_id))

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        pinned = None
        applied = False
        try:
            if expectations:
                from ..operators import expectations as EX

                pinned = batch_df.persist()
                EX.enforce(pinned, expectations)  # fail rules abort pre-commit
                clean, bad = EX.split(pinned, expectations)
                if quarantine_root is not None:
                    quarantine(bad, batch_id)
                batch_df = clean.drop(EX.VIOLATIONS_COL)
                if batch_df.isEmpty():
                    return
            if key is not None:
                batch_df = reduce_last_wins(batch_df)
            if not os.path.exists(os.path.join(root, "_latest")):
                TF.create_table(
                    batch_df, root, partition_by=partition_by,
                    txn=(app_id, batch_id),
                )
            else:
                last = TF.last_txn_version(root, app_id)
                if last is not None and batch_id <= last:
                    pass  # replayed microbatch: already committed, skip
                elif key is not None:
                    TF.merge_into(
                        spark, root, batch_df, on=key,
                        write_mode=write_mode, txn=(app_id, batch_id),
                    )
                else:
                    TF.insert_into(
                        spark, root, batch_df, txn=(app_id, batch_id)
                    )
            applied = True
        finally:
            if pinned is not None:
                pinned.unpersist()
        # outside the expectation-abort path: a failed batch never
        # refreshes derived state (nothing committed, replay will retry);
        # a replay-skipped batch DOES (see docstring)
        if applied and post_batch is not None:
            post_batch(spark)

    return apply


def stream_write_table(
    stream: DataFrame,
    root: str,
    checkpoint: str,
    app_id: str,
    key: str | list[str] | None = None,
    partition_by: str | list[str] | None = None,
    write_mode: str = "cow",
    available_now: bool = True,
    order_by: str | None = None,
    expectations: list | None = None,
    quarantine_root: str | None = None,
    post_batch=None,
):
    """``stream.writeStream`` into the versioned table with exactly-once
    commits. Returns the started StreamingQuery (caller awaits it).
    ``expectations``/``quarantine_root`` gate every microbatch through the
    data-quality contracts, ``post_batch`` maintains derived state (an
    index refresh) after each batch (see
    :func:`exactly_once_batch_writer`)."""
    writer = (
        stream.writeStream.outputMode("update" if key else "append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            exactly_once_batch_writer(
                root, app_id, key=key,
                partition_by=partition_by, write_mode=write_mode,
                order_by=order_by, expectations=expectations,
                quarantine_root=quarantine_root, post_batch=post_batch,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
