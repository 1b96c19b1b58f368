"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# DataFrames persisted by operators for intra-query reuse (shingle sets,
# scaled vectors). A long-lived session running the catalog repeatedly
# (driver / bench / selfcheck loops) would otherwise accumulate cached
# partitions until the block manager evicts under pressure — harnesses call
# release_persisted() between queries.
_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() with lifecycle tracking so harness loops can reclaim."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns the count."""
    n = len(_PERSISTED)
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist(blocking=False)
        except Exception:
            pass
    return n


def stage_checkpoint(df: DataFrame) -> DataFrame:
    """EAGER ``localCheckpoint``: materialize ``df`` and cut its lineage at
    a pipeline stage boundary.

    Why not plain persist: Catalyst re-ANALYZES the full logical plan on
    every new action — cache substitution happens after analysis — so a
    multi-stage pipeline whose early stages carry huge expression trees
    (the langid model's ~320-term scores, the PII regex chain) pays
    ~0.5 s of driver-side plan processing PER downstream action PER
    occurrence of the subtree in the DAG (measured r13: a trivial count
    over the persisted-but-not-checkpointed dedup stage took 0.6 s vs
    0.15 s checkpointed). localCheckpoint replaces the subtree with a
    LogicalRDD leaf, so every later stage's plan is shallow. The
    materialization doubles as the stage-boundary action the pipeline ran
    anyway (persist + count).

    Trade-offs (guide §5): checkpoint blocks are freed by the context
    cleaner when the RDD goes unreferenced (same lifecycle the iterative
    operators' per-round localCheckpoints already rely on), and a locally
    checkpointed intermediate is not recomputable after executor loss —
    at cluster scale a long pipeline would use a reliable checkpoint dir
    for the same lineage cut."""
    return df.localCheckpoint()


def global_rank(df: DataFrame, order_cols: list, rank_col: str = "rank") -> DataFrame:
    """Materialized dense global row rank (1-based) by ``order_cols``
    WITHOUT a ``row_number`` over an unpartitioned window — which Spark
    executes as a SINGLE task funneling every row through one core (the
    plan-audit ``UnpartitionedWindow`` rule). The classic two-pass
    partition-offset scheme instead:

      1. range-repartition on the order columns (the same exchange a
         global orderBy pays), sort within partitions;
      2. ``monotonically_increasing_id`` = (partitionId << 33) | localRow,
         assigned in sorted row order, all map-side;
      3. one metadata-sized job collects per-partition counts, prefix-sums
         them driver-side, rejoins as a broadcast literal map;
      4. rank = offset[pid] + localRow + 1 — every pass parallel.

    ``order_cols`` may mix names and Column expressions (incl. ``.desc()``
    — the caller must make the total order unambiguous for determinism).
    The persisted midpoint guarantees the count job and the final job see
    the SAME physical layout (range-sampling boundaries resolve once)."""
    from pyspark.sql import functions as F

    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = df.repartitionByRange(n_part, *order_cols).sortWithinPartitions(
        *order_cols
    )
    with_id = tracked_persist(
        ranged.withColumn("_gr_mid", F.monotonically_increasing_id())
    )
    pid = (F.col("_gr_mid") / F.lit(1 << 33)).cast("long")
    local = F.col("_gr_mid") % F.lit(1 << 33)
    counts = with_id.groupBy(pid.alias("_pid")).count().orderBy("_pid").collect()
    offsets, acc = [], 0
    for row in counts:
        offsets.extend([F.lit(row["_pid"]), F.lit(acc)])
        acc += row["count"]
    if offsets:
        rank = F.create_map(*offsets)[pid] + local + F.lit(1)
    else:
        # empty input: zero rows will evaluate this, but the column must
        # still type-check (an argless create_map() is map<void,void> and
        # fails analysis when indexed — found via an empty AND-probe)
        rank = local + F.lit(1)
    return with_id.withColumn(rank_col, rank.cast("long")).drop("_gr_mid")


def topk_ranked(
    df: DataFrame, order_cols: list, k: int, rank_col: str = "rank"
) -> DataFrame:
    """Global top-``k`` with materialized ranks 1..k — the bounded-output
    sibling of :func:`global_rank` (r11 verdict item 4). When the caller
    only keeps ``rank <= k``, the two-pass offset scheme is overkill:
    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject
    (per-partition top-k heaps merged once — no range-sampling exchange,
    no persist, no driver count job), and the <= k survivors re-sort
    inside ONE tiny partition where ``monotonically_increasing_id``
    (pid 0 → ids 0..k-1) assigns the rank. Replaces
    ``global_rank(df, cols).where(rank <= k)`` in the retrieval queries;
    ``global_rank`` remains for FULL-relation ranking (shuffles,
    curriculum quartiles) where no k bounds the output.

    Same determinism contract: ``order_cols`` must be a total order
    (tie-break on a key) or ranks are engine-unstable."""
    from pyspark.sql import functions as F

    top = df.orderBy(*order_cols).limit(int(k))
    one = top.repartition(1).sortWithinPartitions(*order_cols)
    return one.withColumn(
        rank_col, (F.monotonically_increasing_id() + F.lit(1)).cast("long")
    )


def fanout_barrier(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """:func:`ensure_parallelism` plus a persist BARRIER, applied only when
    a repartition was actually needed. Why the barrier: Catalyst pushes
    deterministic filters below a round-robin exchange (PushDownPredicates
    treats Repartition as transparent), so a compute-heavy scan-local
    filter chain written ABOVE ``repartition(n)`` still executes on the
    small input's original (often single) partition — the repartition
    parallelizes nothing. Filters do not push through an InMemoryRelation,
    so persisting the repartitioned rows forces the heavy expressions to
    evaluate post-exchange at full parallelism (measured on the pipeline's
    langid stage, r12: the filter sat below the exchange and ran 1-core).
    At scale the input is already parallel and this is a no-op — nothing
    is cached, nothing reshuffled."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return tracked_persist(df.repartition(target))
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input has fewer partitions than the session's
    parallelism. A small parquet file arrives as 1 partition, which serializes
    every downstream compute-heavy projection (shingling, hashing, vector
    math) onto one core; a 100 TB table already has thousands of partitions
    and must NOT be gratuitously reshuffled — hence the conditional.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
