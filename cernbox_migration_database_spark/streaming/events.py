"""Structured Streaming counterparts of the event-time operators.

The reference is a one-shot batch job (SURVEY.md §2.9 — streaming ABSENT),
so this module is part of the engine's generalization: the same event-time
semantics as the batch queries (time_bucket_agg / window_sessionize),
expressed as streaming plans with watermarks and state.

Testing model: a parquet-file source drained synchronously into a memory
sink (`processAllAvailable`) makes the streaming result deterministic and
comparable against the batch oracle — in production the source line swaps
for Kafka and the sink for a real table, with checkpointing giving
exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, "
    "props string"
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (ns timestamps read as long and
    truncated to microseconds, same as the batch catalog)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        # file streaming sources require a directory; select just the events
        # file out of the fixture dir with a glob
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window counts + exact-decimal sums with a watermark — the
    streaming twin of the batch `time_bucket_agg` query."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_agg(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native session windows (gap-based) per user — the streaming twin of
    the batch lag+cumsum sessionization (`window_sessionize`)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def stateful_user_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a per-user
    running event counter carried in explicit state across micro-batches —
    the template for bespoke streaming state machines (the engine's answer
    to 'operator Spark lacks' in streaming form)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    agg: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain the full source synchronously into an in-memory table `name` —
    deterministic batch-equivalent results for tests/oracles."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each left event
    matched to right events for the same key within [-within, 0] of its
    timestamp. Watermarks on BOTH sides bound the join state — without them
    a stream-stream join buffers forever."""
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event"),
        F.col("ts").alias("l_ts"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event"),
        F.col("ts").alias("r_ts"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("r_ts") <= F.col("l_ts")),
    )


def dedup_within_watermark(stream: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; state for older keys is reclaimed
    (dropDuplicatesWithinWatermark vs the unbounded dropDuplicates)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
