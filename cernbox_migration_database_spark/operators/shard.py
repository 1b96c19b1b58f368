"""Deterministic shard export — the last mile of a training-data
pipeline: split a corpus into N stable shards, lay each shard out as its
own sorted parquet output, and emit a per-shard manifest (row counts,
token/byte totals, id bounds) that the training loader can trust without
re-scanning data.

Shard identity is content-addressed, not positional: ``shard =
int(md5(seed || key)[:13 hex]) % n_shards``. That makes assignment (a)
reproducible across runs, engines, and partition counts — no
``rand()``, no zipWithIndex; (b) incrementally stable — adding documents
never moves existing ones between shards, so downstream caches and
resume points survive corpus growth; (c) uniformly balanced in
expectation regardless of key skew in the id space.

Scale shape at 100 TB: assignment is a row-local expression (codegen);
the export is ONE hash shuffle on the shard id, writing each shard as a
hive partition; the manifest is a map-side-combinable aggregation. No
driver-side state bigger than N manifest rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_key(key: Column, n_shards: int, seed: str = "shard") -> Column:
    """Stable shard id in [0, n_shards): top 52 bits of md5(seed ':' key)
    reduced mod n_shards. The 13-hex-digit slice fits a BIGINT exactly on
    both Spark and DuckDB (< 2^52), so the oracle reproduces it with
    ``CAST('0x' || substring(md5(...), 1, 13) AS BIGINT) % n``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), key.cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    return (h % n_shards).cast("int")


def shard_key_sql(key_expr: str, n_shards: int, seed: str = "shard") -> str:
    """DuckDB rendering of :func:`shard_key` for oracle strings."""
    return (
        f"CAST(CAST('0x' || substring(md5('{seed}:' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 13) AS BIGINT) % {n_shards} AS INT)"
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "shard",
) -> DataFrame:
    """Attach the deterministic ``shard`` column."""
    return df.withColumn("shard", shard_key(F.col(key_col), n_shards, seed))


def shard_manifest(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    n_shards: int = 16,
    seed: str = "shard",
) -> DataFrame:
    """Per-shard manifest: doc count, whitespace-token and byte totals,
    distinct languages, id bounds. One combinable aggregation — the
    training loader reads N rows instead of re-scanning the corpus."""
    toks = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    )
    return (
        assign_shards(df, key_col, n_shards, seed)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("bigint").alias("tok_sum"),
            F.sum(F.length(text_col)).cast("bigint").alias("byte_sum"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min(key_col).alias("min_id"),
            F.max(key_col).alias("max_id"),
        )
        .orderBy("shard")
    )


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: str = "shard",
    order_col: str | None = None,
) -> DataFrame:
    """Write the corpus as ``path/shard=K/...`` hive partitions, each
    shard internally sorted by ``order_col`` (default: the shard key
    column) so loaders stream deterministically. One shuffle: an exact
    1:1 repartition on the shard id (``n_shards`` partitions keyed by the
    shard value itself — no hash collision can fuse two shards into one
    task), then ``sortWithinPartitions`` rides the same exchange. Returns
    the manifest DataFrame computed from the SAME assignment."""
    sharded = assign_shards(df, key_col, n_shards, seed)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(order_col or key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return shard_manifest(df, key_col, n_shards=n_shards, seed=seed)


def pack_next_fit(
    df: DataFrame,
    tok_col: Column,
    budget: int,
    key_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("lang",),
    n_buckets: int = 4,
    seed: str = "pack",
) -> DataFrame:
    """Next-fit sequence packing: walk each packing group in ``key_col``
    order, appending documents to the current bin until the token budget
    would overflow, then open a new bin — the streaming-friendly packing
    discipline training pipelines use (an oversized document gets a bin
    of its own). Output: one row per document with its ``bin`` (1-based
    per group) and ``fill_after`` (bin occupancy including the doc).

    Packing is inherently a sequential fold, so the unit of sequence is
    bounded explicitly: groups are ``group_cols`` × a content-addressed
    ``bucket`` (md5 of the key, so membership is stable under corpus
    growth). Within a group the fold runs JVM-side — ``sort_array`` over
    a collected struct array, then ``aggregate`` with a struct
    accumulator; no Python crosses the row path. At 100 TB you raise
    ``n_buckets`` so each group's array stays executor-memory-sized: the
    shuffle is one hash partition on (group, bucket) and the fold is
    O(group) with no further exchange."""
    bucket = shard_key(F.col(key_col), n_buckets, seed).alias("bucket")
    base = df.select(
        *group_cols, bucket, F.col(key_col), tok_col.cast("int").alias("_tc")
    )
    gb = [*group_cols, "bucket"]
    grouped = base.groupBy(*gb).agg(
        F.sort_array(F.collect_list(F.struct(key_col, "_tc"))).alias("_docs")
    )
    key_t = base.schema[key_col].dataType.simpleString()
    acc_t = f"array<struct<{key_col}:{key_t},bin:int,fill:int>>"
    zero = F.struct(
        F.array().cast(acc_t).alias("out"),
        F.lit(0).alias("bin"),
        F.lit(0).alias("fill"),
    )

    def step(acc, x):
        # empty-accumulator detection keys on bin == 0, NOT fill == 0: a
        # zero-token document legitimately leaves fill at 0, and a
        # fill-based sentinel would reset the bin counter after it
        # (caught by the hypothesis replay in test_pack_properties.py)
        opens = (acc["bin"] == 0) | (acc["fill"] + x["_tc"] > budget)
        nbin = F.when(opens, acc["bin"] + 1).otherwise(acc["bin"])
        nfill = F.when(opens, x["_tc"]).otherwise(acc["fill"] + x["_tc"])
        return F.struct(
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x[key_col].alias(key_col),
                        nbin.alias("bin"),
                        nfill.alias("fill"),
                    )
                ),
            ).alias("out"),
            nbin.alias("bin"),
            nfill.alias("fill"),
        )

    folded = grouped.select(
        *gb, F.aggregate("_docs", zero, step)["out"].alias("_packed")
    )
    ex = folded.select(*gb, F.explode("_packed").alias("_e"))
    return ex.select(
        *gb,
        F.col(f"_e.{key_col}").alias(key_col),
        F.col("_e.bin").alias("bin"),
        F.col("_e.fill").alias("fill_after"),
    )
