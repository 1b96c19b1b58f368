"""Commit-history data source (PySpark Python Data Source API): batch SQL
over the commit log + streaming commit events with exactly-once restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import table_format as TF
from cernbox_migration_database_spark.sources.table_history import (
    register_table_history,
)


def _mk_table(spark, root):
    df = spark.range(40).select(
        "id", (F.col("id") % 2).cast("int").alias("p"), (F.col("id") * 2).alias("v")
    )
    TF.create_table(df, root, partition_by="p")


def test_history_batch_read_matches_commit_log(spark, tmp_path):
    register_table_history(spark)
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    TF.delete_where(spark, root, "id = 3", mode="mor")
    TF.update_where(spark, root, "id = 4", {"v": "99"})
    TF.compact(spark, root)
    got = (
        spark.read.format("table_history")
        .option("root", root)
        .load()
        .orderBy("version")
        .collect()
    )
    assert [(r["version"], r["action"]) for r in got] == [
        (1, "create"),
        (2, "delete_mor"),
        (3, "update"),
        (4, "compact"),
    ]
    # touched-partition metadata surfaces for data commits
    by_v = {r["version"]: r for r in got}
    assert by_v[2]["n_touched_partitions"] == 1
    assert by_v[2]["touched_partitions"] == ["p=1"]
    assert by_v[3]["touched_partitions"] == ["p=0"]
    # filters work as plain SQL over the relation
    n_data = (
        spark.read.format("table_history")
        .option("root", root)
        .load()
        .where("action NOT IN ('compact', 'compact_partitions', 'create')")
        .count()
    )
    assert n_data == 2


def test_history_stream_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    """A restarted stream (same checkpoint) must emit ONLY commits that
    landed after the last batch — the version-offset contract — and a
    fresh stream with startingVersion skips the prefix."""
    register_table_history(spark)
    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _mk_table(spark, root)
    TF.delete_where(spark, root, "id = 3", mode="mor")

    def run_once():
        q = (
            spark.readStream.format("table_history")
            .option("root", root)
            .load()
            .select("version", "action")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {
        (r["version"], r["action"]) for r in spark.read.parquet(out).collect()
    }
    assert first == {(1, "create"), (2, "delete_mor")}

    TF.update_where(spark, root, "id = 4", {"v": "99"}, mode="mor")
    TF.compact(spark, root)
    run_once()  # same checkpoint: only versions 3 and 4 are new
    second = {
        (r["version"], r["action"]) for r in spark.read.parquet(out).collect()
    }
    assert second == first | {(3, "update_mor"), (4, "compact")}

    # startingVersion: a monitoring consumer that only wants NEW activity
    q = (
        spark.readStream.format("table_history")
        .option("root", root)
        .option("startingVersion", 3)
        .load()
        .writeStream.format("memory")
        .queryName("tail_hist")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    tail = spark.sql("SELECT version FROM tail_hist").collect()
    assert sorted(r["version"] for r in tail) == [4]
    assert os.path.isdir(ckpt)
