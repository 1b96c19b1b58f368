"""Side-effecting sink shape (S10/X1): bounded-parallelism foreachPartition
writes — the Spark form of the reference's 20-goroutine semaphore + per-row
UPDATE (main.go:217-240, 260-271)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators.merge import (
    jdbc_upsert_writer,
    merge_updates,
)


def test_foreach_partition_bounded_sink(spark):
    """Drive the merged update set through a foreachPartition sink with
    bounded width (repartition(4) = the X1 concurrency bound) and verify
    every updated row was 'written' exactly once."""
    base = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.0).alias("val")
    )
    updates = base.filter(F.col("id") % 3 == 0).select(
        "id", (F.col("val") + 1000).alias("val")
    )
    merged = merge_updates(base, updates, key="id", update_cols=["val"])
    to_write = merged.filter("updated").repartition(4)

    out_dir = tempfile.mkdtemp()

    def write_partition(rows):
        # one 'connection' per partition (the prepared-statement analogue);
        # file-per-partition keeps executor-side state observable
        import uuid

        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}")
        with open(path, "w") as f:
            for r in rows:
                f.write(f"{r['id']},{r['val']}\n")

    to_write.foreachPartition(write_partition)

    written = {}
    nfiles = 0
    for name in os.listdir(out_dir):
        nfiles += 1
        for line in open(os.path.join(out_dir, name)):
            k, v = line.strip().split(",")
            written[int(k)] = float(v)
    assert nfiles <= 4  # bounded width held
    assert set(written) == {i for i in range(100) if i % 3 == 0}
    assert written[3] == 3 * 2.0 + 1000


def test_jdbc_writer_is_marked_stub(spark):
    writer = jdbc_upsert_writer("jdbc:mysql://x", "t", "id", ["v"])
    with pytest.raises(NotImplementedError, match="DBAPI"):
        writer(iter([]))


def test_merge_rejects_duplicate_update_keys(spark):
    base = spark.range(10).select(F.col("id"), F.lit(1.0).alias("v"))
    dup = spark.createDataFrame([(1, 2.0), (1, 3.0)], "id long, v double")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_updates(base, dup, key="id", update_cols=["v"])
