"""Per-partition Bloom pruning index: metadata-only point-lookup planning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import bloomindex as BI
from cernbox_migration_database_spark.operators import table_format as TF


def _base(spark, n=200):
    return spark.createDataFrame(
        [Row(id=i, day=f"d{i % 5}", val=float(i)) for i in range(n)]
    )


def test_python_positions_match_spark_expression(spark):
    """The driver-side probe hash must be bit-identical to the executor-side
    build hash — the invariant the whole index rests on."""
    from cernbox_migration_database_spark.operators.sketches import bloom_pos

    for v in [7, "abc", 123456789, "ünïcødé"]:
        sp = (
            spark.range(1)
            .select(
                *[
                    bloom_pos(F.lit(str(v)), i, 1 << 14).alias(f"p{i}")
                    for i in range(4)
                ]
            )
            .collect()[0]
        )
        assert [sp[f"p{i}"] for i in range(4)] == BI._py_positions(v, range(4), 1 << 14)


def test_lookup_prunes_and_never_misses(spark, tmp_path):
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.bloomindex.json")
    TF.create_table(_base(spark), root, partition_by="day")
    BI.create_bloom_index(spark, root, idx, key="id")

    out = BI.bloom_prune_lookup(spark, idx, [7, 13])  # days d2 and d3
    rows = sorted((r["id"], r["day"]) for r in out.collect())
    assert rows == [(7, "d2"), (13, "d3")]
    # pruning evidence: fewer partition dirs read than exist; the true
    # partitions are always among them (no false negatives)
    read_files = [
        r[0] for r in out.select(F.input_file_name()).distinct().collect()
    ]
    days = {os.path.basename(os.path.dirname(f)) for f in read_files}
    assert {"day=d2", "day=d3"} <= days and len(days) < 5

    # every existing key's partition passes its bloom (exhaustive)
    truth = {r["id"]: r["day"] for r in TF.read_table(spark, root).collect()}
    for key_val, day in truth.items():
        got = {(r["id"], r["day"]) for r in BI.bloom_prune_lookup(spark, idx, [key_val]).collect()}
        assert got == {(key_val, day)}


def test_float_and_timestamp_keys_never_false_negative(spark, tmp_path):
    """ADVICE r4: Python str(1e-07) != Spark CAST(1e-07 AS STRING)
    ('1e-07' vs '1.0E-7'), so a driver-side str() probe on a double key
    silently skipped partitions containing the key. Non-integer/string
    keys must probe through the Spark expression and find every key."""
    import datetime as dt

    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.bloomindex.json")
    vals = [1e-07, 2.5, 1234.0625, 3.333333333, 1e20, 0.1]
    df = spark.createDataFrame(
        [Row(id=i, day=f"d{i % 3}", price=v) for i, v in enumerate(vals)]
    )
    TF.create_table(df, root, partition_by="day")
    BI.create_bloom_index(spark, root, idx, key="price")
    for i, v in enumerate(vals):
        got = {
            (r["id"], r["price"])
            for r in BI.bloom_prune_lookup(spark, idx, [v]).collect()
        }
        assert got == {(i, v)}, f"false negative for double key {v!r}"

    root2 = str(tmp_path / "t2")
    idx2 = str(tmp_path / "t2.bloomindex.json")
    stamps = [dt.datetime(2024, 1, 1, 0, 0, i) for i in range(6)]
    df2 = spark.createDataFrame(
        [Row(id=i, day=f"d{i % 3}", ts=s) for i, s in enumerate(stamps)]
    )
    TF.create_table(df2, root2, partition_by="day")
    BI.create_bloom_index(spark, root2, idx2, key="ts")
    for i, s in enumerate(stamps):
        got = {
            r["id"] for r in BI.bloom_prune_lookup(spark, idx2, [s]).collect()
        }
        assert got == {i}, f"false negative for timestamp key {s!r}"


def test_refresh_is_add_only_and_stays_correct(spark, tmp_path):
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.bloomindex.json")
    TF.create_table(_base(spark), root, partition_by="day")
    BI.create_bloom_index(spark, root, idx, key="id")

    # insert a brand-new key into a brand-new partition; move one; delete one
    TF.merge_into(
        spark,
        root,
        spark.createDataFrame(
            [Row(id=7, day="d9", val=7.0), Row(id=5000, day="d9", val=1.0)]
        ),
        on="id",
    )
    TF.delete_where(spark, root, "id = 12")
    assert BI.refresh_bloom_index(spark, idx) == 3

    got = sorted(
        (r["id"], r["day"])
        for r in BI.bloom_prune_lookup(spark, idx, [7, 5000, 12]).collect()
    )
    assert got == [(7, "d9"), (5000, "d9")]  # moved + inserted found, deleted gone
    # add-only: the deleted key's old bits remain (false-positive read is
    # allowed) but the KEY filter keeps the result exact — asserted above.
    # idempotent refresh: nothing to fold
    assert BI.refresh_bloom_index(spark, idx) == 3


def test_bad_geometry_and_unpartitioned_rejected(spark, tmp_path):
    root = str(tmp_path / "u")
    TF.create_table(_base(spark), root)  # unpartitioned
    with pytest.raises(ValueError, match="partitioned"):
        BI.create_bloom_index(spark, root, str(tmp_path / "x.json"), key="id")
    root2 = str(tmp_path / "p")
    TF.create_table(_base(spark), root2, partition_by="day")
    with pytest.raises(ValueError, match="multiple of 8"):
        BI.create_bloom_index(spark, root2, str(tmp_path / "y.json"), key="id", m_bits=100)


def test_debt_report_and_rebuild_cycle(spark, tmp_path):
    """r11 verdict item 1: add-only staleness is metered and priced. A
    deletion-heavy history trips deleted_fraction, the prescribed rebuild
    re-tightens (measurably lower false-positive estimate), and lookups
    stay exact throughout."""
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.bloomindex.json")
    TF.create_table(_base(spark), root, partition_by="day")
    # small m so per-partition fill (and its decay) is measurable
    BI.create_bloom_index(spark, root, idx, key="id", m_bits=256)
    rep0 = BI.bloom_debt_report(idx)
    assert rep0["drifted"] is False and rep0["deleted_fraction"] == 0.0
    assert rep0["fp_ratio"] == 1.0 and rep0["ref_fp_rate"] is not None

    gone = TF.read_table(spark, root).where(F.col("id") >= 40)
    TF.merge_into(
        spark, root, gone, on="id",
        when_matched="delete", when_not_matched=None,
    )
    assert BI.refresh_bloom_index(spark, idx) == 2
    rep1 = BI.bloom_debt_report(idx)
    assert rep1["deletes_since_build"] == 160
    assert rep1["deleted_fraction"] > rep1["deleted_fraction_threshold"]
    assert rep1["drifted"] is True
    assert rep1["action"] == "rebuild_bloom_index"
    # stale bits are false-positive reads, never misses: still exact
    got = {r["id"] for r in BI.bloom_prune_lookup(spark, idx, [7, 13]).collect()}
    assert got == {7, 13}

    BI.rebuild_bloom_index(spark, idx)
    rep2 = BI.bloom_debt_report(idx)
    assert rep2["drifted"] is False and rep2["deleted_fraction"] == 0.0
    # the rebuild actually re-tightened pruning
    assert rep2["est_fp_rate"] < rep1["est_fp_rate"]
    got = {r["id"] for r in BI.bloom_prune_lookup(spark, idx, [7, 13]).collect()}
    assert got == {7, 13}


def test_lookup_raises_when_index_lags_base(spark, tmp_path):
    """An unfolded INSERT would be silently missed — the probe must
    refuse to plan against a lagging index."""
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.bloomindex.json")
    TF.create_table(_base(spark), root, partition_by="day")
    BI.create_bloom_index(spark, root, idx, key="id")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=9999, day="d9", val=1.0)]),
        on="id", when_matched=None,
    )
    with pytest.raises(ValueError, match="refresh_bloom_index"):
        BI.bloom_prune_lookup(spark, idx, [9999])
    BI.refresh_bloom_index(spark, idx)
    got = {r["id"] for r in BI.bloom_prune_lookup(spark, idx, [9999]).collect()}
    assert got == {9999}


def test_streaming_sink_post_batch_keeps_index_probe_safe(spark, tmp_path):
    """Live-pipeline wiring (the histstore/lshindex post_batch twin): a
    streaming sink whose hook runs refresh_bloom_index keeps the index
    fold-current through insert microbatches, so the probe's version-lag
    guard never trips and lookups stay exact; a crash-replayed
    microbatch is a txn-marked no-op the hook survives."""
    from cernbox_migration_database_spark.streaming.table_sink import (
        exactly_once_batch_writer,
    )

    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.bloomindex.json")
    TF.create_table(_base(spark), root, partition_by="day")
    BI.create_bloom_index(spark, root, idx, key="id")

    def _batch(rows):
        return spark.createDataFrame(
            [Row(id=i, day=f"d{i % 5}", val=float(i)) for i in rows]
        )

    apply = exactly_once_batch_writer(
        root, app_id="bloom", key="id",
        post_batch=lambda sp: BI.refresh_bloom_index(sp, idx),
    )
    apply(_batch([1000, 1001]), 1)
    apply(_batch([2002]), 2)
    got = {
        r["id"]
        for r in BI.bloom_prune_lookup(
            spark, idx, [1000, 1001, 2002, 7]
        ).collect()
    }
    assert got == {1000, 1001, 2002, 7}
    # crash-replay: merge no-ops, hook sees no new version, still exact
    apply(_batch([2002]), 2)
    got = {r["id"] for r in BI.bloom_prune_lookup(spark, idx, [2002]).collect()}
    assert got == {2002}
