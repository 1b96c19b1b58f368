"""Per-partition zone maps: range-pruned scans with widen-only refresh."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import table_format as TF
from cernbox_migration_database_spark.operators import zonemap as ZM


def _base(spark):
    # day dX holds vals [100*x, 100*x + 49] — disjoint, orderable zones
    return spark.createDataFrame(
        [
            Row(id=x * 100 + j, day=f"d{x}", val=float(x * 100 + j))
            for x in range(5)
            for j in range(50)
        ]
    )


def test_range_scan_prunes_and_never_misses(spark, tmp_path):
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.zonemap.json")
    TF.create_table(_base(spark), root, partition_by="day")
    ZM.create_zone_map(spark, root, idx, col="val", key="id")

    out = ZM.range_prune_scan(spark, idx, 120.0, 230.0)
    got = sorted(r["val"] for r in out.collect())
    assert got == [float(v) for v in list(range(120, 150)) + list(range(200, 231))]
    read_files = [
        r[0] for r in out.select(F.input_file_name()).distinct().collect()
    ]
    days = {os.path.basename(os.path.dirname(f)) for f in read_files}
    assert days == {"day=d1", "day=d2"}  # d0, d3, d4 zone-pruned

    # empty range overlapping no zone reads nothing
    assert ZM.range_prune_scan(spark, idx, 50.0, 99.0).count() == 0


def test_refresh_widens_and_deletes_are_noops(spark, tmp_path):
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.zonemap.json")
    TF.create_table(_base(spark), root, partition_by="day")
    ZM.create_zone_map(spark, root, idx, col="val", key="id")

    # widen d0's zone upward and open a new partition
    TF.merge_into(
        spark,
        root,
        spark.createDataFrame(
            [Row(id=9001, day="d0", val=75.0), Row(id=9002, day="d9", val=950.0)]
        ),
        on="id",
    )
    TF.delete_where(spark, root, "day = 'd4'")
    assert ZM.refresh_zone_map(spark, idx) == 3

    got = sorted(r["val"] for r in ZM.range_prune_scan(spark, idx, 60.0, 80.0).collect())
    assert got == [75.0]  # the widened zone admits d0 now
    assert {r["val"] for r in ZM.range_prune_scan(spark, idx, 940.0, 960.0).collect()} == {950.0}
    # deleted partition: zone stays (false-positive read) but result is exact
    assert ZM.range_prune_scan(spark, idx, 400.0, 449.0).count() == 0
    # idempotent
    assert ZM.refresh_zone_map(spark, idx) == 3


def test_type_and_partitioning_validation(spark, tmp_path):
    root = str(tmp_path / "u")
    TF.create_table(_base(spark), root)  # unpartitioned
    with pytest.raises(ValueError, match="partitioned"):
        ZM.create_zone_map(spark, root, str(tmp_path / "x.json"), col="val", key="id")
    root2 = str(tmp_path / "p")
    df = _base(spark).withColumn("arr", F.array(F.col("val")))
    TF.create_table(df, root2, partition_by="day")
    with pytest.raises(ValueError, match="unsupported"):
        ZM.create_zone_map(spark, root2, str(tmp_path / "y.json"), col="arr", key="id")
    with pytest.raises(ValueError, match="not in"):
        ZM.create_zone_map(spark, root2, str(tmp_path / "z.json"), col="nope", key="id")


def test_zone_debt_report_and_rebuild_cycle(spark, tmp_path):
    """r11 verdict item 1: widen-only staleness is metered against the
    manifest's per-file stats (metadata-only). COW deletes tighten the
    files but never the zones — slack and retired partitions trip the
    report, the prescribed rebuild re-tightens, scans stay exact."""
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.zonemap.json")
    TF.create_table(_base(spark), root, partition_by="day")
    ZM.create_zone_map(spark, root, idx, col="val", key="id")
    rep0 = ZM.zone_debt_report(idx)
    assert rep0["drifted"] is False and rep0["stale_partitions"] == {}

    # shrink d1 and d3 to their bottom fifth, retire d4 entirely
    cur = TF.read_table(spark, root)
    gone = cur.where(
        (F.col("day").isin("d1", "d3") & (F.col("val") % 100 >= 10))
        | (F.col("day") == "d4")
    )
    TF.merge_into(
        spark, root, gone, on="id",
        when_matched="delete", when_not_matched=None,
    )
    ZM.refresh_zone_map(spark, idx)  # widen-only: zones unchanged
    rep1 = ZM.zone_debt_report(idx)
    assert set(rep1["stale_partitions"]) == {"d1", "d3", "d4"}, rep1
    assert "retired" in rep1["stale_partitions"]["d4"]
    assert rep1["drifted"] is True and rep1["action"] == "rebuild_zone_map"
    # stale zones are false-positive reads, never misses: still exact
    got = sorted(
        r["val"] for r in ZM.range_prune_scan(spark, idx, 100.0, 120.0).collect()
    )
    assert got == [float(v) for v in range(100, 110)]

    ZM.rebuild_zone_map(spark, idx)
    rep2 = ZM.zone_debt_report(idx)
    assert rep2["drifted"] is False and rep2["stale_partitions"] == {}
    got = sorted(
        r["val"] for r in ZM.range_prune_scan(spark, idx, 100.0, 120.0).collect()
    )
    assert got == [float(v) for v in range(100, 110)]


def test_range_scan_raises_when_map_lags_base(spark, tmp_path):
    """An unfolded INSERT may be outside every stored bound — the scan
    must refuse to prune with a lagging map."""
    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.zonemap.json")
    TF.create_table(_base(spark), root, partition_by="day")
    ZM.create_zone_map(spark, root, idx, col="val", key="id")
    TF.merge_into(
        spark, root,
        spark.createDataFrame([Row(id=99999, day="d9", val=9999.0)]),
        on="id", when_matched=None,
    )
    with pytest.raises(ValueError, match="refresh_zone_map"):
        ZM.range_prune_scan(spark, idx, 9000.0, 10000.0)
    ZM.refresh_zone_map(spark, idx)
    got = {r["val"] for r in ZM.range_prune_scan(spark, idx, 9000.0, 10000.0).collect()}
    assert got == {9999.0}


def test_streaming_sink_post_batch_keeps_map_scan_safe(spark, tmp_path):
    """Streaming twin for the zone map: post_batch refresh keeps bounds
    fold-current (the scan's version-lag guard never trips), widened
    zones admit the new rows, and a replayed microbatch no-ops."""
    from cernbox_migration_database_spark.streaming.table_sink import (
        exactly_once_batch_writer,
    )

    root = str(tmp_path / "t")
    idx = str(tmp_path / "t.zonemap.json")
    TF.create_table(_base(spark), root, partition_by="day")
    ZM.create_zone_map(spark, root, idx, col="val", key="id")

    apply = exactly_once_batch_writer(
        root, app_id="zone", key="id",
        post_batch=lambda sp: ZM.refresh_zone_map(sp, idx),
    )
    apply(
        spark.createDataFrame([Row(id=9001, day="d1", val=9001.0)]), 1
    )
    apply(
        spark.createDataFrame([Row(id=9002, day="d9", val=9002.0)]), 2
    )
    got = {
        r["val"]
        for r in ZM.range_prune_scan(spark, idx, 9000.0, 9100.0).collect()
    }
    assert got == {9001.0, 9002.0}
    apply(  # crash-replay no-op
        spark.createDataFrame([Row(id=9002, day="d9", val=9002.0)]), 2
    )
    assert ZM.range_prune_scan(spark, idx, 9000.0, 9100.0).count() == 2
