"""Per-partition zone maps (min/max bounds) for range-pruned scans.

The range-predicate companion to the Bloom pruning index (bloomindex.py):
where the bloom answers "may this partition contain key = ?", the zone map
answers "may this partition contain col BETWEEN lo AND hi" from one
(min, max, has_null) triple per partition — exactly what Iceberg manifests
and parquet row-group footers keep, lifted to partition granularity so the
planning happens DRIVER-SIDE on a KiB-sized sidecar before any file is
listed.

Scale properties, same contract as the bloom index:

* The whole map is ``n_partitions x 1`` bound rows of metadata; building
  it is one (partition, min, max) aggregate — map-side combinable, the
  collect bounded by partition count.
* Maintenance is WIDEN-ONLY from the change feed: insert/update
  post-images can only widen a partition's bounds (O(changed rows), no
  shuffle beyond the CDF diff). Deletes are no-ops — bounds stay wide, a
  pruned read admits a partition that no longer has matching rows (false
  positive), never skips one that does. Rebuild after heavy deletion or a
  compact to re-tighten.
* Works for any orderable column the partition scheme does NOT cover —
  the classic case: date-partitioned facts, zone-mapped on a monotone-ish
  id or amount, so both time ranges (partition pruning) and value ranges
  (zone pruning) skip data.

Bounds are stored as JSON-native values; supported column types are the
ones whose Python collect round-trips exactly (int, float, str) — pinned
by a type check at build time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table_format import current_version, partition_scheme, read_changes, read_table

_SUPPORTED_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "float",
    "double",
    "decimal",
    "string",
    "date",
)


def _check_col_type(df: DataFrame, col: str) -> str:
    t = dict(df.dtypes).get(col)
    if t is None:
        raise ValueError(f"column {col!r} not in {df.columns}")
    if not t.startswith(_SUPPORTED_PREFIXES):
        raise ValueError(
            f"zone map on {col!r} of type {t} unsupported — bounds must "
            "JSON-round-trip exactly (int/float/decimal/string/date)"
        )
    return t


def _norm(v):
    """JSON-native form of a bound (date/Decimal -> str)."""
    if v is None:
        return None
    return v if isinstance(v, (int, float, str)) else str(v)


def _bounds(df: DataFrame, col: str, part_col: str) -> dict:
    rows = (
        df.select(
            F.col(part_col).cast("string").alias("__p"), F.col(col).alias("__c")
        )
        .groupBy("__p")
        .agg(
            F.min("__c").alias("lo"),
            F.max("__c").alias("hi"),
            F.max(F.col("__c").isNull().cast("int")).alias("has_null"),
        )
        .collect()
    )
    return {
        r["__p"]: {
            "lo": _norm(r["lo"]),
            "hi": _norm(r["hi"]),
            "has_null": bool(r["has_null"]),
        }
        for r in rows
    }


def _write_state(index_path: str, st: dict) -> None:
    tmp = index_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(st, fh)
    os.replace(tmp, index_path)


def _read_state(index_path: str) -> dict:
    with open(index_path, encoding="utf-8") as fh:
        return json.load(fh)


def create_zone_map(
    spark: SparkSession, base_root: str, index_path: str, col: str, key: str
) -> int:
    """Build per-partition (min, max, has_null) of ``col`` at the base's
    current version. ``key`` is the table's merge key — the refresh diffs
    the change feed on it. One aggregate scan; the sidecar is
    partition-count rows of JSON. Returns the indexed base version."""
    part_col = partition_scheme(base_root)
    if not part_col or not isinstance(part_col, str):
        raise ValueError(
            "zone map requires a single-column-partitioned base table, "
            f"got partition scheme {part_col!r}"
        )
    base_v = current_version(base_root)
    base = read_table(spark, base_root, base_v)
    _check_col_type(base, col)
    st = {
        "base_root": base_root,
        "base_version": base_v,
        "col": col,
        "key": key,
        "part_col": part_col,
        "zones": {
            ("\x00null" if p is None else p): b
            for p, b in _bounds(base, col, part_col).items()
        },
    }
    _write_state(index_path, st)
    return base_v


def refresh_zone_map(spark: SparkSession, index_path: str) -> int:
    """Widen bounds from the base change feed: insert/update post-images
    fold in via min/max merge; deletes are no-ops by design (bounds stay
    wide — false-positive partition reads, never misses)."""
    st = _read_state(index_path)
    cur = current_version(st["base_root"])
    if cur == st["base_version"]:
        return cur
    ch = read_changes(
        spark,
        st["base_root"],
        key=st["key"],
        from_version=st["base_version"],
        to_version=cur,
    )
    adds = ch.where(F.col("_change_type").isin("insert", "update"))
    for p, b in _bounds(adds, st["col"], st["part_col"]).items():
        key = "\x00null" if p is None else p
        cur_b = st["zones"].get(key)
        if cur_b is None:
            st["zones"][key] = b
        else:
            if b["lo"] is not None and (cur_b["lo"] is None or b["lo"] < cur_b["lo"]):
                cur_b["lo"] = b["lo"]
            if b["hi"] is not None and (cur_b["hi"] is None or b["hi"] > cur_b["hi"]):
                cur_b["hi"] = b["hi"]
            cur_b["has_null"] = cur_b["has_null"] or b["has_null"]
    st["base_version"] = cur
    _write_state(index_path, st)
    return cur


def range_prune_scan(
    spark: SparkSession, index_path: str, lo, hi
) -> DataFrame:
    """Scan ``col BETWEEN lo AND hi`` reading only partitions whose zone
    overlaps the range (driver-side interval test on the sidecar). The
    returned plan carries both the partition filter and the range filter,
    so file listing is already restricted before parquet row-group stats
    prune further."""
    st = _read_state(index_path)
    nlo, nhi = _norm(lo), _norm(hi)
    parts = [
        p
        for p, b in st["zones"].items()
        if b["lo"] is not None
        and b["hi"] is not None
        and not (b["hi"] < nlo or b["lo"] > nhi)
    ]
    base = read_table(spark, st["base_root"])
    pc = F.col(st["part_col"]).cast("string")
    pred = pc.isin([p for p in parts if p != "\x00null"])
    if "\x00null" in parts:
        pred = pred | F.col(st["part_col"]).isNull()
    return base.where(pred & F.col(st["col"]).between(lo, hi))
