"""Per-partition Bloom pruning index for versioned tables.

The probabilistic sibling of the record-level key index (keyindex.py), the
shape of Delta's Bloom filter index / Iceberg puffin blobs: one fixed-size
Bloom bitset PER PARTITION over the key column. A point lookup probes the
bitsets DRIVER-SIDE (n_partitions x k hash tests on pure metadata — no
index-table scan at all) and reads only partitions that MAY contain a
probe key.

Why it complements keyindex at 100 TB:

* The whole index is ``n_partitions x m/8`` bytes of metadata (KiB-MiB),
  not O(n_keys) index rows — no side TABLE to scan, merge, or compact;
  lookup planning costs zero cluster work.
* Maintenance is ADD-ONLY from the change feed: inserts and updates OR
  their key's positions into the destination partition's bitset. Deletes
  (and the source half of partition-moving updates) need NO action — a
  stale bit can only cause a false-positive partition read, never a miss,
  so pruning stays CORRECT and merely less tight until the next rebuild
  (rebuild with create_bloom_index after heavy deletion or a compact).
* The trade against keyindex: probabilistic (reads ~fp_rate extra
  partitions) and add-only, but maintenance never shuffles and the lookup
  never touches storage before the pruned base read.

Hashes are the same md5-derived positions as sketches.bloom_pos with the
key CAST TO STRING first, so the driver-side Python probe (hashlib.md5)
is bit-identical to the executor-side build — pinned by test.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sketches import bloom_pos
from .table_format import current_version, partition_scheme, read_changes, read_table

_STATE_SUFFIX = ".bloomindex.json"


def _py_positions(value, i_range: range, m_bits: int) -> list[int]:
    """Python twin of sketches.bloom_pos on the STRINGIFIED key — must stay
    bit-identical to the Spark expression (test-pinned). Only valid for key
    types whose Python str() rendering equals Spark's CAST(.. AS STRING)
    (integers and strings); other types go through _probe_positions."""
    s = str(value)
    return [
        int(hashlib.md5(f"{s}#{i}".encode()).hexdigest()[:13], 16) % m_bits
        for i in i_range
    ]


# Key types where Python str(value) is provably identical to Spark's
# CAST(key AS STRING), so the zero-job driver probe is safe.
_PY_STR_SAFE_TYPES = {"string", "tinyint", "smallint", "int", "bigint"}


def _probe_positions(
    spark: SparkSession, values: list, key_type: str, k: int, m_bits: int
) -> dict:
    """Probe positions computed with the SAME Spark expression pipeline as
    the build side (CAST to the key's column type, then to STRING, then
    bloom_pos). For float ('1e-07' vs '1.0E-7'), boolean ('True' vs
    'true'), timestamp, and decimal keys the Python and Spark string
    renderings differ, so hashing str(value) driver-side would probe the
    WRONG bits and silently skip partitions that contain the key — a
    false negative the index contract forbids. One local job over
    len(values) rows; no table data touched."""
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, ["__i", "__v"])
    ks = F.col("__v").cast(key_type).cast("string")
    out = df.select(
        "__i", F.array(*[bloom_pos(ks, j, m_bits) for j in range(k)]).alias("pos")
    ).collect()
    return {values[r["__i"]]: list(r["pos"]) for r in out}


def _part_positions(
    df: DataFrame, key: str, part_col: str, m_bits: int, k: int
) -> dict:
    """(partition value -> set of bit positions) for every key in ``df`` —
    ONE distributed job; the collect is bounded by n_partitions x m_bits,
    metadata-sized by construction."""
    ks = F.col(key).cast("string")
    # Partition values are normalized to STRING form here (and kept string
    # through the JSON state round-trip) so int-partitioned tables don't
    # split one partition across 5-vs-'5' dict keys on refresh.
    rows = (
        df.select(
            F.col(part_col).cast("string").alias("__p"),
            F.explode(
                F.array(*[bloom_pos(ks, i, m_bits) for i in range(k)])
            ).alias("pos"),
        )
        .distinct()
        .collect()
    )
    out: dict = {}
    for r in rows:
        out.setdefault(r["__p"], set()).add(r["pos"])
    return out


def _fold(bitsets: dict, positions: dict, m_bits: int) -> None:
    for part, poss in positions.items():
        cur = bytearray(bitsets.get(part) or bytes(m_bits // 8))
        for p in poss:
            cur[p >> 3] |= 1 << (p & 7)
        bitsets[part] = bytes(cur)


def _write_state(index_path: str, st: dict, bitsets: dict) -> None:
    payload = {
        **st,
        "blooms": {
            ("\x00null" if p is None else str(p)): b.hex()
            for p, b in bitsets.items()
        },
    }
    tmp = index_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh)
    os.replace(tmp, index_path)


def _read_state(index_path: str) -> tuple[dict, dict]:
    with open(index_path, encoding="utf-8") as fh:
        payload = json.load(fh)
    blooms = {
        (None if p == "\x00null" else p): bytes.fromhex(h)
        for p, h in payload.pop("blooms").items()
    }
    return payload, blooms


def create_bloom_index(
    spark: SparkSession,
    base_root: str,
    index_path: str,
    key: str,
    m_bits: int = 1 << 14,
    k: int = 4,
) -> int:
    """Build the per-partition bitsets at the base table's current version.
    One base scan (key + partition column only); everything after is
    metadata. Returns the indexed base version."""
    part_col = partition_scheme(base_root)
    if not part_col or not isinstance(part_col, str):
        raise ValueError(
            "bloom index requires a single-column-partitioned base table, "
            f"got partition scheme {part_col!r}"
        )
    if m_bits % 8:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")
    base_v = current_version(base_root)
    base = read_table(spark, base_root, base_v)
    bitsets: dict = {}
    _fold(bitsets, _part_positions(base, key, part_col, m_bits, k), m_bits)
    st = {
        "base_root": base_root,
        "base_version": base_v,
        "key": key,
        "part_col": part_col,
        "m_bits": m_bits,
        "k": k,
    }
    _write_state(index_path, st, bitsets)
    return base_v


def refresh_bloom_index(spark: SparkSession, index_path: str) -> int:
    """Fold the base change feed into the bitsets: insert/update keys OR
    their positions into the post-image partition. Deletes are a NO-OP by
    design (add-only; stale bits are false-positive reads, never misses).
    O(changed rows) cluster work, zero shuffle beyond the CDF diff."""
    st, bitsets = _read_state(index_path)
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
    _fold(
        bitsets,
        _part_positions(adds, st["key"], st["part_col"], st["m_bits"], st["k"]),
        st["m_bits"],
    )
    st["base_version"] = cur
    _write_state(index_path, st, bitsets)
    return cur


def _may_contain(bitset: bytes, positions: list[int]) -> bool:
    return all(bitset[p >> 3] & (1 << (p & 7)) for p in positions)


def bloom_prune_lookup(
    spark: SparkSession, index_path: str, values: list
) -> DataFrame:
    """Point lookup pruned by the bitsets: a partition is read iff its
    bloom MAY contain at least one probe value (no false negatives — a
    present key's partition always passes). The probe itself is
    driver-side metadata arithmetic; the returned plan reads only the
    admitted partition directories with the key filter pushed down."""
    st, blooms = _read_state(index_path)
    k, m = st["k"], st["m_bits"]
    base = read_table(spark, st["base_root"])
    key_type = dict(base.dtypes)[st["key"]]
    if key_type in _PY_STR_SAFE_TYPES:
        # zero-job driver probe: Python str(value) is bit-identical to
        # Spark's cast for integer/string keys (test-pinned)
        probe_pos = {v: _py_positions(v, range(k), m) for v in values}
    else:
        probe_pos = _probe_positions(spark, values, key_type, k, m)
    parts = [
        part
        for part, bitset in blooms.items()
        if any(_may_contain(bitset, pos) for pos in probe_pos.values())
    ]
    # Compare in string space (the state's normalized form). The cast is a
    # deterministic expression of the partition column alone, so partition
    # pruning still evaluates it driver-side against the directory values
    # (executed-file evidence in tests).
    pc = F.col(st["part_col"]).cast("string")
    pred = pc.isin([p for p in parts if p is not None])
    if any(p is None for p in parts):
        pred = pred | F.col(st["part_col"]).isNull()
    return base.where(pred & F.col(st["key"]).isin(values))
