"""Mergeable sketches for the 100 TB ingest path: count-min (heavy
hitters), KMV (deterministic approx-distinct), and a Bloom filter
(zero-join membership prefilter) — the summaries a pipeline keeps
instead of exact token->count / membership tables.

Design for scale (and why this shape, not the naive one):

* Frequencies are aggregated ONCE (``groupBy(token)``) before the sketch is
  built. The naive formulation explodes every token OCCURRENCE ``depth``
  times and shuffles ``depth x corpus`` rows; here the depth fan-out happens
  on the *distinct-token* table (orders of magnitude smaller), each row
  carrying its pre-summed weight. Same counters, ~depth x corpus fewer
  shuffled rows — the same lesson as the r1 simhash fix.
* The sketch itself is ``depth * width`` rows (a few KiB) — it broadcasts
  for the estimate join and unions/merges across corpora by simple counter
  addition (CMS is linear), which is the whole point of keeping a sketch
  rather than the exact table at 100 TB.
* Hashes are md5-derived (first two hex digits of ``md5(token || '#row')``),
  so the (probabilistic) sketch is deterministic and bit-identical across
  engines — the DuckDB oracle rebuilds the exact same counters.

Reference scope note: the reference CLI (main.go) has no sketching; this is
part of the extended large-scale pipeline set required alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _bucket(token: Column, row: Column, width: int) -> Column:
    """md5-derived bucket in [0, width): first two hex digits (8 bits) of
    ``md5(token || '#' || row)``, reduced mod width — pure built-in string
    arithmetic, replayed verbatim by the DuckDB oracle
    (queries.cms_heavy_hitters)."""
    h = F.md5(F.concat(token, F.lit("#"), row.cast("string")))
    d1 = F.instr(F.lit(HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(HEX), F.substring(h, 2, 1)) - 1
    return ((d1 * 16 + d2) % width).cast("int")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact per-token occurrence counts (whitespace tokens, empties
    dropped) — the single full-corpus shuffle everything downstream reuses.
    """
    tok = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("token")
    )
    return tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_sketch(
    counts: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the ``depth x width`` counter table from exact token counts.

    Returns (row, bucket, counter). Each distinct token contributes its
    pre-aggregated weight to one bucket per sketch row — a weighted
    histogram, all map-side combinable.
    """
    rows = counts.select(
        "token",
        "cnt",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row"),
    )
    return (
        rows.select(
            "row",
            "cnt",
            _bucket(F.col("token"), F.col("row"), width).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for each probe token: min over the ``depth``
    counters the token hashes to. The sketch is tiny — broadcast it so the
    probe side never shuffles for the join."""
    pb = probes.select(
        "token",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row"),
    ).select(
        "token",
        "row",
        _bucket(F.col("token"), F.col("row"), width).alias("bucket"),
    )
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("token")
        .agg(F.min("counter").alias("cms_est"))
    )


def bloom_pos(value: Column, i: int, m_bits: int) -> Column:
    """Hash function i of a Bloom filter over [0, m_bits): the first 13 hex
    digits (52 bits — BIGINT-exact on both engines) of
    ``md5(value || '#i')``, reduced mod m. Pure built-in string arithmetic,
    replayed verbatim by the DuckDB oracle."""
    h = F.md5(F.concat(value, F.lit(f"#{i}")))
    return (F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % m_bits).cast(
        "int"
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 18,
    k: int = 4,
    assume_distinct: bool = False,
) -> str:
    """Build a Bloom filter bitset over the distinct values of ``key_col``.

    ``assume_distinct=True`` skips the internal value-distinct shuffle when
    the caller already holds a distinct (typically persisted) key relation —
    the bit_or word fold is idempotent, so duplicate keys would only cost
    the redundant exchange, never change the bitset; skipping it when the
    input is known-distinct removes one corpus-scale shuffle (r13, guide
    §2.4).

    Returns the bitset as ``m_bits / 8`` BYTES (low bit of byte ``p >> 3``
    = position, bit index ``p & 7``), ready to embed as a single BINARY
    literal for :func:`bloom_contains`. Binary — not a literal long array,
    and not a hex string — because the probe must index at a random
    offset in O(1): a multi-thousand-element inline array literal is
    re-materialized per evaluation (measured 15.7 s / 260k probes), and
    ``substring`` on a STRING walks the bytes linearly to count UTF-8
    codepoints, O(m) per probe (measured 5.3 s); a binary slice is a byte
    offset (measured 0.5 s for the same probes). The one driver-side
    collect is the DISTINCT SET-BIT POSITIONS — bounded by
    ``min(k * |keys|, m_bits)``, i.e. by the filter's own fixed size, never
    by data volume (for the default 2^18 bits that is ≤ 256 Ki ints and a
    32 KiB bitset). The position aggregation is a map-side-combinable
    distinct, so building from a 1000-executor key set still reduces to at
    most m_bits rows on the wire.

    Why this exists next to the exact anti-join (dedup.contamination_*):
    at 100 TB the membership probe should not pay a join AT ALL. The
    bitset ships inside the plan as a literal to every executor and the
    probe is row-local expression arithmetic — zero shuffle, zero
    build-side relation — with one-sided error: no false negatives, false
    positives at rate ~(1 - e^(-k*n/m))^k. The intended composition is
    bloom-prefilter → exact verification join on the tiny surviving
    fraction (queries.bloom_decontaminate demonstrates it end-to-end).
    """
    if m_bits % 8:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")
    vals = keys.select(F.col(key_col).alias("v")).where(F.col("v").isNotNull())
    if not assume_distinct:
        vals = vals.distinct()
    pos = (
        vals.select(
            F.explode(
                F.array(*[bloom_pos(F.col("v"), i, m_bits) for i in range(k)])
            ).alias("p")
        )
    )
    # Fold positions into 64-bit words cluster-side (bit_or is idempotent,
    # so the former distinct-positions pass is subsumed): the driver
    # collects AT MOST m_bits/64 (word, bits) rows — 4 Ki rows for the
    # default 2^18-bit filter — instead of up to m_bits position rows
    # (256 Ki), and the map-side bit_or combine bounds the exchange the
    # same way. Byte layout is unchanged: little-endian word w covers
    # byte indexes 8w..8w+7, bit j of the word = position 64w + j.
    words = (
        pos.select(
            F.shiftright(F.col("p"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), p & 63)").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    bitset = bytearray(m_bits // 8)
    for r in words.collect():
        off = r["w"] * 8
        chunk = (r["bits"] & ((1 << 64) - 1)).to_bytes(8, "little")
        n = min(8, len(bitset) - off)
        bitset[off : off + n] = chunk[:n]
    return bytes(bitset)


def bloom_contains(
    value: Column, bitset: bytes, m_bits: int, k: int = 4
) -> Column:
    """Boolean probe of a :func:`bloom_build` bitset: True iff all ``k``
    positions of ``value`` are set (possible member — no false negatives).
    Row-local: the bitset rides as one binary literal; each probe slices
    its byte at a constant offset, decodes it via hex+conv, and tests the
    bit with shift/AND — whole-stage-codegen arithmetic, no join."""
    s = F.lit(bytearray(bitset))
    cond = None
    for i in range(k):
        p = bloom_pos(value, i, m_bits)
        byte = F.call_function(
            "substring", s, F.shiftright(p, 3) + F.lit(1), F.lit(1)
        )
        bv = F.conv(F.hex(byte), 16, 10).cast("int")
        bit = F.call_function(
            "shiftright", bv, p.bitwiseAND(F.lit(7))
        ).bitwiseAND(F.lit(1)) == F.lit(1)
        cond = bit if cond is None else (cond & bit)
    return cond


def kmv_distinct(
    docs: DataFrame, text_col: str = "text", k: int = 256
) -> DataFrame:
    """K-minimum-values distinct-count sketch — the DETERMINISTIC
    approximate-distinct. ``approx_count_distinct`` (HLL) is
    engine-internal and cannot be differentially tested; KMV with an md5
    hash is bit-reproducible anywhere, so the estimate itself is
    oracle-checkable, while keeping the property that matters at 100 TB:
    the full token stream reduces to k hash values per partition
    (TakeOrdered — no global sort), the sketches merge by keeping the k
    smallest of a union, and the estimator is (k-1) * H / h_(k) with H the
    hash-space size.

    Exactness discipline: the hash value is the first 13 hex digits of
    md5 (52 bits — exact in BIGINT on both engines), and the estimate is
    pure INTEGER arithmetic ((k-1) * 2^52 div kth-min) — no float anywhere,
    so the result hash-matches across engines bit-for-bit.

    Returns one row: (k, kth_hash, est_distinct, exact_distinct) — the
    exact count rides along so the estimate's error is auditable in the
    result itself.
    """
    tok = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("token")
    ).distinct()
    v = F.conv(F.substring(F.md5("token"), 1, 13), 16, 10).cast("long")
    kmin = tok.select(v.alias("v")).orderBy("v").limit(k)
    s = kmin.agg(
        F.count(F.lit(1)).alias("k"), F.max("v").alias("kth_hash")
    )
    ex = tok.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return s.crossJoin(ex).select(
        F.col("k").cast("long").alias("k"),
        F.col("kth_hash").cast("long").alias("kth_hash"),
        F.expr(f"(k - 1) * {2**52}L div kth_hash")
        .cast("long")
        .alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )
