"""Skew mitigation: salted two-phase aggregation.

At 100 TB a handful of hot keys (one user, one event type) can pin a single
reducer. AQE's skew-join handling covers joins; for aggregations over hot
keys the classic fix is salting: shuffle on (key, salt) first — spreading a
hot key over `n_salts` reducers — then combine the partials per key. Both
phases are map-side-combinable, so the extra pass costs one small shuffle of
pre-aggregated partials.

The transformation is semantics-preserving for any commutative+associative
aggregate; the catalog query `salted_agg` proves it differentially against a
plain GROUP BY oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    ``agg_exprs`` maps output column -> one of 'count' | 'sum_long:<col>'.
    (Only resplittable aggregates belong here; avg = sum+count downstream.)
    ``salt_source``: a column whose hash spreads rows — defaults to
    ``spark_partition_id()`` which is free and uniform; pass a row-level
    column when partition-level spreading is not enough.
    """
    salt = (
        (F.hash(salt_source) % n_salts if salt_source is not None
         else F.spark_partition_id() % n_salts)
    ).alias("__salt")

    phase1_aggs = []
    phase2_aggs = []
    for out, spec in agg_exprs.items():
        if spec == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif spec.startswith("sum_long:"):
            col = spec.split(":", 1)[1]
            phase1_aggs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported agg spec {spec!r}")

    partial = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(
        *phase1_aggs
    )
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, possibly skewed) probe side and
    replicate the (smaller) build side ``n_salts`` times, so a hot join key
    spreads across ``n_salts`` reducers instead of pinning one.

    Semantics-preserving for inner/left joins on equi-keys: every probe row
    meets every build row of its key exactly once, because the probe row
    carries ONE salt value and the build side carries ALL of them. The salt
    is derived from the probe row's whole key tuple plus a per-row
    discriminator hash, so it is deterministic (no ``rand()`` — task retries
    at 100 TB must re-produce the same salt or the join drops/duplicates
    rows). Cost: build side inflated x``n_salts`` through the shuffle —
    choose ``n_salts`` ~ (hot-key rows / target-partition rows), keep the
    build side the small one. AQE's skew-join split handles sort-merge
    skew automatically; this manual form also covers the hash-aggregate
    downstream of the join and engines/paths where AQE is off.

    Differentially verified by the catalog query ``salted_join_skew``
    against the plain-join oracle.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = p.join(b, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
