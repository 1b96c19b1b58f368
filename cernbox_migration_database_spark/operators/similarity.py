"""Vector similarity search over array<float> embedding columns.

Two paths, as a 100 TB pipeline needs both:
  * brute-force cosine top-k — exact baseline; a broadcast of the (small)
    query set against the full corpus, ranked per query with a window;
  * random-hyperplane LSH bucketing — the scale path: an 8-bit signature per
    vector from deterministic md5-derived hyperplanes; bucket equi-joins
    replace the corpus cross-join for candidate generation.

All dot products run through exact DECIMAL accumulation (cast each float via
DOUBLE first — engines disagree on direct float->decimal rounding), so
cosine values are bit-identical across runs, partitionings, and engines;
thresholds and rank ties are therefore stable. See functions/numeric.py for
the rationale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..util import ensure_parallelism

EMB_DIM = 64
NUM_PLANES = 8


def _dec(x: Column) -> Column:
    # float -> double -> decimal: both Spark and external engines round the
    # exact binary expansion this way (direct float->decimal does not match).
    return x.cast("double").cast("decimal(12,9)")


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent, engine-exact dot product as double."""
    prod = F.zip_with(a, b, lambda x, y: _dec(x) * _dec(y))
    s = F.aggregate(
        prod,
        F.lit(0).cast("decimal(38,18)"),
        lambda acc, x: (acc + x).cast("decimal(38,18)"),
    )
    return s.cast("double")


def norm_exact(a: Column) -> Column:
    return F.sqrt(dot_exact(a, a))


def cosine_exact(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine = dot / (na * nb); computed identically on the oracle side."""
    return dot_exact(a, b) / (na * nb)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    # parallelism guard: decimal-exact vector math is compute-bound and a
    # single-file corpus would otherwise run it on one core
    return ensure_parallelism(df).withColumn("norm", norm_exact(F.col(vec_col)))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top_k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query vector: broadcast the query set,
    evaluate cosine against every corpus vector, rank with a total order
    (cosine desc, neighbor id). One pass over the corpus — the right
    baseline even at scale when the query set is small."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("norm").alias("cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "cosine", cosine_exact(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        # output rounded to 9 dp: DuckDB's DECIMAL->DOUBLE cast double-rounds
        # (int128->double, then /10^s), so raw doubles can sit 1 ulp apart
        # across engines; ranking above still uses the raw value.
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 9).alias("cosine"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """Near-duplicate vector pairs within a blocking key (here: label) —
    blocked self-join, never an unblocked cross join. At 100 TB the blocking
    key comes from LSH buckets (lsh_bucket below) instead of a label."""
    d = with_norm(df, vec_col)
    sel = [F.col(id_col), F.col(vec_col), F.col("norm")]
    if block_col:
        sel.append(F.col(block_col))
    d = d.select(*sel)
    a = d.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
        *([F.col(block_col).alias("ka")] if block_col else []),
    )
    b = d.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
        *([F.col(block_col).alias("kb")] if block_col else []),
    )
    cond = F.col("vec_a") < F.col("vec_b")
    if block_col:
        cond = cond & (F.col("ka") == F.col("kb"))
    return (
        a.join(b, cond)
        .withColumn(
            "cosine", cosine_exact(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
        )
        .filter(F.col("cosine") > threshold)
        .select("vec_a", "vec_b", F.round("cosine", 9).alias("cosine"))
    )


def lsh_bucket(vec: Column, num_planes: int = NUM_PLANES, dim: int = EMB_DIM) -> Column:
    """Random-hyperplane LSH bucket id: '0'/'1' string of sign bits of
    <plane, vec> dots, planes derived from md5 so any engine reproduces the
    same buckets. Exact decimal accumulation keeps the sign stable."""
    def _plane_sign(p: int):
        # NB: must be a 1-arg lambda — pyspark treats a 2-parameter lambda
        # (e.g. `lambda i, p=p`) as the (element, index) form and would bind
        # the index column to p.
        return lambda i: (
            F.when(
                F.substring(
                    F.md5(F.concat(F.lit(f"{p}:"), i.cast("string"))), 1, 1
                ).rlike("[89a-f]"),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("decimal(2,0)")
        )

    bits = []
    for p in range(num_planes):
        prod = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _plane_sign(p))
        dot = F.aggregate(
            F.zip_with(prod, vec, lambda s, x: (s * _dec(x)).cast("decimal(38,18)")),
            F.lit(0).cast("decimal(38,18)"),
            lambda acc, x: (acc + x).cast("decimal(38,18)"),
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return ensure_parallelism(df).withColumn("bucket", lsh_bucket(F.col(vec_col)))
