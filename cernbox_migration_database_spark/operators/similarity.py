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

from ..util import ensure_parallelism, tracked_persist

EMB_DIM = 64
NUM_PLANES = 8


# Fixed-point scale for vector elements: x -> round(x * 10^7) as long.
# 7 decimal digits keeps every pairwise product EXACT in int64
# (|x| < 37 suffices: 64 * (37*10^7)^2 < 2^63) and the dot product below
# 2^53, so the final integer -> double conversion is exact too. Pure long
# arithmetic runs ~5x faster than the DECIMAL(38,18) BigDecimal path it
# replaced, with identical determinism guarantees.
VEC_SCALE = 7
_VEC_MUL = 10**VEC_SCALE
_DOT_DIV = float(10 ** (2 * VEC_SCALE))


def _scaled(x: Column) -> Column:
    # float -> double -> decimal -> scaled long: both Spark and external
    # engines round the exact binary expansion this way (a direct
    # float->decimal cast does not match across engines).
    return (
        x.cast("double").cast(f"decimal(12,{VEC_SCALE})") * _VEC_MUL
    ).cast("long")


def scaled_vector(a: Column) -> Column:
    """array<float> -> array<long> fixed-point form (precompute + persist
    this once per vector before pairwise work)."""
    return F.transform(a, _scaled)


def dot_scaled(sa: Column, sb: Column) -> Column:
    """Exact dot product of two pre-scaled long vectors, as double."""
    s = F.aggregate(
        F.zip_with(sa, sb, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return s.cast("double") / F.lit(_DOT_DIV)


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent, engine-exact dot product of float vectors."""
    return dot_scaled(scaled_vector(a), scaled_vector(b))


def norm_exact(a: Column) -> Column:
    return F.sqrt(dot_exact(a, a))


def cosine_scaled(sa: Column, sb: Column, na: Column, nb: Column) -> Column:
    """cosine = dot / (na * nb); computed identically on the oracle side."""
    return dot_scaled(sa, sb) / (na * nb)


def with_norm(
    df: DataFrame, vec_col: str = "embedding", fanout: bool = True
) -> DataFrame:
    """Adds the fixed-point vector (`svec`) and its L2 norm (`norm`).

    Persisted: downstream pairwise joins reference `svec` once per pair, and
    without materialization the scaling transform would re-run per pair
    (lineage recompute). Parallelism guard for single-file corpora. Tracked
    for release_persisted() so harness loops don't leak cached partitions.

    ``fanout=False`` skips BOTH the parallelism guard and the persist: a
    BOUNDED probe batch (tens of query rows) gains nothing from a
    repartition to session parallelism, and its scaling arithmetic is
    cheaper to recompute per consumer than a cache materialization job
    plus cache-read stages — the r12 probes ran 32-task stages over ~20
    cached rows for the cell collect, the broadcast build AND the LUT
    (r13, guide §2.4: remove shuffles and jobs the data doesn't need)."""
    out = ensure_parallelism(df) if fanout else df
    out = out.withColumn("svec", scaled_vector(F.col(vec_col))).withColumn(
        "norm", F.sqrt(dot_scaled(F.col("svec"), F.col("svec")))
    )
    return tracked_persist(out) if fanout else out


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
        F.col("svec").alias("qs"),
        F.col("norm").alias("qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("svec").alias("cs"),
        F.col("norm").alias("cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # project the vectors away BEFORE the ranking shuffle: the window
    # needs only (query_id, neighbor_id, cosine) — ~24 bytes/row — while
    # carrying qs/cs through it would move the 64-long arrays (~1 KiB/row)
    # through the exchange, a 40x shuffle-volume tax measured on the knn
    # headline query
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_scaled(
            F.col("qs"), F.col("cs"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
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
    sel = [F.col(id_col), F.col("svec"), F.col("norm")]
    if block_col:
        sel.append(F.col(block_col))
    d = d.select(*sel)
    a = d.select(
        F.col(id_col).alias("vec_a"), F.col("svec").alias("sa"),
        F.col("norm").alias("na"),
        *([F.col(block_col).alias("ka")] if block_col else []),
    )
    b = d.select(
        F.col(id_col).alias("vec_b"), F.col("svec").alias("sb"),
        F.col("norm").alias("nb"),
        *([F.col(block_col).alias("kb")] if block_col else []),
    )
    cond = F.col("vec_a") < F.col("vec_b")
    if block_col:
        cond = cond & (F.col("ka") == F.col("kb"))
    return (
        a.join(b, cond)
        .withColumn(
            "cosine", cosine_scaled(F.col("sa"), F.col("sb"), F.col("na"), F.col("nb"))
        )
        .filter(F.col("cosine") > threshold)
        .select("vec_a", "vec_b", F.round("cosine", 9).alias("cosine"))
    )


def plane_signs(plane: int, dim: int = EMB_DIM) -> list[int]:
    """Deterministic +/-1 hyperplane: sign i = +1 iff the first hex digit of
    md5('<plane>:<i>') is >= 8. Computed driver-side with hashlib (identical
    to the md5 the oracle computes in SQL) and embedded as a literal array --
    evaluating 64 md5 calls per row per plane in the expression tree was
    pure waste on constants Catalyst doesn't fold."""
    import hashlib

    return [
        1 if hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[0] in "89abcdef" else -1
        for i in range(dim)
    ]


def lsh_bucket_scaled(
    svec: Column, num_planes: int = NUM_PLANES, dim: int = EMB_DIM
) -> Column:
    """Random-hyperplane LSH bucket id over a pre-scaled long vector:
    '0'/'1' string of sign bits of <plane, vec> -- exact integer sums, so
    the sign is engine-stable."""
    bits = []
    for p in range(num_planes):
        signs = F.array(*[F.lit(s).cast("long") for s in plane_signs(p, dim)])
        dot = F.aggregate(
            F.zip_with(signs, svec, lambda s, x: s * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucket(vec: Column, num_planes: int = NUM_PLANES, dim: int = EMB_DIM) -> Column:
    """Bucket id from a raw float vector (scales internally)."""
    return lsh_bucket_scaled(scaled_vector(vec), num_planes, dim)


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return (
        ensure_parallelism(df)
        .withColumn("svec", scaled_vector(F.col(vec_col)))
        .withColumn("bucket", lsh_bucket_scaled(F.col("svec")))
        .drop("svec")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: partition the corpus into k centroid cells, search
# only the nprobe cells closest to each query. Complements hyperplane LSH:
# data-adaptive cells (trained or seeded from the corpus) usually beat
# data-oblivious hyperplanes on clustered embeddings.
#
# Scale shape: cell assignment is k dot products per vector computed row-
# locally against literal centroids — NO shuffle, no join; candidate
# generation is an equi-join on the cell id against the (tiny, broadcast)
# query-probe list. At 10^9 vectors the assigned corpus is written out
# partitioned by cell once and reused across query batches.
# ---------------------------------------------------------------------------


def _sql_ref(c: Column | str) -> str:
    """SQL rendering of a PLAIN column reference (every caller passes
    ``F.col("name")`` or the name itself); used to assemble literal-heavy
    expressions as parsed SQL text instead of py4j Column composition."""
    if isinstance(c, str):
        return c
    s = c._jc.toString()  # "qs" for a bare reference
    if not s.replace("_", "").isalnum():
        raise ValueError(f"expected a plain column reference, got {s!r}")
    return s


def _centroid_cosines(
    svec: Column | str, norm: Column | str,
    centroids: list[tuple[list[int], float]],
) -> list[Column]:
    """One exact cosine per centroid; centroids are (scaled-long vector,
    norm) pairs embedded as literals — like plane_signs, evaluating them as
    expressions per row would waste work Catalyst doesn't constant-fold.
    The k × dim literal array is rendered as SQL TEXT and parsed once:
    composing it from F.lit() Columns cost ~2 py4j round trips per element
    (k=16, dim=64 → ~2000 calls ≈ seconds of driver time PER probe call,
    measured r12 — the dominant cost of the warm ivf/ivfpq probe phases).
    Identical expression semantics to dot_scaled(svec, literal-array)."""
    s_sql = _sql_ref(svec)
    norm = F.col(norm) if isinstance(norm, str) else norm
    out = []
    for csvec, cnorm in centroids:
        vals = ",".join(f"{int(v)}L" for v in csvec)
        dot = F.expr(
            f"aggregate(zip_with({s_sql}, array({vals}), (x, y) -> x * y),"
            f" CAST(0 AS BIGINT), (a, x) -> a + x)"
        )
        out.append(
            dot.cast("double") / F.lit(_DOT_DIV) / (norm * F.lit(float(cnorm)))
        )
    return out


def cell_of(
    svec: Column, norm: Column, centroids: list[tuple[list[int], float]]
) -> Column:
    """argmax-cosine cell id; ties resolve to the smallest centroid index
    (array_position returns the FIRST occurrence of the max)."""
    arr = F.array(*_centroid_cosines(svec, norm, centroids))
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def probe_cells(
    svec: Column,
    norm: Column,
    centroids: list[tuple[list[int], float]],
    nprobe: int,
) -> Column:
    """The nprobe closest cells for a query, as array<int>; sort key is
    (-cosine, cell index) so ties break identically to cell_of."""
    structs = [
        F.struct((-c).alias("nc"), F.lit(j).cast("int").alias("j"))
        for j, c in enumerate(_centroid_cosines(svec, norm, centroids))
    ]
    top = F.slice(F.array_sort(F.array(*structs)), 1, nprobe)
    return F.transform(top, lambda s: s.getField("j"))


def seed_centroids(
    df: DataFrame, k: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[list[int], float]]:
    """Deterministic seed centroids: the corpus vectors with id < k (ids are
    dense from 0 in the fixtures; an oracle can name the same rows with a
    WHERE clause). Scaling/norm run IN Spark so the collected literals match
    executor arithmetic bit-for-bit. Driver collect is k rows — metadata-
    sized, same budget class as a broadcast."""
    rows = (
        with_norm(df.where(F.col(id_col) < k), vec_col)
        .select(F.col(id_col), "svec", "norm")
        .orderBy(id_col)
        .collect()
    )
    return [(list(r["svec"]), float(r["norm"])) for r in rows]


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[list[int], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    top_k: int = 5,
) -> DataFrame:
    """IVF ANN search: rank the corpus vectors of each query's nprobe
    closest cells by exact cosine. Same output shape / determinism contract
    as knn_bruteforce (total tie-break, 9 dp rounding)."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("svec").alias("cs"),
        F.col("norm").alias("cn"),
    )
    c = c.withColumn("cell", cell_of(F.col("cs"), F.col("cn"), centroids))
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("svec").alias("qs"),
        F.col("norm").alias("qn"),
    )
    probe = q.select(
        "query_id",
        "qs",
        "qn",
        F.explode(
            probe_cells(F.col("qs"), F.col("qn"), centroids, nprobe)
        ).alias("cell"),
    )
    pairs = c.join(F.broadcast(probe), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # vectors projected away before the ranking shuffle (see knn_bruteforce)
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_scaled(
            F.col("qs"), F.col("cs"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cosine", 9).alias("cosine")
        )
    )


def kmeans_train(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd k-means for IVF cell training.

    Each iteration: (1) assignment — argmin squared-distance against the
    current centroids as literal expressions, row-local JVM arithmetic, no
    shuffle; (2) update — per-cell vector mean via applyInPandas (Arrow-
    batched, numpy-vectorized; one shuffle on the k-valued cell key, k tiny
    rows back to the driver). Deterministic init (k smallest-id vectors);
    empty cells keep their previous centroid. Float means are partition-
    order sensitive in the last ulp — fine for training (consumers rank by
    exact fixed-point cosine against whatever centroids come out).
    """
    import numpy as np
    import pandas as pd

    base = ensure_parallelism(df).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = [list(r["v"]) for r in base.orderBy(id_col).limit(k).collect()]

    def _mean(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["v"].to_numpy()).mean(axis=0)
        return pd.DataFrame({"cell": [int(pdf["cell"].iloc[0])], "centroid": [m.tolist()]})

    for _ in range(iters):
        dists = [
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in cvec]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cvec in cents
        ]
        arr = F.array(*dists)
        assigned = base.withColumn(
            "cell", (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        )
        means = assigned.groupBy("cell").applyInPandas(
            _mean, schema="cell int, centroid array<double>"
        )
        got = {r["cell"]: list(r["centroid"]) for r in means.collect()}
        cents = [got.get(j, cents[j]) for j in range(k)]
    return cents


def centroid_literals(spark, vectors: list[list[float]]) -> list[tuple[list[int], float]]:
    """Convert trained float centroids to the (scaled-long vector, norm)
    literal form ann_ivf consumes — scaled IN Spark so literals match
    executor arithmetic exactly."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], "vec_id int, embedding array<double>"
    )
    rows = (
        with_norm(df).select("vec_id", "svec", "norm").orderBy("vec_id").collect()
    )
    return [(list(r["svec"]), float(r["norm"])) for r in rows]


# ---------------------------------------------------------------------------
# Sparse random projection (Johnson-Lindenstrauss / Achlioptas): project the
# embedding down to a handful of dimensions with a deterministic {+1,-1,0}
# matrix. The cheap dimensionality-reduction step in front of clustering /
# visualization / coarse ANN at 100 TB: row-local arithmetic against literal
# weights — no shuffle, no UDF, no trained state to distribute.
# ---------------------------------------------------------------------------


def projection_weights(
    out_dims: int = 8, in_dims: int = EMB_DIM, prefix: str = "rp"
) -> list[list[int]]:
    """Achlioptas-style sparse projection matrix: w[p][i] = +1 if the first
    md5 hex digit of '<prefix>:<p>:<i>' is '0', -1 if '1', else 0 (density
    1/8). Derived from md5 driver-side so every executor, engine, and rerun
    reproduces the identical matrix — the same determinism trick as the LSH
    hyperplanes (plane_signs above)."""
    import hashlib

    ws: list[list[int]] = []
    for p in range(out_dims):
        row = []
        for i in range(in_dims):
            h = hashlib.md5(f"{prefix}:{p}:{i}".encode()).hexdigest()[0]
            row.append(1 if h == "0" else -1 if h == "1" else 0)
        ws.append(row)
    return ws


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dims: int = 8,
) -> DataFrame:
    """Project `vec_col` to `out_dims` scaled-long columns proj_0..proj_k.

    Each output dim is one zip_with+aggregate of the scaled-long vector
    against a literal weight array — exact int64 arithmetic (inputs bounded
    by the DECIMAL(12,7) scaling, 64 terms stay far under 2^63), so results
    are bit-identical across engines and partitionings. Output stays in the
    x10^7 fixed-point domain; divide by 1e7 when a float view is needed.
    """
    ws = projection_weights(out_dims)
    out = ensure_parallelism(df).withColumn("_s", scaled_vector(F.col(vec_col)))
    cols = [F.col(id_col)]
    for p, row in enumerate(ws):
        wlit = F.array(*[F.lit(w).cast("long") for w in row])
        proj = F.aggregate(
            F.zip_with(F.col("_s"), wlit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        cols.append(proj.alias(f"proj_{p}"))
    return out.select(*cols)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third ANN family next to LSH bucketing and
# IVF cells. Jégou/Douze/Schmid "Product Quantization for Nearest Neighbor
# Search" (TPAMI'11): split each d-dim vector into m contiguous subvectors
# and quantize each against its own k-entry codebook; a vector compresses to
# m small codes (m=8, k=16 -> 8 nibbles for a 64-float vector, 64x smaller)
# and distances are approximated per-subspace via table lookups (ADC).
#
# Scale shape: encoding is row-local arithmetic against literal codebooks —
# no shuffle, no join, same plan family as IVF cell assignment; the encoded
# table is the compact index a 10^9-vector corpus actually stores. Codebook
# entries here are deterministic seeds (subvectors of the first k corpus
# vectors — the same oracle-nameable convention as seed_centroids); k-means
# refinement per subspace would reuse kmeans_train.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim fixture vectors -> 8 dims per subspace)
PQ_K = 16  # codes per subspace


def pq_codebooks(
    df: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """codebooks[sub][code] = scaled-long subvector. Entries come from the
    corpus vectors with id < k (dense fixture ids; the oracle names the
    same rows with WHERE vec_id < k). Scaling runs IN Spark so literals
    match executor arithmetic bit-for-bit; the collect is k rows."""
    rows = (
        df.where(F.col(id_col) < k)
        .select(F.col(id_col), scaled_vector(F.col(vec_col)).alias("sv"))
        .orderBy(id_col)
        .collect()
    )
    if len(rows) != k:
        raise ValueError(
            f"pq_codebooks seeding needs the {k} corpus rows with "
            f"{id_col} < {k}; found {len(rows)} — ids must be dense from 0"
        )
    d = len(rows[0]["sv"])
    if d % m != 0:
        raise ValueError(
            f"vector dim {d} is not divisible by m={m} subspaces — the "
            f"tail {d % m} dims would be silently dropped from every "
            "subspace in both encode and ADC"
        )
    sub = d // m
    return [
        [list(r["sv"][s * sub : (s + 1) * sub]) for r in rows]
        for s in range(m)
    ]


def pq_train_codebooks(
    df: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Per-subspace Lloyd k-means refinement of the seed codebooks — the
    training step that separates a production PQ index (FAISS-style
    recall ~0.7+) from untrained seeds (~0.25 on the fixtures).

    Same distributed discipline as :func:`kmeans_train`: assignment is
    row-local exact-long arithmetic against literal entries (the
    pq_encode expression family — all m·k distances in one codegen
    stage), the update is one shuffle on the (subspace, code) key into an
    Arrow-batched numpy mean, and m·k tiny rows return to the driver per
    iteration. Init = the deterministic seed codebooks, so training is a
    strict refinement. Means are rounded back to scaled longs each
    iteration, keeping every consumer (pq_encode / ADC / the SQL oracle)
    in the exact-integer contract; freeze the returned literals (e.g.
    operators/pq_trained.py) to share one trained quantizer across
    engines and runs."""
    import numpy as np
    import pandas as pd

    books = pq_codebooks(df, m=m, k=k, id_col=id_col, vec_col=vec_col)
    sub = len(books[0][0])
    base = ensure_parallelism(df).select(
        F.col(id_col), scaled_vector(F.col(vec_col)).alias("_sv")
    )

    def _mean(pdf: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(
            np.stack(pdf["sub"].to_numpy()).mean(axis=0)
        ).astype("int64")
        return pd.DataFrame(
            {
                "s": [int(pdf["s"].iloc[0])],
                "code": [int(pdf["code"].iloc[0])],
                "centroid": [c.tolist()],
            }
        )

    for _ in range(iters):
        structs = []
        for s in range(m):
            dists = ", ".join(
                _pq_dist_sql("_sv", s * sub, entry) for entry in books[s]
            )
            structs.append(
                f"struct({s} as s, "
                f"cast(array_position(array({dists}), "
                f"array_min(array({dists}))) - 1 as int) as code, "
                f"slice(_sv, {s * sub + 1}, {sub}) as sub)"
            )
        assigned = base.select(
            F.explode(F.expr(f"array({', '.join(structs)})")).alias("a")
        ).select("a.s", "a.code", "a.sub")
        means = assigned.groupBy("s", "code").applyInPandas(
            _mean, schema="s int, code int, centroid array<long>"
        )
        got = {
            (r["s"], r["code"]): list(r["centroid"])
            for r in means.collect()
        }
        books = [
            [got.get((s, c), books[s][c]) for c in range(k)]
            for s in range(m)
        ]
    return books


def _pq_dist_sql(vec_sql: str, offset: int, entry: list[int]) -> str:
    """Exact squared-L2 between ``vec_sql[offset+1 .. offset+len]`` (scaled
    longs) and a literal codebook entry, as a Spark SQL string.

    Measured A/B (sf0.1, 2000x128 distances): this aggregate/zip_with form
    runs the m*k distances in ~8 s; fully UNROLLED element_at arithmetic
    (1024 terms per row) ran ~21 s — the giant expression tree bloats past
    codegen limits and falls back to slower interpreted eval than the HOF
    loop. Keep the slice+zip_with form."""
    lits = ", ".join(f"{int(v)}L" for v in entry)
    return (
        f"aggregate(zip_with(slice({vec_sql}, {offset + 1}, {len(entry)}), "
        f"array({lits}), "
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    )


def pq_encode_packed(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): argmin squared-L2 code per subspace,
    PACKED — one row per vector, codes[s] = the subspace-s code.

    Per subspace: slice the scaled vector, one zip_with+aggregate squared
    distance per literal codebook entry, argmin via array_position of the
    array minimum (ties -> smallest code, matching the oracle's ORDER BY
    dist, code). Bounds: |element| <= 3.7e8 scaled, diff^2 <= 5.5e17, the
    8-term sum < 2^62 — exact long arithmetic. All m*k distances are
    row-local top-level expressions in one codegen stage. The packed form
    is what the standing IVF-PQ index stores (ivfpqindex.py): m codes ride
    in ONE array cell, so index row count equals corpus row count and ADC
    is row-local — at m=32 the exploded layout cost 32x the rows and a
    per-candidate shuffle (the round-8 probe regression's root cause)."""
    out = ensure_parallelism(df).withColumn(
        "_sv", scaled_vector(F.col(vec_col))
    )
    out, code = _packed_codes_column(out, "_sv", codebooks)
    return out.select(F.col(id_col), code.alias("codes"))


def _packed_codes_column(df, sv_col: str, codebooks):
    """Append the per-subspace distance arrays to ``df`` and return
    ``(df, codes_column)`` where the column is the packed argmin code
    array over the ALREADY-SCALED vector column ``sv_col`` — shared by
    :func:`pq_encode_packed` (scales itself) and :func:`ivf_pq_topk`
    (fuses codes onto with_norm's ``svec`` projection, so cell assignment
    and encoding ride one corpus scan with no self-join).

    Distance expressions are generated as SQL TEXT and parsed once per
    subspace: composing the same m*k aggregate(zip_with(...)) trees
    through the Column API costs thousands of py4j round trips —
    measured ~5 s of pure driver-side plan build for a 128-entry
    codebook; one F.expr parse is milliseconds. Semantics identical."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    for s in range(m):
        dists = ", ".join(
            _pq_dist_sql(sv_col, s * sub, entry) for entry in codebooks[s]
        )
        df = df.withColumn(f"_d{s}", F.expr(f"array({dists})"))
    code = [
        F.expr(
            f"cast(array_position(_d{s}, array_min(_d{s})) - 1 as int)"
        )
        for s in range(m)
    ]
    return df, F.array(*code)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sub_id, code): the EXPLODED code relation — m rows per
    vector. The relational form oracle-paired queries expose; the index
    stores :func:`pq_encode_packed`'s array form."""
    # Persist the per-vector codes ARRAY before exploding: the explode's
    # inferred size()>0 filter otherwise inlines all m*k distance
    # computations and evaluates them interpreted per row (the winnowing
    # lesson — operators/text.py:winnow_fingerprints).
    enc = tracked_persist(
        pq_encode_packed(df, codebooks, id_col=id_col, vec_col=vec_col)
        .withColumnRenamed("codes", "_codes")
    )
    return enc.select(
        F.col(id_col),
        F.posexplode("_codes").alias("sub_id", "code"),
    ).select(F.col(id_col), F.col("sub_id").cast("int"), "code")


def pq_query_lut(
    queries_df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query ADC lookup table: (query_id, sub_id, code, d) with d the
    EXACT scaled-long squared distance from the query's subvector to the
    literal codebook entry — m*k rows per query, row-local arithmetic
    against literals. Shared by :func:`pq_adc_topk` (full-corpus ADC) and
    :func:`ivf_pq_topk` (cell-restricted ADC)."""
    m = len(codebooks)
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    q = ensure_parallelism(queries_df).withColumn(
        "_sv", scaled_vector(F.col(vec_col))
    )
    # One parsed SQL expression for the whole m*k LUT (see pq_encode for
    # why text beats the Column API here: ~5 s of py4j plan build).
    entries = []
    for s in range(m):
        for j in range(k):
            d = _pq_dist_sql("_sv", s * sub, codebooks[s][j])
            entries.append(
                f"named_struct('sub_id', cast({s} as int), "
                f"'code', cast({j} as int), 'd', {d})"
            )
    return q.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.expr("array(" + ", ".join(entries) + ")")).alias("e"),
    ).select("query_id", "e.sub_id", "e.code", "e.d")


def pq_query_lut_flat(
    queries_df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fanout: bool = True,
) -> DataFrame:
    """Per-query ADC lookup table, FLAT: (query_id, lut array<long>) with
    ``lut[s*k + j]`` (0-based) the exact scaled-long squared distance from
    the query's subvector ``s`` to codebook entry ``j`` — the broadcast
    row-local counterpart of :func:`pq_query_lut`. One array cell per
    query replaces m*k relational rows, so ADC against packed codes is a
    single broadcast join on query_id plus :func:`pq_adc_packed_expr` —
    no per-candidate shuffle."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    q = (ensure_parallelism(queries_df) if fanout else queries_df).withColumn(
        "_sv", scaled_vector(F.col(vec_col))
    )
    entries = [
        _pq_dist_sql("_sv", s * sub, codebooks[s][j])
        for s in range(m)
        for j in range(len(codebooks[s]))
    ]
    return q.select(
        F.col(id_col).alias("query_id"),
        F.expr("array(" + ", ".join(entries) + ")").alias("lut"),
    )


def pq_adc_packed_expr(k: int, codes_col: str = "codes", lut_col: str = "lut"):
    """Row-local exact-integer ADC between a packed code array and a flat
    per-query LUT: sum over subspaces of ``lut[s*k + codes[s]]``
    (element_at is 1-based, hence the +1). Pure Catalyst HOFs — stays in
    whole-stage codegen; the long accumulator matches the exploded path's
    SUM(d) bit-for-bit."""
    return F.expr(
        f"aggregate(transform({codes_col}, (c, s) -> "
        f"element_at({lut_col}, s * {k} + c + 1)), "
        "0L, (acc, x) -> acc + x)"
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries_df: DataFrame,
    codebooks: list[list[list[int]]],
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over a PQ-encoded
    corpus: each query precomputes an m x k lookup table of EXACT
    scaled-long squared distances from its subvectors to every codebook
    entry (row-local against literals), the corpus's compact code table
    joins the broadcast LUT on (sub_id, code), and per-(query, vector)
    sums of the m looked-up terms rank ascending. This is the search half
    of PQ: the corpus is touched only through its m-codes-per-vector index
    — the full vectors never load — which is the point at 10^9 vectors.
    Distances stay exact integers end-to-end, so the whole search is
    oracle-pairable (unlike float ADC implementations)."""
    lut = pq_query_lut(queries_df, codebooks, id_col, vec_col)
    joined = (
        codes_df.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), ["sub_id", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    agg = joined.groupBy("query_id", "neighbor_id").agg(
        F.sum("d").alias("adc")
    )
    w = W.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "adc")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[list[int], float]],
    codebooks: list[list[list[int]]],
    nprobe: int = 4,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ composite ANN — the two-stage index shape production vector
    stores run at 10^9+ vectors: a coarse quantizer (IVF cells against
    literal centroids, row-local argmax) restricts the search to each
    query's ``nprobe`` cells, and within those cells distance comes from
    PQ asymmetric distance computation over the compact code table — the
    corpus is touched ONLY through its (cell, m codes) index rows; full
    vectors never load at search time.

    Scale anatomy: cell assignment and the per-query flat m*k LUT are
    row-local arithmetic against plan literals (no shuffle); the candidate
    restriction is one broadcast join on the cell id (probe set =
    |queries| * nprobe rows); ADC is one broadcast flat-LUT join on
    query_id + a row-local packed-code aggregate
    (:func:`pq_adc_packed_expr`) — index rows stay ONE per vector, so no
    per-candidate shuffle exists anywhere in the search (the exploded
    m-rows-per-vector layout cost 32x the rows and a groupBy shuffle at
    the trained m=32 config — the round-8 probe regression). Versus plain
    :func:`pq_adc_topk`, the scanned code rows drop by the factor
    ``nprobe / n_cells`` — the knob that keeps search latency flat as the
    corpus grows, paid for in recall at cell boundaries. With
    ``nprobe = len(centroids)`` the result equals full-corpus ADC exactly
    (pytest pins this equivalence); all distances stay exact scaled-long
    integers, so the composite is oracle-pairable end-to-end.
    """
    # The inverted index: packed code rows keyed by their vector's cell —
    # what a production store materializes once at build time. Cell
    # assignment and encoding are fused onto ONE corpus projection (both
    # are row-local arithmetic over the same scaled vector), so the
    # ephemeral index build is a single scan with no self-join.
    withc, code = _packed_codes_column(
        with_norm(corpus, vec_col), "svec", codebooks
    )
    icodes = withc.select(
        F.col(id_col).alias("neighbor_id"),
        cell_of(F.col("svec"), F.col("norm"), centroids).alias("cell"),
        code.alias("codes"),
    )
    probe = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.explode(
            probe_cells(F.col("svec"), F.col("norm"), centroids, nprobe)
        ).alias("cell"),
    )
    lut = pq_query_lut_flat(queries, codebooks, id_col, vec_col)
    k = len(codebooks[0])
    cand = icodes.join(F.broadcast(probe), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    agg = cand.join(F.broadcast(lut), "query_id").withColumn(
        "adc", pq_adc_packed_expr(k)
    )
    w = W.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "adc")
    )


# ---------------------------------------------------------------------------
# MMR — Maximal Marginal Relevance diversified re-ranking
# ---------------------------------------------------------------------------

def mmr_rerank(
    corpus: DataFrame,
    query_id,
    k: int = 8,
    lam: float = 0.7,
    pen_weight: float = 0.3,
    pool_size: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein '98) re-rank:
    greedily pick ``k`` results maximizing
    ``lam * rel(c) - pen_weight * max_{s in selected} cos(c, s)`` —
    relevance traded against redundancy with what is already selected,
    the standard diversification pass after a dense retrieval stage.

    Scale split: the two corpus-sized parts are distributed — the
    relevance pass is one broadcast-query scan over the corpus (the same
    shape as :func:`knn_bruteforce`; swap in the IVF/LSH candidate path
    for a 100 TB corpus), and the pool's pairwise cosines are a
    pool x pool product of the top-``pool_size`` survivors only. The
    greedy selection itself is inherently sequential and touches only
    O(pool^2) scalars, so it runs on the driver (the same discipline as
    the k-means centroid and BPE argmax loops); ``pool_size`` is a knob
    independent of corpus size. All cosines use the exact fixed-point
    dot (scaled-long) so selection order is engine-stable; ``lam`` and
    ``pen_weight`` are passed separately rather than derived (1-0.7 is
    not 0.3 in binary floating point).
    """
    nv = with_norm(corpus, vec_col)
    q = nv.filter(F.col(id_col) == query_id).select(
        F.col("svec").alias("qs"), F.col("norm").alias("qn")
    )
    scored = (
        nv.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col("svec"),
            F.col("norm"),
            cosine_scaled(
                F.col("qs"), F.col("svec"), F.col("qn"), F.col("norm")
            ).alias("rel"),
        )
    )
    pool = tracked_persist(
        scored.orderBy(F.desc("rel"), "vec_id").limit(pool_size)
    )
    a = pool.select(
        F.col("vec_id").alias("ia"), F.col("svec").alias("sa"), F.col("norm").alias("na")
    )
    b = pool.select(
        F.col("vec_id").alias("ib"), F.col("svec").alias("sb"), F.col("norm").alias("nb")
    )
    pair_rows = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            cosine_scaled(F.col("sa"), F.col("sb"), F.col("na"), F.col("nb")).alias("cos"),
        )
        .collect()
    )
    cand = [(r.vec_id, r.rel) for r in pool.select("vec_id", "rel").collect()]
    cand.sort(key=lambda t: (-t[1], t[0]))
    pair = {(r.ia, r.ib): r.cos for r in pair_rows}
    picked: list[tuple[int, int, float, float]] = []  # rank, id, rel, score
    sel: list = []
    for rank in range(1, min(k, len(cand)) + 1):
        best = None
        for cid, rel in cand:
            if any(cid == s for s in sel):
                continue
            pen = max((pair[(cid, s)] for s in sel), default=0.0)
            score = lam * rel - pen_weight * pen
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, rel, score)
        _, cid, rel, score = best
        sel.append(cid)
        picked.append((rank, cid, rel, score))
    spark = corpus.sparkSession
    out = spark.createDataFrame(
        picked, "rank int, vec_id long, relevance double, mmr_score double"
    )
    return out.select(
        "rank",
        "vec_id",
        F.round("relevance", 9).alias("relevance"),
        F.round("mmr_score", 9).alias("mmr_score"),
    ).orderBy("rank")
