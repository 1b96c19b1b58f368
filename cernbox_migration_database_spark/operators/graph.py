"""Iterative numeric graph algorithms (PageRank) over the near-dup graph.

Connected components and label propagation (operators/dedup.py) cover the
*categorical* graph fixpoints; PageRank adds the *numeric* one — the
canonical importance score used to pick the canonical document of a dup
cluster or to weight crawl frontiers. The whole iteration is exact
fixed-point integer arithmetic, so a 3-round run is bit-identical across
engines, partition counts, and retries — which is what makes it
oracle-pairable as an unrolled-CTE differential (query ``graph_pagerank``),
the same verification pattern as label propagation.

Scale notes (100 TB / billions of edges): each round is one equi-join of
the edge list against the rank table plus one map-side-combinable SUM —
no windows, no driver collects. The edge list and degree table are
persisted once and reused every round with a stable partitioning, so
rounds after the first shuffle only the (node, rank) table. Rank mass is
bounded by n_nodes * SCALE, so with SCALE=1e7 the LONG accumulator is
safe past 1e10 nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import tracked_persist

#: fixed-point scale for ranks: 1.0 == 10**7
PR_SCALE = 10**7


def pagerank(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Deterministic fixed-iteration PageRank on an undirected pair list.

    Every arithmetic step is integer-exact and engine-portable:

    * ranks live in a scaled-LONG domain (``PR_SCALE`` == 1.0);
    * a node's per-edge contribution is ``rank DIV out_degree`` (integer
      division — Spark's ``DIV`` and DuckDB's ``//`` agree on non-negative
      operands);
    * the damping mix is ``(100-d)%*SCALE DIV 100 + d% * contrib_sum DIV
      100`` — integer again.

    Floating-point PageRank would be order-dependent under Spark's
    nondeterministic partial-sum ordering; the integer form is reproducible
    bit-for-bit, at the cost of <=1 ulp-of-scale truncation per round
    (irrelevant for ranking, essential for differential testing).

    The input pair list is treated as UNDIRECTED (each pair contributes an
    edge in both directions), so every node has out-degree >= 1 and the
    dangling-mass correction of general PageRank is unnecessary.
    """
    a, b = F.col(a_col), F.col(b_col)
    edges = tracked_persist(
        pairs.select(a.alias("src"), b.alias("dst"))
        .unionByName(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
    )
    deg = tracked_persist(edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")))
    base = (100 - damping_pct) * PR_SCALE // 100
    ranks = deg.select(F.col("src").alias("id"), F.lit(PR_SCALE).alias("r"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("id"), F.expr("r DIV d").alias("c"))
        )
        ranks = contrib.groupBy("id").agg(
            (F.lit(base) + F.expr(f"{damping_pct} * sum(c) DIV 100")).alias("r")
        )
    return ranks.select(F.col("id").alias("doc_id"), F.col("r").alias("rank_scaled"))
