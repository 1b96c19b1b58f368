"""Incremental IVF vector index over a versioned corpus.

Completes the index-family triad (textindex = BM25 postings, lshindex =
near-dup bands, this = ANN cells): `similarity.ann_ivf` re-assigns the
whole corpus to cells on every search — right for a one-shot sweep,
wrong for a vector store serving daily probes. Here the cell-assigned
corpus vectors live in a cell-partitioned versioned table (the FAISS
IVF posting-list shape: each cell partition holds its members' scaled
vectors + norms, denormalized so probes never read the base table),
kept current through the base change feed: inserted vectors assign to
cells row-locally against the stored centroid literals and merge in,
deleted vectors merge-delete by key, updates re-assign. Centroids are
FIXED at build time (classic IVF: cells drift as data grows; periodic
retrain = rebuild — loud and explicit, never silent drift of what an
existing cell means).

A probe reads ONLY the nprobe cell partitions each query's centroid
ranking names — manifest-planned, no listing, no full-index pass — and
ranks candidates by the same exact fixed-point cosine as the scan-path
operators, so indexed results are differentialable against a relational
oracle recomputing assignment + probe from the raw table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import table_format as TF
from .similarity import cell_of, cosine_scaled, probe_cells, with_norm

_META = "_ivf_meta.json"


def _assigned(docs: DataFrame, st: dict) -> DataFrame:
    """(id, cell, svec, norm [, attrs...]) rows — assignment is row-local
    arithmetic against the centroid literals; no shuffle before the table
    write. ``attr_cols`` metadata rides along denormalized so FILTERED
    probes evaluate their predicate inside the cell scan instead of
    joining back to the base table."""
    cents = [(list(c), float(n)) for c, n in st["centroids"]]
    nv = with_norm(docs, st["vec_col"])
    return nv.select(
        F.col(st["id_col"]),
        cell_of(F.col("svec"), F.col("norm"), cents).alias("cell"),
        "svec",
        "norm",
        *[F.col(c) for c in st.get("attr_cols", [])],
    )


def build_ivf_index(
    spark: SparkSession,
    base_root: str,
    index_root: str,
    centroids: list[tuple[list[int], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    attr_cols: list[str] | None = None,
) -> int:
    """Materialize the cell-assigned corpus at ``base_root`` as a
    cell-partitioned versioned table. ``centroids`` are (scaled-long
    vector, norm) literals — from similarity.seed_centroids (oracle-
    nameable) or kmeans_train + centroid_literals (data-adaptive).
    ``attr_cols`` names base metadata columns to denormalize into the
    index for FILTERED search (probe ``where=...``). Returns the base
    version the index reflects."""
    st = {
        "base_root": base_root,
        "base_version": TF.current_version(base_root),
        "id_col": id_col,
        "vec_col": vec_col,
        "attr_cols": list(attr_cols or []),
        "centroids": [[list(c), float(n)] for c, n in centroids],
    }
    docs = TF.read_table(spark, base_root, st["base_version"])
    TF.create_table(
        _assigned(docs, st), os.path.join(index_root, "cells"),
        partition_by="cell",
    )
    os.makedirs(index_root, exist_ok=True)
    with open(os.path.join(index_root, _META), "w", encoding="utf-8") as fh:
        json.dump(st, fh)
    return st["base_version"]


def _state(index_root: str) -> dict:
    with open(os.path.join(index_root, _META), encoding="utf-8") as fh:
        return json.load(fh)


def refresh_ivf_index(spark: SparkSession, index_root: str) -> int:
    """Fold the base change feed: O(changed vectors) assignment work,
    writes bounded by the cells the changes land in. Keyed by the vector
    id (one index row per vector), so inserts/deletes/updates all fold
    exactly — the index stays a pure function of (snapshot, centroids)."""
    st = _state(index_root)
    cur = TF.current_version(st["base_root"])
    if cur == st["base_version"]:
        return cur
    cells_root = os.path.join(index_root, "cells")
    ch = TF.read_changes(
        spark,
        st["base_root"],
        key=st["id_col"],
        from_version=st["base_version"],
        to_version=cur,
    )
    # one row per vector id: deletes drop it, inserts add it, updates
    # re-assign it — a single keyed merge handles all three
    removed = ch.where(F.col("_change_type") == "delete")
    if not removed.isEmpty():
        TF.merge_into(
            spark, cells_root,
            _assigned(removed.drop("_change_type"), st),
            on=st["id_col"], when_matched="delete", when_not_matched=None,
            check_cardinality=False,
        )
    upserts = ch.where(F.col("_change_type").isin("insert", "update"))
    if not upserts.isEmpty():
        TF.merge_into(
            spark, cells_root,
            _assigned(upserts.drop("_change_type"), st),
            on=st["id_col"], check_cardinality=False,
        )
    st["base_version"] = cur
    with open(os.path.join(index_root, _META), "w", encoding="utf-8") as fh:
        json.dump(st, fh)
    return cur


def probe_ivf_index(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    nprobe: int = 4,
    top_k: int = 5,
    where: str | None = None,
) -> DataFrame:
    """ANN top-k through the index: each query's nprobe closest cells are
    named row-locally against the centroid literals, the UNION of probed
    cells is read through the manifest-planned pruned scan (at 100 TB:
    nprobe/n_cells of the index, never the corpus), and candidates rank
    by exact fixed-point cosine — the same output contract as
    similarity.ann_ivf (total tie-break, 9 dp rounding).

    ``where`` is a FILTERED-search predicate over the index's
    ``attr_cols`` (SQL expression string): top-k among the vectors
    satisfying it — evaluated inside the cell scan, the filtered-ANN
    semantics dedicated vector stores struggle with, expressed here as a
    plain pushed filter. NOTE the recall caveat filtered ANN inherits
    everywhere: cells are probed by QUERY proximity, so a highly
    selective predicate can empty the probed cells while matches exist in
    unprobed ones — raise nprobe for selective filters."""
    st = _state(index_root)
    cents = [(list(c), float(n)) for c, n in st["centroids"]]
    cells_root = os.path.join(index_root, "cells")
    id_col = st["id_col"]
    q = with_norm(queries, st["vec_col"]).select(
        F.col(id_col).alias("query_id"),
        F.col("svec").alias("qs"),
        F.col("norm").alias("qn"),
    )
    probe = q.select(
        "query_id", "qs", "qn",
        F.explode(
            probe_cells(F.col("qs"), F.col("qn"), cents, nprobe)
        ).alias("cell"),
    )
    want = {r["cell"] for r in probe.select("cell").distinct().collect()}
    have = {
        e["path"].split("/", 1)[0]
        for e in TF.manifest(cells_root)
        if "/" in e["path"]
    }
    rels = [f"cell={c}" for c in sorted(want) if f"cell={c}" in have]
    if not rels:
        t = queries.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {t}, neighbor_id {t}, rank int, cosine double"
        )
    members = TF.scan_partitions(spark, cells_root, rels)
    if where is not None:
        members = members.where(where)
    members = members.select(
        F.col(id_col).alias("neighbor_id"), "cell",
        F.col("svec").alias("cs"), F.col("norm").alias("cn"),
    )
    pairs = members.join(F.broadcast(probe), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # vectors projected away before the ranking shuffle (the
    # knn_bruteforce shuffle-volume discipline)
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
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cosine", 9).alias("cosine"),
        )
    )
