"""Incremental IVF-PQ composite index — the memory-optimal scale path.

:mod:`ivfindex` stores full scaled vectors in its posting lists; at
10^9+ vectors the index itself becomes the storage problem, which is why
production stores run IVF-PQ: posting lists hold m sub-quantizer CODES
per vector (nibbles, not floats), and search approximates distance via
per-query lookup tables (asymmetric distance computation). This module
materializes `similarity.ivf_pq_topk`'s ephemeral (cell, codes) relation
as a cell-partitioned versioned table and keeps it current through the
base change feed — the same maintenance discipline as the other indexes
(inserts/deletes/updates fold as keyed merges; coarse centroids AND
codebooks are fixed at build time, retrain = rebuild, loud).

A probe touches: the per-query m x k LUT (row-local arithmetic against
codebook literals), the nprobe probed cell PARTITIONS of the code table
(manifest-planned — nprobe/n_cells of an index that is itself ~100x
smaller than the corpus), one broadcast LUT join, and a map-side-
combinable SUM of m terms per candidate. All distances stay exact
scaled-long integers, so maintenance and probe are oracle-pairable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import table_format as TF
from .similarity import (
    cell_of,
    pq_encode,
    pq_query_lut,
    probe_cells,
    with_norm,
)

_META = "_ivfpq_meta.json"


def _index_rows(docs: DataFrame, st: dict) -> DataFrame:
    """(id, sub_id, code, cell): the compact inverted index — PQ codes
    keyed by their vector's coarse cell. Both assignments are row-local
    arithmetic against plan literals; the one join is id-keyed and
    batch-sized on refresh."""
    cents = [(list(c), float(n)) for c, n in st["centroids"]]
    id_col = st["id_col"]
    cells = with_norm(docs, st["vec_col"]).select(
        F.col(id_col),
        cell_of(F.col("svec"), F.col("norm"), cents).alias("cell"),
    )
    codes = pq_encode(
        docs, st["codebooks"], id_col=id_col, vec_col=st["vec_col"]
    )
    return codes.join(cells, id_col)


def build_ivfpq_index(
    spark: SparkSession,
    base_root: str,
    index_root: str,
    centroids: list[tuple[list[int], float]],
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    st = {
        "base_root": base_root,
        "base_version": TF.current_version(base_root),
        "id_col": id_col,
        "vec_col": vec_col,
        "centroids": [[list(c), float(n)] for c, n in centroids],
        "codebooks": [[list(e) for e in cb] for cb in codebooks],
    }
    docs = TF.read_table(spark, base_root, st["base_version"])
    TF.create_table(
        _index_rows(docs, st), os.path.join(index_root, "codes"),
        partition_by="cell",
    )
    os.makedirs(index_root, exist_ok=True)
    with open(os.path.join(index_root, _META), "w", encoding="utf-8") as fh:
        json.dump(st, fh)
    return st["base_version"]


def _state(index_root: str) -> dict:
    with open(os.path.join(index_root, _META), encoding="utf-8") as fh:
        return json.load(fh)


def refresh_ivfpq_index(spark: SparkSession, index_root: str) -> int:
    """Fold the base change feed: O(changed vectors) encode/assign work,
    keyed merges on (id, sub_id) — deleted vectors' rows are regenerated
    from their pre-images and merge-deleted; updates re-encode and
    re-assign (cross-cell moves included)."""
    st = _state(index_root)
    cur = TF.current_version(st["base_root"])
    if cur == st["base_version"]:
        return cur
    codes_root = os.path.join(index_root, "codes")
    key = [st["id_col"], "sub_id"]
    ch = TF.read_changes(
        spark, st["base_root"], key=st["id_col"],
        from_version=st["base_version"], to_version=cur,
    )
    removed = ch.where(F.col("_change_type") == "delete")
    if not removed.isEmpty():
        TF.merge_into(
            spark, codes_root,
            _index_rows(removed.drop("_change_type"), st),
            on=key, when_matched="delete", when_not_matched=None,
            check_cardinality=False,
        )
    upserts = ch.where(F.col("_change_type").isin("insert", "update"))
    if not upserts.isEmpty():
        TF.merge_into(
            spark, codes_root,
            _index_rows(upserts.drop("_change_type"), st),
            on=key, check_cardinality=False,
        )
    st["base_version"] = cur
    with open(os.path.join(index_root, _META), "w", encoding="utf-8") as fh:
        json.dump(st, fh)
    return cur


def probe_ivfpq_index(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    nprobe: int = 4,
    top_k: int = 5,
) -> DataFrame:
    """ADC top-k through the index — output contract identical to
    similarity.ivf_pq_topk (exact integer adc, total tie-break)."""
    st = _state(index_root)
    cents = [(list(c), float(n)) for c, n in st["centroids"]]
    codes_root = os.path.join(index_root, "codes")
    id_col = st["id_col"]
    probe = with_norm(queries, st["vec_col"]).select(
        F.col(id_col).alias("query_id"),
        F.explode(
            probe_cells(F.col("svec"), F.col("norm"), cents, nprobe)
        ).alias("cell"),
    )
    want = {r["cell"] for r in probe.select("cell").distinct().collect()}
    have = {
        e["path"].split("/", 1)[0]
        for e in TF.manifest(codes_root)
        if "/" in e["path"]
    }
    rels = [f"cell={c}" for c in sorted(want) if f"cell={c}" in have]
    if not rels:
        t = queries.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {t}, neighbor_id {t}, rank int, adc bigint"
        )
    lut = pq_query_lut(
        queries, st["codebooks"], id_col=id_col, vec_col=st["vec_col"]
    )
    cand = (
        TF.scan_partitions(spark, codes_root, rels)
        .withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(probe), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    agg = (
        cand.join(F.broadcast(lut), ["query_id", "sub_id", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adc"))
    )
    w = W.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "adc")
    )
