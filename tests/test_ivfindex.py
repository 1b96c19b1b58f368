"""Incremental IVF vector index (operators/ivfindex.py): probes must
match the one-shot ann_ivf, and change-feed refresh must leave the index
identical to a from-scratch rebuild (pure function of snapshot +
centroids), including vectors that move cells on update."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import ivfindex as IX
from cernbox_migration_database_spark.operators import similarity as S
from cernbox_migration_database_spark.operators import table_format as TF


def _vec(i: int) -> list[float]:
    # three loose clusters around axes, deterministic
    axis = i % 3
    base = [0.05 * ((i * 7) % 5), 0.05 * ((i * 11) % 5), 0.05 * ((i * 13) % 5)]
    base[axis] += 2.0 + 0.01 * i
    return base


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids],
        "vec_id long, embedding array<float>",
    )


def _mk(spark, tmp_path, ids=range(20)):
    base, idx = str(tmp_path / "emb"), str(tmp_path / "idx")
    df = _emb(spark, ids)
    TF.create_table(df, base)
    cents = S.seed_centroids(df, k=3)
    IX.build_ivf_index(spark, base, idx, cents)
    return base, idx, cents


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in df.collect()
    )


def test_probe_matches_one_shot_ann_ivf(spark, tmp_path):
    base, idx, cents = _mk(spark, tmp_path)
    corpus = TF.read_table(spark, base)
    queries = _emb(spark, [0, 1, 2, 5])
    got = _rows(IX.probe_ivf_index(spark, idx, queries, nprobe=2, top_k=3))
    want = _rows(S.ann_ivf(corpus, queries, cents, nprobe=2, top_k=3))
    assert got == want and len(got) > 0


def test_refresh_keeps_index_equal_to_rebuild(spark, tmp_path):
    base, idx, cents = _mk(spark, tmp_path)
    # insert new vectors, delete one, and UPDATE one onto a different
    # axis so its cell assignment must move partitions
    TF.merge_into(
        spark, base, _emb(spark, [30, 31]), on="vec_id", when_matched=None
    )
    TF.delete_where(spark, base, F.col("vec_id") == 4)
    moved = spark.createDataFrame(
        [(5, [9.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    TF.merge_into(spark, base, moved, on="vec_id")
    assert IX.refresh_ivf_index(spark, idx) == TF.current_version(base)

    idx2 = str(tmp_path / "idx2")
    IX.build_ivf_index(spark, base, idx2, cents)

    def cells(root):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["svec"]), r["norm"])
            for r in TF.read_table(
                spark, os.path.join(root, "cells")
            ).collect()
        )

    assert cells(idx) == cells(idx2)
    # deleted vector absent, moved vector re-assigned
    by_id = {v: c for v, c, _, _ in cells(idx)}
    assert 4 not in by_id
    assert by_id[5] == 0  # x-axis cell (centroid 0 seeds from vec 0)
    # probes through the refreshed index still match one-shot
    queries = _emb(spark, [1, 2])
    got = _rows(IX.probe_ivf_index(spark, idx, queries, nprobe=2, top_k=3))
    want = _rows(
        S.ann_ivf(TF.read_table(spark, base), queries, cents, nprobe=2, top_k=3)
    )
    assert got == want
    # no-op refresh
    v = TF.current_version(os.path.join(idx, "cells"))
    assert IX.refresh_ivf_index(spark, idx) == TF.current_version(base)
    assert TF.current_version(os.path.join(idx, "cells")) == v


def test_probe_reads_only_probed_cells(spark, tmp_path):
    """nprobe=1 ⇒ the scan underneath the probe opens exactly ONE cell
    partition (file-provenance check at the scan, before shuffles erase
    input_file_name), and every returned neighbor belongs to that cell."""
    base, idx, cents = _mk(spark, tmp_path)
    queries = _emb(spark, [0])  # hugs the x-axis centroid
    q = S.with_norm(queries)
    cell = q.select(
        F.explode(
            S.probe_cells(F.col("svec"), F.col("norm"), cents, 1)
        ).alias("cell")
    ).collect()[0]["cell"]
    scan = TF.scan_partitions(
        spark, os.path.join(idx, "cells"), [f"cell={cell}"]
    )
    read = {
        os.path.basename(os.path.dirname(r[0]))
        for r in scan.select(F.input_file_name()).distinct().collect()
    }
    assert read == {f"cell={cell}"}
    members = {r["vec_id"] for r in scan.collect()}
    out = IX.probe_ivf_index(spark, idx, queries, nprobe=1, top_k=5)
    neighbors = {r["neighbor_id"] for r in out.collect()}
    assert neighbors and neighbors <= members - {0}


def test_filtered_probe_restricts_to_predicate(spark, tmp_path):
    """Filtered search: top-k among only predicate-satisfying vectors,
    with attrs riding in the index (no base-table join) and surviving
    a change-feed refresh."""
    base, idx = str(tmp_path / "emb"), str(tmp_path / "idx")
    df = _emb(spark, range(20)).withColumn(
        "grp", (F.col("vec_id") % 2).cast("int")
    )
    TF.create_table(df, base)
    cents = S.seed_centroids(df, k=3)
    IX.build_ivf_index(spark, base, idx, cents, attr_cols=["grp"])
    queries = _emb(spark, [0, 1])
    out = IX.probe_ivf_index(
        spark, idx, queries, nprobe=3, top_k=4, where="grp = 1"
    )
    rows = out.collect()
    assert rows and all(r["neighbor_id"] % 2 == 1 for r in rows)
    # unfiltered equals ann_ivf; filtered equals ann_ivf restricted
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_ivf(
            df.where("vec_id % 2 = 1"), queries, cents, nprobe=3, top_k=4
        ).collect()
    }
    assert {(r["query_id"], r["neighbor_id"]) for r in rows} == want
    # attrs survive refresh: insert an odd vector near query 1's cluster
    TF.merge_into(
        spark, base,
        _emb(spark, [33]).withColumn("grp", F.lit(1).cast("int")),
        on="vec_id", when_matched=None,
    )
    IX.refresh_ivf_index(spark, idx)
    rows2 = IX.probe_ivf_index(
        spark, idx, queries, nprobe=3, top_k=20, where="grp = 1"
    ).collect()
    assert 33 in {r["neighbor_id"] for r in rows2}


def test_base_compaction_is_a_content_noop_for_refresh(spark, tmp_path):
    base, idx, cents = _mk(spark, tmp_path)
    before = sorted(
        tuple(r)
        for r in TF.read_table(spark, os.path.join(idx, "cells")).collect()
    )
    TF.compact(spark, base)
    assert IX.refresh_ivf_index(spark, idx) == TF.current_version(base)
    after = sorted(
        tuple(r)
        for r in TF.read_table(spark, os.path.join(idx, "cells")).collect()
    )
    assert after == before
