"""util.py primitives — pinned after global_rank's empty-input crash
(an argless create_map() types as map<void,void> and fails analysis when
indexed; surfaced by an empty conjunctive BM25 probe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark.util import global_rank


def test_global_rank_dense_total_order(spark):
    df = spark.createDataFrame(
        [(v,) for v in [5, 3, 9, 1, 7, 3]], "v int"
    )
    got = {
        (r["v"], r["rank"])
        for r in global_rank(df, [F.col("v").desc()]).collect()
    }
    # ties (two 3s) get distinct adjacent ranks in some order
    ranks = sorted(r for _, r in got)
    assert ranks == [1, 2, 3, 4, 5, 6]
    by_rank = {r: v for v, r in got}
    assert [by_rank[i] for i in (1, 2, 3, 4)] == [9, 7, 5, 3]


def test_global_rank_empty_input_analyzes_and_returns_zero_rows(spark):
    df = spark.createDataFrame([], "v int").where(F.col("v") > 0)
    out = global_rank(df, [F.col("v")])
    assert out.collect() == []
    assert dict(out.dtypes)["rank"] == "bigint"
