from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from cernbox_migration_database_spark.operators import shard as SH


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                draw(st.sampled_from(["en", "de"])),
                draw(st.integers(min_value=0, max_value=300)),
            )
        )
    return rows


# the spark fixture is session-scoped, which hypothesis permits inside @given
@settings(max_examples=15, deadline=None)
@given(rows=corpora(), budget=st.integers(min_value=10, max_value=200))
def test_next_fit_invariants(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id int, lang string, tc int")
    out = SH.pack_next_fit(
        df,
        F.col("tc"),
        budget=budget,
        group_cols=("lang",),
        n_buckets=2,
    ).collect()
    # every document is assigned exactly once
    assert sorted(r.doc_id for r in out) == sorted(r[0] for r in rows)
    tc_by_id = {r[0]: r[2] for r in rows}
    by_group: dict[tuple, list] = {}
    for r in out:
        by_group.setdefault((r.lang, r.bucket), []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: r.doc_id)
        # bins are 1-based, contiguous, non-decreasing in id order, and
        # fill_after replays the next-fit discipline exactly
        assert grp[0].bin == 1
        fill = 0
        bin_no = 0
        for r in grp:
            tc = tc_by_id[r.doc_id]
            opens = bin_no == 0 or fill + tc > budget
            expect_bin = bin_no + 1 if opens else bin_no
            assert r.bin == expect_bin
            bin_no = expect_bin
            fill = tc if opens else fill + tc
            assert r.fill_after == fill
            # a bin exceeds the budget only when one oversized doc owns it
            if fill > budget:
                assert r.fill_after == tc
