"""Semantics tests for the round-3 training-pipeline additions: funnel /
cohort analytics, decontamination, repetition stats, mixture weights, and
sparse random projection."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark.operators import dedup as D
from cernbox_migration_database_spark.operators import similarity as S
from cernbox_migration_database_spark.operators import text as TX


def test_ngrams_multiset_and_guard(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "a", "b"]), (2, ["only"]), (3, [])],
        "id long, t array<string>",
    )
    out = {
        r["id"]: r["g"]
        for r in df.select("id", TX.ngrams(F.col("t"), 2).alias("g")).collect()
    }
    # duplicates preserved (multiset, unlike shingles_from_tokens)
    assert out[1] == ["a b", "b a", "a b"]
    # fewer-than-n tokens -> empty array, not a descending-sequence blowup
    assert out[2] == [] and out[3] == []


def test_contamination_overlap_counts(spark):
    docs = spark.createDataFrame(
        [
            # train doc 1 shares the shingle "x y z" with eval docs 2 and 4
            (1, "x y z tail one", "en"),
            (2, "x y z tail two", "en"),
            (4, "prefix x y z", "en"),
            # doc 3: same text as 1 but different lang block -> no collision
            (3, "x y z tail one", "de"),
            # doc 5: train, no overlap with any eval doc
            (5, "completely different words here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    is_eval = F.col("doc_id").isin(2, 4)
    out = {
        r["train_doc"]: (r["n_shared_shingles"], r["n_eval_docs"])
        for r in D.contamination_overlap(docs, is_eval).collect()
    }
    assert 5 not in out and 3 not in out  # no eval collision
    n_sh, n_docs = out[1]
    assert n_docs == 2 and n_sh >= 2  # "x y z" + "y z tail" (doc 2)


def test_random_projection_matches_manual(spark):
    vec = [0.5, -1.25] + [0.0] * 62
    df = spark.createDataFrame([(7, vec)], "vec_id long, embedding array<float>")
    rows = S.random_projection(df).collect()
    assert len(rows) == 1
    ws = S.projection_weights(8)
    scaled = [int(round(v * 10**7)) for v in vec]
    for p in range(8):
        expect = sum(w * s for w, s in zip(ws[p], scaled))
        assert rows[0][f"proj_{p}"] == expect


def test_percentile_disc_is_data_value(spark, sf_dir):
    out = Q.QUERIES["percentile_disc_groups"](spark, sf_dir)
    vals = {
        r["o_totalprice"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice")
        .collect()
    }
    for r in out.collect():
        for c in ("p25", "p50", "p75", "p95"):
            assert r[c] in vals  # discrete percentile returns actual values
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p95"]


def test_funnel_monotone(spark, sf_dir):
    r = Q.QUERIES["events_funnel"](spark, sf_dir).collect()[0]
    assert r["n_users"] >= r["n_viewed"] >= r["n_clicked"] >= r["n_purchased"]
    assert r["n_purchased"] > 0  # fixture has all three stages
    assert 0.0 <= r["click_to_purchase"] <= 1.0
    assert 0.0 <= r["view_to_click"] <= 1.0


def test_funnel_ordering_semantics(spark, tmp_path, monkeypatch):
    # user 10: view -> click -> purchase (full funnel)
    # user 20: click BEFORE its only view, purchase after -> click must not
    #          count (no view precedes it), so purchase can't either
    # user 30: view only
    rows = [
        (1, "2024-01-01 10:00:00", 10, "view"),
        (2, "2024-01-01 10:01:00", 10, "click"),
        (3, "2024-01-01 10:02:00", 10, "purchase"),
        (4, "2024-01-01 09:00:00", 20, "click"),
        (5, "2024-01-01 09:30:00", 20, "view"),
        (6, "2024-01-01 09:45:00", 20, "purchase"),
        (7, "2024-01-01 08:00:00", 30, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # run the same plan the catalog query builds, against this frame
    from cernbox_migration_database_spark.queries import events_funnel

    monkeypatch.setattr(
        "cernbox_migration_database_spark.queries.events._t",
        lambda _s, _d, _n: df,
    )
    r = events_funnel(spark, "unused").collect()[0]
    assert (r["n_users"], r["n_viewed"], r["n_clicked"], r["n_purchased"]) == (
        3,
        3,
        1,
        1,
    )


def test_retention_cohort_shape(spark, sf_dir):
    out = Q.QUERIES["events_retention_cohort"](spark, sf_dir).collect()
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert all(r["week_offset"] >= 0 for r in out)
    assert all(0 < r["n_active"] <= users for r in out)
    # offset-0 cell of each cohort contains every cohort member's first week
    zero = [r for r in out if r["week_offset"] == 0]
    assert len(zero) >= 1


def test_mixture_weights_bounds(spark, sf_dir):
    out = Q.QUERIES["train_mixture_weights"](spark, sf_dir)
    rows = out.collect()
    assert rows, "sample should be non-empty"
    ws = {r["lang"]: r["weight"] for r in rows}
    assert all(0.0 < w <= 1.0 for w in ws.values())
    # the minority language sits at/below the equal-share target -> weight 1
    assert max(ws.values()) == 1.0


def test_repetition_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "all tokens here differ")],
        "doc_id long, text string",
    )
    from cernbox_migration_database_spark.queries import text_repetition
    import cernbox_migration_database_spark.queries.text as QM

    orig = QM._t
    QM._t = lambda _s, _d, _n: docs
    try:
        out = {r["doc_id"]: r for r in text_repetition(spark, "unused").collect()}
    finally:
        QM._t = orig
    assert out[1]["repetitive"] and out[1]["dup_ratio"] > 0.5
    assert not out[2]["repetitive"] and out[2]["dup_ratio"] == 0.0
    assert out[1]["top_frac"] == 1.0


def _winnow_py(text: str, k: int, w: int) -> set[int]:
    """Reference winnowing in plain Python (Schleimer et al. semantics:
    k-gram polynomial hashes, min per window of w, distinct values)."""
    import re

    s = re.sub(r"\s+", " ", text.lower()).strip()
    if len(s) < k:
        return set()
    pw = [pow(TX.WINNOW_BASE, k - 1 - j, TX.WINNOW_MOD) for j in range(k)]
    h = [
        sum(ord(s[i + j]) * pw[j] for j in range(k)) % TX.WINNOW_MOD
        for i in range(len(s) - k + 1)
    ]
    if len(h) <= w:
        return {min(h)}
    return {min(h[i : i + w]) for i in range(len(h) - w + 1)}


def test_winnowing_matches_python_reference(spark):
    cases = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the  QUICK   brown fox"),  # whitespace collapse + casefold
        (3, "aaaaaaa"),                 # all-equal hashes (tie handling)
        (4, "abcdefg"),
        (5, "abcd"),                    # shorter than k -> no rows
        (6, "abcdefgh"),               # m < w -> single whole-array window
        (7, "xy"),
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in TX.winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for doc_id, text in cases:
        want = _winnow_py(text, TX.WINNOW_K, TX.WINNOW_W)
        assert got.get(doc_id, set()) == want, f"doc {doc_id}"


def test_winnowing_shared_substring_guarantee(spark):
    # Any shared substring of length >= w + k - 1 must yield at least one
    # shared fingerprint (the winnowing guarantee).
    shared = "incriminating shared passage"
    docs = spark.createDataFrame(
        [
            (1, f"left context {shared} and some tail"),
            (2, f"completely different head {shared} other end"),
            (3, "no overlap with the others at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps: dict[int, set[int]] = {1: set(), 2: set(), 3: set()}
    for r in TX.winnow_fingerprints(docs).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert not (fps[1] & fps[3] and fps[2] & fps[3])


def test_profile_counts_nulls_and_distincts(spark):
    from cernbox_migration_database_spark.operators.profile import profile

    df = spark.createDataFrame(
        [
            (1, "a", 2.0),
            (2, "a", None),
            (3, None, 4.5),
            (3, "b", 4.5),
        ],
        "k long, s string, v double",
    )
    out = {r["col"]: r for r in profile(df, numeric_cols=["k", "v"]).collect()}
    assert set(out) == {"k", "s", "v"}
    assert out["k"]["n"] == 4 and out["k"]["n_null"] == 0
    assert out["k"]["n_distinct"] == 3
    assert (out["k"]["min_num"], out["k"]["max_num"]) == (1.0, 3.0)
    assert out["k"]["sum_num"] == 9.0
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_num"] is None and out["s"]["sum_num"] is None
    assert out["v"]["n_null"] == 1 and out["v"]["sum_num"] == 11.0


def test_deletion_propagation_purges_and_audits(spark, sf_dir):
    from cernbox_migration_database_spark.operators.purge import (
        propagate_deletions,
    )
    from cernbox_migration_database_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    deletions = ev.where(F.col("user_id") % 7 == 0).select("user_id")
    purged, audit = propagate_deletions(
        {"events": (ev, "user_id"), "customer": (cust, "c_custkey")},
        deletions,
    )
    rows = {r["tbl"]: r for r in audit.collect()}
    del_keys = {r["user_id"] for r in deletions.distinct().collect()}
    for name, (src, key) in {
        "events": (ev, "user_id"),
        "customer": (cust, "c_custkey"),
    }.items():
        a = rows[name]
        assert a["n_before"] == src.count()
        assert a["n_before"] == a["n_deleted"] + a["n_after"]
        assert purged[name].count() == a["n_after"]
        # no purged table retains a deleted key
        remaining = {
            r[key] for r in purged[name].select(key).distinct().collect()
        }
        assert not (remaining & del_keys)
    assert rows["events"]["n_deleted"] > 0


def test_winnowing_pairs_detect_shared_passage(spark, monkeypatch):
    import cernbox_migration_database_spark.queries.text as QM

    shared = "a very distinctive incriminating passage nobody else has"
    docs = spark.createDataFrame(
        [
            (1, f"first document containing {shared} plus its own tail"),
            (2, f"second one also containing {shared} with other words"),
            (3, "a completely unrelated piece of text goes here instead"),
            (4, "yet another unrelated document about engines and queries"),
        ],
        "doc_id long, text string",
    )
    orig = QM._t
    monkeypatch.setattr(QM, "_t", lambda _s, _d, _n: docs)
    try:
        pairs = {
            (r["doc_a"], r["doc_b"]): r["shared_fps"]
            for r in QM.dedup_winnowing_pairs(spark, "unused").collect()
        }
    finally:
        monkeypatch.setattr(QM, "_t", orig)
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    # incidental word-level matches can clear the bar in a 4-doc corpus
    # (nothing reaches max_df to be culled), but the planted shared
    # passage must dominate every other pair's evidence
    others = [v for k, v in pairs.items() if k != (1, 2)]
    assert not others or pairs[(1, 2)] > max(others)
