"""Maintenance planner (operators/maintenance.py): metadata-only debt
detection across a branch tree, and apply = the existing repairs."""

from __future__ import annotations

import os

from cernbox_migration_database_spark.operators import maintenance as M
from cernbox_migration_database_spark.operators import table_format as T


def _mk(spark, tmp_path, name="tbl"):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, p long, v double"
    )
    # write compactly (one task per partition value) — a parallel write
    # at local[32] legitimately starts life with small-file debt, which
    # is exactly what the planner is supposed to flag
    T.create_table(df.repartition(3, "p"), root, partition_by="p")
    return root


def test_fresh_table_has_no_debt(spark, tmp_path):
    root = _mk(spark, tmp_path)
    plan = M.plan_maintenance(root)
    assert list(plan) == ["main"]
    assert plan["main"]["actions"] == []
    assert plan["main"]["has_dv"] is False


def test_small_files_and_retention_detected_and_repaired(spark, tmp_path):
    root = _mk(spark, tmp_path)
    # append-heavy history: each MOR insert-only merge APPENDS files
    # without rewriting (COW would self-compact the touched partition)
    for i in range(6):
        T.merge_into(
            spark, root,
            spark.createDataFrame(
                [(100 + i, i % 3, 1.0 * i)], "id long, p long, v double"
            ),
            on="id", when_matched=None, write_mode="mor",
        )
    plan = M.plan_maintenance(root, max_files_per_partition=2.0)
    ops = [a["op"] for a in plan["main"]["actions"]]
    assert "compact" in ops and "vacuum" in ops
    assert plan["main"]["old_versions"]  # beyond keep_last
    n_before = T.read_table(spark, root).count()
    res = M.apply_maintenance(spark, root, plan)
    assert res["main"]["compacted"] is not None
    assert res["main"]["vacuumed"]
    # repairs preserve data and clear the debt
    assert T.read_table(spark, root).count() == n_before
    plan2 = M.plan_maintenance(root)
    assert plan2["main"]["actions"] == []
    # idempotent: a second apply does nothing
    res2 = M.apply_maintenance(spark, root)
    assert res2["main"] == {"compacted": None, "vacuumed": []}


def test_dv_debt_detected_and_compaction_clears_it(spark, tmp_path):
    root = _mk(spark, tmp_path)
    T.delete_where(spark, root, "id % 10 = 5", mode="mor")
    plan = M.plan_maintenance(root)
    assert plan["main"]["has_dv"] is True
    assert any(
        a["op"] == "compact" and "deletion vectors" in a["reason"]
        for a in plan["main"]["actions"]
    )
    M.apply_maintenance(spark, root, plan)
    cur = T.current_version(root)
    assert not os.path.isdir(os.path.join(T._vdir(root, cur), "_dv"))
    assert M.plan_maintenance(root)["main"]["has_dv"] is False


def test_orphans_and_tag_pins_reported(spark, tmp_path):
    root = _mk(spark, tmp_path)
    T.delete_where(spark, root, "id = 1")  # v2
    T.delete_where(spark, root, "id = 2")  # v3 -> v1 beyond keep_last=2
    T.create_tag(root, "release", version=1)
    # crashed-writer debris
    os.makedirs(os.path.join(root, T._VERSIONS, "v9.staging"))
    plan = M.plan_maintenance(root)
    m = plan["main"]
    assert m["old_versions"] == [1]
    assert "v9.staging" in m["orphans"]
    assert m["pinned_tags"] == ["release"]
    vac = next(a for a in m["actions"] if a["op"] == "vacuum")
    assert "release" in vac["reason"] and "orphan" in vac["reason"]


def test_planner_walks_branch_tree(spark, tmp_path):
    root = _mk(spark, tmp_path)
    T.create_branch(root, "child")
    child = T.branch_root(root, "child")
    T.create_branch(child, "grandchild")
    T.delete_where(spark, child, "id = 3", mode="mor")
    plan = M.plan_maintenance(root)
    assert set(plan) == {
        "main", "branch:child", "branch:child/branch:grandchild"
    }
    assert plan["branch:child"]["has_dv"] is True
    assert plan["branch:child/branch:grandchild"]["has_dv"] is False


def test_planner_maintains_a_sketch_store_state_table(spark, tmp_path):
    """Composition: an incremental store's state table is itself a
    versioned table that accretes versions with every fold — the planner
    finds the retention debt and vacuum reclaims it without breaking the
    store's serving or its next fold."""
    from cernbox_migration_database_spark.operators import freqstore as FS

    base, store = str(tmp_path / "docs"), str(tmp_path / "freq")
    T.create_table(
        spark.createDataFrame(
            [(1, "a a b"), (2, "a c"), (3, "b b b")],
            "doc_id long, text string",
        ),
        base,
    )
    FS.build_freq_store(spark, base, store, key="doc_id",
                        theta_num=1, theta_den=4)
    for i in range(3):  # three folds -> three+ sketch-table versions
        T.merge_into(
            spark, base,
            spark.createDataFrame([(10 + i, "a b z")],
                                  "doc_id long, text string"),
            on="doc_id",
        )
        FS.refresh_freq_store(spark, store)
    plan = M.plan_maintenance(store + "/sketch")
    assert any(a["op"] == "vacuum" for a in plan["main"]["actions"]), plan
    before = FS.heavy_hitters(spark, store).collect()
    M.apply_maintenance(spark, store + "/sketch", plan)
    assert M.plan_maintenance(store + "/sketch")["main"]["old_versions"] == []
    # store still serves and still folds after the reclamation
    assert FS.heavy_hitters(spark, store).collect() == before
    T.delete_where(spark, base, "doc_id = 3")
    FS.refresh_freq_store(spark, store)
    scratch = str(tmp_path / "scratch")
    FS.build_freq_store(spark, base, scratch, key="doc_id",
                        theta_num=1, theta_den=4)
    sk = lambda s: sorted(
        (r["row"], r["bucket"], r["counter"])
        for r in T.read_table(spark, s + "/sketch").collect()
    )
    assert sk(store) == sk(scratch)


def test_apply_uses_the_plans_recorded_keep_last(spark, tmp_path):
    """ADVICE r10: apply_maintenance used to vacuum with its own default
    keep_last regardless of what the reviewed plan was computed with —
    versions the plan never reported as debt were deleted. The plan now
    records its thresholds and apply honors them, erroring on an
    explicit conflicting override."""
    root = _mk(spark, tmp_path)
    for i in range(5):  # versions v1..v6
        T.delete_where(spark, root, f"id = {i}")
    plan = M.plan_maintenance(root, keep_last=4)
    assert plan["main"]["keep_last"] == 4
    assert plan["main"]["old_versions"] == [1, 2]
    # an explicit override that contradicts the reviewed plan is refused
    import pytest

    with pytest.raises(ValueError, match="keep_last"):
        M.apply_maintenance(spark, root, plan, keep_last=2)
    assert os.path.isdir(T._vdir(root, 3))  # nothing was deleted
    # apply with the plan alone vacuums exactly what the plan priced
    M.apply_maintenance(spark, root, plan)
    assert not os.path.isdir(T._vdir(root, 2))
    assert os.path.isdir(T._vdir(root, 3))  # keep_last=4 kept v3..v6
    assert os.path.isdir(T._vdir(root, 6))


def test_drift_stores_priced_and_hist_rebuild_executed(spark, tmp_path):
    """The module's fifth promised debt, now real: attached drift stores
    land in the plan as store:<label> entries; a drifted histogram store
    gets its rebuild EXECUTED by apply (state-sized), a drifted vector
    index stays a reported O(corpus) prescription."""
    from cernbox_migration_database_spark.operators import histstore as HS
    from cernbox_migration_database_spark.operators import ivfindex as IX
    from cernbox_migration_database_spark.operators import similarity as S

    root = _mk(spark, tmp_path)
    # drifted histogram store over a price table
    base, hstore = str(tmp_path / "hb"), str(tmp_path / "hs")
    T.create_table(
        spark.createDataFrame(
            [(i, "a", 10.0 + i) for i in range(10)],
            "k long, part string, price double",
        ),
        base,
    )
    HS.build_hist_store(
        spark, base, hstore, part_col="part", value_col="price", key="k"
    )
    T.merge_into(
        spark, base,
        spark.createDataFrame(
            [(100 + i, "a", 900.0 + i) for i in range(30)],
            "k long, part string, price double",
        ),
        on="k",
    )
    HS.refresh_hist_store(spark, hstore)
    # drifted ivf index
    vb, vidx = str(tmp_path / "vb"), str(tmp_path / "vi")
    emb = spark.createDataFrame(
        [(i, [2.0 + 0.01 * i, 0.05 * (i % 3), 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    T.create_table(emb, vb)
    IX.build_ivf_index(spark, vb, vidx, S.seed_centroids(emb, k=2))
    T.merge_into(
        spark, vb,
        spark.createDataFrame(
            [(100 + i, [0.1, 3.0, 1.0 + 0.02 * i]) for i in range(40)],
            "vec_id long, embedding array<float>",
        ),
        on="vec_id", when_matched=None,
    )
    IX.refresh_ivf_index(spark, vidx)

    import pytest

    with pytest.raises(ValueError, match="SparkSession"):
        M.plan_maintenance(root, drift_stores={"h": ("hist", hstore)})
    plan = M.plan_maintenance(
        root, spark=spark,
        drift_stores={"prices": ("hist", hstore), "vecs": ("ivf", vidx)},
    )
    assert plan["store:prices"]["drift"]["drifted"] is True
    assert plan["store:prices"]["actions"][0]["op"] == "rebuild_hist_store"
    assert plan["store:vecs"]["drift"]["drifted"] is True
    assert plan["store:vecs"]["actions"][0]["op"] == "replan+rebuild"
    res = M.apply_maintenance(spark, root, plan)
    assert res["store:prices"]["rebuilt"] is not None
    assert res["store:vecs"]["skipped"] == ["replan+rebuild"]
    # the executed rebuild actually cleared the histogram drift
    assert HS.drift_report(spark, hstore)["drifted"] is False
    plan2 = M.plan_maintenance(
        root, spark=spark, drift_stores={"prices": ("hist", hstore)}
    )
    assert plan2["store:prices"]["actions"] == []
    # unknown kind is loud
    with pytest.raises(ValueError, match="kind"):
        M.plan_maintenance(
            root, spark=spark, drift_stores={"x": ("bogus", hstore)}
        )


def test_unified_store_registry_prices_and_executes_repairs(
    spark, tmp_path
):
    """r11 verdict items 1-2: the registry prices EVERY attached-store
    family in one sweep — bloom/zone staleness debt, freq rescans, text
    sync lag, key/lsh refresh lag — and apply executes every repair that
    is a pure function of (store state, base snapshot), after which a
    re-plan is clean."""
    from pyspark.sql import functions as F

    from cernbox_migration_database_spark.operators import bloomindex as BI
    from cernbox_migration_database_spark.operators import freqstore as FS
    from cernbox_migration_database_spark.operators import keyindex as KI
    from cernbox_migration_database_spark.operators import textindex as TX
    from cernbox_migration_database_spark.operators import zonemap as ZM

    root = _mk(spark, tmp_path)

    # bloom + zone over one deletion-heavy partitioned table
    pb = str(tmp_path / "pb")
    T.create_table(
        spark.createDataFrame(
            [(i, f"d{i % 4}", float(i)) for i in range(120)],
            "id long, day string, val double",
        ),
        pb, partition_by="day",
    )
    bidx = str(tmp_path / "pb.bloom.json")
    zidx = str(tmp_path / "pb.zone.json")
    BI.create_bloom_index(spark, pb, bidx, key="id", m_bits=256)
    ZM.create_zone_map(spark, pb, zidx, col="val", key="id")
    gone = T.read_table(spark, pb).where(F.col("id") >= 24)
    T.merge_into(
        spark, pb, gone, on="id",
        when_matched="delete", when_not_matched=None,
    )
    BI.refresh_bloom_index(spark, bidx)
    ZM.refresh_zone_map(spark, zidx)

    # freq store over a deletion-heavy corpus (trips needs_rescan)
    fb = str(tmp_path / "fb")
    T.create_table(
        spark.createDataFrame(
            [(i, "alpha beta " + ("hot " * 5 if i % 2 else "cold "))
             for i in range(40)],
            "doc_id long, text string",
        ),
        fb,
    )
    fstore = str(tmp_path / "fs")
    FS.build_freq_store(spark, fb, fstore, key="doc_id")
    fgone = T.read_table(spark, fb).where(F.col("doc_id") >= 8)
    T.merge_into(
        spark, fb, fgone, on="doc_id",
        when_matched="delete", when_not_matched=None,
    )
    FS.refresh_freq_store(spark, fstore)

    # text index bound to a corpus that then advanced
    tb = str(tmp_path / "tb")
    docs = spark.createDataFrame(
        [(i, "spark engine query plan") for i in range(6)],
        "doc_id long, text string",
    )
    T.create_table(docs, tb)
    tix = str(tmp_path / "tix")
    TX.build_text_index(spark, T.read_table(spark, tb), tix)
    TX.bind_text_index(tix, tb)
    T.merge_into(
        spark, tb,
        spark.createDataFrame(
            [(100, "new shuffle stage")], "doc_id long, text string"
        ),
        on="doc_id", when_matched=None,
    )

    # key index lagging one version
    kb = str(tmp_path / "kb")
    T.create_table(
        spark.createDataFrame(
            [(i, f"d{i % 3}", float(i)) for i in range(30)],
            "id long, day string, val double",
        ),
        kb, partition_by="day",
    )
    kidx = str(tmp_path / "kidx")
    KI.create_key_index(spark, kb, kidx, key="id")
    T.merge_into(
        spark, kb,
        spark.createDataFrame([(500, "d0", 5.0)],
                              "id long, day string, val double"),
        on="id", when_matched=None,
    )

    stores = {
        "b": ("bloom", bidx),
        "z": ("zone", zidx),
        "f": ("freq", fstore),
        "t": ("text", tix),
        "k": ("key", kidx),
    }
    plan = M.plan_maintenance(root, spark=spark, drift_stores=stores)
    assert plan["store:b"]["drift"]["drifted"] is True
    assert plan["store:b"]["actions"][0]["op"] == "rebuild_bloom_index"
    assert plan["store:z"]["drift"]["drifted"] is True
    assert plan["store:z"]["actions"][0]["op"] == "rebuild_zone_map"
    assert plan["store:f"]["drift"]["needs_rescan"] is True
    assert {a["op"] for a in plan["store:f"]["actions"]} == {
        "rescan_candidates"
    }
    assert plan["store:t"]["drift"]["versions_behind"] == 1
    assert plan["store:t"]["actions"][0]["op"] == "sync_text_index"
    assert plan["store:k"]["drift"]["versions_behind"] == 1
    assert plan["store:k"]["actions"][0]["op"] == "refresh_key_index"

    res = M.apply_maintenance(spark, root, plan)
    assert "rebuild_bloom_index" in res["store:b"]["executed"]
    assert "rebuild_zone_map" in res["store:z"]["executed"]
    assert "rescan_candidates" in res["store:f"]["executed"]
    assert "sync_text_index" in res["store:t"]["executed"]
    assert "refresh_key_index" in res["store:k"]["executed"]
    assert res["store:b"]["skipped"] == []

    plan2 = M.plan_maintenance(root, spark=spark, drift_stores=stores)
    for label in stores:
        assert plan2[f"store:{label}"]["actions"] == [], (
            label, plan2[f"store:{label}"],
        )

    # sidecar-only kinds price WITHOUT a SparkSession
    plan3 = M.plan_maintenance(
        root, drift_stores={"b": ("bloom", bidx), "k": ("key", kidx)}
    )
    assert plan3["store:b"]["actions"] == []
    assert plan3["store:k"]["actions"] == []
