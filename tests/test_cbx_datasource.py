"""The ``cbxtable`` Python DataSource: the versioned table as a native
Spark source (batch + time travel + pushdown pruning), a streaming
source (commit log as microbatches), and — with the txn-marker sink —
both ends of an exactly-once table→stream→table pipeline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators import table_format as TF
from cernbox_migration_database_spark.sources import cbx_datasource as DS
from cernbox_migration_database_spark.streaming.table_sink import (
    exactly_once_batch_writer,
    stream_write_table,
)


@pytest.fixture(autouse=True)
def _registered(spark):
    DS.register(spark)
    yield


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _evolved_table(spark, root):
    """create(partitioned) → MOR delete → rename → evolve-schema merge:
    the snapshot mixes footer schemas, carries tombstones, and maps an
    old physical name — everything the file-level reader must honor."""
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 10, f"s{i}") for i in range(20)],
        "id long, grp string, val long, note string",
    )
    TF.create_table(df, root, partition_by="grp")
    TF.delete_where(spark, root, "id % 5 = 0", mode="mor")
    TF.rename_column(spark, root, "note", "comment")
    TF.merge_into(
        spark, root,
        spark.createDataFrame(
            [(100, "a", 1, "new", 9.5)],
            "id long, grp string, val long, comment string, score double",
        ),
        on="id", evolve_schema=True,
    )


def test_batch_read_matches_native_across_evolution(spark, tmp_path):
    root = str(tmp_path / "t")
    _evolved_table(spark, root)
    native = TF.read_table(spark, root)
    via = spark.read.format("cbxtable").load(root)
    assert via.schema == native.schema
    assert _rows(via) == _rows(native)
    # time travel through reader options, version and timestamp forms
    v1 = spark.read.format("cbxtable").option("version", "1").load(root)
    assert v1.count() == 20 and v1.columns == ["id", "grp", "val", "note"]
    ts = [e["ts"] for e in TF.history(root) if e["version"] == 2][0]
    v2 = spark.read.format("cbxtable").option("timestamp", str(ts)).load(root)
    assert v2.count() == 16  # after the MOR delete of id%5==0


def test_filters_prune_partitions_and_files(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    root = str(tmp_path / "t")
    # 4 partitions x several files with disjoint id ranges per insert
    TF.create_table(
        spark.range(0, 400)
        .select(
            F.col("id"),
            (F.col("id") % 4).cast("string").alias("p"),
            (F.col("id") * 2).alias("v"),
        )
        .repartition(4, "p"),
        root,
        partition_by="p",
    )
    TF.insert_into(
        spark, root,
        spark.range(1000, 1400).select(
            F.col("id"),
            (F.col("id") % 4).cast("string").alias("p"),
            (F.col("id") * 2).alias("v"),
        ),
    )
    schema = DS._logical_schema(root, TF.current_version(root))
    # Spark's hive partition inference reads "0".."3" back as INT; the
    # connector must mirror that or native/connector schemas diverge
    assert dict((f.name, f.dataType.simpleString()) for f in schema.fields)[
        "p"
    ] == "int"
    total = len(TF.manifest(root, TF.current_version(root)))
    # partition-value pruning: p = 1 keeps only that directory's files
    kept, skipped = DS._plan_files(
        root, TF.current_version(root), [EqualTo(("p",), 1)], schema
    )
    assert skipped > 0 and len(kept) + skipped == total
    assert all("/p=1/" in p.file or "p=1" in p.rel for p in kept)
    # manifest min/max stats skip the low-id files for a high-id predicate
    kept2, skipped2 = DS._plan_files(
        root, TF.current_version(root), [GreaterThan(("id",), 1000)], schema
    )
    assert skipped2 > 0
    kept3, skipped3 = DS._plan_files(
        root, TF.current_version(root), [In(("p",), (1, 2))], schema
    )
    assert skipped3 > 0 and len(kept3) + skipped3 == total
    # end-to-end: pruned scans return exactly the native rows
    via = spark.read.format("cbxtable").load(root)
    native = TF.read_table(spark, root)
    for cond in ["p = 1", "id > 1000", "p = 1 AND id > 1000", "id = 7"]:
        assert _rows(via.where(cond)) == _rows(native.where(cond)), cond
    # an everything-pruned scan is an empty result, not an error
    assert via.where("id = -5").count() == 0


def test_stream_appends_skip_and_error_semantics(spark, tmp_path):
    root = str(tmp_path / "t")
    mk = lambda rows: spark.createDataFrame(rows, "id long, grp string, v long")
    TF.create_table(
        mk([(i, "ab"[i % 2], i) for i in range(10)]), root, partition_by="grp"
    )
    TF.insert_into(spark, root, mk([(100, "a", 100), (101, "b", 101)]))
    TF.delete_where(spark, root, "id = 3", mode="mor")  # change commit
    TF.insert_into(spark, root, mk([(102, "a", 102)]))

    q = (
        spark.readStream.format("cbxtable")
        .option("startingVersion", "earliest")
        .option("skipChangeCommits", "true")
        .load(root)
        .writeStream.format("memory").queryName("ds_skip")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["id"] for r in spark.sql("SELECT * FROM ds_skip").collect()}
    # append-stream semantics: id=3 streamed with the CREATE commit; the
    # later delete commit is skipped, not retroactively applied
    assert got == set(range(10)) | {100, 101, 102}

    with pytest.raises(Exception, match="append-only"):
        q2 = (
            spark.readStream.format("cbxtable")
            .option("startingVersion", "earliest")
            .load(root)
            .writeStream.format("memory").queryName("ds_err")
            .trigger(availableNow=True).start()
        )
        q2.awaitTermination(120)

    # default start: nothing until a commit AFTER the checkpointed offset
    # (parquet sink: the memory sink cannot recover from a checkpoint)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_tail():
        q = (
            spark.readStream.format("cbxtable").load(root)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_tail()
    assert spark.read.parquet(out).count() == 0
    TF.insert_into(spark, root, mk([(200, "b", 200)]))
    run_tail()
    assert {r["id"] for r in spark.read.parquet(out).collect()} == {200}


def test_exactly_once_sink_replay_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    apply = exactly_once_batch_writer(root, "app1", key="k")
    apply(mk([(1, 10), (2, 20)]), 0)   # creates the table
    apply(mk([(2, 21), (3, 30)]), 1)   # upserts
    v_after = TF.current_version(root)
    apply(mk([(2, 21), (3, 30)]), 1)   # crash-replay of batch 1
    apply(mk([(1, 10), (2, 20)]), 0)   # deep replay
    assert TF.current_version(root) == v_after  # no new commits
    assert {
        (r["k"], r["v"]) for r in TF.read_table(spark, root).collect()
    } == {(1, 10), (2, 21), (3, 30)}
    assert TF.last_txn_version(root, "app1") == 1
    assert TF.last_txn_version(root, "elsewhere") is None
    apply(mk([(4, 40)]), 2)            # progress resumes past the replay
    assert TF.read_table(spark, root).count() == 4
    # in-batch duplicate keys must not trip the merge cardinality check
    apply(mk([(5, 50), (5, 51)]), 3)
    assert TF.read_table(spark, root).where("k = 5").count() == 1


def test_commit_version_column_orders_multi_commit_batches(spark, tmp_path):
    """An availableNow catch-up compresses several commits into ONE
    microbatch, so a corrected key arrives with both its old and new
    image in the same batch. withCommitVersion stamps rows with their
    commit; the sink's struct-max reduce must keep the NEWEST image —
    an arbitrary dropDuplicates here would be flaky-wrong."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    mk = lambda rows: spark.createDataFrame(rows, "k long, g string, v long")
    TF.create_table(mk([(1, "a", 10), (2, "b", 20)]), src, partition_by="g")
    TF.merge_into(spark, src, mk([(1, "a", 11)]), on="k")   # correction 1
    TF.merge_into(spark, src, mk([(1, "a", 12)]), on="k")   # correction 2
    stream = (
        spark.readStream.format("cbxtable")
        .option("startingVersion", "earliest")
        .option("ignoreChanges", "true")
        .option("withCommitVersion", "true")
        .load(src)
    )
    assert "_commit_version" in stream.columns
    q = stream_write_table(
        stream, dst, str(tmp_path / "ckpt"), app_id="ord",
        key="k", partition_by="g", order_by="_commit_version",
    )
    q.awaitTermination(180)
    got = {(r["k"], r["v"]) for r in TF.read_table(spark, dst).collect()}
    assert got == {(1, 12), (2, 20)}
    # the synthetic column must not leak into the destination schema
    assert "_commit_version" not in TF.read_table(spark, dst).columns
    # and a batch snapshot read rejects the streaming-only option
    with pytest.raises(Exception, match="streaming option"):
        spark.read.format("cbxtable").option(
            "withCommitVersion", "true"
        ).load(src).collect()


def test_table_to_table_streaming_pipeline(spark, tmp_path):
    """Source table → cbxtable stream → exactly-once sink table; a second
    pass over the SAME checkpoint after new source commits moves only the
    delta, and a re-run with no new commits moves nothing."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("g")
    )
    TF.create_table(mk(0, 50), src, partition_by="g")
    TF.insert_into(spark, src, mk(50, 80))

    def run_pipe():
        stream = (
            spark.readStream.format("cbxtable")
            .option("startingVersion", "earliest").load(src)
        )
        q = stream_write_table(
            stream, dst, ckpt, app_id="pipe", key="id", partition_by="g"
        )
        q.awaitTermination(180)

    run_pipe()
    assert _rows(TF.read_table(spark, dst)) == _rows(TF.read_table(spark, src))
    v_dst = TF.current_version(dst)
    run_pipe()  # no new source commits: offsets caught up, no new version
    assert TF.current_version(dst) == v_dst
    TF.insert_into(spark, src, mk(80, 90))
    run_pipe()
    assert _rows(TF.read_table(spark, dst)) == _rows(TF.read_table(spark, src))


def test_writer_create_append_overwrite_roundtrip(spark, tmp_path):
    """df.write.format('cbxtable'): append to a missing table CREATES it
    (Python data sources allow only Append/Overwrite modes), appends
    commit new versions that hardlink-carry, native merges interoperate,
    and overwrite is a full-reset commit with history intact."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 10) for i in range(20)],
        "id long, p string, v long",
    )
    (
        df.write.format("cbxtable").mode("append")
        .option("partition_by", "p").save(root)
    )
    assert TF.current_version(root) == 1
    assert _rows(TF.read_table(spark, root)) == _rows(df)
    # partition dirs use Spark's hive naming, manifest carries stats
    assert {e["path"].split("/")[0] for e in TF.manifest(root, 1)} == {
        "p=a", "p=b",
    }
    assert all("stats" in e and "rows" in e for e in TF.manifest(root, 1))

    # append with NARROWER source types: footers must carry table types
    df2 = spark.createDataFrame(
        [(100, "a", 5)], "id int, p string, v int"
    )
    df2.write.format("cbxtable").mode("append").save(root)
    assert TF.read_table(spark, root).count() == 21
    assert TF.read_table(spark, root).schema["v"].dataType.simpleString() == "bigint"

    # native writer interop on a format-created table
    TF.merge_into(
        spark, root,
        spark.createDataFrame([(1, "a", 999)], "id long, p string, v long"),
        on="id",
    )
    assert TF.read_table(spark, root).where("id = 1").collect()[0]["v"] == 999

    # overwrite: full reset, older versions still readable
    spark.createDataFrame([(7, "a", 7)], "id long, p string, v long").write \
        .format("cbxtable").mode("overwrite").save(root)
    assert _rows(TF.read_table(spark, root)) == [(7, "a", 7)]
    assert TF.read_table(spark, root, version=3).count() == 21

    # schema-mismatch and CHECK-constraint guards
    with pytest.raises(Exception, match="table columns"):
        spark.createDataFrame([(1, "a")], "id long, p string").write \
            .format("cbxtable").mode("append").save(root)
    chk = str(tmp_path / "chk")
    TF.create_table(
        spark.createDataFrame([(1, 2)], "a long, b long"), chk,
        checks={"b_pos": "b > 0"},
    )
    with pytest.raises(Exception, match="CHECK"):
        spark.createDataFrame([(3, -4)], "a long, b long").write \
            .format("cbxtable").mode("append").save(chk)


def test_writer_overwrite_resets_rename_chain(spark, tmp_path):
    """'overwrite' joins create/compact/restore as a uniform-reset point:
    files before it are gone, so rename mappings and evolved flags from
    the prior lineage must not leak into reads of the new one."""
    root = str(tmp_path / "t")
    TF.create_table(
        spark.createDataFrame([(1, 10)], "id long, old long"), root
    )
    TF.rename_column(spark, root, "old", "new")
    spark.createDataFrame([(2, 20)], "id long, new long").write \
        .format("cbxtable").mode("overwrite").save(root)
    out = TF.read_table(spark, root)
    assert out.columns == ["id", "new"]
    assert _rows(out) == [(2, 20)]
    via = spark.read.format("cbxtable").load(root)
    assert _rows(via) == [(2, 20)]


def test_writer_null_and_special_partition_values(spark, tmp_path):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__ and
    special characters escape exactly like Spark's native writer, so the
    native reader and the connector agree on both."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, 10), (2, "a/b:c=d", 20), (3, "plain", 30)],
        "id long, p string, v long",
    )
    (
        df.write.format("cbxtable").mode("append")
        .option("partition_by", "p").save(root)
    )
    native = TF.read_table(spark, root)
    assert _rows(native) == _rows(df)
    via = spark.read.format("cbxtable").load(root)
    assert _rows(via) == _rows(df)
    dirs = {e["path"].split("/")[0] for e in TF.manifest(root, 1)}
    assert "p=__HIVE_DEFAULT_PARTITION__" in dirs
    assert "p=a%2Fb%3Ac%3Dd" in dirs


def test_writer_append_retries_after_losing_claim(spark, tmp_path, monkeypatch):
    """A format-writer append racing a native merge loses the version
    claim and must retry against the winner's snapshot — the same
    optimistic-concurrency posture every native committing op has. The
    writer object is driven in-process here (in production write()/
    commit() run inside Python worker subprocesses, which a driver-side
    monkeypatch cannot reach — the code path is identical). The final
    table carries BOTH the merge's update and the appended rows, with a
    gapless version chain."""
    import pyarrow as pa

    root = str(tmp_path / "t")
    TF.create_table(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, p string, v long"
        ),
        root, partition_by="p",
    )
    schema = DS._logical_schema(root, 1)
    writer = DS.CbxTableWriter(root, schema, False, {})
    msg = writer.write(
        iter(
            pa.table(
                {"id": [3], "p": ["a"], "v": [30]},
            ).cast(pa.schema([("id", pa.int64()), ("p", pa.string()), ("v", pa.int64())])).to_batches()
        )
    )
    real_claim = TF._claim_version
    state = {"raced": False}

    def racing_claim(r, version):
        if r == root and not state["raced"]:
            state["raced"] = True
            TF.merge_into(
                spark, r,
                spark.createDataFrame(
                    [(1, "a", 999)], "id long, p string, v long"
                ),
                on="id", when_not_matched=None,
            )
            raise FileExistsError("lost the claim")
        return real_claim(r, version)

    monkeypatch.setattr(TF, "_claim_version", racing_claim)
    writer.commit([msg])
    monkeypatch.setattr(TF, "_claim_version", real_claim)
    got = {(r["id"], r["v"]) for r in TF.read_table(spark, root).collect()}
    assert got == {(1, 999), (2, 20), (3, 30)}
    assert [e["version"] for e in TF.history(root)] == [1, 2, 3]


def test_writer_abort_leaves_table_untouched(spark, tmp_path):
    """A failing write task aborts the job: no version commits, the
    snapshot is unchanged, and no writer staging survives under the
    table root."""
    root = str(tmp_path / "t")
    TF.create_table(
        spark.createDataFrame([(1, "a", 10)], "id long, p string, v long"),
        root, partition_by="p",
    )

    @F.udf("long")
    def boom(v):
        raise RuntimeError("task failure injected")

    bad = spark.createDataFrame(
        [(9, "a", 90)], "id long, p string, v long"
    ).withColumn("v", boom("v"))
    with pytest.raises(Exception):
        bad.write.format("cbxtable").mode("append").save(root)
    assert TF.current_version(root) == 1
    assert _rows(TF.read_table(spark, root)) == [(1, "a", 10)]
    stray = [d for d in os.listdir(root) if d.startswith(".ds_write_")]
    assert stray == []


def test_property_connector_reads_equal_native_across_random_histories(
    spark, tmp_path
):
    """Model-based differential for the WHOLE connector read path: random
    sequences of table operations (COW/MOR upserts, merge deletes,
    predicate deletes, append inserts, RENAME, DROP, OPTIMIZE, restore)
    build arbitrary histories; after every op, `spark.read.format
    ("cbxtable")` must return exactly the native `read_table`'s schema
    and rows — and at the end, for EVERY historical version (time travel
    through reader options). The native reader is the trusted oracle
    here; it is itself differentialed against DuckDB by the catalog."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op = st.one_of(
        st.tuples(
            st.sampled_from(["upsert", "mor_upsert"]),
            st.lists(
                st.tuples(st.integers(0, 14), st.integers(0, 99)),
                min_size=1, max_size=3, unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(
            st.just("mdelete"),
            st.lists(st.integers(0, 14), min_size=1, max_size=2, unique=True),
        ),
        st.tuples(st.just("pdelete"), st.integers(0, 99)),
        st.tuples(st.just("insert"), st.integers(20, 34)),
        st.tuples(st.just("rename"), st.none()),
        st.tuples(st.just("drop"), st.none()),
        st.tuples(st.just("optimize"), st.none()),
        st.tuples(st.just("restore"), st.integers(1, 3)),
    )
    counter = {"n": 0}

    @settings(
        max_examples=4, deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(st.lists(op, min_size=1, max_size=4))
    def run(ops):
        counter["n"] += 1
        root = str(tmp_path / f"t{counter['n']}")
        vcol = "val"
        has_extra = True

        def mk(d):
            if has_extra:
                return spark.createDataFrame(
                    [(k, "ab"[k % 2], v, k * 100) for k, v in sorted(d.items())],
                    f"id long, grp string, {vcol} long, extra long",
                )
            return spark.createDataFrame(
                [(k, "ab"[k % 2], v) for k, v in sorted(d.items())],
                f"id long, grp string, {vcol} long",
            )

        TF.create_table(mk({i: i * 10 for i in range(8)}), root, partition_by="grp")
        for kind, arg in ops:
            if kind in ("upsert", "mor_upsert"):
                TF.merge_into(
                    spark, root, mk(dict(arg)), on="id",
                    write_mode="mor" if kind == "mor_upsert" else "cow",
                )
            elif kind == "mdelete":
                TF.merge_into(
                    spark, root, mk({k: 0 for k in arg}), on="id",
                    when_matched="delete", when_not_matched=None,
                )
            elif kind == "pdelete":
                TF.delete_where(spark, root, f"{vcol} >= {arg}", mode="mor")
            elif kind == "insert":
                TF.insert_into(spark, root, mk({arg: arg}))
            elif kind == "rename":
                new = "v2" if vcol == "val" else "val"
                TF.rename_column(spark, root, vcol, new)
                vcol = new
            elif kind == "drop":
                if not has_extra:
                    continue
                TF.drop_column(spark, root, "extra")
                has_extra = False
            elif kind == "optimize":
                TF.compact(spark, root)
            else:
                v = min(arg, TF.current_version(root))
                if v == TF.current_version(root):
                    continue
                TF.restore(root, v)
                ent = [e for e in TF.history(root) if e["version"] == v][0]
                cols = ent.get("columns") or []
                vcol = "v2" if "v2" in cols else "val"
                has_extra = "extra" in cols
            native = TF.read_table(spark, root)
            via = spark.read.format("cbxtable").load(root)
            assert via.schema == native.schema, f"after {kind}"
            assert _rows(via) == _rows(native), f"after {kind}"
        for v in range(1, TF.current_version(root) + 1):
            native = TF.read_table(spark, root, version=v)
            via = (
                spark.read.format("cbxtable")
                .option("version", str(v)).load(root)
            )
            assert via.schema == native.schema, f"v{v}"
            assert _rows(via) == _rows(native), f"v{v}"

    run()


def _multi_rg_table(spark, tmp_path, n=10_000, rg_rows=1_000):
    """A versioned table whose single data file holds n/rg_rows row
    groups — the compacted-partition shape that must not become one
    straggler task."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(n), type=pa.int64()),
                "val": pa.array([i * 2 for i in range(n)], type=pa.int64()),
            }
        ),
        os.path.join(src, "part-0.parquet"),
        row_group_size=rg_rows,
    )
    root = str(tmp_path / "t")
    TF.convert_to_table(spark, src, root)
    return root


def test_row_group_splitting_parallelizes_compacted_files(spark, tmp_path):
    """One compacted multi-row-group file plans into up to N row-group
    tasks (geometry straight from the manifest — no plan-time footer
    reads) with byte-identical results; splitRowGroups=false and the
    default 128 MiB target both degrade to one task per file."""
    root = _multi_rg_table(spark, tmp_path)
    e = TF.manifest(root)[0]
    assert len(e["rgs"]) == 10
    assert sum(r for r, _ in e["rgs"]) == 10_000
    schema = TF.read_table(spark, root).schema

    kept, _ = DS._plan_files(root, 1, [], schema, split_bytes=1)
    assert len(kept) == 10  # one task per row group at the tiny target
    starts = sorted(p.row_start for p in kept)
    assert starts == [i * 1_000 for i in range(10)]
    # a mid-size target packs CONSECUTIVE groups, still covering all rows
    rg_bytes = e["rgs"][0][1]
    kept3, _ = DS._plan_files(
        root, 1, [], schema, split_bytes=3 * rg_bytes + 1
    )
    assert 3 <= len(kept3) < 10
    # default target: these tiny files stay one task (no behavior change)
    kept_def, _ = DS._plan_files(root, 1, [], schema)
    assert len(kept_def) == 1 and kept_def[0].rgs is None

    native = TF.read_table(spark, root)
    split = (
        spark.read.format("cbxtable")
        .option("targetsplitbytes", "1")
        .load(root)
    )
    assert _rows(split) == _rows(native)
    unsplit = (
        spark.read.format("cbxtable")
        .option("splitrowgroups", "false")
        .load(root)
    )
    assert _rows(unsplit) == _rows(native)


def test_row_group_splitting_honors_deletion_vectors(spark, tmp_path):
    """DV positions are file-relative; a split task must re-base them to
    its row-group range. Tombstones land in the first, a middle, and the
    last group, plus one straddling a boundary."""
    root = _multi_rg_table(spark, tmp_path)
    TF.delete_where(
        spark, root, "id IN (3, 999, 1000, 5500, 9999)", mode="mor"
    )
    native = TF.read_table(spark, root)
    split = (
        spark.read.format("cbxtable")
        .option("targetsplitbytes", "1")
        .load(root)
    )
    assert split.count() == 9_995
    assert _rows(split) == _rows(native)
    # filters + split compose (pushed bounds prune at FILE level only;
    # re-applied by Spark post-scan, so ranges stay exact)
    f_native = native.where("val >= 10000 AND val < 12000")
    f_split = split.where("val >= 10000 AND val < 12000")
    assert _rows(f_split) == _rows(f_native)


def test_columns_option_prunes_schema_and_decode(spark, tmp_path):
    """R8: the Python DS API has no column-pruning hook, so the `columns`
    read option is how a user keeps a projection from shipping every
    column through Arrow. The pruned source must equal the native
    projection (values AND schema), compose with pushed filters and
    partition columns, and reject unknown names loudly."""
    root = str(tmp_path / "t")
    _evolved_table(spark, root)
    native = TF.read_table(spark, root)
    keep = [c for c in native.columns if c != native.columns[1]][:2]
    pruned = (
        spark.read.format("cbxtable")
        .option("columns", ",".join(keep))
        .load(root)
    )
    assert pruned.columns == keep
    assert _rows(pruned) == _rows(native.select(*keep))
    # unknown column: loud, names the table's real columns
    with pytest.raises(Exception, match="unknown column"):
        spark.read.format("cbxtable").option(
            "columns", "no_such_col"
        ).load(root).collect()


def test_small_file_coalescing_packs_tasks_without_changing_rows(
    spark, tmp_path
):
    """R8: one Python task per file pays the worker round trip per file;
    partitions() bin-packs consecutive small files toward
    min(target, max(open-cost, total/parallelism)). Pinned: bundle
    arithmetic on planned parts, byte-identical results with coalescing
    on and off, and DV subtraction surviving bundling."""
    root = str(tmp_path / "t")
    mk = lambda rows: spark.createDataFrame(rows, "id long, g int, v long")
    TF.create_table(
        mk([(i, i % 4, i * 10) for i in range(400)]).repartition(16),
        root,
        partition_by="g",
    )
    schema = TF.read_table(spark, root).schema
    parts, _ = DS._plan_files(root, TF.current_version(root), [], schema)
    assert len(parts) > 4  # many small files per partition dir
    assert all(p.size > 0 for p in parts)
    # a generous target packs everything into <= #dirs-ish bundles
    packed = DS._coalesce_parts(parts, 1 << 30)
    assert len(packed) < len(parts)
    assert any(isinstance(p, DS._MultiPart) for p in packed)
    n_files = sum(
        len(p.parts) if isinstance(p, DS._MultiPart) else 1 for p in packed
    )
    assert n_files == len(parts)  # nothing dropped or duplicated
    # a 1-byte target degenerates to one task per file (bundles of one
    # stay bare _FileParts)
    assert DS._coalesce_parts(parts, 1) == parts
    native = TF.read_table(spark, root)
    assert _rows(spark.read.format("cbxtable").load(root)) == _rows(native)
    assert _rows(
        spark.read.format("cbxtable")
        .option("coalescefiles", "false")
        .load(root)
    ) == _rows(native)
    # deletion vectors still subtract inside bundles
    TF.delete_where(spark, root, "id % 7 = 0", mode="mor")
    native2 = TF.read_table(spark, root)
    assert _rows(spark.read.format("cbxtable").load(root)) == _rows(native2)
