"""external_service_lookup (S3/S5 live-service shape) + quote_audit (F11) +
Go-parity property tests for the kv parser."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cernbox_migration_database_spark.functions.kv import parse_kv_map
from cernbox_migration_database_spark.functions.paths import quote_audit
from cernbox_migration_database_spark.operators.enrich import external_service_lookup


def test_external_service_lookup_batches(spark):
    """The mapInPandas enrichment template: a fake catalog service keyed by
    inode, called once per Arrow batch (not per row)."""
    df = spark.range(100).select(F.col("id").alias("inode")).repartition(4)

    def fetch_batch(pdf):
        # the per-batch 'service call' — vectorized over the whole batch
        pdf = pdf.copy()
        pdf["path"] = "/eos/u/f" + pdf["inode"].astype(str)
        pdf["size"] = pdf["inode"] * 10
        return pdf

    out = external_service_lookup(df, fetch_batch, "inode long, path string, size long")
    rows = {r["inode"]: (r["path"], r["size"]) for r in out.collect()}
    assert len(rows) == 100
    assert rows[7] == ("/eos/u/f7", 70)


def test_quote_audit(spark):
    df = spark.createDataFrame(
        [("/eos/u/plain.txt",), ('/eos/u/we"ird.txt',)], ["p"]
    )
    got = [r[0] for r in df.select(quote_audit("p")).collect()]
    assert got[0] == '"/eos/u/plain.txt"'
    assert got[1] == '"/eos/u/we\\"ird.txt"'


def _go_parse_kv(raw: str) -> dict[str, str]:
    """Reference implementation mirroring main.go:184-190 exactly: split on
    single spaces; keep only tokens that split into exactly two '='-parts;
    last assignment wins."""
    out: dict[str, str] = {}
    for tok in raw.split(" "):
        parts = tok.split("=")
        if len(parts) == 2:
            out[parts[0]] = parts[1]
    return out


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"),
                whitelist_characters="=._-/",
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_parse_kv_matches_go_semantics(tokens):
    from cernbox_migration_database_spark.session import get_spark

    spark = get_spark(app_name="cbx-tests", shuffle_partitions=8)
    raw = " ".join(tokens)
    df = spark.createDataFrame([(raw,)], ["raw"])
    got = df.select(parse_kv_map("raw").alias("m")).collect()[0]["m"] or {}
    assert got == _go_parse_kv(raw)


def test_subprocess_batch_fetch_real_process(spark, tmp_path):
    """The executeCMD boundary with a REAL subprocess (main.go:107-117): a
    fake eos binary answers `file info` for a whole batch of inodes in one
    invocation; mapInPandas calls it once per Arrow batch and parses the
    kv output back onto the batch."""
    import os
    import stat

    from cernbox_migration_database_spark.operators.enrich import (
        subprocess_batch_fetch,
    )

    fake_eos = tmp_path / "eos"
    fake_eos.write_text(
        "#!/bin/sh\n"
        '# fake `eos file info` answering one line per inode argument\n'
        "for ino in \"$@\"; do\n"
        '  echo "ino=$ino file=/eos/user/x/f$ino uid=u$ino gid=g size=10"\n'
        "done\n"
    )
    os.chmod(fake_eos, os.stat(fake_eos).st_mode | stat.S_IEXEC)

    def argv_for_batch(pdf):
        return [str(fake_eos)] + [str(i) for i in pdf["inode"]]

    def parse_stdout(pdf, stdout):
        meta = {}
        for line in stdout.splitlines():
            kv = dict(
                p.split("=", 1) for p in line.split(" ") if p.count("=") == 1
            )
            meta[int(kv["ino"])] = (kv["file"], kv["uid"])
        pdf = pdf.copy()
        pdf["path"] = pdf["inode"].map(lambda i: meta[i][0])
        pdf["uid"] = pdf["inode"].map(lambda i: meta[i][1])
        return pdf

    from cernbox_migration_database_spark.operators.enrich import (
        external_service_lookup,
    )
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.range(40).select(F.col("id").alias("inode")).repartition(4)
    out = external_service_lookup(
        df,
        subprocess_batch_fetch(argv_for_batch, parse_stdout),
        "inode long, path string, uid string",
    )
    rows = {r["inode"]: (r["path"], r["uid"]) for r in out.collect()}
    assert len(rows) == 40
    assert rows[7] == ("/eos/user/x/f7", "u7")


def test_run_create_commands_privilege_dropped(spark, tmp_path):
    """The create sink with a REAL per-row subprocess: a fake eos logs its
    argv; every create must carry `-r <uid> <gid>` (privilege drop,
    main.go:208-216) and run once per missing folder."""
    import os
    import stat

    from cernbox_migration_database_spark.operators.enrich import (
        run_create_commands,
    )
    from cernbox_migration_database_spark.plans.migration import create_command

    log = tmp_path / "calls.log"
    fake_eos = tmp_path / "eos"
    fake_eos.write_text(f'#!/bin/sh\necho "$@" >> {log}\n')
    os.chmod(fake_eos, os.stat(fake_eos).st_mode | stat.S_IEXEC)

    df = spark.createDataFrame(
        [(1, "/eos/u/a.txt", "u1", "g1"), (2, "/eos/u/b 2.txt", "u2", "g2")],
        "id long, f_path string, f_uid string, f_gid string",
    ).repartition(2)

    run_create_commands(
        df, lambda row: [str(fake_eos)] + create_command(row)[1:]
    )

    lines = sorted(log.read_text().splitlines())
    assert lines == [
        "-r u1 g1 file version /eos/u/a.txt",
        "-r u2 g2 file version /eos/u/b 2.txt",
    ]


def test_run_create_commands_failure_raises(spark, tmp_path):
    import os
    import stat

    from cernbox_migration_database_spark.operators.enrich import (
        run_create_commands,
    )

    fake_eos = tmp_path / "eos"
    fake_eos.write_text('#!/bin/sh\necho "boom" >&2\nexit 3\n')
    os.chmod(fake_eos, os.stat(fake_eos).st_mode | stat.S_IEXEC)
    df = spark.createDataFrame([(1,)], "id long")

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Py4JJavaError, match="create failed"):
        run_create_commands(df, lambda row: [str(fake_eos)])
