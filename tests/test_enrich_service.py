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
