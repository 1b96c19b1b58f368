"""key=value reply parsing, incl. the length-prefixed spaces-in-path trap
(main.go:182-207) — SURVEY.md ranks this the #1 parity risk."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cernbox_migration_database_spark.functions.kv import (
    length_prefixed_value,
    parse_kv_map,
    safe_cast_long,
)


def _one(spark, col, raw):
    df = spark.createDataFrame([(raw,)], ["raw"])
    return df.select(col.alias("v")).collect()[0]["v"]


def test_parse_kv_basic(spark):
    m = _one(spark, parse_kv_map("raw"), "ino=42 size=10 uid=u1 gid=g1")
    assert m == {"ino": "42", "size": "10", "uid": "u1", "gid": "g1"}


def test_parse_kv_skips_malformed_tokens(spark):
    # only len==2 splits survive (main.go:186-189): 'a=b=c' and bare tokens drop
    m = _one(spark, parse_kv_map("raw"), "a=b=c bare ino=42 =x")
    assert m == {"ino": "42", "": "x"}


def test_parse_kv_last_wins(spark):
    m = _one(spark, parse_kv_map("raw"), "k=1 k=2")
    assert m == {"k": "2"}


def test_length_prefixed_spaces(spark):
    path = "/eos/user/j/my doc v2.txt"
    raw = f"keylength.file={len(path)} file={path} ino=7 size=9"
    assert _one(spark, length_prefixed_value("raw"), raw) == path


def test_length_prefixed_no_prefix_is_null(spark):
    assert _one(spark, length_prefixed_value("raw"), "ino=7 size=9") is None


@settings(max_examples=20, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" ._-/"
        ),
        min_size=1,
        max_size=60,
    )
)
def test_length_prefixed_roundtrip(path):
    # format -> parse recovers the exact path, any spaces included
    import tests.conftest as c
    from cernbox_migration_database_spark.session import get_spark

    spark = get_spark(app_name="cbx-tests", shuffle_partitions=8)
    raw = f"keylength.file={len(path)} file={path} ino=1"
    assert _one(spark, length_prefixed_value("raw"), raw) == path


def test_safe_cast_long(spark):
    df = spark.createDataFrame([("42",), ("xx",), (None,)], ["s"])
    rows = df.select(safe_cast_long("s").alias("r")).collect()
    vals = [(r["r"]["value"], r["r"]["is_dead"]) for r in rows]
    assert vals == [(42, False), (None, True), (None, False)]


def test_parse_kv_last_wins_without_session_conf(spark):
    """Last-wins is STRUCTURAL (reverse + keep-first-occurrence), not a
    mapKeyDedupPolicy side effect: under the Spark-default EXCEPTION policy
    duplicate keys must still resolve to the last value instead of
    throwing — the driver hands us vanilla sessions."""
    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        m = _one(spark, parse_kv_map("raw"), "k=1 j=0 k=2 k=3")
        assert m == {"k": "3", "j": "0"}
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
