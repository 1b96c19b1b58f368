"""Router disjointness/exhaustiveness + branch parity (main.go:280-315)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernbox_migration_database_spark.operators.router import (
    ALREADY_VERSION,
    DECISIONS,
    DEFAULT,
    NOT_UNDER_HOME,
    PARENT_IS_VERSION,
    route_shares,
    with_decision,
)

CASES = [
    ("/eos/user/j/jdoe/.sys.v#.file.txt", ALREADY_VERSION),   # P4 wins first
    ("/tmp/out/file.txt", NOT_UNDER_HOME),                    # P5
    ("/eos/user/j/jdoe/.sys.v#.d/file.txt", PARENT_IS_VERSION),  # P6
    ("/eos/user/j/jdoe/file.txt", DEFAULT),
    # precedence: basename-is-version beats parent-is-version
    ("/eos/u/.sys.v#.d/.sys.v#.f", ALREADY_VERSION),
    # outside home but basename is version -> still P4 first (reference order)
    ("/tmp/.sys.v#.f", ALREADY_VERSION),
]


def test_router_branches(spark):
    df = spark.createDataFrame([(p,) for p, _ in CASES], ["path"])
    got = {
        r["path"]: r["decision"]
        for r in with_decision(df, "path").collect()
    }
    for p, want in CASES:
        assert got[p] == want, p


def test_router_disjoint_exhaustive(spark):
    df = spark.createDataFrame([(p,) for p, _ in CASES], ["path"])
    branches = route_shares(df, "path")
    total = sum(b.count() for b in branches.values())
    assert total == len(CASES)
    assert set(branches) == set(DECISIONS)


def _py_decision(path: str, home: str = "/eos/") -> str:
    """Reference router mirroring main.go:280-304 branch order."""
    import posixpath

    base = posixpath.basename(path)
    if base.startswith(".sys.v#."):
        return ALREADY_VERSION
    if not path.startswith(home):
        return NOT_UNDER_HOME
    clean = posixpath.normpath(path)
    parts = [p for p in clean.split("/") if p != ""]
    parent = parts[-2] if len(parts) >= 2 else ""
    if parent.startswith(".sys.v#."):
        return PARENT_IS_VERSION
    return DEFAULT


def test_router_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd"), whitelist_characters="._-"),
        min_size=1,
        max_size=8,
    )
    prefix = st.sampled_from(["/eos/u/", "/tmp/x/", "/eos/"])
    marker = st.sampled_from(["", ".sys.v#."])

    @settings(max_examples=40, deadline=None)
    @given(prefix, marker, seg, marker, seg)
    def check(pre, m1, s1, m2, s2):
        path = pre + m1 + s1 + "/" + m2 + s2
        df = spark.createDataFrame([(path,)], ["path"])
        got = with_decision(df, "path").collect()[0]["decision"]
        assert got == _py_decision(path), path

    check()
