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
