"""Shared registry the domain query modules feed.

Every module in this package registers its (PySpark builder, DuckDB
oracle) pairs here via :func:`register`; the package root re-exports the
populated ``QUERIES`` / ``ORACLE`` / ``PHASED`` dicts to the driver
contract (``__spark_entry__.py``) and the harness tools.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
# Queries that construct their fixture (a versioned table / index) inside
# the query, split as (build, probe) so the bench can time the phases
# separately: build(spark, sf_dir) -> ctx, probe(spark, ctx) -> DataFrame.
# The registered query stays probe(build(...)) — one source of truth.
PHASED: dict[str, tuple[Callable, Callable]] = {}

# Optional per-STAGE wall times recorded by a builder during its last run
# (query name -> {stage: seconds}); bench.py copies this into the bench
# artifact's `phases` detail so a multi-second build is attributable to a
# specific stage instead of being one opaque number (r10 verdict item 4).
STAGE_TIMES: dict[str, dict[str, float]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _versioned_scratch(tag: str, sf_dir: str) -> str:
    """Deterministic scratch root per (query, sf_dir), wiped on entry so each
    run commits a fresh table lineage. The PREVIOUS run's directory (if any)
    is removed here rather than at query exit because the returned DataFrame
    is a lazy plan over the committed snapshot — the caller collects it after
    the builder returns."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        "cbx_versioned",
        # pid-scoped: concurrent harness processes (driver + selfcheck) must
        # not rmtree each other's live tables mid-read
        f"{tag}-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}-{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    # self-clean at interpreter exit — results are collected by then, and
    # repeated harness processes must not accumulate scratch tables in /tmp
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root
