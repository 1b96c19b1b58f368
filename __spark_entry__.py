"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog from
``cernbox_migration_database_spark.queries`` for the DuckDB differential
harness (row-count + schema + order-insensitive value hash at sf0.01).
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cernbox_migration_database_spark import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"
_REPO = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def _vintage() -> dict[str, int]:
    """Per-query last-fully-green driver round, from the committed
    CORRECTNESS_r*.json history. A row counts as verified only when
    rows+schema matched and the value hash didn't mismatch (absent hash =
    rows-only query, still counts)."""
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f, encoding="utf-8") as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        for q, v in d.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") is not False
            ):
                last[q] = max(last.get(q, 0), rnd)
    return last


def fingerprint(name: str) -> str:
    """Verification fingerprint for a registered query: md5 over the
    builder function's source + its oracle SQL (r8 verdict item 2). A
    mismatch against the committed VERIFY_MANIFEST.json entry means the
    query's code changed since its last driver-green, so the rotation
    re-verifies it ahead of merely-old vintages."""
    import hashlib
    import inspect

    fn = Q.QUERIES[name]
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    blob = src + "\n--oracle--\n" + Q.ORACLE.get(name, "")
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def _manifest() -> dict[str, dict]:
    """Committed per-query {fingerprint, round} snapshot taken at each
    round start (tools/update_verify_manifest.py), i.e. while the tree
    still equals what the driver just verified."""
    path = os.path.join(_REPO, "VERIFY_MANIFEST.json")
    if not os.path.exists(path):
        return {}
    try:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh).get("queries", {})
    except (OSError, ValueError):
        return {}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extended
    set), ordered for the driver's 50-query differential window:

      1. never driver-verified queries;
      2. CHURNED queries — verified, but the builder-source+oracle
         fingerprint no longer matches the committed manifest entry from
         their last green (or the manifest marks them stale), so the
         green no longer covers the code that would ship;
      3. clean greens, oldest vintage first.

    Ties keep registration order (stable sort). This makes the window a
    churn-aware re-verification sweep: code that changed since its last
    green is re-proved the very next round instead of waiting for its
    vintage to age out (r8 verdict item 2)."""
    base = dict(Q.QUERIES)
    last = _vintage()
    man = _manifest()

    def key(q: str) -> tuple[int, int]:
        if q not in last:
            return (0, 0)
        ent = man.get(q)
        if ent is not None and (
            ent.get("stale") or ent.get("fingerprint") != fingerprint(q)
        ):
            return (1, last[q])
        return (2, last[q])

    order = sorted(base, key=key)  # stable sort
    return {q: base[q] for q in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops, which get a rows-only check)."""
    return dict(Q.ORACLE)
