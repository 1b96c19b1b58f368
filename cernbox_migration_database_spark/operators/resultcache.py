"""Snapshot-keyed query result cache over versioned tables.

A dashboard aggregate or a training-mix profile is recomputed thousands
of times against a table that changed a handful of times. Because every
versioned table has an atomic version pointer, "may I reuse the last
result?" is an O(1) metadata read — no content hashing, no TTL
guesswork, no stale-serving risk: the cache key is (query name, the
exact snapshot version of EVERY input table). Any commit to any input
moves a pointer and thereby misses the cache; an untouched input serves
the materialized parquet with zero cluster work. This is the snapshot-
pinned variant of the result caches Snowflake/BigQuery run behind their
front doors, buildable here precisely because reads are versioned.

Consistency guarantees:

* **Snapshot-pinned builds** — the build callback receives frames pinned
  to the versions captured in the key, so a commit landing mid-build can
  neither tear the result nor poison the cache with a version≠content
  mismatch.
* **Hit/miss indistinguishability** — the miss path serves the parquet
  it just wrote (not the live plan), so hit and miss return
  byte-identical frames.
* **Racing builders** — results stage under a pid-suffixed temp dir and
  publish with one atomic rename; the loser deletes its staging and
  serves the winner's slot (both computed the same pinned snapshots, so
  the results are interchangeable).

Entries are immutable once published; ``prune`` drops every slot not
keyed to the inputs' CURRENT versions (old results are re-derivable, so
pruning is always safe).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .table_format import current_version, read_table


def _slot(cache_root: str, name: str, versions: dict[str, int]) -> str:
    key = hashlib.md5(
        json.dumps([name, versions], sort_keys=True).encode()
    ).hexdigest()[:16]
    return os.path.join(cache_root, name, key)


def cached(
    spark: SparkSession,
    cache_root: str,
    name: str,
    inputs: dict[str, str],
    build,
    report: dict | None = None,
) -> DataFrame:
    """Serve ``build(spark, {alias: snapshot_df})`` from the cache when
    every input table is still at the version the entry was built
    against; otherwise compute against pinned snapshots, publish, serve.
    ``inputs`` maps alias → versioned-table root. Pass ``report={}`` to
    receive ``{"hit": bool, "versions": {...}}``."""
    versions = {a: current_version(r) for a, r in sorted(inputs.items())}
    slot = _slot(cache_root, name, versions)
    data = os.path.join(slot, "data")
    if report is not None:
        report["hit"] = os.path.isdir(slot)
        report["versions"] = versions
    if os.path.isdir(slot):
        return spark.read.parquet(data)
    pinned = {a: read_table(spark, r, versions[a]) for a, r in inputs.items()}
    out = build(spark, pinned)
    tmp = f"{slot}.tmp-{os.getpid()}"
    out.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf-8") as fh:
        json.dump({"name": name, "versions": versions}, fh)
    os.makedirs(os.path.dirname(slot), exist_ok=True)
    try:
        os.rename(tmp, slot)
    except OSError:
        # a racing builder published first — same pinned inputs, same
        # result; drop ours and serve theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(data)


def prune(
    cache_root: str,
    inputs_by_name: dict[str, dict[str, str]],
    tmp_grace_seconds: float = 900.0,
) -> int:
    """Remove every cache slot whose key does not match its query's
    inputs at their CURRENT versions. Returns slots removed.

    '<key>.tmp-<pid>' staging dirs get the same stale-after discipline as
    the lock module: a YOUNG one is a concurrent builder mid-publish
    (deleting it would make the racer's rename fail and leave it serving
    a slot that was never published), but one older than
    ``tmp_grace_seconds`` is an orphan from a crashed builder whose
    rename never happened — sparing those unconditionally would leak disk
    without bound."""
    import time

    removed = 0
    for name, inputs in inputs_by_name.items():
        qdir = os.path.join(cache_root, name)
        if not os.path.isdir(qdir):
            continue
        versions = {a: current_version(r) for a, r in sorted(inputs.items())}
        keep = os.path.basename(_slot(cache_root, name, versions))
        for entry in os.listdir(qdir):
            path = os.path.join(qdir, entry)
            if ".tmp-" in entry:
                try:
                    age = time.time() - os.stat(path).st_mtime
                except OSError:
                    continue  # published or cleaned up under us
                if age <= tmp_grace_seconds:
                    continue
            elif entry == keep:
                continue
            shutil.rmtree(path, ignore_errors=True)
            removed += 1
    return removed
