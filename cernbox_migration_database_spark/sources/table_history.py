"""Commit-history data source for versioned tables (PySpark 4 Python Data
Source API): ``spark.read.format("table_history")`` for batch SQL over a
table's commit log, and ``spark.readStream.format("table_history")`` for a
STREAMING feed of commit events — the monitoring/orchestration primitive
(alert on churn, trigger downstream refresh when a data commit lands,
audit layout maintenance) that table formats expose as their history/
metadata tables.

Reference anchor: the reference CLI prints per-phase progress and final
status to its operator (main.go's log statements are its only
observability surface); this source is that surface re-expressed as a
queryable/streamable relation.

Design notes:

* The log is METADATA — one small JSON file per commit — so the reader is
  a driver-side Python source reading O(#commits) files, never data. That
  is exactly the scale contract of Delta's ``DESCRIBE HISTORY`` /
  Iceberg's ``table.history``: commit count, not table size.
* The streaming reader implements ``SimpleDataSourceStreamReader`` with
  the COMMIT VERSION as the offset: ``read(start)`` returns every commit
  with ``start < version <= current`` and advances the offset to
  ``current``; ``readBetweenOffsets`` replays a committed range exactly —
  Spark's replay contract for simple stream readers — so a restarted
  query re-emits precisely the in-flight range and nothing else.
* Everything is implemented with ``os``/``json`` directly (no package
  imports inside the reader): data source classes are pickled into Python
  workers, and a self-contained reader has no import-path coupling.

Usage::

    spark.dataSource.register(TableHistoryDataSource)
    spark.read.format("table_history").option("root", root).load()
    (spark.readStream.format("table_history").option("root", root).load()
         .writeStream...)
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)

_SCHEMA = (
    "version INT, ts DOUBLE, action STRING, parent INT, "
    "partition_by STRING, n_touched_partitions INT, "
    "touched_partitions ARRAY<STRING>, evolved BOOLEAN, "
    "carry_copied_files INT"
)


def _read_log(root: str, after: int = 0, upto: int | None = None):
    """Commit rows with ``after < version <= upto`` as schema-ordered
    tuples, oldest first. Self-contained (no package imports): runs inside
    pickled data-source workers."""
    logdir = os.path.join(root, "_log")
    try:
        names = sorted(os.listdir(logdir))
    except FileNotFoundError:
        return
    for name in names:
        # published commits only — .staged.json entries (write-audit-
        # publish stages) are invisible until published, matching
        # table_format.history()
        if not name.endswith(".json") or name.endswith(".staged.json"):
            continue
        with open(os.path.join(logdir, name), encoding="utf-8") as fh:
            e = json.load(fh)
        v = int(e["version"])
        if v <= after or (upto is not None and v > upto):
            continue
        pby = e.get("partition_by")
        if isinstance(pby, list):
            pby = ",".join(pby)
        tp = e.get("touched_partitions")
        yield (
            v,
            float(e.get("ts", 0.0)),
            e.get("action"),
            e.get("parent"),
            pby,
            len(tp) if tp is not None else None,
            tp,
            bool(e.get("evolved", False)),
            e.get("carry_copied_files"),
        )


def _current_version(root: str) -> int:
    try:
        with open(os.path.join(root, "_latest"), encoding="utf-8") as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


class _HistoryBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["root"]

    def read(self, partition):
        # one partition: the log is O(#commits) of KiB-sized metadata
        yield from _read_log(self.root)


class _HistoryStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.root = options["root"]
        self.start_after = int(options.get("startingversion", 0))

    def initialOffset(self):
        return {"version": self.start_after}

    def read(self, start):
        # materialized lists, not generators: Spark caches the prefetched
        # batch for replay-on-failure, which requires picklable records
        after = int(start["version"])
        cur = _current_version(self.root)
        if cur <= after:
            return [], {"version": after}
        return (
            list(_read_log(self.root, after=after, upto=cur)),
            {"version": cur},
        )

    def readBetweenOffsets(self, start, end):
        # exact replay of a committed range (restart recovery contract)
        return list(
            _read_log(
                self.root, after=int(start["version"]), upto=int(end["version"])
            )
        )


class TableHistoryDataSource(DataSource):
    """``format("table_history")`` — batch + streaming commit-event source
    over a versioned table's commit log. Options: ``root`` (table root,
    required), ``startingVersion`` (stream only: emit commits AFTER this
    version; default 0 = from the beginning)."""

    @classmethod
    def name(cls):
        return "table_history"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _HistoryBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _HistoryStreamReader(self.options)


def register_table_history(spark) -> None:
    """Register the source with a session. Python data-source classes are
    cloudpickled INTO the worker processes, which pickle importable
    classes by REFERENCE — a worker without this repo on its module path
    would fail the import. Registering this module for by-VALUE pickling
    ships the (tiny, stdlib-only) code inside the pickle instead, so the
    source works regardless of worker PYTHONPATH — the standard
    deployment posture for a Python data source that isn't pip-installed
    on the cluster."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(TableHistoryDataSource)
