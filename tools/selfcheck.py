"""Differential self-check: run every catalog query on Spark AND its DuckDB
oracle on the same parquet, compare row count + column names + values.

Stricter than the driver: values compare exactly (after per-row column sort
by name), so a pass here implies a pass on any order-insensitive hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark import util as U
from cernbox_migration_database_spark.session import get_spark
from cernbox_migration_database_spark.sources.catalog import TABLES


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="selfcheck", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    n_run = 0
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        sql = Q.ORACLE.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            sset = sorted(_key([r[i] for i in sidx]) for r in srows)
            oset = sorted(_key([r[i] for i in oidx]) for r in orows)
            if sset != oset:
                diffs = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
        U.release_persisted()

    print(f"\n{n_run - len(failures)}/{n_run} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
