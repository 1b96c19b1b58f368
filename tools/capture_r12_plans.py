"""Capture `.explain("formatted")` for the headline + probe queries into
plans/r12/<query>_<tag>.txt (optimization-round evidence files).

Usage: python tools/capture_r12_plans.py <before|after> [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import bench
from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark import util as U
from cernbox_migration_database_spark.session import get_spark

OUT = "/root/repo/plans/r12"


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or (bench.HEADLINE + bench.PROBE_HEADLINE)
    spark = get_spark(app_name="capture_r12")
    os.makedirs(OUT, exist_ok=True)
    seen = set()
    for name in names:
        if name in seen:
            continue
        seen.add(name)
        try:
            if name in Q.PHASED:
                build, probe = Q.PHASED[name]
                ctx = build(spark, sf)
                df = probe(spark, ctx)
                suffix = " (probe plan; fixture built separately)"
            else:
                df = Q.QUERIES[name](spark, sf)
                suffix = ""
            txt = fmt(df)
            ex = txt.count("Exchange")
            path = os.path.join(OUT, f"{name}_{tag}.txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(f"# {name} [{tag}]{suffix}\n# Exchange nodes: {ex}\n\n")
                fh.write(txt)
            print(f"{name}: exchanges={ex} -> {path}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
        U.release_persisted()


if __name__ == "__main__":
    main()
