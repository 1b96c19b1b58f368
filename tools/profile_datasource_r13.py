"""r13 measurement: where does the cbxtable read phase's ~1-2 s/query go?

Times, inside ONE warm session: (a) plan construction
(spark.read.format("cbxtable").load(...)), (b) first action, (c) repeat
reads of the same root, (d) a native read_table of the same snapshot for
contrast — and samples the set of live python processes before/after to
see whether the planner workers are reused or respawned per query.
Usage: python tools/profile_datasource_r13.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cernbox_migration_database_spark import queries as Q  # noqa: E402
from cernbox_migration_database_spark import util as U  # noqa: E402
from cernbox_migration_database_spark.session import get_spark  # noqa: E402


def pyworkers() -> list[str]:
    out = subprocess.run(
        ["ps", "-eo", "pid,etimes,args"], capture_output=True, text=True
    ).stdout
    return [
        ln.strip()
        for ln in out.splitlines()
        if "pyspark" in ln and ("worker" in ln or "daemon" in ln)
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_ds_r13")
    Q.QUERIES["scan_filter_project_sort"](spark, sf_dir).count()

    build, probe = Q.PHASED["datasource_scan_pruned"]
    t0 = time.time()
    ctx = build(spark, sf_dir)
    t1 = time.time()
    print(f"build: {t1 - t0:.2f}s")
    for i in range(4):
        w0 = pyworkers()
        t0 = time.time()
        df = probe(spark, ctx)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        w1 = pyworkers()
        print(
            f"probe pass {i}: plan={t1 - t0:.2f}s exec={t2 - t1:.2f}s "
            f"workers_before={len(w0)} after={len(w1)}",
            flush=True,
        )
        new = set(w1) - set(w0)
        for ln in sorted(new)[:6]:
            print(f"  new: {ln[:140]}")
        U.release_persisted()


if __name__ == "__main__":
    main()
