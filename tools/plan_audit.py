"""Plan-hygiene audit: sweep every catalog query's physical plan for the
anti-patterns that kill 100 TB jobs, mechanically.

Flags:
  * BatchEvalPython / PythonUDF      - row-at-a-time Python in the plan
    (Arrow paths - ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
    FlatMapGroupsInPandasWithState - are allowed and reported separately);
  * CartesianProduct                 - a NON-broadcast cross join
    (BroadcastNestedLoopJoin over a small broadcast side is allowed: that
    is the exact-KNN / scalar-join shape);
  * count of Exchange operators      - reported per query so shuffle-count
    regressions show up in review diffs.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Exit 1 if any query trips a hard flag.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark.session import get_spark
from cernbox_migration_database_spark.util import release_persisted

HARD = ("BatchEvalPython", "CartesianProduct")
ARROW = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
)
# Streaming/iterative queries execute on build (memory-sink drain / driver
# loop); their plan text is the already-executed result — still auditable.


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan_audit", shuffle_partitions=8)
    bad = []
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"FLAG {name}: build error {type(e).__name__}: {e}")
            continue
        hard_hits = [h for h in HARD if h in plan]
        arrow_hits = [a for a in ARROW if a in plan]
        n_exchange = len(re.findall(r"\bExchange ", plan))
        if hard_hits:
            bad.append(name)
            print(f"FLAG {name}: {hard_hits} (exchanges={n_exchange})")
        else:
            arrow = f" arrow={arrow_hits}" if arrow_hits else ""
            print(f"ok   {name}: exchanges={n_exchange}{arrow}", flush=True)
        release_persisted()
        spark.catalog.clearCache()
    print(f"\n{len(bad)} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
