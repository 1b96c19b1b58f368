"""r13 A/B: AQE coalescePartitions.parallelismFirst=false + advisory size
(guide §9 / r12 verdict item 9), measured same-session with alternating
passes so co-tenant drift hits both arms equally.

Usage: python tools/ab_conf_r13.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cernbox_migration_database_spark import queries as Q  # noqa: E402
from cernbox_migration_database_spark import util as U  # noqa: E402
from cernbox_migration_database_spark.session import get_spark  # noqa: E402

SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "merge_into_versioned",
    "search_bm25_indexed",
    "pipeline_pretraining_corpus",
]

ARMS = {
    "baseline": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    "coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
}


def run_pass(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in SUBSET:
        if name in Q.PHASED:
            build, probe = Q.PHASED[name]
            t0 = time.time()
            ctx = build(spark, sf_dir)
            probe(spark, ctx).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        else:
            t0 = time.time()
            Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.time() - t0, 3)
        U.release_persisted()
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_conf_r13")
    Q.QUERIES["scan_filter_project_sort"](spark, sf_dir).count()
    # one throwaway warm pass per arm
    for arm, conf in ARMS.items():
        for k, v in conf.items():
            spark.conf.set(k, v)
        run_pass(spark, sf_dir)
    results: dict[str, list[dict[str, float]]] = {a: [] for a in ARMS}
    for _ in range(reps):
        for arm, conf in ARMS.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            r = run_pass(spark, sf_dir)
            results[arm].append(r)
            print(f"{arm}: {r} (load {os.getloadavg()[0]:.2f})", flush=True)
    print("\nmedians:")
    for name in SUBSET:
        med = {
            a: round(statistics.median(p[name] for p in results[a]), 3)
            for a in ARMS
        }
        ratio = round(med["coalesce"] / med["baseline"], 3) if med["baseline"] else 0
        print(f"  {name}: {med} coalesce/baseline={ratio}")
    tot = {
        a: round(
            statistics.median(sum(p.values()) for p in results[a]), 3
        )
        for a in ARMS
    }
    print(f"  TOTAL: {tot} ratio={round(tot['coalesce'] / tot['baseline'], 3)}")


if __name__ == "__main__":
    main()
