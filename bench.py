"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced to full execution with a count-style action (no result
materialization on the driver beyond the aggregate). A warmup query absorbs
JVM/codegen startup so per-query numbers reflect plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark import util as U
from cernbox_migration_database_spark.session import get_spark

# Representative coverage: scan/topk, heavy aggregation, multi-join, window,
# event-time, kv/json parse, text, dedup (exact + LSH + simhash), vectors.
HEADLINE = [
    "scan_filter_project_sort",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_enrich_parts",
    "merge_update_orders",
    "window_topk_per_group",
    "window_sessionize",
    "time_bucket_agg",
    "kv_parse_map",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_knn",
    "embedding_lsh_buckets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")

    # warmup: JVM + codegen + parquet footer caches
    Q.QUERIES["scan_filter_project_sort"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # Force full execution of every operator in the plan.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        U.release_persisted()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
