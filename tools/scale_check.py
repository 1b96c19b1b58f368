"""Scale-up check: do the headline plans scale linearly with data volume?

Builds a k-fold replica of the FACT tables (lineitem, orders, events) at
/tmp/scale_<k> — each `<name>.parquet` becomes a DIRECTORY of k file copies,
which Spark reads as one table with k x the rows and k x the input splits —
while dimension tables (region/nation/customer/supplier/part) stay at 1x.
That is the shape of real growth: facts scale, dims don't. Then times a
scan+agg query (q1), a multi-join query (q3), and an event-time agg
(time_bucket_agg) at 1x and kx and reports the scaling efficiency
t_k / (k * t_1); 1.0 = perfectly linear, < 1 = super-linear (economies of
scale from fixed overheads), > 1 = a plan that degrades with volume
(the thing this tool exists to catch).

Duplicate-sensitive operators (near-dup pairing, distinct-heavy plans) are
deliberately excluded: replicating rows k x inflates their OUTPUT
quadratically, so wall-clock would measure the workload change, not the
plan. The three queries here have output cardinality independent of (q1,
time_bucket) or linear in (q3) the replication factor.

Usage: python tools/scale_check.py [k] [sf_dir] [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark import util as U
from cernbox_migration_database_spark.session import get_spark

FACTS = ("lineitem", "orders", "events")
DIMS = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "documents",
    "embeddings",
)
QUERIES = ("q1_pricing_summary", "q3_shipping_priority", "time_bucket_agg")


def build_replica(sf_dir: str, k: int) -> str:
    out = f"/tmp/scale_{k}x_{os.path.basename(os.path.normpath(sf_dir))}"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for name in FACTS:
        d = os.path.join(out, f"{name}.parquet")
        os.makedirs(d)
        src = os.path.join(sf_dir, f"{name}.parquet")
        for i in range(k):
            # hard links where possible: k x the logical bytes, 1 x the disk
            dst = os.path.join(d, f"copy_{i:02d}.parquet")
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy(src, dst)
    for name in DIMS:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy(src, dst)
    return out


def time_query(spark, name: str, sf_dir: str, runs: int) -> float:
    fn = Q.QUERIES[name]
    # one untimed warm-up absorbs codegen/JIT compile so the timed runs
    # measure the data-dependent cost — the part that scales
    fn(spark, sf_dir).count()
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        ts.append(time.monotonic() - t0)
        U.release_persisted()
    return statistics.median(ts)


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    replica = build_replica(sf_dir, k)
    spark = get_spark(app_name="scale-check")
    results = {}
    for name in QUERIES:
        t1 = time_query(spark, name, sf_dir, runs)
        tk = time_query(spark, name, replica, runs)
        results[name] = {
            "t_1x_sec": round(t1, 3),
            f"t_{k}x_sec": round(tk, 3),
            "ratio": round(tk / t1, 2),
            "efficiency": round(tk / (k * t1), 3),
        }
    print(
        json.dumps(
            {"metric": "scale_check", "k": k, "sf_dir": sf_dir, "queries": results}
        )
    )
    shutil.rmtree(replica, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
