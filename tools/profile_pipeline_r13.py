"""r13 measurement: isolate the pipeline stages + job-level timing.

Runs _pipeline_clean/_pipeline_pack N times in one session (first pass =
cold, rest warm) and prints per-stage seconds plus the total, so the
decontaminate stage's cost is attributable before/after the r13 change.
Usage: python tools/profile_pipeline_r13.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cernbox_migration_database_spark import queries as Q  # noqa: E402
from cernbox_migration_database_spark import util as U  # noqa: E402
from cernbox_migration_database_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_pipeline_r13")
    Q.QUERIES["scan_filter_project_sort"](spark, sf_dir).count()  # warm JVM
    build, read = Q.PHASED["pipeline_pretraining_corpus"]
    for i in range(n):
        t0 = time.time()
        ctx = build(spark, sf_dir)
        t1 = time.time()
        read(spark, ctx).write.format("noop").mode("overwrite").save()
        t2 = time.time()
        st = Q.STAGE_TIMES.get("pipeline_pretraining_corpus", {})
        print(
            f"pass {i}: build={t1 - t0:.2f}s read={t2 - t1:.2f}s "
            f"total={t2 - t0:.2f}s stages={ {k: round(v, 2) for k, v in st.items()} }",
            flush=True,
        )
        U.release_persisted()


if __name__ == "__main__":
    main()
