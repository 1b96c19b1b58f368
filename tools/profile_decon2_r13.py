"""r13: sub-action timing of the NEW stage-5 structure (post-restructure).

Reuses the real _pipeline_clean for stages 1-4 context by replicating,
then times: sh persist, evalg persist, bloom collect, write.
Usage: python tools/profile_decon2_r13.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cernbox_migration_database_spark import util as U  # noqa: E402
from cernbox_migration_database_spark.operators import dedup as D  # noqa: E402
from cernbox_migration_database_spark.operators import langid as LID  # noqa: E402
from cernbox_migration_database_spark.operators import pii as PII  # noqa: E402
from cernbox_migration_database_spark.operators import sketches as SK  # noqa: E402
from cernbox_migration_database_spark.operators import text as TX  # noqa: E402
from cernbox_migration_database_spark.queries._registry import (  # noqa: E402
    _t,
    _versioned_scratch,
)
from cernbox_migration_database_spark.session import get_spark  # noqa: E402
from cernbox_migration_database_spark.util import (  # noqa: E402
    fanout_barrier,
    tracked_persist,
)


def one_pass(spark, sf_dir: str, i: int) -> None:
    T: dict[str, float] = {}

    def tick(name, t0):
        T[name] = round(time.time() - t0, 2)
        return time.time()

    t = time.time()
    docs = fanout_barrier(_t(spark, sf_dir, "documents"))
    ok = TX.with_quality(docs).where(F.col("quality") == "ok")
    keep = LID.with_langid(ok).where(F.col("lang_pred") == F.col("lang"))
    red = tracked_persist(
        keep.select("doc_id", "lang", PII.redact_pii(F.col("text")).alias("text"))
    )
    red.count()
    t = tick("s1", t)
    keepers = (
        red.withColumn("__fp", TX.fingerprint("text"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    d1 = tracked_persist(red.join(keepers.select("doc_id"), "doc_id", "left_semi"))
    d1.count()
    t = tick("s2", t)
    sets_d1 = D.shingle_sets(d1, "text", "doc_id", 3)
    near = D.minhash_lsh_dedup(d1, threshold=0.5, sets_df=sets_d1)
    d2 = tracked_persist(
        d1.join(near.select(F.col("doc_b").alias("doc_id")), "doc_id", "left_anti")
    )
    d2.count()
    t = tick("s34", t)

    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    sh = tracked_persist(
        sets_d1.join(d2.select("doc_id"), "doc_id", "left_semi").select(
            "doc_id", is_eval.alias("__is_eval"), F.col("sh").alias("s")
        )
    )
    sh.count()
    t = tick("s5_sh_persist", t)
    ex = sh.where(F.size("s") > 0).select(
        "doc_id", "__is_eval", F.explode("s").alias("g")
    )
    evalg = tracked_persist(ex.where("__is_eval").select("g").distinct())
    evalg.count()
    t = tick("s5_evalg_persist", t)
    m_bits, k = 1 << 18, 4
    words = SK.bloom_build(evalg, "g", m_bits=m_bits, k=k, assume_distinct=True)
    t = tick("s5_bloom_collect", t)
    contaminated = (
        ex.where(~F.col("__is_eval"))
        .select("doc_id", "g")
        .where(SK.bloom_contains(F.col("g"), words, m_bits, k))
        .join(evalg, "g", "left_semi")
        .select("doc_id")
    )
    d3 = d2.where(~is_eval).join(contaminated, "doc_id", "left_anti")
    out = _versioned_scratch("pipeline_prof2", sf_dir) + "/survivors"
    d3.select("doc_id", "lang", "text").write.mode("overwrite").parquet(out)
    t = tick("s5_write", t)
    print(f"pass {i}: {T} (load {os.getloadavg()[0]:.2f})", flush=True)
    U.release_persisted()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_decon2_r13")
    from cernbox_migration_database_spark import queries as Q

    Q.QUERIES["scan_filter_project_sort"](spark, sf_dir).count()
    for i in range(n):
        one_pass(spark, sf_dir, i)


if __name__ == "__main__":
    main()
