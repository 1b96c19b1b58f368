"""Capture `.explain("formatted")` for the r13-touched queries into
plans/r13/<query>_<tag>.txt (optimization-round evidence files).

Besides the registered probe/query plans, ``pipeline_build`` captures the
stage-1-5 survivors frame of the pretraining pipeline (the build side the
bench times), via queries.train._pipeline_survivors on the current tree.

Usage: python tools/capture_r13_plans.py <before|after> [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from cernbox_migration_database_spark import queries as Q  # noqa: E402
from cernbox_migration_database_spark import util as U  # noqa: E402
from cernbox_migration_database_spark.session import get_spark  # noqa: E402

OUT = os.path.join(_REPO, "plans", "r13")

DEFAULT = [
    "pipeline_build",
    "pipeline_pretraining_corpus",
    "similarity_ivfpq_index_probe",
    "similarity_ivf_index_probe",
    "dedup_lsh_probe_index",
    "dedup_simhash",
    "merge_into_versioned",
    "datasource_scan_pruned",
    "search_bm25_indexed",
    "search_hybrid_rrf",
]


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT
    spark = get_spark(app_name="capture_r13")
    os.makedirs(OUT, exist_ok=True)
    for name in dict.fromkeys(names):
        try:
            if name == "pipeline_build":
                from cernbox_migration_database_spark.queries import train

                if hasattr(train, "_pipeline_survivors"):
                    df = train._pipeline_survivors(spark, sf, {})
                    suffix = " (stage 1-5 survivors frame, pre-write)"
                else:
                    print("pipeline_build: no _pipeline_survivors (old tree)")
                    continue
            elif name in Q.PHASED:
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
                fh.write(
                    f"# {name} [{tag}]{suffix}\n# Exchange nodes: {ex}\n\n"
                )
                fh.write(txt)
            print(f"{name}: exchanges={ex} -> {path}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
        U.release_persisted()


if __name__ == "__main__":
    main()
