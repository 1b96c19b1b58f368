"""Isolated A/B for the IVF-PQ index probe (VERDICT r8 item 3).

Round 8's driver run recorded `similarity_ivfpq_index_probe` warm at
1.653x its committed baseline — the only ratio above 1.3 — and round 8
is also when the index build was rebased from the seed quantizers
(m=8 x k=16 seed codebooks, seeded centroids) onto the TRAINED frozen
quantizers (m=32 x k=16 Lloyd codebooks, trained centroids). This tool
answers "environment or regression?" with a clean isolated experiment:

  * mode `seed`     — build the standing index with the r7 seed config
                      (S.seed_centroids k=16 + S.pq_codebooks m=8),
                      time the PROBE phase only.
  * mode `trained`  — build with the current trained config
                      (TRAINED_IVF_CENTROIDS + TRAINED_PQ_CODEBOOKS m=32),
                      time the PROBE phase only.

Each mode runs in a FRESH subprocess/JVM (the bench protocol's proven
fix for in-session timing drift), builds the index untimed through the
full insert/delete lifecycle, then times the probe: one untimed warm-up
+ `runs` timed executions, median reported, loadavg sampled around the
timed section so a co-tenant-loaded run is visibly disqualified.

Usage: python tools/ab_ivfpq.py [sf_dir] [runs]
Prints one JSON line with both medians and the trained/seed ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_mode(mode: str, sf_dir: str, runs: int) -> dict:
    from pyspark.sql import functions as F

    from cernbox_migration_database_spark import util as U
    from cernbox_migration_database_spark.operators import ivfpqindex as PQX
    from cernbox_migration_database_spark.operators import similarity as S
    from cernbox_migration_database_spark.operators import table_format as TF
    from cernbox_migration_database_spark.queries.similarity import (
        _ivfpq_index_probe_phase,
        _t,
        _versioned_scratch,
    )
    from cernbox_migration_database_spark.session import get_spark

    spark = get_spark()
    root = _versioned_scratch(f"abivfpq_{mode}", sf_dir)
    base, idx = root + "/emb", root + "/idx"
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus0 = emb.where((F.col("vec_id") % 10 != 7) | (F.col("vec_id") < 16))
    TF.create_table(corpus0, base)
    t_build0 = time.monotonic()
    if mode == "seed":
        PQX.build_ivfpq_index(
            spark, base, idx,
            S.seed_centroids(corpus0, k=16),
            S.pq_codebooks(corpus0),
        )
    elif mode == "trained":
        from cernbox_migration_database_spark.operators.ivf_trained import (
            TRAINED_IVF_CENTROIDS,
        )
        from cernbox_migration_database_spark.operators.pq_trained import (
            TRAINED_PQ_CODEBOOKS,
        )

        PQX.build_ivfpq_index(
            spark, base, idx,
            S.centroid_literals(spark, TRAINED_IVF_CENTROIDS),
            TRAINED_PQ_CODEBOOKS,
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    TF.merge_into(
        spark, base,
        emb.where((F.col("vec_id") % 10 == 7) & (F.col("vec_id") >= 16)),
        on="vec_id", when_matched=None,
    )
    PQX.refresh_ivfpq_index(spark, idx)
    TF.delete_where(spark, base, F.col("vec_id") % 100 == 23)
    PQX.refresh_ivfpq_index(spark, idx)
    build_s = time.monotonic() - t_build0

    # probe-only timing: warm-up + timed medians
    _ivfpq_index_probe_phase(spark, (sf_dir, idx)).count()
    U.release_persisted()
    load0 = os.getloadavg()[0]
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        n = _ivfpq_index_probe_phase(spark, (sf_dir, idx)).count()
        ts.append(time.monotonic() - t0)
        U.release_persisted()
    return {
        "mode": mode,
        "build_s": round(build_s, 3),
        "probe_median_s": round(statistics.median(ts), 3),
        "probe_runs_s": [round(t, 3) for t in ts],
        "probe_rows": n,
        "load_1m": round((load0 + os.getloadavg()[0]) / 2, 2),
    }


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--_one":
        print(
            "R=" + json.dumps(_time_mode(sys.argv[2], sys.argv[3], int(sys.argv[4])))
        )
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    out = {}
    for mode in ("seed", "trained"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_one", mode, sf_dir, str(runs)],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("R=")]
        if not lines:
            raise RuntimeError(f"{mode} failed: {r.stderr[-800:]}")
        out[mode] = json.loads(lines[-1][2:])
    out["trained_over_seed"] = round(
        out["trained"]["probe_median_s"] / out["seed"]["probe_median_s"], 3
    )
    out["sf_dir"] = sf_dir
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
