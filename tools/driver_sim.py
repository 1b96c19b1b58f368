"""Driver-harness simulator: the pre-flight gate for CORRECTNESS_r{N}.

Replicates what the grading harness actually does, which selfcheck.py (our
stricter exact-value differential) does NOT:
  * a VANILLA SparkSession — none of session.get_spark's confs, so any
    query relying on a factory conf (ANSI interactions, mapKeyDedupPolicy,
    nanosAsLong) fails here unless it sets the conf itself;
  * only the FIRST 50 entries of queries() in dict order;
  * pandas-level canonicalization + hashing — list-typed result columns
    crash pandas hashing (the r1 `array_agg_sorted` red), and engine type
    mismatches (DuckDB HUGEINT vs Spark BIGINT) flip hashes even when
    values agree.

Usage: python tools/driver_sim.py [sf_dir] [query ...|--all]
(--all widens past the 50-query window: out-of-window queries are graded by
selfcheck only, but they must still run on a vanilla session.)
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

WINDOW = 50


def canon(df: pd.DataFrame) -> tuple:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        # Timestamps arrive as datetime64 of DIFFERENT units per engine
        # (Spark/Arrow us vs DuckDB us/ns) — the real harness is green on
        # r1 timestamp queries, so compare them as ISO strings. Numeric
        # dtypes stay strict: int64-vs-object (DuckDB HUGEINT) mismatches
        # are exactly what flipped r1's window_sessionize red.
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    h = pd.util.hash_pandas_object(df, index=False)  # raises on list cells
    return len(df), cols, int(h.sum()) & 0xFFFFFFFFFFFFFFFF


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    run_all = "--all" in args
    only = {a for a in args if a != "--all"}

    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from cernbox_migration_database_spark.sources.catalog import TABLES
    from cernbox_migration_database_spark.util import release_persisted

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    osql = E.oracle_sql()
    names = list(qs) if run_all else list(qs)[:WINDOW]
    fails = []
    n_run = 0
    for name in names:
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            srows, scols, shash = canon(spdf)
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: spark/canon: {type(e).__name__}: {e}")
            continue
        sql = osql.get(name)
        if sql is None:
            fails.append(name)
            print(f"FAIL {name}: no oracle (graded red by the harness)")
            continue
        try:
            opdf = con.execute(sql).df()
            orows, ocols, ohash = canon(opdf)
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: duckdb/canon: {type(e).__name__}: {e}")
            continue
        problems = []
        if srows != orows:
            problems.append(f"rows {srows} != {orows}")
        if scols != ocols:
            problems.append(f"cols {scols} != {ocols}")
        # NB: hash compares VALUES-with-dtype; pandas hashes int64 and
        # float64 differently, so a dtype mismatch shows up here even when
        # values print identically — exactly like the real harness.
        if not problems and shash != ohash:
            problems.append("hash mismatch (value or dtype level)")
        if problems:
            fails.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: rows={srows} ({time.time()-t0:.1f}s)", flush=True)
        release_persisted()

    print(f"\n{n_run - len(fails)}/{n_run} window-queries driver-sim green")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
