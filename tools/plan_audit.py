"""Plan-hygiene audit: sweep every catalog query's physical plan for the
anti-patterns that kill 100 TB jobs, mechanically.

Flags:
  * BatchEvalPython / PythonUDF      - row-at-a-time Python in the plan
    (Arrow paths - ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
    FlatMapGroupsInPandasWithState - are allowed and reported separately);
  * CartesianProduct                 - a NON-broadcast cross join
    (BroadcastNestedLoopJoin over a small broadcast side is allowed: that
    is the exact-KNN / scalar-join shape);
  * UNPARTITIONED Window             - a Window node with an empty
    partition spec: Spark funnels EVERY row through ONE task (Exchange
    SinglePartition -> single-threaded WindowExec). The round-2 verdict
    caught `train_shuffle` shipping exactly this; the rule makes the class
    unrepeatable. (A SinglePartition exchange alone is NOT flagged — final
    scalar aggregates legitimately use one, moving only partial-agg rows.)
  * count of Exchange operators      - reported per query so shuffle-count
    regressions show up in review diffs.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
       python tools/plan_audit.py --selftest   (rule must flag a known-bad
                                                fixture plan and pass a
                                                known-good one)
Exit 1 if any query trips a hard flag (or a selftest expectation fails).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark.session import get_spark
from cernbox_migration_database_spark.util import release_persisted

HARD = ("BatchEvalPython", "CartesianProduct")
# Broadcast hints are DEFAULT-DENY (r9 verdict inverted the old one-query
# deny-list): an unconditional hint on a side that grows with the data is
# a driver OOM at scale — LSH candidate pairs, cluster relations on a
# dup-heavy crawl, eval splits designated as a corpus fraction, TPC-H
# part/supplier (SF-linear) are all such sides. AQE choosing broadcast at
# runtime for a MEASURED-small side is always fine; the rule bans only
# the hard hint (ResolvedHint in the analyzed logical plan). A query may
# carry hints ONLY if listed here with a bounded-size justification; any
# unlisted hint flags UnjustifiedBroadcastHint. Keep justifications honest
# — "small at sf0.1" is NOT bounded; "25-row nation enum" is. Non-broadcast
# hints (merge/shuffle_hash) are never flagged: they force the SCALABLE
# join path, the opposite failure mode.
_HINT = "ResolvedHint (strategy=broadcast)"
BROADCAST_HINT_ALLOWED: dict[str, str] = {
    # fixed probe/query sets: k rows chosen by the query itself
    "similarity_knn": "fixed probe set (k query vectors)",
    "similarity_range_search": "fixed probe set",
    "similarity_maxsim": "fixed multi-vector query set",
    "similarity_ann_lsh": "fixed probe set; LSH bands fixed",
    "similarity_ann_ivf": "fixed probe set + k centroids",
    "similarity_ann_ivf_trained": "fixed probe set + trained centroids",
    "similarity_ivf_pq": "fixed probe set + k*m*16 PQ LUT",
    "similarity_ivf_pq_trained": "fixed probe set + trained PQ LUT",
    "similarity_pq_adc": "per-query m*16 ADC LUT",
    "similarity_pq_adc_trained": "trained m*16 ADC LUT",
    "similarity_ivfpq_index_probe": "probe batch + flat broadcast LUT",
    "similarity_ivf_index_probe": "fixed probe batch vs standing index",
    "similarity_ivf_drift": (
        "fixed probe batch vs the rebuilt standing index"
    ),
    "similarity_ivf_filtered": "fixed probe set + k centroids",
    "streaming_text_ingest_search": (
        "per-query term stats + RTBF delete batch (per-entity)"
    ),
    # text search: per-query-term stats (<= |terms| rows) and 1-row scalars
    "bm25_search": "1-row vocab/corpus scalars",
    "search_bm25_indexed": "df stats for the query's terms only",
    "search_bm25_conjunctive": "df stats for the query's terms only",
    "search_hybrid_rrf": "per-query term stats + fixed probe",
    "text_tfidf": "1-row corpus-stats scalar (dfreq is unhinted)",
    "text_lm_score_heldout": "1-row normalizer scalar",
    "text_lm_cross_entropy": "1-row normalizer scalar",
    # TPC-H fixed-cardinality enums: nation=25 rows, region=5 at EVERY SF
    "q5_region_revenue": "nation(25)/region(5) fixed enums",
    "q7_volume_shipping": "nation(25) fixed enum",
    "q8_market_share": "nation(25)/region(5) fixed enums",
    "q9_product_profit": "nation(25) fixed enum",
    "q10_returned_items": "nation(25) fixed enum",
    "join_dims_region": "nation(25)/region(5) fixed enums",
    # fixed-bin / scalar relations
    "quantile_binning": "fixed threshold list",
    "histogram_totalprice": "fixed bin edges + 1-row total",
    "range_join_price_bands": "fixed band table",
    "quantile_histogram_store": "bin-bounded store state (KiB)",
    "quantile_histogram_drift": "bin-bounded store state (KiB)",
    "table_maintenance_drift": "bin-bounded store state (KiB)",
    "events_anomaly_zscore": "per-event-type stats (enum-bounded)",
    "graph_triangle_count": "1-row scalar aggregates",
    "graph_bfs_levels": "modulus-bounded 200-row edge relation",
    "cms_heavy_hitters": "fixed w*d CMS sketch",
    "heavy_hitters_store": "fixed w*d CMS state (KiB)",
    # bounded side relations
    "train_token_packing": "|langs| x 16 chunk-offset rows",
    "pipeline_end_to_end": "|langs| x 16 pack offsets (evalg unhinted)",
    "pipeline_pretraining_corpus": (
        "|langs| x 16 pack offsets (decontaminate evalg unhinted)"
    ),
    "train_mixture_weights": "1-row total + per-lang weights (|langs|)",
    "train_curriculum_stages": "1-row corpus-count scalar",
    "deletion_propagation": "RTBF request list (per-entity, not per-row)",
}
ARROW = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
)
# Streaming/iterative queries execute on build (memory-sink drain / driver
# loop); their plan text is the already-executed result — still auditable.


def _top_level_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups in a plan-node argument list (nested
    brackets inside expressions are handled by depth counting)."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                buf = []
                continue
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    return groups


def unpartitioned_windows(plan: str) -> list[str]:
    """Window nodes whose simple-string lacks a partition spec.

    WindowExec prints ``Window [exprs], [partitionSpec], [orderSpec]`` with
    empty specs OMITTED, so bracket-group arity alone is ambiguous: both an
    unpartitioned ordered window (``[exprs], [orderSpec]``) and a
    partitioned unordered one (``[exprs], [partitionSpec]`` — e.g. a
    whole-partition SUM like q20's share-of-part total) print two groups.
    They are distinguishable because an order spec ALWAYS carries a sort
    direction (`` ASC``/`` DESC``) and a partition spec never does:

      * 3 groups                      -> partitioned, ordered: fine
      * 2 groups, 2nd has ASC/DESC    -> UNPARTITIONED ordered: FLAG
      * 2 groups, no direction        -> partitioned, unordered: fine
      * 1 group (over ())             -> unpartitioned, unordered: FLAG
    """
    hits = []
    for line in plan.splitlines():
        node = line.lstrip(" +-:*()").rstrip()
        if not node.startswith("Window "):
            continue
        groups = _top_level_groups(node)
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(r" (ASC|DESC)\b", groups[1]):
            continue
        hits.append(node[:100])
    return hits


def audit_plan(plan: str) -> list[str]:
    """All hard-flag reasons for one physical-plan string."""
    reasons = [h for h in HARD if h in plan]
    if unpartitioned_windows(plan):
        reasons.append("UnpartitionedWindow")
    return reasons


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def selftest() -> int:
    """The rule must flag a deliberately-bad plan and pass a good one."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = get_spark(app_name="plan_audit_selftest", shuffle_partitions=8)
    df = spark.range(10).toDF("x")
    bad = df.select(F.row_number().over(W.orderBy("x")).alias("r"))
    good = df.select(
        F.row_number()
        .over(W.partitionBy((F.col("x") % 2)).orderBy("x"))
        .alias("r")
    )
    failures = []
    if "UnpartitionedWindow" not in audit_plan(_explain(bad)):
        failures.append("bad fixture NOT flagged")
    if audit_plan(_explain(good)):
        failures.append("good fixture flagged")
    # Default-deny broadcast rule: a hinted join must read as hinted in
    # the analyzed plan (so an unlisted query would flag), an unhinted
    # one must not (so AQE-chosen broadcasts never flag).
    dim = spark.range(5).toDF("x")
    hinted_join = df.join(F.broadcast(dim), "x")
    plain_join = df.join(dim, "x")
    merge_join = df.join(dim.hint("merge"), "x")
    if _HINT not in _analyzed(hinted_join):
        failures.append("hinted fixture NOT detected in analyzed plan")
    if _HINT in _analyzed(plain_join):
        failures.append("unhinted fixture detected as hinted")
    if _HINT in _analyzed(merge_join):
        failures.append("merge hint wrongly detected as broadcast")
    for f in failures:
        print(f"SELFTEST FAIL: {f}")
    print("selftest ok" if not failures else "selftest FAILED")
    return 1 if failures else 0


def main() -> int:
    if "--selftest" in sys.argv:
        return selftest()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan_audit", shuffle_partitions=8)
    bad = []
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = _explain(df)
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"FLAG {name}: build error {type(e).__name__}: {e}")
            continue
        reasons = audit_plan(plan)
        hinted = _HINT in _analyzed(df)
        if hinted and name not in BROADCAST_HINT_ALLOWED:
            reasons.append("UnjustifiedBroadcastHint")
        arrow_hits = [a for a in ARROW if a in plan]
        n_exchange = len(re.findall(r"\bExchange ", plan))
        if reasons:
            bad.append(name)
            print(f"FLAG {name}: {reasons} (exchanges={n_exchange})")
        else:
            arrow = f" arrow={arrow_hits}" if arrow_hits else ""
            hint = " hint(allowed)" if hinted else ""
            if not hinted and name in BROADCAST_HINT_ALLOWED:
                # keep the allowlist honest: an entry whose plan carries
                # no hint anymore is dead weight — prune it
                hint = " NOTE stale-allowlist-entry"
            print(
                f"ok   {name}: exchanges={n_exchange}{arrow}{hint}",
                flush=True,
            )
        release_persisted()
        spark.catalog.clearCache()
    print(f"\n{len(bad)} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
