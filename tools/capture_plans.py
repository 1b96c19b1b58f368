"""Regenerate PLANS.md: formatted physical plans for flagship queries.

Usage: python tools/capture_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from cernbox_migration_database_spark import queries as Q
from cernbox_migration_database_spark.session import get_spark

SHOW = {
    "scan_filter_project_sort": "S1 scan: both predicates pushed to parquet, 4-col pruned read",
    "q1_pricing_summary": "partial (map-side) + final aggregate, scaled-long accumulators",
    "q5_region_revenue": "6-table join: all dims broadcast, AQE re-plans fact joins",
    "merge_update_orders": "MERGE shape: single left join on the key",
    "dedup_minhash_lsh": "LSH: band-bucket AGGREGATE (collect_set + in-array pair expansion) + broadcast candidate verification — no self-join",
    "dedup_simhash": "one row per (doc, token), single groupBy(doc) with 64 partial sums — no 64-way explode",
    "similarity_knn": "corpus scan x broadcast queries, window top-k",
    "similarity_ann_ivf": "IVF: row-local cell assignment (no shuffle), broadcast probe equi-join on cell, window top-k",
    "q17_small_quantity_revenue": "correlated AVG subquery DECORRELATED into an aggregate + join (no per-row rescan)",
}

# Narrative that survives regeneration (measured evidence lives here, the
# plan dumps above are mechanical).
EPILOGUE = """
## Round-2 plan changes (measured on local[32], sf0.1; env variance ±25%)

### dedup_simhash: 64-way explode -> 64 vote columns
Before: `explode(sequence(0,63))` per token multiplied shuffle input 64x.
After: one row per (doc, token) carrying 64 0/1 bit expressions, ONE
groupBy(doc) with 64 partial sums + a count (sign = 2*sum(bit) -
n_tokens). Partial-aggregation hash-map entries per partition drop 64x
(5k vs 320k on this corpus — the number that decides spill at 10^9 docs),
shuffle rows drop 64x. Measured trade-off: the 65-aggregate generated
class pays ~1.4 s one-time codegen/JIT (2.37 s cold -> 0.91 s warm same
session, vs the old shape's 1.36 s steady) — ~1.5x faster per repeated
execution and strictly lighter on shuffle; a single cold run includes the
compile. bench.py reports both (`queries` cold / `queries_warm`).

### lsh_candidate_pairs: self-join -> bucket aggregate + in-array expansion
Before: posexplode bands, self-join on (band, bv), distinct — three
exchanges plus a join hash table (and the un-aliased `band` column had
degenerated to a trivially-true join predicate, pairing values across band
positions — fixed). After: groupBy(band, bv) -> collect_set(ids) ->
pairwise expansion inside the sorted array -> distinct: two exchanges, no
join build, quadratic fan-out confined to within-bucket arrays exactly as
LSH intends. dedup_minhash_lsh: 2.39 s cold / 1.44 s warm (from ~2.6-3.0).

### jaccard_pairs hot-shingle cap (skew guard)
`max_df` drops shingles with document frequency > cap before the inverted-
index join: the DF count itself is a map-side-combinable groupBy (skew-
immune), the hot set broadcasts into a left-anti join, per-document sizes
are recomputed so capped Jaccard stays exact over the surviving shingle
space (mirrored in the DuckDB oracle; test asserts max per-key join input
<= cap with a shingle 30 docs hot).

### connected_components (dedup_clusters): bounded iterative plan
Each round is one equi-join + one groupBy(min) over (id, label) pairs —
text never enters the loop. Labels only decrease, so the driver loop stops
when the global label sum is unchanged (one agg action per round, no extra
join); `localCheckpoint` cuts lineage so round N's plan does not embed
rounds 1..N-1. Convergence is bounded by component diameter — shallow for
near-dup clusters; for billion-edge skewed graphs swap the inner step for
large-star/small-star, same loop shape.

### catalog DataFrame cache
Every `spark.read.parquet` re-lists the path and re-reads footers (~85 ms
per table per call). The catalog hands back the same resolved DataFrame
per (applicationId, sf_dir, table) — fixed-overhead removal for an
86-query session over 10 immutable tables.

### Mechanical plan audit (tools/plan_audit.py)
Every catalog query's physical plan is swept for row-at-a-time Python
(BatchEvalPython) and non-broadcast cartesian products: 0 flagged across
all 90 queries; the only Python boundary in any plan is the Arrow-batched
MapInPandas of the multimodal decode. Exchange counts are printed per
query so shuffle regressions show up in review.

### Cold/warm decomposition of the headline number
Cold sum 18.6 s vs warm sum 11.9 s (same session, same plans): the ~7 s
delta is plan analysis + codegen compile + JIT, amortized away on any
long-lived session. The remaining warm floor is compute-bound JVM
expression work (simhash bit votes, minhash md5, LSH bucket dots) — no
Python anywhere in those paths.
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plans")
    out = [
        "# PLANS — physical-plan evidence for flagship queries",
        "",
        "Captured from `df.explain('formatted')` at sf0.1 (regenerate with",
        "`python tools/capture_plans.py`). Annotations state what the plan",
        "must show for the 100 TB design to hold.",
        "",
    ]
    for name, note in SHOW.items():
        df = Q.QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines = plan.splitlines()
        interesting = [l for l in lines if "PushedFilters" in l or "ReadSchema" in l]
        out += [f"## {name}", f"*{note}*", "```", *lines[:30], "```"]
        if interesting:
            out += ["Scan details:", "```"]
            out += [x.strip()[:160] for x in interesting[:4]]
            out += ["```"]
        out.append("")
    out.append(EPILOGUE.strip())
    out.append("")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(out)} lines)")


if __name__ == "__main__":
    main()
