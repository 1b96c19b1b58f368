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
    "train_shuffle": "global deterministic rank WITHOUT a single-task window: range exchange + per-partition ids + broadcast offsets",
    "train_token_packing": "two-level (lang, chunk) running sums — window partitions by (lang, _chunk), offsets broadcast",
    "pipeline_end_to_end": "quality gate fused into scan; corpus shuffled exactly twice (fingerprint window, pack window)",
    "text_winnowing": "winnowing fingerprints: shifted-slice zip_with hash pipeline, persisted pre-explode (inferred-filter barrier); zero exchanges",
    "similarity_pq_adc": "PQ search: broadcast per-query LUT joined to the compact code index — corpus vectors never load",
    "graph_pagerank": "3 integer PageRank rounds: per round one edge equi-join + map-side-combinable SUM, edges/degrees persisted once",
    "profile_orders": "N exact COUNT(DISTINCT) via one Expand feeding a single partial+final aggregation; stack-unpivot on the 1-row agg",
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

## Round-3 plan changes (measured on local[32], sf0.1 unless noted)

### text_winnowing: the inferred-filter tax and its persist barrier
The winnowing hash pipeline is pure row-local HOF arithmetic built ONLY
from shifted slices + whole-array zip_with (never element_at on an
inlined array inside a lambda — that re-evaluates the array per element,
the first version measured >5 min at sf0.001). Even in that
substitution-proof form, `InferFiltersFromGenerate` adds size(_fps)>0
above the explode and PushDownPredicates inlines the ENTIRE pipeline into
a scan-level Filter evaluated interpreted per row: 48 s of filter
overhead vs 0.8 s of real work at sf0.1. Persisting the per-doc
fingerprint array before the explode is the barrier (filters do not push
through InMemoryRelation): 54 s -> 7 s end-to-end, and dropping the
redundant final distinct (array_distinct already dedupes per doc)
removed the query's only exchange.

### similarity_pq_encode / _adc: plan-build cost is real cost
Composing the m*k=128 codebook-distance expressions through the Python
Column API cost ~5 s of py4j round trips per query BEFORE any execution;
generating the same expressions as SQL text and parsing once with F.expr
is milliseconds. A/B'd a third form — fully unrolled element_at
arithmetic (1024 scalar terms/row) — and it ran ~2.5x SLOWER than the
aggregate/zip_with HOF form (expression tree bloats past codegen limits
and falls back to interpreted eval); kept the zip_with form with the
measurement in the docstring. The encoded codes array is persisted
pre-explode for the same inferred-filter reason as winnowing.


### train_shuffle: unpartitioned row_number -> partition-offset ranking
Before (r2 verdict "What's wrong" #1): `row_number().over(W.orderBy(...))`
— Spark plans an empty-partition-spec WindowExec behind an `Exchange
SinglePartition`: EVERY row through ONE task. After: range-repartition on
the hash key (the exchange a global sort pays anyway), sort within
partitions, `monotonically_increasing_id` = (pid << 33) | localRow
assigned map-side, one #partitions-row count job prefix-summed on the
driver, rank = broadcast-literal offset[pid] + localRow + 1. Every pass
runs at full parallelism; the only extra cost is a metadata-sized count
job against the persisted midpoint.

### train_token_packing: per-lang window -> two-level (lang, chunk) sum
Before (#2): running sum partitioned by `lang` — a real corpus has ~5
languages, so each language's token stream serialized through one reducer.
After: chunk = FIRST HEX CHAR of the same md5 ordering key, so sorting by
(chunk, md5) IS sorting by md5 — within-chunk running sums at |langs|x16
parallelism + a broadcast per-chunk offset table (|langs|x16 rows) prefix-
summed by a window over the tiny aggregate. Bit-identical bins to the
per-lang oracle window; widen the prefix to 2 hex chars for 256x.

### plan_audit: UnpartitionedWindow rule
The class of bug above can no longer land silently: the audit flags any
`Window` node whose simple-string lacks a partition spec. Subtlety that
made arity-counting insufficient: WindowExec omits EMPTY specs, so a
partitioned-unordered window (q20's whole-partition SUM) also prints two
bracket groups — disambiguated because an order spec always carries
ASC/DESC and a partition spec never does. `--selftest` proves the rule
flags a known-bad plan and passes q20; pytest pins the fixed plans.
Full-catalog sweep: 0 flagged of 115.

### parse_kv_map: structural last-wins dedup, fold form (measured trap)
Making last-wins independent of `mapKeyDedupPolicy` first shipped as
reverse + `array_position` filter referencing the entries array INSIDE the
lambda — no CSE across HOF lambdas, so the whole split pipeline
re-evaluated per element: kv_parse_map 0.67 -> 1.37 s cold on the bench.
Final form is a fold (`aggregate`) whose lambdas touch only their own
arguments (drop key from accumulator, append entry): entries evaluates
once, 0.73 s cold / 0.62 s warm — conf-independence at zero plan cost.

### text_langid / text_fluency: model-as-literal scoring
Char-bigram Naive Bayes (and an English-bigram LM for fluency): weights
fitted offline at import, quantized to fixed-point integers, embedded as
a LITERAL map — scoring is a row-local Catalyst `aggregate` over the
bigram array inside codegen. No UDF, no shuffle, no broadcast; exchanges=0
at any corpus size, and integer sums make both engines' results
bit-identical (the oracle SQL is GENERATED from the same fitted dict).
1.1 s warm over sf0.1. This is the pattern for any small-model scoring
pass at 100 TB: fold the model into the plan.

### connected_components_star (dedup_clusters_star)
Large-star/small-star alternation as pure join+agg rounds — O(log d)
rounds vs min-label's O(d), no neighbor-list materialization (each
half-round: per-node min aggregate + equi-join + distinct). Fixpoint
tested EXACTLY (edge count + left-anti emptiness; a hash-sum signature
would be probabilistic and overflows under ANSI). A 30-node chain
converges in <=10 star rounds where min-label correctly refuses at its
15-round budget; both produce identical clusters vs the recursive-CTE
oracle (three-way differential).

### bucketed_join_priority_revenue
`bucketBy(8, key).sortBy(key)` writes for both sides, then a merge-hint
join: ZERO exchanges below the SortMergeJoin (plan-asserted) — the
pay-shuffle-once-at-write-time lever for every repeated join key. The
`merge` hint (not a broadcast-threshold conf flip) keeps the demo free of
session-conf mutation.

### kmv_distinct_estimate
Deterministic approximate-distinct: per-partition TakeOrdered of the k=256
smallest 52-bit md5 prefixes (no global sort), integer-only estimator
(k-1)*2^52 div kth-min — unlike HLL the ESTIMATE itself hash-matches the
DuckDB oracle. Sketches merge by keeping the k smallest of a union.

### pipeline_end_to_end
Quality gate -> fingerprint exact-dedup (partitioned window) -> two-level
token packing, one declarative plan: the corpus shuffles exactly twice
(fingerprint window, pack window); remaining exchanges move the
|langs|x16-row offset table. The composed chain is what a training-data
pipeline actually ships — and it is oracle-paired end-to-end.

### Bench variance protocol (tools/bench_protocol.py)
VERDICT r2 asked for median-of-3 ISOLATED cold runs. Two protocol batches
on the SAME code, ~30 min apart:
  batch A: cold [27.7, 23.9, 23.7] median 23.9, warm median 14.3
  batch B: cold [24.4, 25.5, 26.2] median 25.5, warm median 13.7
Within-batch spread ~8-17%; BETWEEN batches the same commit moves 10-25%
per query in BOTH directions (q1 2.0 -> 2.5 while scan fell r2->r3) —
and the queries that "regressed" most vs r2 (simhash 2.1 -> 3.4, knn
1.2 -> 1.8) are byte-identical plans since r1 (similarity.py untouched).
Conclusion, now with data: cold totals on this box are environment-
dominated beyond ±25%; only same-session relative comparisons and warm
floors are actionable. The r2->r3 "regression" is noise, not plans —
the only real regression found (kv filter form, above) was caught by
same-session A/B and fixed.

Batch C (after the driver REGENERATED the sf fixtures — events.ts
ns->us, order/ship dates ms->us; same code plus the unit-adaptive
events readers): cold [19.62, 19.66, 20.50] median 19.66, warm median
11.56 — tightest spread observed (~4%), under the r2 single-run 20.57
and within the ±25% band of the 18.5 s target named in the r2 verdict.
Batch D (later the same day, identical headline plans): cold
[23.73, 23.80, 49.20], the outlier 2x slower even WARM — and `uptime`
showed load average 3-4 with zero of our processes running: the box is
SHARED, and cold-total comparisons across rounds measure co-tenant
load as much as plans. The warm medians (11.5-13.9 across batches
A-D) remain the stable signal. Batch E (end of round 3, after the
winnowing/PQ additions — none of which touch a headline query): cold
[22.2, 24.0, 24.2] median 23.98, warm median 15.57, spread tight but
load average climbed to ~7 during the run; the inflation vs batch C is
UNIFORM across all 16 queries (scan 0.82->1.0, q1 2.06->2.32, simhash
2.48->3.41) — the signature of co-tenant contention, not of any plan
change.

### Late round-3 additions (plan notes)
`dedup_simhash_pairs`: 4x16-bit band bucket join — pigeonhole-EXACT
candidates for Hamming<=3 (no recall loss), bucket-aggregate pair
expansion, 64-position row-local verify on candidates only; equality with
brute-force all-pairs is test-asserted. `dedup_incremental_ingest`: daily
batch deduped by a fingerprint anti-join against the corpus index + a
batch-only window — incremental cost, corpus text never rescanned.
`streaming_dedup`: dropDuplicatesWithinWatermark with keys-only output
(survivor choice is arrival-dependent; the key set is not).
`train_chunking`: overlapping token windows via sequence/posexplode/slice,
exchanges=0. Measured non-change: a conv()-based 2x32-bit simhash digit
decode was A/B'd against the 64 substring/instr expressions and came out
SLOWER warm (2.76 vs 2.51 s) — codegen subexpression elimination already
dedupes the string work; kept the portable form.
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
