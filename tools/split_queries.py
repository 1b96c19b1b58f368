"""One-shot mechanical splitter: queries.py (10.9k lines, 229 registrations)
-> cernbox_migration_database_spark/queries/ package of domain modules
re-exported through one registry. Registry CONTENT is bit-identical (names,
oracle SQL, phased pairs); final dict ORDER is still governed by _PRIORITY +
_reorder_registry in __init__. Kept in tools/ as the audit trail for the
refactor (VERDICT r7 next-item #8)."""

from __future__ import annotations

import io
import re
import tokenize

SRC = "cernbox_migration_database_spark/queries.py"
PKG = "cernbox_migration_database_spark/queries"

# ---------------------------------------------------------------- scan units
src = open(SRC).read()
lines = src.splitlines(keepends=True)

starts = []  # (idx0, name, kind)
for i, l in enumerate(lines):
    if re.match(r"^@register\(", l):
        starts.append([i, None, "reg"])
    elif re.match(r"^def (\w+)", l):
        starts.append([i, re.match(r"^def (\w+)", l).group(1), "def"])
    elif re.match(r"^\w+\s*(=|:)", l) and not l.startswith(("QUERIES", "ORACLE", "PHASED")):
        starts.append([i, re.match(r"^(\w+)", l).group(1), "assign"])
    elif re.match(r"^_reorder_registry\(\)", l):
        starts.append([i, "_reorder_call", "call"])

for u in starts:
    if u[2] == "reg":
        txt = "".join(lines[u[0] : u[0] + 6])
        u[1] = re.search(r'@register\(\s*\n?\s*"([^"]+)"', txt).group(1)

# merge a def-unit that directly follows its @register decorator
units = []
for u in starts:
    if u[2] == "def" and units and units[-1][2] == "reg" and units[-1][3] is None:
        units[-1][3] = u[0]  # mark decorated-def consumed
        continue
    units.append(u + [None])

# spans
spans = []
for k, u in enumerate(units):
    end = units[k + 1][0] if k + 1 < len(units) else len(lines)
    spans.append((u[1], u[2], u[0], end))

# ------------------------------------------------------------ classification
M = {}
def assign(mod, names):
    for n in names.split():
        M[n] = mod

assign("relational", """
scan_filter_project_sort scan_param_filter topk_orders
agg_group_count agg_distinct_customers agg_cube agg_rollup grouping_sets
join_enrich_parts join_dims_region join_semi_returned_orders
join_anti_customers_no_orders merge_update_orders
_SEG_A _SEG_B _segments set_union set_intersect set_except set_union_all
string_functions from_json_struct conditional_agg scalar_subquery
null_functions date_functions percentiles array_agg_sorted unpivot_orders
histogram_totalprice quantile_binning range_join_price_bands
hof_array_pipeline map_functions_pipeline bucketed_join_priority_revenue
salted_agg salted_join_skew agg_weighted_median rollup_incremental_merge
percentile_disc_groups json_extract_props
""")
assign("tpch", """
q1_pricing_summary q3_shipping_priority q5_region_revenue
q6_forecast_revenue q18_large_orders q4_order_priority
q12_shipmode_priority q14_promo_revenue _REV_SUM q2_min_cost_supplier
q11_important_parts q15_top_supplier q13_customer_distribution _QTY_AVG
_PRICE_SUM q17_small_quantity_revenue _BAL_SUM q22_inactive_customers
_REV q7_volume_shipping q10_returned_items q19_disjunctive_join
q21_waiting_supplier q8_market_share q9_product_profit
q16_supplier_part_counts q20_dominant_supplier
""")
assign("windows", """
window_dedup_recency window_running_sum window_topk_per_group
window_sessionize batch_session_window window_analytics window_range_frame
window_distribution _EWMA_W _EWMA_NUM_SQL _EWMA_DEN_SQL window_ewma
window_gap_islands asof_join_purchases asof_forward_tolerance
""")
assign("events", """
time_bucket_agg events_pivot events_funnel events_retention_cohort
events_anomaly_zscore events_ohlc_bars events_top_transitions
events_attribution events_sequence_match events_rolling_distinct_users
ts_gap_fill ts_interpolate market_basket_pairs
""")
assign("migration", """
_DOC_PATH_SQL path_functions router_4way kv_parse_map kv_length_prefixed
cast_deadletter _MIG_SHARES_SQL _MIG_META_SQL _MIG_PIPE_SQL
migration_merged migration_audit migration_dead_letters _mig_shares
_run_mig migration_upsert_versioned txn_multi_table pipeline_end_to_end
deletion_propagation scd2_apply
""")
assign("text", """
_TOKS _TOKEN_RE text_token_stats text_quality text_langid text_fluency
text_fingerprint text_bigram_lm _winnow_oracle _winnow_pairs_oracle
dedup_winnowing_pairs text_winnowing _LM_SELF_ORACLE _lm_heldout_oracle
text_lm_score_heldout text_lm_cross_entropy text_tfidf text_redact
text_repetition text_ngram_entropy token_frequencies _URL_HOST_RE
_URL_PATH_RE _URL_REF_RE url_functions _BM25_TERMS _BM25_K1 _BM25_B
bm25_search search_bm25_indexed _bm25_indexed_build _bm25_indexed_probe
search_bm25_conjunctive search_hybrid_rrf _pii_aug_sql _pii_augmented
text_pii_scrub streaming_pii_scrub
""")
assign("dedup", """
_SHINGLES dedup_exact dedup_ngram_jaccard dedup_prefix_filter
dedup_clusters dedup_incremental_ingest dedup_clusters_star _MINHASH_SIGS
dedup_minhash_lsh dedup_lsh_probe_index _lsh_index_build _lsh_probe_phase
dedup_cluster_ingest streaming_lsh_ingest_probe dedup_simhash
_SIMHASH_SIG_CTES dedup_simhash_pairs dedup_keep_canonical
dedup_repeated_spans dedup_containment_pairs dedup_cross_field
""")
assign("similarity", """
_SCALED_EL _dot_sql similarity_knn _mmr_oracle_sql search_mmr_rerank
dedup_embedding_cosine dedup_semantic_keep embedding_norm_stats
_LSH_BIT_SQL embedding_lsh_buckets embedding_quantize embedding_dim_stats
similarity_ann_lsh similarity_ann_ivf similarity_ivf_index_probe
similarity_ivfpq_index_probe similarity_ivf_filtered _pq_oracle
_pq_adc_oracle similarity_pq_adc _ivf_pq_oracle similarity_ivf_pq
similarity_pq_encode embedding_kmeans similarity_range_search
similarity_maxsim _RP_WEIGHTS _rp_sql embedding_random_projection
""")
assign("multimodal", """
multimodal_bytes multimodal_decode multimodal_frame_sample
multimodal_phash_dedup
""")
assign("streaming", """
streaming_window_agg streaming_sliding_window streaming_enrich_join
streaming_session_window streaming_stateful_counts streaming_dedup
streaming_interval_join streaming_outer_join
""")
assign("table", """
merge_into_versioned _merge_versioned_build _merge_versioned_probe
table_time_travel table_changes mv_incremental_refresh
point_lookup_indexed merge_into_nested_partitions table_delete_where
table_delete_vectors table_merge_mor table_cdc_replication
table_update_where table_restore table_manifest_scan table_stats_skipping
table_schema_evolution table_optimize_compact table_partition_evolution
table_insert_append datasource_scan_pruned _dsscan_build _dsscan_probe
table_stream_pipeline table_tag_read quality_expectations
table_agg_pushdown mv_join_refresh profile_drift_psi
table_convert_in_place query_result_cache zorder_lineitem _zorder_oracle
""")
assign("stats", """
stats_moments hash_sample stratified_exact_n stratified_hash_sample
stats_linear_fit graph_triangle_count _LPA_ROUND graph_label_propagation
_LPA_ROUND_W graph_label_propagation_weighted _pagerank_round
graph_pagerank graph_bfs_levels stats_mad_outliers stats_covariance_matrix
stats_chi_square_cells stats_ttest_groups profile_orders
_profile_orders_oracle approx_sketches kmv_distinct_estimate
_kmv_scope_sql approx_distinct_store _CMS_BUCKET cms_heavy_hitters
""")
assign("train", """
train_weighted_sample train_shuffle train_token_packing
_pack_bins_two_level train_chunking train_decontaminate
bloom_decontaminate train_mixture_weights train_curriculum_stages
train_dataset_card train_shard_manifest train_pack_nextfit
train_bpe_merges _ENCODE_MERGES train_bpe_encode train_split_no_leakage
""")
assign("__init__", "_PRIORITY _reorder_registry _reorder_call")
assign("_registry", "QUERIES ORACLE PHASED register _t _versioned_scratch")

MODULE_DOC = {
    "relational": "Relational core: scans, aggregations, joins, set ops, and the general SQL-expression surface (SURVEY §2.1–2.4, §2.6–2.8 extended).",
    "tpch": "The TPC-H query family — the classic analytic join/agg shapes, each hash-differentialed against its DuckDB twin.",
    "windows": "Window functions: ranking, frames, sessionization, EWMA, gaps-and-islands, and as-of joins (SURVEY §2.5 extended).",
    "events": "Batch event-time analytics over `events`: funnels, cohorts, attribution, time-series bucketing/interpolation.",
    "migration": "The reference pipeline's own surface: path/kv parsing (F1-F13), the 4-way router, and the flagship end-to-end migration differential (SURVEY §2.8, §3.1).",
    "text": "Text analysis over `documents`: quality, language-ID, fingerprinting, LM scoring, BM25/hybrid retrieval, PII scrubbing.",
    "dedup": "Deduplication over `documents`: exact, n-gram Jaccard, MinHash-LSH (one-shot + incremental index), SimHash, clustering.",
    "similarity": "Vector similarity over `embeddings`: KNN, LSH/IVF/PQ ANN (one-shot + incremental indexes), k-means, re-ranking.",
    "multimodal": "Multimodal binary-column plumbing: bytes, decode, frame sampling, perceptual-hash dedup.",
    "streaming": "Structured Streaming counterparts (§2.9 generalization): windows, joins, stateful counts, dedup.",
    "table": "The versioned lakehouse surface: MERGE INTO, time travel, CDC, MOR, OPTIMIZE, the DataSource connector, views and caches.",
    "stats": "Statistics and graph analytics: moments, tests, sketches, sampling, label propagation / PageRank / BFS.",
    "train": "Training-data pipeline ops: packing, chunking, decontamination, mixture weights, BPE, shard manifests, splits.",
}
ORDER = ["relational", "tpch", "windows", "events", "migration", "text",
         "dedup", "similarity", "multimodal", "streaming", "table",
         "stats", "train"]

# -------------------------------------------------- collect per-module text
unclassified = [n for n, _, _, _ in spans if n not in M]
assert not unclassified, f"unclassified units: {unclassified}"

# union of every top-level import line in the original file (preamble +
# mid-file noqa imports); each module gets the subset it references
tl_imports = []
tok_comment_lines = set()
for t in tokenize.generate_tokens(io.StringIO(src).readline):
    if t.type == tokenize.COMMENT and t.start[1] == 0:
        tok_comment_lines.add(t.start[0] - 1)
for i, l in enumerate(lines):
    s = l.rstrip("\n")
    if re.match(r"^(from |import )", s) and "__future__" not in s:
        s = re.sub(r"\s*#.*$", "", s)
        if s not in tl_imports:
            tl_imports.append(s)

blocks = {m: [] for m in ORDER}
init_blocks = []
for name, kind, a, b in spans:
    mod = M[name]
    body = []
    for i in range(a, b):
        if i in tok_comment_lines:
            continue
        s = lines[i]
        if re.match(r"^(from |import )", s):
            continue  # hoisted into the module header
        body.append(s)
    text = "".join(body).strip("\n")
    if not text:
        continue
    if mod == "__init__":
        init_blocks.append(text)
    elif mod == "_registry":
        continue  # hand-written below
    else:
        blocks[mod].append(text)


def relevel(t: str) -> str:
    t = re.sub(r"from \.(?=\w)", "from ..", t)
    t = re.sub(r"from \. import", "from .. import", t)
    return t


def emit(mod: str) -> str:
    body = "\n\n\n".join(blocks[mod]) + "\n"
    body = relevel(body)
    hdr = [f'"""{MODULE_DOC[mod]}\n\nSplit out of the monolithic queries.py (round 8); registration behavior\nis identical — every ``@register`` feeds the shared registry in\n``._registry`` and the public names re-export through the package root.\n"""',
           "", "from __future__ import annotations", ""]
    used = []
    for imp in tl_imports:
        imp2 = relevel(imp)
        aliases = []
        m = re.match(r"from \S+ import (.+)$", imp2)
        if m:
            for part in m.group(1).split(","):
                part = part.strip()
                aliases.append(part.split(" as ")[-1].strip())
        else:
            m2 = re.match(r"import (\S+)(?: as (\S+))?", imp2)
            aliases.append(m2.group(2) or m2.group(1).split(".")[0])
        if any(re.search(r"\b" + re.escape(al) + r"\b", body) for al in aliases):
            used.append(imp2)
    reg_names = [n for n in ("register", "_t", "_versioned_scratch",
                             "QUERIES", "ORACLE", "PHASED")
                 if re.search(r"\b" + n + r"\b", body)]
    # cross-module helper imports
    xmod = {"_segments": "relational", "_dot_sql": "similarity",
            "_SCALED_EL": "similarity", "_REV": "tpch", "_TOKS": "text",
            "_SHINGLES": "dedup", "_pack_bins_two_level": "train"}
    xi = []
    for n, src_mod in xmod.items():
        if src_mod != mod and re.search(r"\b" + n + r"\b", body):
            xi.append(f"from .{src_mod} import {n}")
    hdr += sorted(used)
    if reg_names:
        hdr.append(f"from ._registry import {', '.join(sorted(reg_names))}")
    hdr += sorted(xi)
    return "\n".join(hdr) + "\n\n\n" + body + "\n"


import os
os.makedirs(PKG, exist_ok=True)
for mod in ORDER:
    open(f"{PKG}/{mod}.py", "w").write(emit(mod))
    print(mod, len(emit(mod).splitlines()))
print("init blocks:", len(init_blocks))
open(f"{PKG}/_init_blocks.txt", "w").write("\n\n\n".join(init_blocks))
