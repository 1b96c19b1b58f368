from .asof import asof_join
from .dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash64,
)
from .enrich import external_service_lookup, lookup_join
from .merge import (
    assert_exactly_one,
    dbapi_upsert_writer,
    jdbc_upsert_writer,
    merge_updates,
)
from .keyindex import (
    create_key_index,
    point_lookup,
    refresh_key_index,
)
from .matview import (
    create_aggregate_view,
    read_aggregate_view,
    refresh_aggregate_view,
)
from .multimodal import decode_media, documents_as_media, frame_sample_plan
from .table_format import (
    compact,
    create_table,
    current_version,
    history,
    merge_into,
    read_changes,
    read_table,
    stream_merge_into,
    vacuum,
    version_at,
)
from .router import DECISIONS, route_shares, with_decision
from .similarity import (
    ann_ivf,
    cosine_near_dup_pairs,
    dot_exact,
    kmeans_train,
    knn_bruteforce,
    lsh_bucket,
    seed_centroids,
    with_lsh_bucket,
    with_norm,
)
from .text import fingerprint, langid_heuristic, normalize_text, tokens, with_quality

__all__ = [
    "DECISIONS",
    "with_decision",
    "route_shares",
    "lookup_join",
    "external_service_lookup",
    "merge_updates",
    "assert_exactly_one",
    "dbapi_upsert_writer",
    "jdbc_upsert_writer",
    "asof_join",
    "exact_dedup",
    "jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_lsh_dedup",
    "simhash64",
    "ann_ivf",
    "kmeans_train",
    "knn_bruteforce",
    "seed_centroids",
    "cosine_near_dup_pairs",
    "dot_exact",
    "with_norm",
    "lsh_bucket",
    "with_lsh_bucket",
    "tokens",
    "normalize_text",
    "fingerprint",
    "with_quality",
    "langid_heuristic",
    "documents_as_media",
    "decode_media",
    "frame_sample_plan",
    "compact",
    "create_aggregate_view",
    "create_key_index",
    "refresh_key_index",
    "point_lookup",
    "refresh_aggregate_view",
    "read_aggregate_view",
    "create_table",
    "current_version",
    "history",
    "merge_into",
    "read_changes",
    "read_table",
    "stream_merge_into",
    "vacuum",
    "version_at",
]
