"""Deduplication over `documents`: exact, n-gram Jaccard, MinHash-LSH (one-shot + incremental index), SimHash, clustering.

Split out of the monolithic queries.py (round 8); registration behavior
is identical — every ``@register`` feeds the shared registry in
``._registry`` and the public names re-export through the package root.
"""

from __future__ import annotations

from ..operators import dedup as D
from ..operators import text as TX
from ..util import ensure_parallelism, global_rank, tracked_persist
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ._registry import PHASED, _t, _versioned_scratch, register
from .text import _TOKS


_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(t)-2),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)


@register(
    "dedup_exact",
    r"""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM documents GROUP BY fp
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized fingerprint — one shuffle,
    the O(n) baseline every pipeline starts with."""
    return D.exact_dedup(_t(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, lang, len(s) AS n, unnest(s) AS shingle
           FROM sh WHERE len(s) > 0),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb,
             COUNT(*) AS inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT ia AS doc_a, ib AS doc_b,
           inter::DOUBLE / (na + nb - inter) AS jaccard
    FROM inter WHERE inter::DOUBLE / (na + nb - inter) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram-shingle Jaccard near-dup pairs via an inverted-index join
    blocked by language — never a cross join (operators/dedup.py)."""
    return D.jaccard_pairs(
        _t(spark, sf_dir, "documents"), block_col="lang", k=3, threshold=0.2
    )


@register(
    "dedup_prefix_filter",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, lang, len(s) AS n, unnest(s) AS shingle
           FROM sh WHERE len(s) > 0),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb,
             COUNT(*) AS inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT ia AS doc_a, ib AS doc_b,
           inter::DOUBLE / (na + nb - inter) AS jaccard
    FROM inter WHERE inter::DOUBLE / (na + nb - inter) >= 0.2
    """,
)
def dedup_prefix_filter(spark, sf_dir):
    """Prefix-filtered EXACT Jaccard join (operators/dedup.py:
    prefix_filter_pairs — the AllPairs/PPJoin candidate scheme): only each
    document's rare-first prefix of ``n - ceil(t*n) + 1`` shingles is
    indexed, because threshold-passing pairs must share a prefix token;
    candidates are verified row-locally against the full sets. The oracle
    is the NAIVE full-inverted-index threshold join — deliberately the
    same SQL as `dedup_ngram_jaccard` — so the differential proves the
    algorithmic shortcut is lossless, not just fast. This is the exact-
    similarity scale path the way LSH is the approximate one: at high
    thresholds the indexed fraction (and the candidate join) shrinks to a
    fraction of the naive join's."""
    return D.prefix_filter_pairs(
        _t(spark, sf_dir, "documents"), block_col="lang", k=3, threshold=0.2
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, lang, len(s) AS n, unnest(s) AS shingle
           FROM sh WHERE len(s) > 0),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb,
             COUNT(*) AS inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pairs AS (
      SELECT ia, ib FROM inter
      WHERE inter::DOUBLE / (na + nb - inter) >= 0.2),
    edges AS (
      SELECT ia AS src, ib AS dst FROM pairs
      UNION SELECT ib, ia FROM pairs),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst)
    SELECT id AS doc_id, MIN(lab) AS cluster FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: jaccard pairs -> connected components via
    iterative min-label propagation (operators/dedup.py
    connected_components) — the canonical keep-one-per-cluster step, and
    the engine's iterative-algorithm showpiece (driver-side loop, each
    round one distributed join+agg, early stop on a monotone invariant).
    The oracle computes the same fixpoint with a recursive CTE — a strong
    cross-formulation differential (iteration vs recursion)."""
    prs = D.jaccard_pairs(
        _t(spark, sf_dir, "documents"), block_col="lang", k=3, threshold=0.2
    )
    return D.connected_components(prs)


@register(
    "dedup_incremental_ingest",
    r"""
    WITH fp AS (
      SELECT doc_id, lang,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
      FROM documents),
    corpus AS (SELECT * FROM fp WHERE doc_id % 10 <> 0),
    batch  AS (SELECT * FROM fp WHERE doc_id % 10 = 0),
    fresh AS (
      SELECT b.doc_id, b.lang, b.f FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.f = b.f)),
    keep AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY f ORDER BY doc_id) AS rn
      FROM fresh)
    SELECT doc_id, lang FROM keep WHERE rn = 1
    """,
)
def dedup_incremental_ingest(spark, sf_dir):
    """INCREMENTAL dedup — the shape a production ingest actually runs
    daily: a new batch (here: doc_id % 10 = 0, standing in for today's
    crawl) deduped against the EXISTING corpus without reprocessing it.
    Two stages, both incremental-cost: (1) left-anti join of batch
    fingerprints against corpus fingerprints — at 100 TB the corpus side
    is a bucketed/sorted fingerprint index, so this never rescans corpus
    text, and the anti-join shuffles only the small batch; (2) within-
    batch keep-min dedup (partitioned window over the batch only). The
    companion batch operator is dedup_exact (full-corpus); this is its
    day-2 form — same fingerprint, rollup_incremental_merge's lesson
    applied to dedup."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "lang", TX.fingerprint("text").alias("f")
    )
    corpus = fp.where(F.col("doc_id") % 10 != 0)
    batch = fp.where(F.col("doc_id") % 10 == 0)
    fresh = batch.join(corpus.select("f"), "f", "left_anti")
    w = W.partitionBy("f").orderBy("doc_id")
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "lang")
    )


@register(
    "dedup_clusters_star",
    f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, lang, len(s) AS n, unnest(s) AS shingle
           FROM sh WHERE len(s) > 0),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb,
             COUNT(*) AS inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pairs AS (
      SELECT ia, ib FROM inter
      WHERE inter::DOUBLE / (na + nb - inter) >= 0.2),
    edges AS (
      SELECT ia AS src, ib AS dst FROM pairs
      UNION SELECT ib, ia FROM pairs),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst)
    SELECT id AS doc_id, MIN(lab) AS cluster FROM reach GROUP BY id
    """,
)
def dedup_clusters_star(spark, sf_dir):
    """The SAME clustering as dedup_clusters, computed by the large-star/
    small-star alternation (operators/dedup.py connected_components_star)
    instead of min-label propagation: O(log d) rounds vs O(d), the
    edge-rewriting formulation that holds up on billion-edge graphs. Both
    implementations are checked against the identical recursive-CTE
    closure oracle — a three-way differential (iteration vs edge-rewrite
    vs recursion) on one relation."""
    prs = D.jaccard_pairs(
        _t(spark, sf_dir, "documents"), block_col="lang", k=3, threshold=0.2
    )
    return D.connected_components_star(prs)


def _minhash_sigs_sql(src: str = "documents") -> str:
    """The MinHash(8)-signature CTE chain (toks/shs/ex/sigs), parameterized
    on the source relation so pipeline compositions can run the SAME
    signature oracle over an intermediate stage (e.g. the post-exact-dedup
    survivors) instead of the raw table. ``src='documents'`` reproduces the
    original fragment byte-for-byte."""
    return f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM {src}),
    shs AS (SELECT doc_id, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle
           FROM shs WHERE len(s) > 0),
    sigs AS (
      SELECT doc_id, ANY_VALUE(n_sh) AS n_sh,
             {', '.join(f"MIN(substring(md5(shingle), {4*i+1}, 4)) AS h{i}" for i in range(8))}
      FROM ex GROUP BY doc_id)
"""


def _minhash_bands_sql() -> str:
    """The 4-band × 2-row LSH banding + candidate/verify CTEs shared by
    the one-shot query's oracle and pipeline compositions (expects the
    ``sigs``/``shs`` CTEs from :func:`_minhash_sigs_sql` in scope)."""
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(h{2 * b} || '|' || h{2 * b + 1}) AS bv FROM sigs"
        for b in range(4)
    )
    return f"""
    bands AS (
      {bands}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, s, len(s) AS n FROM shs),
    verified AS (
      SELECT ia, ib,
             len(list_intersect(sa.s, sb.s))::DOUBLE /
             (sa.n + sb.n - len(list_intersect(sa.s, sb.s))) AS jaccard
      FROM cands JOIN sets sa ON sa.doc_id = ia
                 JOIN sets sb ON sb.doc_id = ib)
"""


_MINHASH_SIGS = _minhash_sigs_sql()


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_MINHASH_SIGS},
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(h{2*b} || '|' || h{2*b+1}) AS bv FROM sigs"
        for b in range(4))}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, s, len(s) AS n FROM shs),
    verified AS (
      SELECT ia, ib,
             len(list_intersect(sa.s, sb.s))::DOUBLE /
             (sa.n + sb.n - len(list_intersect(sa.s, sb.s))) AS jaccard
      FROM cands JOIN sets sa ON sa.doc_id = ia
                 JOIN sets sb ON sb.doc_id = ib)
    SELECT ia AS doc_a, ib AS doc_b, jaccard
    FROM verified WHERE jaccard >= 0.5
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(8) + LSH(4 bands x 2): candidate pairs from band-bucket joins,
    exact-Jaccard verification on candidates only — the 100 TB-safe near-dup
    path. md5-derived hashes keep the (probabilistic) result deterministic
    and engine-reproducible."""
    return D.minhash_lsh_dedup(_t(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_lsh_probe_index",
    f"""
    WITH {_MINHASH_SIGS},
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(h{2*b} || '|' || h{2*b+1}) AS bv FROM sigs"
        for b in range(4))}
    ),
    cands AS (
      SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS corpus_id
      FROM bands q JOIN bands c ON q.band = c.band AND q.bv = c.bv
      WHERE q.doc_id % 10 = 0
        AND c.doc_id % 10 <> 0 AND c.doc_id % 100 <> 11),
    sets AS (SELECT doc_id, s, len(s) AS n FROM shs),
    verified AS (
      SELECT query_id, corpus_id,
             len(list_intersect(sq.s, sc.s))::DOUBLE /
             (sq.n + sc.n - len(list_intersect(sq.s, sc.s))) AS jaccard
      FROM cands JOIN sets sq ON sq.doc_id = query_id
                 JOIN sets sc ON sc.doc_id = corpus_id)
    SELECT query_id, corpus_id, jaccard
    FROM verified WHERE jaccard >= 0.5
    ORDER BY query_id, corpus_id
    """,
)
def dedup_lsh_probe_index(spark, sf_dir):
    """Near-dup PROBE through the incremental LSH index
    (operators/lshindex.py) — the day-2 form of dedup_minhash_lsh, the
    way dedup_incremental_ingest is dedup_exact's: the corpus's banded
    MinHash rows live in a bucket-partitioned versioned table kept
    current through the base change feed (inserts AND deletes — band
    rows are exactly keyed, so a deleted doc's rows merge-delete from
    its pre-image), and "is anything in today's batch a near-dup of the
    corpus?" reads only the buckets the batch's bands hash into, then
    exact-verifies candidates against only THEIR corpus text. The
    builder exercises the full lifecycle (build on 8/10 of the corpus →
    insert-fold the %10==9 slice → delete-fold %100==11) and the oracle
    recomputes the same md5 bands + exact Jaccard relationally over the
    final corpus — index maintenance and probe both differentialed.
    Scale: probe cost is O(batch × bands) bucket reads + candidate
    verification, independent of corpus size."""
    return _lsh_probe_phase(spark, _lsh_index_build(spark, sf_dir))


def _lsh_index_build(spark, sf_dir):
    """Build phase (bench-timed separately): corpus table + index build +
    insert-fold + delete-fold — the amortized maintenance cost."""
    from ..operators import lshindex as LX
    from ..operators import table_format as TF

    root = _versioned_scratch("lshidx", sf_dir)
    base, idx = root + "/docs", root + "/idx"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    TF.create_table(
        docs.where(
            (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 10 != 9)
        ),
        base,
    )
    LX.build_lsh_index(spark, base, idx)
    TF.merge_into(
        spark, base, docs.where(F.col("doc_id") % 10 == 9),
        on="doc_id", when_matched=None,
    )
    LX.refresh_lsh_index(spark, idx)
    TF.delete_where(spark, base, F.col("doc_id") % 100 == 11)
    LX.refresh_lsh_index(spark, idx)
    return (sf_dir, idx)


def _lsh_probe_phase(spark, ctx):
    """Read phase: the bucket-pruned probe + candidate-only verify."""
    from ..operators import lshindex as LX

    sf_dir, idx = ctx
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return LX.probe_lsh_index(
        spark, idx, docs.where(F.col("doc_id") % 10 == 0), threshold=0.5
    ).orderBy("query_id", "corpus_id")


PHASED["dedup_lsh_probe_index"] = (_lsh_index_build, _lsh_probe_phase)


@register(
    "dedup_cluster_ingest",
    f"""
    WITH RECURSIVE {_MINHASH_SIGS},
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(h{2*b} || '|' || h{2*b+1}) AS bv FROM sigs"
        for b in range(4))}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
      WHERE a.doc_id % 100 <> 17 AND b.doc_id % 100 <> 17),
    sets AS (SELECT doc_id, s, len(s) AS n FROM shs),
    pairs AS (
      SELECT ia, ib FROM (
        SELECT ia, ib,
               len(list_intersect(sa.s, sb.s))::DOUBLE /
               (sa.n + sb.n - len(list_intersect(sa.s, sb.s))) AS jaccard
        FROM cands JOIN sets sa ON sa.doc_id = ia
                   JOIN sets sb ON sb.doc_id = ib)
      WHERE jaccard >= 0.5),
    edges AS (
      SELECT ia AS src, ib AS dst FROM pairs
      UNION SELECT ib, ia FROM pairs),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst)
    SELECT d.doc_id,
           COALESCE(r.cluster, d.doc_id) AS cluster
    FROM documents d
    LEFT JOIN (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id) r
      ON r.id = d.doc_id
    WHERE d.doc_id % 100 <> 17
    ORDER BY d.doc_id
    """,
)
def dedup_cluster_ingest(spark, sf_dir):
    """INCREMENTAL duplicate-cluster maintenance
    (operators/clusterindex.py): standing (doc_id, cluster) groups that
    absorb each change window by touching only the window and the
    clusters it bridges or splits — never re-clustering the settled
    corpus. The edge relation is deterministic (LSH band candidates
    verified at exact Jaccard >= 0.5), so incremental == from-scratch is
    an exact equality the oracle checks: it re-derives the same bands,
    verifies the same pairs among the FINAL corpus, and closes the
    components with a recursive CTE, singletons included. The builder
    clusters the %10!=9 slice, ingests the %10==9 batch (index probe
    finds batch↔corpus edges, a batch-local LSH pass finds batch↔batch,
    monotone relabeling merges bridged clusters), then — new in round 8 —
    folds an RTBF DELETE window (%100==17): incident edges merge out of
    the persisted edge side table and only the touched components'
    survivors are re-closed from stored edges."""
    from ..operators import clusterindex as CI
    from ..operators import lshindex as LX
    from ..operators import table_format as TF

    root = _versioned_scratch("clustidx", sf_dir)
    base, idx, cl = root + "/docs", root + "/idx", root + "/clusters"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    TF.create_table(docs.where(F.col("doc_id") % 10 != 9), base)
    LX.build_lsh_index(spark, base, idx)
    CI.build_cluster_index(spark, idx, cl, threshold=0.5)
    TF.merge_into(
        spark, base, docs.where(F.col("doc_id") % 10 == 9),
        on="doc_id", when_matched=None,
    )
    CI.ingest_clusters(spark, cl)
    TF.delete_where(spark, base, F.col("doc_id") % 100 == 17)
    CI.ingest_clusters(spark, cl)
    return CI.read_clusters(spark, cl).orderBy("doc_id")


@register(
    "streaming_lsh_ingest_probe",
    f"""
    WITH {_MINHASH_SIGS},
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(h{2*b} || '|' || h{2*b+1}) AS bv FROM sigs"
        for b in range(4))}
    ),
    cands AS (
      SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS corpus_id
      FROM bands q JOIN bands c ON q.band = c.band AND q.bv = c.bv
      WHERE q.doc_id % 10 = 0 AND c.doc_id % 10 <> 0),
    sets AS (SELECT doc_id, s, len(s) AS n FROM shs),
    verified AS (
      SELECT query_id, corpus_id,
             len(list_intersect(sq.s, sc.s))::DOUBLE /
             (sq.n + sc.n - len(list_intersect(sq.s, sc.s))) AS jaccard
      FROM cands JOIN sets sq ON sq.doc_id = query_id
                 JOIN sets sc ON sc.doc_id = corpus_id)
    SELECT query_id, corpus_id, jaccard
    FROM verified WHERE jaccard >= 0.5
    ORDER BY query_id, corpus_id
    """,
)
def streaming_lsh_ingest_probe(spark, sf_dir):
    """STREAMING ingest with standing index maintenance — the composition
    the index exists for: today's crawl arrives as a Structured Streaming
    feed (a source table's commit log via ``readStream.format("cbxtable")``),
    lands in the corpus through the exactly-once txn-marked sink, and the
    sink's ``post_batch`` hook folds each microbatch's change window into
    the LSH index (``refresh_lsh_index`` is idempotent — driven by the
    corpus VERSION, so a replayed batch whose merge no-ops also refreshes
    to a no-op, and a crash between commit and refresh is healed by the
    next batch's refresh). The probe then answers near-dup questions
    against the fully-ingested corpus; the oracle recomputes bands +
    exact Jaccard relationally over the same final state."""
    from ..operators import lshindex as LX
    from ..operators import table_format as TF
    from ..sources import cbx_datasource as DS
    from ..streaming.table_sink import stream_write_table

    scratch = _versioned_scratch("lshstream", sf_dir)
    src, dst, idx, ckpt = (
        scratch + "/src", scratch + "/docs",
        scratch + "/idx", scratch + "/ckpt",
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    TF.create_table(
        docs.where(
            (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 10 != 9)
        ),
        dst,
    )
    LX.build_lsh_index(spark, dst, idx)
    newdocs = docs.where(F.col("doc_id") % 10 == 9)
    TF.create_table(newdocs.where(F.col("doc_id") % 20 == 9), src)
    TF.insert_into(spark, src, newdocs.where(F.col("doc_id") % 20 == 19))
    DS.register(spark)
    stream = (
        spark.readStream.format("cbxtable")
        .option("startingVersion", "earliest")
        .load(src)
    )
    q = stream_write_table(
        stream, dst, ckpt, app_id="lsh_ingest", key="doc_id",
        post_batch=lambda sp: LX.refresh_lsh_index(sp, idx),
    )
    q.awaitTermination(600)
    return LX.probe_lsh_index(
        spark, idx, docs.where(F.col("doc_id") % 10 == 0), threshold=0.5
    ).orderBy("query_id", "corpus_id")


@register(
    "dedup_simhash",
    f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_TOKS}) AS t FROM documents),
    tok AS (SELECT doc_id, md5(unnest(t)) AS hex FROM toks),
    bits AS (SELECT doc_id, hex, unnest(generate_series(0, 63)) AS j FROM tok),
    v AS (
      SELECT doc_id, j,
             SUM(2 * ((CAST(strpos('0123456789abcdef',
                                   substring(hex, (j // 4) + 1, 1)) - 1 AS INT)
                       // (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                      WHEN 2 THEN 2 ELSE 1 END)) % 2) - 1) AS s
      FROM bits GROUP BY doc_id, j)
    SELECT doc_id,
           string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY j)
             AS simhash
    FROM v GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """64-bit SimHash signatures from md5 token bits — integer/string
    arithmetic only, bit-identical across engines."""
    return D.simhash64(_t(spark, sf_dir, "documents"))


_SIMHASH_SIG_CTES = f"""
    toks AS (
      SELECT doc_id, list_distinct({_TOKS}) AS t FROM documents),
    tok AS (SELECT doc_id, md5(unnest(t)) AS hex FROM toks),
    bits AS (SELECT doc_id, hex, unnest(generate_series(0, 63)) AS j FROM tok),
    v AS (
      SELECT doc_id, j,
             SUM(2 * ((CAST(strpos('0123456789abcdef',
                                   substring(hex, (j // 4) + 1, 1)) - 1 AS INT)
                       // (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                      WHEN 2 THEN 2 ELSE 1 END)) % 2) - 1) AS s
      FROM bits GROUP BY doc_id, j),
    sig AS (
      SELECT doc_id,
             string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY j)
               AS simhash
      FROM v GROUP BY doc_id)"""


@register(
    "dedup_simhash_pairs",
    f"""
    WITH {_SIMHASH_SIG_CTES},
    bands AS (
      SELECT doc_id, b, substring(simhash, b * 16 + 1, 16) AS bv
      FROM sig, unnest(generate_series(0, 3)) AS t(b)),
    cands AS (
      SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
    ham AS (
      SELECT ia, ib,
             len(list_filter(range(1, 65),
                 i -> substring(sa.simhash, CAST(i AS INT), 1)
                   <> substring(sb.simhash, CAST(i AS INT), 1))) AS hamming
      FROM cands JOIN sig sa ON sa.doc_id = ia
                 JOIN sig sb ON sb.doc_id = ib)
    SELECT ia AS doc_a, ib AS doc_b, CAST(hamming AS BIGINT) AS hamming
    FROM ham WHERE hamming <= 3
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS — completes the simhash path (r1-r3 only
    produced signatures). Candidate generation is EXACT by pigeonhole:
    within Hamming distance 3, at most 3 of the 4 16-bit bands can differ,
    so every qualifying pair shares a verbatim band — a bucket equi-join
    with zero recall loss (unlike MinHash banding). Bucket-aggregate pair
    expansion (no self-join), then a row-local 64-position compare on
    candidates only. Oracle replays signature, banding, and distance."""
    return D.simhash_hamming_pairs(_t(spark, sf_dir, "documents"))


@register(
    "dedup_keep_canonical",
    f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, lang, len(s) AS n, unnest(s) AS shingle
           FROM sh WHERE len(s) > 0),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb,
             COUNT(*) AS inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pairs AS (
      SELECT ia, ib FROM inter
      WHERE inter::DOUBLE / (na + nb - inter) >= 0.2),
    edges AS (
      SELECT ia AS src, ib AS dst FROM pairs
      UNION SELECT ib, ia FROM pairs),
    reach(id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
    clusters AS (SELECT id AS doc_id, MIN(lab) AS cluster FROM reach GROUP BY id)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    WHERE c.cluster IS NULL OR c.cluster = d.doc_id
    """,
)
def dedup_keep_canonical(spark, sf_dir):
    """The dedup operator a pipeline actually RUNS: the corpus with near-
    duplicates dropped — one canonical document (minimum id) kept per
    near-dup cluster, singletons passed through untouched. Composes
    jaccard_pairs -> connected_components -> a left join back onto the
    corpus. NO broadcast hint on the cluster table: it is |near-dup
    docs| rows, which on a dup-heavy crawl (the 100 TB design point,
    30-50% near-dup rates) grows linearly with the corpus — the same
    argument plan_audit's NO-HINT rule makes about LSH candidate pairs
    (r9 verdict). AQE broadcasts it when measured-small and shuffles
    when not. End-to-end differential: the oracle recomputes pairs,
    clusters (recursive CTE), and the keep-filter from scratch."""
    docs = _t(spark, sf_dir, "documents")
    prs = D.jaccard_pairs(docs, block_col="lang", k=3, threshold=0.2)
    clusters = D.connected_components(prs)
    keep = docs.join(clusters, "doc_id", "left").where(
        F.col("cluster").isNull() | (F.col("cluster") == F.col("doc_id"))
    )
    return keep.select("doc_id", "lang", "n_chars")


@register(
    "dedup_repeated_spans",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    segs AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(0, CAST(ceil(len(t) / 3.0) AS BIGINT) - 1),
               i -> struct_pack(
                 seg_idx := i,
                 seg := array_to_string(list_slice(t, i*3 + 1, i*3 + 3), ' ')
               ))) AS s
      FROM toks WHERE len(t) > 0),
    flat AS (SELECT doc_id, s.seg_idx AS seg_idx, s.seg AS seg FROM segs),
    canon AS (
      SELECT doc_id, seg_idx, seg,
             ROW_NUMBER() OVER (PARTITION BY seg
                                ORDER BY doc_id, seg_idx) AS rn
      FROM flat),
    keep AS (SELECT doc_id, seg_idx, seg FROM canon WHERE rn = 1),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             array_to_string(list(seg ORDER BY seg_idx), ' ') AS new_text
      FROM keep GROUP BY doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS n_segs FROM flat GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n_segs - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
           COALESCE(a.new_text, '') AS new_text
    FROM tot t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def dedup_repeated_spans(spark, sf_dir):
    """Sub-document span dedup — the C4/RefinedWeb repeated-line removal,
    at 3-token span granularity (the fixture has no line breaks): every
    globally duplicated span keeps ONLY its canonical first occurrence
    (min doc_id, then position) and is dropped everywhere else, then each
    document is reassembled from its surviving spans in order. This is
    the dedup documents-level fingerprinting can't do: boilerplate
    repeated across distinct pages is removed FROM INSIDE otherwise-unique
    documents. Scale anatomy: one shuffle on the span text (the honest
    global-dedup exchange — at 100 TB, span-hash instead of span text to
    shrink shuffle bytes), canonical choice is a per-span window,
    reassembly a per-doc sorted fold bounded by document length. The
    oracle replays canonicalization AND reassembly, so the differential
    covers the order-sensitive rebuild, not just the drop counts."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("t"),
    )
    nseg = F.ceil(F.size("t") / F.lit(3.0)).cast("int")
    seg_arr = F.when(
        F.size("t") > 0,
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("t"), i * F.lit(3) + 1, F.lit(3))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    flat = base.select(
        "doc_id", F.posexplode(seg_arr).alias("seg_idx", "seg")
    )
    flat = tracked_persist(flat)
    wseg = W.partitionBy("seg").orderBy("doc_id", "seg_idx")
    keep = (
        flat.withColumn("rn", F.row_number().over(wseg))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    agg = keep.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s.getField("seg"),
            ),
        ).alias("new_text"),
    )
    tot = flat.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segs")
    )
    return (
        tot.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            (
                F.col("n_segs") - F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
            ).alias("n_dropped"),
            F.coalesce(F.col("new_text"), F.lit("")).alias("new_text"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_containment_pairs",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3),
    ex AS (SELECT doc_id, lang, len(s) AS n, unnest(s) AS shingle
           FROM sh WHERE len(s) > 0),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.n AS na, b.n AS nb,
             COUNT(*) AS inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    directed AS (
      SELECT ia AS doc_a, ib AS doc_b, inter::DOUBLE / na AS containment
      FROM inter
      UNION ALL
      SELECT ib AS doc_a, ia AS doc_b, inter::DOUBLE / nb AS containment
      FROM inter)
    SELECT doc_a, doc_b, containment FROM directed WHERE containment >= 0.5
    """,
)
def dedup_containment_pairs(spark, sf_dir):
    """Directed shingle-containment pairs (operators/dedup.py
    containment_pairs): |A∩B|/|A| >= 0.5 — catches a short document
    embedded in a longer one, which symmetric Jaccard scores near
    |A|/|B| and misses. One undirected inverted-index join; both
    directions derived from each intersection row."""
    return D.containment_pairs(
        _t(spark, sf_dir, "documents"), block_col="lang", k=3, threshold=0.5
    )


@register(
    "dedup_cross_field",
    """
    WITH b AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer),
    g AS (
      SELECT c_custkey, c_nationkey, c_mktsegment, bal_band,
             CAST(COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                                 bal_band) AS BIGINT) AS block_size,
             CAST(MIN(c_custkey) OVER (PARTITION BY c_nationkey,
                                       c_mktsegment, bal_band)
                  AS BIGINT) AS canonical
      FROM b)
    SELECT c_custkey, c_nationkey, c_mktsegment, bal_band, block_size,
           canonical
    FROM g WHERE block_size > 1
    """,
)
def dedup_cross_field(spark, sf_dir):
    """Blocking-key entity resolution over structured fields: records
    agreeing on a composite normalized key (nation, segment, balance
    band) form candidate-duplicate blocks; each member is tagged with the
    block's canonical representative (min key) and size. This is the
    blocking stage every record-linkage pipeline runs before expensive
    pairwise comparison — partitioned windows only, so block computation
    shuffles once on the blocking key and scales with the largest block,
    not the table."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
    )
    w = W.partitionBy("c_nationkey", "c_mktsegment", "bal_band")
    g = c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        F.count(F.lit(1)).over(w).alias("block_size"),
        F.min("c_custkey").over(w).alias("canonical"),
    )
    return g.where(F.col("block_size") > 1)



@register(
    "fuzzy_join_part_names",
    """
    WITH probes AS (
      SELECT p_partkey AS probe_key,
             substring(p_name, 1, 4) || substring(p_name, 6) AS q
      FROM part WHERE p_partkey % 40 = 7
    ),
    cands AS (
      SELECT pr.probe_key, pr.q, p.p_partkey AS match_key, p.p_name
      FROM probes pr JOIN part p
        ON substring(pr.q, 1, 4) = substring(p.p_name, 1, 4)
       AND abs(length(pr.q) - length(p.p_name)) <= 2
    )
    SELECT probe_key, match_key,
           CAST(levenshtein(q, p_name) AS BIGINT) AS dist
    FROM cands
    WHERE levenshtein(q, p_name) <= 2
    ORDER BY probe_key, match_key
    """,
)
def fuzzy_join_part_names(spark, sf_dir):
    """Blocked fuzzy string join — the record-linkage / entity-resolution
    primitive: probe strings (part names with their 5th character
    deterministically dropped, the classic typo model) rejoin the catalog
    under edit distance ≤ 2. The plan is the standard two-phase shape
    that survives 100 TB: a BLOCKING equi-join on (4-char prefix) with a
    ±2 length guard — an ordinary shuffle hash join, NO all-pairs
    anywhere — then the expensive Wagner-Fischer levenshtein verify runs
    ONLY on in-block candidates (prefix blocking is exact for this typo
    model because the corruption site is past the prefix; general fuzzy
    pipelines add more block keys, not a wider join). Both engines run
    the identical unbounded DP, so distances hash-match exactly."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    probes = part.where(F.col("p_partkey") % 40 == 7).select(
        F.col("p_partkey").alias("probe_key"),
        F.concat(
            F.substring("p_name", 1, 4), F.expr("substring(p_name, 6)")
        ).alias("q"),
    )
    cands = probes.join(
        part,
        (F.substring("q", 1, 4) == F.substring("p_name", 1, 4))
        & (
            F.abs(F.length("q") - F.length("p_name")) <= 2
        ),
    )
    return (
        cands.select(
            "probe_key",
            F.col("p_partkey").alias("match_key"),
            F.levenshtein("q", "p_name").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= 2)
        .orderBy("probe_key", "match_key")
    )
