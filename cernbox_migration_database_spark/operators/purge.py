"""Deletion propagation — right-to-be-forgotten over a multi-table corpus.

A deletion-request list (user ids, document ids) must be propagated to
every table that references the key, with an auditable account of what was
removed — the governance operation any training-data pipeline that ingests
user data eventually runs, and a close cousin of the reference's
audited-update shape (main.go:217-240: mutate + RECORD line per row).

Plan shape per table: ONE pass — left join against the broadcast deletion
list tags each row, a single aggregate counts total/tagged, and the purged
table is the corresponding left-anti join (Catalyst reuses the same
broadcast exchange for both). The deletion list is assumed
broadcast-sized; at 100 TB that holds (requests are per-entity, not
per-row) and the anti-join never shuffles the fact tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_deletions(
    tables: dict[str, tuple[DataFrame, str]],
    deletions: DataFrame,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Purge every table of rows whose key appears in ``deletions``.

    ``tables`` maps table name -> (DataFrame, key column); ``deletions``
    is a single-column DataFrame of keys (deduplicated here defensively).
    Returns (purged tables, audit DataFrame with one row per table:
    ``tbl, n_before, n_deleted, n_after``). Everything is lazy — callers
    write the purged tables and the audit in whatever order their sink
    requires.
    """
    del_col = deletions.columns[0]
    dl = F.broadcast(
        deletions.select(F.col(del_col).alias("__delkey")).distinct()
    )
    purged: dict[str, DataFrame] = {}
    audits = []
    for name, (df, key) in tables.items():
        purged[name] = df.join(
            dl, df[key] == dl["__delkey"], "left_anti"
        )
        tagged = df.join(
            dl.withColumn("__del", F.lit(1)),
            df[key] == dl["__delkey"],
            "left",
        )
        audits.append(
            tagged.agg(
                F.lit(name).alias("tbl"),
                F.count(F.lit(1)).alias("n_before"),
                F.coalesce(F.sum("__del"), F.lit(0)).alias("n_deleted"),
                (
                    F.count(F.lit(1)) - F.coalesce(F.sum("__del"), F.lit(0))
                ).alias("n_after"),
            )
        )
    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    return purged, audit


def purge_table_tree(
    spark,
    root: str,
    condition,
    mode: str = "cow",
    vacuum_after: bool = False,
    compact_after: bool = False,
    orphan_grace_s: float = 3600.0,
) -> dict:
    """Right-to-be-forgotten over a VERSIONED table and every branch of
    it — the compliance operation time travel makes subtle: a
    ``DELETE`` commit removes rows from the CURRENT snapshot only, while
    every earlier version directory (and any branch forked from one)
    still physically holds them. This runs ``delete_where(condition)``
    against main and each branch (targets with no matching rows are
    skipped — no empty commits) — branches RECURSIVELY, since a branch
    is a full table root that can carry branches of its own — then
    reports what RETENTION still holds:

    * ``targets`` — per-target rows deleted + the delete's version;
    * ``retained_versions`` — per-target version directories older than
      the delete that still contain the purged rows until vacuumed;
    * ``pinned_tags`` — tags pinning such versions: vacuum will NOT
      reclaim them, so compliance needs the tag released first (reported,
      never auto-deleted — a tag is a reproducibility promise);
    * with ``vacuum_after=True``, each target is vacuumed down to its
      post-delete snapshot (``keep_last=1``) and the reclaimed versions
      are reported.

    ``mode='cow'`` (default) rewrites the touched partitions — the purged
    rows leave the data files immediately, which is what a deletion
    request means. ``mode='mor'`` commits tombstones instead (O(deleted
    rows), but the bytes REMAIN in the current version's files until the
    next OPTIMIZE compacts them) — the result records
    ``physical=False`` so the caller knows a compaction is still owed.
    ``compact_after=True`` settles that debt in the same call: every
    MOR target that committed deletion vectors gets an OPTIMIZE commit
    (``table_format.compact``) that materializes the tombstones — the
    purged bytes leave the CURRENT snapshot's data files — and the
    result flips to ``physical=True`` with the compaction versions in
    ``compacted``. Pair with ``vacuum_after=True`` for bytes-gone-on-
    disk including the pre-delete snapshots. A second purge pass stays a
    no-op: zero matches commit nothing, so nothing re-compacts.
    Scale: per target one partition-pruned delete; the audit counts ride
    the deletes' own plans; compaction (opt-in) is the only step that
    rewrites beyond the touched partitions.
    """
    from . import table_format as TF

    # Walk the WHOLE branch tree (branches-of-branches hold the purged
    # rows too) — the walk lives in table_format so purge and the
    # maintenance planner can never drift on branch resolution.
    targets = dict(TF.walk_branch_tree(root))
    report: dict = {
        "targets": {},
        "retained_versions": {},
        "pinned_tags": {},
        "physical": mode == "cow" or compact_after,
        "vacuumed": {},
        "compacted": {},
    }
    for name, troot in targets.items():
        n = TF.read_table(spark, troot).where(condition).count()
        if n == 0:
            # nothing in the CURRENT snapshot — but earlier versions may
            # still hold previously-deleted matches, so retention is
            # reported (and reclaimed) for zero-match targets too
            v = TF.current_version(troot)
            report["targets"][name] = {"n_deleted": 0, "version": None}
        else:
            v = TF.delete_where(spark, troot, condition, mode=mode)
            report["targets"][name] = {"n_deleted": n, "version": v}
            if mode == "mor" and compact_after:
                # materialize the deletion vectors: the purged bytes
                # leave the current snapshot's data files
                report["compacted"][name] = TF.compact(spark, troot)
                v = report["compacted"][name]
        # vacuum FIRST (when requested), then report retention — so
        # retained_versions always describes the FINAL state of this
        # call: with vacuum_after=True the property test caught the old
        # order listing directories the same call had just reclaimed
        # (a compliance reader would chase ghosts).
        if vacuum_after:
            report["vacuumed"][name] = TF.vacuum(
                troot, keep_last=1, remove_orphans=True,
                orphan_grace_s=orphan_grace_s,
            )
        # history() log entries survive vacuum — filter to version dirs
        # that still physically exist, else the report claims already-
        # reclaimed directories "still contain the purged rows"
        older = [
            e["version"]
            for e in TF.history(troot)
            if e["version"] < v
            and os.path.isdir(TF._vdir(troot, e["version"]))
        ]
        if older:
            report["retained_versions"][name] = older
        pinned = [t for t in TF.list_tags(troot) if t["version"] < v]
        if pinned:
            report["pinned_tags"][name] = [t["name"] for t in pinned]
    return report
