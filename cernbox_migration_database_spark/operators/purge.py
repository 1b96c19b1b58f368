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
