"""PySpark-native analytics engine with the capabilities of
labkode/cernbox-migration-database (reference: /root/reference/main.go),
generalized into a large-scale data-pipeline operator set.

The reference is a Go ETL job: scan with pushdown -> external lookup join ->
semi-structured parse -> path derivation -> 4-way router -> merge/update sink
with audit + dead-letter streams (SURVEY.md). This package re-expresses those
semantics Spark-first: declarative DataFrame plans optimized by Catalyst, with
set-at-a-time joins replacing per-row subprocess lookups.

Layout:
    session    - SparkSession factory (AQE, UTC, arrow, tuned shuffles)
    sources/   - fixture/table catalog, generic readers
    functions/ - scalar expression layer (paths, key=value parse, exact-decimal aggs)
    operators/ - router, enrichment joins, merge sink, dedup, similarity, text
    plans/     - composed end-to-end pipelines (the migration job)
    streaming/ - Structured Streaming counterparts of the event operators
"""

__version__ = "0.1.0"
