"""sqlite_cdc_spark — a PySpark-native CDC analytics engine.

A from-scratch re-expression of the capabilities of kevinconway/sqlite-cdc
(reference at /root/reference, Go, Apache-2.0) on Spark's execution model:

- the canonical change record (table, timestamp, operation, before, after)
  becomes a DataFrame schema (:mod:`sqlite_cdc_spark.model`),
- bootstrap snapshots become partitioned parquet scans projected to
  synthetic INSERT changes (:mod:`sqlite_cdc_spark.bootstrap`),
- the trigger-fed change log becomes an append-only source drained in
  ordered batches or consumed by Structured Streaming
  (:mod:`sqlite_cdc_spark.log`, :mod:`sqlite_cdc_spark.streaming`),
- downstream CDC analytics (snapshot diff, compaction, as-of reads) live in
  :mod:`sqlite_cdc_spark.derive`,
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) live in :mod:`sqlite_cdc_spark.pipeline`.

Everything is declarative DataFrame/SQL so Catalyst owns the physical plan;
no RDDs, no driver-side row loops in any hot path.
"""

__version__ = "0.1.0"
