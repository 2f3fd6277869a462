"""PySpark-native analytics engine with the capability surface of
``jbhp9fysxx-droid/aws-callcenter-delta-lakehouse`` (reference at
/root/reference, read-only), re-expressed Spark-first.

The reference is a medallion lakehouse (CSV -> DQ validation -> Silver
Delta MERGE -> Gold aggregates -> Athena SQL). This package provides:

- ``session``    — tuned SparkSession factory (AQE, arrow, UTC).
- ``catalog``    — a table registry over parquet dirs (replaces Glue Catalog).
- ``sources``    — readers/writers + a Delta-MERGE-equivalent managed table
                   (pure DataFrame algebra; delta-spark is not installed).
- ``functions``  — validation rule engine + scalar helpers.
- ``operators``  — relational + LLM-data-pipeline operator library
                   (joins, windows, dedup, similarity, text analysis,
                   multimodal column plumbing).
- ``pipeline``   — the reference-faithful Silver/Gold medallion jobs
                   (parameterized by processing_date for determinism).
- ``plans``      — the named query registry consumed by __spark_entry__.
- ``streaming``  — Structured Streaming surface (watermarks, windows,
                   stateful dedup, foreachBatch upsert).
"""

__version__ = "0.1.0"
