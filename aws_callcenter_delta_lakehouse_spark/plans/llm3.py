"""Third LLM-pipeline batch: benchmark decontamination and the
filter->dedup->shard curation/export pipeline. Both oracle-checked —
the shard hash is an md5 prefix both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.curation import curate, curation_summary, decontaminate
from .registry import query


@query(
    "decontaminate_benchmark_overlap",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(w) >= 5
                   THEN list_transform(range(1, len(w) - 3),
                        i -> array_to_string(w[i:i+4], ' '))
                   ELSE [] END) AS gs
          FROM words),
    bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 20 = 0),
    train AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 20 <> 0)
    SELECT t.doc_id, CAST(COUNT(*) AS INT) AS n_overlap_grams
    FROM train t JOIN bench USING (gram)
    GROUP BY t.doc_id
    """,
)
def decontaminate_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training decontamination: flag corpus documents sharing any
    5-gram with a held-out benchmark set (here: every 20th doc stands in
    for the eval suite). The benchmark gram set is distinct'd and
    broadcast — the only shuffle is the per-doc overlap count."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(train, bench, "doc_id", "text", n=5)


@query(
    "curation_pipeline",
    oracle="""
    WITH filt AS (
      SELECT doc_id, text, len(text) AS n_chars
      FROM documents
      WHERE lang = 'en'
        AND len(string_split(text, ' ')) >= 30
        AND len(text) BETWEEN 100 AND 20000),
    dedup AS (
      SELECT md5(text) AS h, MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars
      FROM filt GROUP BY md5(text)),
    sharded AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % 16 AS INT) AS shard,
             n_chars
      FROM dedup)
    SELECT shard, CAST(COUNT(*) AS INT) AS n_docs,
           SUM(n_chars) AS total_chars, MIN(doc_id) AS min_doc_id
    FROM sharded GROUP BY shard
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training export: language + length filters (pushed to
    the scan), exact dedup on md5(text) keeping the lowest doc_id (the
    shuffle carries 32-char hashes, never document text), deterministic
    md5-prefix shard assignment, per-shard manifest."""
    docs = load_table(spark, sf_dir, "documents")
    return curation_summary(curate(docs, "doc_id", "text"))
