"""Third LLM-pipeline batch: benchmark decontamination and the
filter->dedup->shard curation/export pipeline. Both oracle-checked —
the shard hash is an md5 prefix both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_portable
from ..operators.curation import (
    curate,
    curation_summary,
    decontaminate,
    pack_sequences,
)
from ..operators.similarity import quantized_topk
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


@query(
    "pack_training_batches",
    oracle="""
    WITH n AS (SELECT source, doc_id,
                      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
               FROM documents),
    packed AS (SELECT source, doc_id, n_tokens,
                      CAST(floor(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        / 512.0) AS INT) AS batch_id
               FROM n)
    SELECT source, batch_id, CAST(COUNT(*) AS INT) AS n_docs,
           SUM(n_tokens) AS batch_tokens, MIN(doc_id) AS first_doc_id
    FROM packed GROUP BY source, batch_id
    """,
)
def pack_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget batch packing (concat-and-split layout): one
    window per source partition assigns each doc a batch, then a batch
    manifest aggregate. No global ordering — parallel across sources."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "text", "source", token_budget=512)
    return packed.groupBy("source", "batch_id").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_tokens").alias("batch_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


@query("similarity_quantized_int8")  # approximate by construction — rows-only
def similarity_quantized_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 to vec_id=0 over int8-quantized vectors — the
    4x-smaller memory-bandwidth path. Recall vs the exact float path is
    pinned in tests (cosine is scale-invariant so no dequantization)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    corpus = emb.join(F.broadcast(qvec))
    return quantized_topk(corpus, F.col("q"), k=10)


@query("events_approx_percentiles")  # sketch-based — rows-only
def events_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles of event value per
    type — the sketch path for 100 TB (exact percentiles need a full
    sort; the sketch is one mergeable aggregate). Accuracy vs the exact
    quantiles is pinned in tests."""
    ev = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx(
        "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)), 10000
    )
    return (
        ev.groupBy("event_type")
        .agg(pcts.alias("p"))
        .select(
            "event_type",
            round_portable(F.col("p")[0], 4).alias("p25"),
            round_portable(F.col("p")[1], 4).alias("p50"),
            round_portable(F.col("p")[2], 4).alias("p75"),
            round_portable(F.col("p")[3], 4).alias("p95"),
        )
    )
