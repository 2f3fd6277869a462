"""Fifth LLM-pipeline batch: substring-level dedup signals, content-
defined chunking, and cross-batch Bloom dedup.

- dedup_duplicated_ngram_spans — Lee et al. 2021 exact-substring-dedup
  signal: per-document fraction of word 7-grams repeated corpus-wide,
- text_cdc_chunks — content-defined chunking (hash-boundary words), the
  edit-stable alternative to fixed sliding windows,
- dedup_bloom_incremental — "was this document (probably) in yesterday's
  corpus?" via a fully-distributed sharded-bitmap Bloom filter.

All three oracle-checked against DuckDB at sf0.01 (the Bloom query via
the portable seeded-md5 positions since r5 — bloom semantics including
false positives reduce to a position-set membership join in SQL); the
no-false-negative and bounded-false-positive property tests in
tests/test_llm5.py cover the xxhash64 fast path too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from ..operators.bloom import bloom_build, bloom_probe
from ..operators.substrings import cdc_chunks, duplicated_ngram_spans
from .registry import query


@query(
    "dedup_duplicated_ngram_spans",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(l) - 5),
                                       i -> array_to_string(l[i:i+6], ' ')))
                   AS gram
          FROM w WHERE len(l) >= 7),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    per AS (SELECT g.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS dup_grams
            FROM g LEFT JOIN dup d USING (gram)
            GROUP BY g.doc_id)
    SELECT doc_id, n_grams, dup_grams,
           floor(dup_grams * 1.0 / n_grams * 1e6 + 0.5) / 1e6 AS dup_fraction
    FROM per
    """,
)
def dedup_duplicated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of each document is an exact repeat of text found
    elsewhere in the corpus (word 7-grams occurring >= 2 times) — the
    per-document signal of Lee et al. 2021. Gram build is array
    projection (no UDF); corpus counts are one map-side-combined
    aggregate; the gram->doc mapback is the only wide join."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    spans = duplicated_ngram_spans(docs, "doc_id", "text", n=7)
    return spans.select(
        "doc_id",
        "n_grams",
        "dup_grams",
        round_portable(F.col("dup_grams") / F.col("n_grams"), 6).alias(
            "dup_fraction"
        ),
    )


@query(
    "text_cdc_chunks",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    p AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(l) + 1),
                                       i -> {'pos': i, 'word': l[i]})) AS s
          FROM w),
    f AS (SELECT doc_id, s.pos AS pos, s.word AS word,
                 CASE WHEN CAST('0x' || substr(md5(s.word), 1, 8) AS BIGINT)
                           % 16 = 0
                      THEN 1 ELSE 0 END AS flag
          FROM p),
    c AS (SELECT doc_id, pos, word,
                 CAST(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos)
                      AS INT) AS chunk_id
          FROM f)
    SELECT doc_id, chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(MIN(pos) AS INT) AS start_pos,
           CAST(MAX(pos) AS INT) AS end_pos,
           string_agg(word, ' ' ORDER BY pos) AS chunk_text
    FROM c GROUP BY doc_id, chunk_id
    """,
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunks (expected 16 words) whose boundaries are
    stable under edits elsewhere in the document — posexplode, one
    window shuffle per doc, order-deterministic reassembly."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = cdc_chunks(docs, "doc_id", "text", divisor=16)
    return chunks.select(
        "doc_id",
        "chunk_id",
        "n_words",
        F.col("start_pos").cast("int").alias("start_pos"),
        F.col("end_pos").cast("int").alias("end_pos"),
        "chunk_text",
    )


@query(
    "dedup_bloom_incremental",
    oracle="""
    WITH seeds AS (SELECT unnest(range(4)) AS i),
    old AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
    oldpos AS MATERIALIZED (
        SELECT DISTINCT
               CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || text),
                                   1, 15) AS BIGINT) % 1048576 AS p
        FROM old, seeds
    ),
    newk AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 2 = 1 OR doc_id % 10 = 0),
    probe AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || text),
                                   1, 15) AS BIGINT) % 1048576 AS p
        FROM newk, seeds
    )
    SELECT pr.doc_id, bool_and(op.p IS NOT NULL) AS maybe_seen
    FROM probe pr LEFT JOIN oldpos op ON pr.p = op.p
    GROUP BY pr.doc_id ORDER BY pr.doc_id
    """,
)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a Bloom bitmap is built from the
    even-doc_id half of the corpus ("yesterday's data") entirely as a
    DataFrame aggregate, broadcast (128 KiB), and probed by the odd half
    ("today's batch") with zero batch-side shuffle of document payloads.
    No false negatives by construction; FP rate bounded by the property
    test. "Today's batch" is the odd half plus a re-ingested slice of
    the old half (every 10th even doc), so the positive path is
    exercised: re-ingested docs MUST probe true. Output:
    (doc_id, maybe_seen) for the new batch.

    ORACLE-CHECKED now (was rows-only through r4): the registry
    instance uses the PORTABLE seeded-md5 bit positions, and bloom
    semantics — INCLUDING false positives — reduce to "every probe
    position is in the old half's position set", which is one distinct
    + one left join + bool_and in SQL. The xxhash64 default stays the
    production fast path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0)
    )
    bloom = bloom_build(old, "text", portable=True)
    return bloom_probe(new, bloom, "text", "doc_id", portable=True).orderBy(
        "doc_id"
    )
