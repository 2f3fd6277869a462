"""Second LLM-pipeline batch: PII redaction, sliding-window chunking,
TF-IDF, Gopher-style repetition signals — the text-curation ops a
training-data pipeline runs corpus-wide. All oracle-checked (the regex
patterns are RE2-safe so DuckDB can mirror them verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..operators.text import (
    chunk_documents,
    redact_pii,
    repetition_signals,
    tfidf_top_terms,
)
from .registry import query


@query(
    "text_pii_redact",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{2}-\d{4}', '<SSN>', 'g'),
             '\d{3}[-. ]\d{3}[-. ]\d{4}', '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           + len(regexp_extract_all(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{2}-\d{4}'))
           + len(regexp_extract_all(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\d{3}-\d{2}-\d{4}', '<SSN>', 'g'),
               '\d{3}[-. ]\d{3}[-. ]\d{4}')) AS INT) AS n_redactions
    FROM documents
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails/SSNs/phones -> typed placeholders) with a
    redaction count — the compliance-audit projection. The synthetic
    corpus contains no PII (output = input, count = 0); constructed-PII
    coverage lives in unit tests; the oracle still pins the transform
    end-to-end."""
    return redact_pii(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_chunk_sliding",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    starts AS (SELECT doc_id, w,
                      unnest(range(1, greatest(len(w) - 5, 1) + 1, 15)) AS s,
                      generate_subscripts(range(1, greatest(len(w) - 5, 1) + 1, 15), 1) - 1
                        AS chunk_id
               FROM words)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(w[s:s+19], ' ') AS chunk_text,
           CAST(len(w[s:s+19]) AS INT) AS n_tokens
    FROM starts
    """,
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (20-word chunks, 5-word overlap,
    stride 15) — the training-example windowing primitive. One
    posexplode; chunk construction is array projection."""
    return chunk_documents(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        chunk_size=20,
        overlap=5,
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (SELECT doc_id, term,
                      floor((tf * ln(n_docs * 1.0 / df)) * 1e4 + 0.5) / 1e4 AS tfidf
               FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — corpus-wide term weighting in
    two aggregates + a broadcast scalar doc count; ranking on the
    ROUNDED score so engines can't disagree on the k-th row."""
    return tfidf_top_terms(
        load_table_parallel(spark, sf_dir, "documents"), "doc_id", "text", k=5
    )


@query(
    "text_repetition_signals",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    g AS (SELECT doc_id,
                 list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bi,
                 list_transform(range(1, len(w) - 1), i ->
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tri
          FROM words WHERE len(w) >= 3)
    SELECT doc_id,
           list_max(list_transform(list_distinct(bi),
             x -> len(list_filter(bi, y -> y = x)))) * 1.0 / len(bi)
             AS top_bigram_frac,
           1 - len(list_distinct(tri)) * 1.0 / len(tri) AS dup_trigram_frac
    FROM g
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: most-frequent-bigram fraction +
    duplicate-trigram fraction, per document. Exact integer counts, one
    portable double division each — pure array projection, no shuffle."""
    return repetition_signals(
        load_table_parallel(spark, sf_dir, "documents"), "doc_id", "text"
    )
