"""Eleventh LLM-pipeline batch: retrieval scoring and heuristic
quality-rule filtering.

- text_bm25_search — Okapi BM25 ranking of the documents table for a
  fixed keyword query, fully SQL-expressible and oracle-checked. The
  plan is the scale shape a distributed search scorer wants: corpus
  stats (N, avgdl) and per-term document frequencies reduce to ONE
  broadcast row, the per-doc term frequencies come from one
  explode+filter+aggregate pass, and the final score is a projection.
- text_gopher_rules — Gopher-style (Rae et al. 2021) document quality
  rules aggregated per source. Every rule is exact integer/boolean
  arithmetic (mean-word-length bounds are cross-multiplied instead of
  divided) so the oracle matches with no float tolerance at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from .registry import query

_BM25_TERMS = ("spark", "table", "merge")
_K1 = 1.2
_B = 0.75


def _bm25_oracle() -> str:
    terms_list = "[" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + "]"
    return f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS words
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(words)) AS avgdl FROM docs
    ),
    tf AS (
        SELECT doc_id, word AS term, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
        FROM (SELECT doc_id, unnest(words) AS word, len(words) AS dl FROM docs)
        WHERE word IN (SELECT unnest({terms_list}::VARCHAR[]))
        GROUP BY doc_id, word
    ),
    df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id,
               SUM(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({_K1} + 1.0)
                   / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * tf.dl / stats.avgdl))
               ) AS score
        FROM tf, stats
        JOIN df ON tf.term = df.term
        GROUP BY tf.doc_id
    )
    SELECT doc_id, floor(score * 1e4 + 0.5) / 1e4 AS score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """


@query("text_bm25_search", oracle=_bm25_oracle())
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for the query terms {spark, table, merge}.

    Scale shape: one explode+filter pass produces (doc, term, tf, dl)
    rows ONLY for query terms (the filter prunes before the aggregate,
    so the shuffle carries O(matching terms), not O(corpus tokens));
    corpus stats and the per-term df table reduce to broadcast-sized
    singletons; the score is a pure projection and the top-20 is
    TakeOrderedAndProject. Nothing driver-side scales with the corpus.
    """
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    docs = docs.select("doc_id", "words", F.size("words").alias("dl"))

    stats = docs.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        docs.select(
            "doc_id", "dl", F.explode("words").alias("term")
        )
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.any_value("dl").alias("dl"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    per_term = (
        tf.join(F.broadcast(df_tbl), on="term")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * F.col("tf")
                * F.lit(_K1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(_K1)
                    * (
                        F.lit(1.0 - _B)
                        + F.lit(_B) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("term_score"),
        )
    )
    return (
        per_term.groupBy("doc_id")
        .agg(round_portable(F.sum("term_score"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


_STOPWORDS = ("the", "be", "to", "of", "and", "a", "in", "that")


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source,
               string_split(text, ' ') AS words,
               length(replace(text, ' ', '')) AS n_word_chars
        FROM documents
    ),
    per_doc AS (
        SELECT source,
               len(words) AS wc,
               n_word_chars,
               len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]')))
                   AS n_alpha_words,
               len(list_filter(words,
                   x -> list_contains({list(_STOPWORDS)!r}, x))) AS n_stop
        FROM w
    ),
    rules AS (
        SELECT source,
               (wc BETWEEN 50 AND 100000) AS r_wordcount,
               (n_word_chars >= 3 * wc AND n_word_chars <= 10 * wc)
                   AS r_mean_word_len,
               (10 * n_alpha_words >= 8 * wc) AS r_alpha_ratio,
               (n_stop >= 2) AS r_stopwords
        FROM per_doc
    )
    SELECT source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN r_wordcount THEN 1 ELSE 0 END) AS pass_wordcount,
           SUM(CASE WHEN r_mean_word_len THEN 1 ELSE 0 END) AS pass_mean_word_len,
           SUM(CASE WHEN r_alpha_ratio THEN 1 ELSE 0 END) AS pass_alpha_ratio,
           SUM(CASE WHEN r_stopwords THEN 1 ELSE 0 END) AS pass_stopwords,
           SUM(CASE WHEN r_wordcount AND r_mean_word_len AND r_alpha_ratio
                         AND r_stopwords THEN 1 ELSE 0 END) AS pass_all
    FROM rules
    GROUP BY source
    ORDER BY source
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules per source: word-count bounds, mean
    word length in [3, 10], ≥80% words containing a letter, ≥2 stopword
    hits. All comparisons are cross-multiplied integer arithmetic
    (``n_chars >= 3*wc`` instead of ``n_chars/wc >= 3``), so the DuckDB
    oracle matches exactly — no float tolerance. One scan, one
    aggregate; at 100 TB this is scan-bound with map-side partials."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    # materialize the split ONCE in its own projection — referencing the
    # split expression from several size/filter expressions would
    # re-evaluate it per reference (CLAUDE.md performance trap #1)
    tok = docs.select(
        "source",
        F.split("text", " ").alias("words"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_word_chars"),
    )
    d = tok.select(
        "source",
        F.size("words").alias("wc"),
        "n_word_chars",
        F.size(F.filter("words", lambda x: x.rlike("[a-zA-Z]"))).alias(
            "n_alpha_words"
        ),
        F.size(
            F.filter("words", lambda x: x.isin(*_STOPWORDS))
        ).alias("n_stop"),
    )
    r = d.select(
        "source",
        F.col("wc").between(50, 100000).alias("r_wordcount"),
        (
            (F.col("n_word_chars") >= 3 * F.col("wc"))
            & (F.col("n_word_chars") <= 10 * F.col("wc"))
        ).alias("r_mean_word_len"),
        (10 * F.col("n_alpha_words") >= 8 * F.col("wc")).alias("r_alpha_ratio"),
        (F.col("n_stop") >= 2).alias("r_stopwords"),
    )

    def _cnt(c):
        return F.sum(F.when(F.col(c), 1).otherwise(0))

    return (
        r.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            _cnt("r_wordcount").alias("pass_wordcount"),
            _cnt("r_mean_word_len").alias("pass_mean_word_len"),
            _cnt("r_alpha_ratio").alias("pass_alpha_ratio"),
            _cnt("r_stopwords").alias("pass_stopwords"),
            F.sum(
                F.when(
                    F.col("r_wordcount")
                    & F.col("r_mean_word_len")
                    & F.col("r_alpha_ratio")
                    & F.col("r_stopwords"),
                    1,
                ).otherwise(0)
            ).alias("pass_all"),
        )
        .orderBy("source")
    )
