"""Eighth batch: graph k-core and percentile-driven curation.

- graph_kcore_suppliers — k-core of the customer–supplier purchase
  graph (iterative peel; rows-only — peeling has no tractable SQL
  oracle; exact structure pinned on handcrafted graphs in
  tests/test_kcore.py),
- curation_quality_percentile_filter — keep documents above the corpus
  p75 of the model quality score (exact interpolated percentile),
  oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from ..operators.components import kcore
from ..operators.text import hashed_linear_quality
from .registry import query


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled k-core peel as chained CTEs (the ``hilbert_oracle_sql``
    pattern: DuckDB recursive CTEs can't aggregate in the recursive
    term, so unroll one degree-filter round per CTE). Peeling is a
    monotone fixpoint — once converged, extra rounds are no-ops, so
    ``rounds`` only needs to exceed the peel depth (measured 2 at
    sf0.01; 8 gives 4x margin)."""
    # AS MATERIALIZED is load-bearing: each round references the
    # previous one 3x, and inlined CTEs would re-evaluate the whole
    # chain 3^rounds times (observed as a too-many-open-files blowup)
    parts = [
        """
    e0 AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
            SELECT o.o_custkey AS a, l.l_suppkey + 10000000 AS b
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            UNION ALL
            SELECT l.l_suppkey + 10000000 AS a, o.o_custkey AS b
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ) WHERE a != b
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    d{i} AS (SELECT a, COUNT(*) AS deg FROM e{i - 1} GROUP BY a),
    k{i} AS MATERIALIZED (SELECT a FROM d{i} WHERE deg >= {k}),
    e{i} AS MATERIALIZED (
        SELECT e.a, e.b FROM e{i - 1} e
        JOIN k{i} ka ON e.a = ka.a
        JOIN k{i} kb ON e.b = kb.a
    )"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT a AS vertex, COUNT(*) AS degree
    FROM e{rounds} GROUP BY a ORDER BY vertex"""
    )


@query("graph_kcore_suppliers", oracle=_kcore_oracle_sql(k=8, rounds=8))
def graph_kcore_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-core of the (customer, supplier) purchase graph: the densely
    cross-trading kernel. Edges = distinct customer->supplier pairs
    from orders x lineitem; supplier ids offset into their own vertex
    range exactly as in pagerank_suppliers.

    ORACLE-CHECKED now (was rows-only through r4): iterative peeling is
    a monotone fixpoint, so a fixed unroll deep enough to converge is
    exact — the engine's convergence-detected loop diffs against 8
    unrolled DuckDB rounds."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(10_000_000)).alias("dst"),
        )
        .distinct()
    )
    return kcore(edges, k=8).orderBy("vertex")


@query(
    "curation_quality_percentile_filter",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    s AS (SELECT doc_id,
                 list_transform(l, x ->
                    (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2001
                     - 1000) / 1000.0) AS wts,
                 len(l) AS n
          FROM w),
    scored AS (SELECT doc_id,
                      floor((1.0 / (1.0 + exp(-(list_sum(wts) / n))))
                            * 1e4 + 0.5) / 1e4 AS keep_prob
               FROM s),
    thr AS (SELECT quantile_cont(keep_prob, 0.75) AS p FROM scored)
    SELECT doc_id, keep_prob FROM scored, thr WHERE keep_prob >= p
    """,
)
def curation_quality_percentile_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Model-score curation with a DATA-DEPENDENT threshold: keep the
    top quartile by hashed-classifier keep-probability. The exact p75
    is one scalar aggregate broadcast back over the scored scan —
    ranked filtering without a global sort. Scores are rounded to 1e-4
    BEFORE the percentile so the interpolated threshold sits strictly
    between representable score values on both engines."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    scored = hashed_linear_quality(docs, "doc_id", "text", buckets=2001).select(
        "doc_id", round_portable(F.col("keep_prob"), 4).alias("keep_prob")
    )
    thr = scored.agg(F.percentile("keep_prob", 0.75).alias("p"))
    return (
        scored.join(F.broadcast(thr))
        .where(F.col("keep_prob") >= F.col("p"))
        .select("doc_id", "keep_prob")
    )
