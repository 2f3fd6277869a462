"""Tenth LLM-pipeline batch: embedding dimensionality reduction and
graph communities.

- embedding_random_projection — seeded Rademacher (±1) JL projection
  64→8, oracle-checked: the sign matrix derives from an LCG formula
  both engines can evaluate, so the DuckDB oracle rebuilds the exact
  matrix as list literals and must match bit-for-bit after portable
  rounding.
- embedding_pca_scores — distributed two-moment PCA (numpy eigh on one
  64×64 row), first two component scores per vector; rows-only (LAPACK
  eigenvectors are not SQL-expressible) with a numpy parity test in
  tests/test_projection.py.
- graph_community_labels — deterministic synchronous label propagation
  over the customer–supplier purchase graph; rows-only (iterative),
  structure pinned on handcrafted graphs in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from ..operators.projection import pca_fit, pca_transform, rademacher_matrix, random_project
from .registry import query

_RP_DIM, _RP_K = 64, 8
_RP_SIGNS = rademacher_matrix(_RP_DIM, _RP_K)


def _rp_oracle() -> str:
    """DuckDB oracle for the Rademacher projection: one list-literal dot
    product per output dim, same left-to-right fold order as Spark's
    ``aggregate``, rounded with the shared portable formula."""
    terms = []
    for j in range(_RP_K):
        lst = "[" + ",".join(str(int(s)) for s in _RP_SIGNS[j]) + "]"
        terms.append(
            f"floor(list_sum(list_transform(range(1, {_RP_DIM + 1}), i -> "
            f"CAST(embedding[i] AS DOUBLE) * ({lst}[i]))) * 1e6 + 0.5) / 1e6"
            f" AS p{j}"
        )
    return "SELECT vec_id, " + ", ".join(terms) + " FROM embeddings"


@query("embedding_random_projection", oracle=_rp_oracle())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→8 with a deterministic
    Rademacher matrix (Achlioptas 2001): a pure JVM-side narrow
    projection (zip_with + aggregate per output dim) — no shuffle, no
    Python, scan-bound at 100 TB. Distance preservation pinned in
    tests/test_projection.py."""
    emb = load_table_parallel(spark, sf_dir, "embeddings")
    out = random_project(emb, "embedding", dim=_RP_DIM, k=_RP_K, prefix="__rp")
    return out.select(
        "vec_id",
        *[
            round_portable(F.col(f"__rp{j}"), 6).alias(f"p{j}")
            for j in range(_RP_K)
        ],
    )


@query("embedding_pca_scores")  # LAPACK eigh — rows-only + parity test
def embedding_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA scores (first 2 components) for every embedding: sufficient
    statistics (n, Σx, Σxxᵀ) reduced fully distributed, eigh on the
    single 64×64 covariance row, projection JVM-side against the
    broadcast components. Parity vs numpy full PCA + explained-variance
    ordering pinned in tests/test_projection.py."""
    emb = load_table_parallel(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", dim=64, k=2)
    scores = pca_transform(emb, model, "embedding", k=2)
    return scores.select(
        "vec_id",
        round_portable(F.col("pc1"), 4).alias("pc1"),
        round_portable(F.col("pc2"), 4).alias("pc2"),
    )


@query("graph_community_labels")  # iterative LPA — rows-only
def graph_community_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities of the supplier co-purchase graph:
    suppliers are linked when they ship lines of the SAME order (the
    unipartite projection of the bipartite order–supplier graph — sync
    LPA oscillates on bipartite input, see the operator docstring;
    the projection is also the graph whose communities mean something:
    suppliers repeatedly bought together). The projection of a dense
    basket graph is near-complete, so only the top-5% heaviest edges
    (co-occurrence count ≥ the exact p95, a scale-relative threshold)
    are kept. Output: the 20 largest communities with size and
    smallest-member representative. Deterministic (min-label tie-break,
    fixed max rounds). Note: this synthetic corpus assigns suppliers to
    lineitems uniformly at random, so the correct output here is one
    giant community — recovery of real structure (cliques, bridges) is
    pinned on handcrafted graphs in tests/test_projection.py."""
    from ..operators.components import label_propagation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    copurchase = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    thr = copurchase.agg(
        F.expr("percentile(w, 0.95)").alias("__thr")
    )
    edges = (
        copurchase.join(F.broadcast(thr))
        .filter(F.col("w") >= F.col("__thr"))
        .select("src", "dst")
    )
    labels = label_propagation(edges, max_iterations=8)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"), F.min("v").alias("representative"))
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(20)
    )
