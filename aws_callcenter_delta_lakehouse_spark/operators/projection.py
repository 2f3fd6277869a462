"""Dimensionality reduction for embedding columns — random projection
(Johnson-Lindenstrauss) and principal component analysis.

Both are staples of a large-scale embedding pipeline (shrink vectors
before ANN indexing / clustering; decorrelate before quantization), and
both are expressible scale-safely:

- **Random projection** needs no training pass at all: a deterministic
  seeded ±1 (Rademacher) matrix, applied as a pure JVM-side projection
  (``zip_with`` + ``aggregate`` per output dimension). Achlioptas 2001
  shows ±1 entries satisfy the JL lemma like Gaussians do — and they
  stay exact in fixed-point/integer arithmetic, so the same matrix is
  reproducible in any engine from the LCG formula alone.

- **PCA** trains from the data, but the sufficient statistics are just
  the first two moments: ``(n, Σx, Σxxᵀ)`` — O(d²) numbers regardless
  of corpus size. We reduce those fully distributed (per-Arrow-batch
  numpy partials → element-wise sum), eigendecompose the d×d covariance
  inside a single-row ``mapInPandas`` (numpy ``eigh`` on ~64×64 — the
  one place Python runs, on ONE row), and project JVM-side against the
  broadcast component matrix. No ``.collect()``; nothing driver-side
  scales with the data. This is the same shape Spark MLlib's RowMatrix
  ``computePrincipalComponents`` uses (Gramian reduce + local eigh).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# LCG constants (glibc rand): public-domain arithmetic both Spark SQL
# and DuckDB reproduce exactly in BIGINT, so oracle SQL can rebuild the
# identical matrix without sharing code with the engine.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31


def rademacher_sign(flat_index: int) -> float:
    """±1 from the high bits of one LCG step (low LCG bits alternate
    with the index — never use them for parity)."""
    v = (_LCG_A * flat_index + _LCG_C) % _LCG_M
    return 1.0 if (v // 65536) % 2 == 0 else -1.0


def rademacher_matrix(dim: int, k: int) -> list[list[float]]:
    """k×dim deterministic ±1 matrix; row j is signs for output dim j."""
    return [
        [rademacher_sign(j * dim + i) for i in range(dim)] for j in range(k)
    ]


def _dot_literal(vec: Column, weights: list[float]) -> Column:
    """JVM-side dot product of a float-array column against a literal
    weight row: cast→double BEFORE multiplying (float*double drifts),
    left fold in element order (deterministic bit-for-bit)."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec, w, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    prefix: str = "p",
) -> DataFrame:
    """Append k projected columns ``{prefix}0..{prefix}{k-1}`` — the
    seeded Rademacher projection of ``vec_col``. Pure narrow projection:
    no shuffle, no Python, whole-stage-codegen-able; at 100 TB this is
    scan-bound."""
    mat = rademacher_matrix(dim, k)
    return df.withColumns(
        {f"{prefix}{j}": _dot_literal(F.col(vec_col), mat[j]) for j in range(k)}
    )


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, k: int = 2
) -> DataFrame:
    """ONE-row DataFrame with the fitted PCA model:
    ``mean array<double>, comps array<array<double>> (k×dim),
    offsets array<double> (comps·mean), explained array<double>``.

    Stage 1 (distributed): per-Arrow-batch numpy partials of
    ``(n, Σx, vec(Σxxᵀ))`` via ``mapInPandas`` — one output row per
    batch, width 1+d+d².
    Stage 2 (distributed): element-wise sum via posexplode + groupBy on
    the flat index — at most ``(1+d+d²) × n_batches`` tiny rows.
    Stage 3 (single row): numpy ``eigh`` of the d×d covariance inside
    ``mapInPandas`` — O(d³) once, data-size-independent.

    Eigenvector sign is pinned (largest-|entry| coordinate positive) so
    results are reproducible across numpy LAPACK builds.
    """
    d, kk = dim, k

    def _moments(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            yield pd.DataFrame(
                {
                    "n": [float(len(x))],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).reshape(-1).tolist()],
                }
            )

    partials = df.select(F.col(vec_col).alias("__v")).mapInPandas(
        _moments, "n double, s array<double>, ss array<double>"
    )
    flat = partials.select(
        F.posexplode(
            F.concat(F.array(F.col("n")), F.col("s"), F.col("ss"))
        ).alias("idx", "val")
    )
    summed = flat.groupBy("idx").agg(F.sum("val").alias("val"))
    one = summed.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "val"))),
            lambda s: s["val"],
        ).alias("m")
    )

    def _fit(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            for m in pdf["m"]:
                a = np.asarray(m, dtype=np.float64)
                n = a[0]
                s = a[1 : 1 + d]
                ss = a[1 + d :].reshape(d, d)
                mu = s / n
                cov = (ss - n * np.outer(mu, mu)) / (n - 1.0)
                w, v = np.linalg.eigh(cov)
                order = np.argsort(w)[::-1][:kk]
                comps = v[:, order].T.copy()
                for r in comps:
                    i = int(np.argmax(np.abs(r)))
                    if r[i] < 0:
                        r *= -1.0
                tot = float(w.sum()) or 1.0
                yield pd.DataFrame(
                    {
                        "mean": [mu.tolist()],
                        "comps": [comps.tolist()],
                        "offsets": [(comps @ mu).tolist()],
                        "explained": [(w[order] / tot).tolist()],
                    }
                )

    return one.mapInPandas(
        _fit,
        "mean array<double>, comps array<array<double>>, "
        "offsets array<double>, explained array<double>",
    )


def pca_transform(
    df: DataFrame,
    model: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    prefix: str = "pc",
) -> DataFrame:
    """Score every row against the broadcast one-row model: k centered
    dot products, all JVM-side (``score_j = x·comp_j − comp_j·mean``).
    The model row is broadcast — no shuffle of the corpus."""
    scored = df.join(F.broadcast(model))
    cols = {}
    for j in range(k):
        comp = F.col("comps")[j]
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), comp, lambda x, c: x.cast("double") * c
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols[f"{prefix}{j + 1}"] = dot - F.col("offsets")[j]
    return scored.withColumns(cols).drop("mean", "comps", "offsets", "explained")
