"""Count-min sketch over a token stream — mergeable heavy-hitter counts.

The CMS (Cormode & Muthukrishnan 2005) is THE sketch for distributed
frequency estimation: each partition's counter grid is a plain sum, so
the whole sketch is one ``groupBy(row, bucket).count`` — mergeable by
construction, no custom state. Estimates are biased UP (collisions only
add), and ``min`` over ``depth`` independent rows bounds the error at
``eps * N`` with probability ``1 - delta`` (eps = e/width,
delta = e^-depth).

Everything is seeded ``xxhash64`` — deterministic across runs and
cluster sizes, which is what makes the probe query testable at all.

At 100 TB: the sketch is ``depth x width`` longs (a few KB) regardless
of corpus size — it reduces on the executors and broadcasts back for
probing. Probing N candidate terms is a projection + broadcast join,
never a shuffle of the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, term_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the (row, bucket, cnt) counter grid for one token per input
    row. One explode by ``depth`` (cheap: depth structs per token) and
    one hash aggregate over at most ``depth*width`` groups — partial
    aggregation compresses each partition to sketch size before the
    (tiny) shuffle."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                F.pmod(F.xxhash64(F.col(term_col), F.lit(d)), width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_probe(
    sketch: DataFrame, terms: Sequence[str], depth: int = 4, width: int = 1024
) -> DataFrame:
    """Estimate counts for ``terms``: re-hash each probe term with the
    same seeds, broadcast-join against the sketch grid, and take the
    row-wise MIN. Terms the sketch never saw estimate as 0 (their cell
    may still collide -> the estimate stays an upper bound)."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame([(t,) for t in terms], ["term"])
    return cms_probe_df(sketch, probes, "term", depth=depth, width=width)


def cms_probe_df(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Probe estimates for an arbitrary DataFrame of terms (one column
    ``term_col``). Same broadcast grid join as :func:`cms_probe`, but the
    probe side can be distributed — e.g. the corpus vocabulary itself
    when harvesting heavy-hitter candidates."""
    if term_col != "term":
        probes = probes.select(F.col(term_col).alias("term"))
    cells = probes.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(F.xxhash64(F.col("term"), F.lit(d)), width).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("term", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    toks: DataFrame,
    term_col: str = "term",
    phi: float = 0.02,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Exact phi-heavy-hitters via the classic CMS two-pass algorithm
    (Cormode & Muthukrishnan 2005, §4): pass 1 builds the sketch; the
    candidate set is every term whose ESTIMATE >= phi*N — a guaranteed
    SUPERSET of the true heavy hitters because CMS errors are one-sided
    (collisions only inflate) — and pass 2 exact-counts only the
    candidates and keeps those whose TRUE count >= phi*N. The output is
    therefore exactly the true heavy hitters no matter how the hash
    buckets collide, which is what makes this oracle-checkable against
    a plain GROUP BY ... HAVING.

    Scale shape: the sketch and the candidate list are KB-sized and
    broadcast; the only corpus-wide shuffles are the sketch's partial
    aggregation (<=depth*width groups) and a hash aggregate over the
    candidate-filtered stream. N is read off the sketch itself (each
    row of the grid sums to N), so no extra count pass.
    """
    toks = toks.select(F.col(term_col).alias("term"))
    # tiny (<= depth*width rows) and consumed three times below —
    # materialize once instead of re-scanning the corpus per consumer
    sketch = cms_build(toks, "term", depth=depth, width=width).localCheckpoint(
        eager=False
    )
    total = (
        sketch.filter(F.col("row") == 0)
        .agg(F.sum("cnt").alias("n"))
        .withColumn("__k", F.lit(1))
    )
    vocab = toks.distinct()
    candidates = (
        cms_probe_df(sketch, vocab, "term", depth=depth, width=width)
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(total), "__k")
        .filter(F.col("est_count") >= F.lit(phi) * F.col("n"))
        .select("term")
    )
    return (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("exact_count"))
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(total), "__k")
        .filter(F.col("exact_count") >= F.lit(phi) * F.col("n"))
        .select("term", "exact_count")
    )
