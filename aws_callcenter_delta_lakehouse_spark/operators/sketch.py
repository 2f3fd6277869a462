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
