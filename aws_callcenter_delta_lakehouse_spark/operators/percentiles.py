"""Exact distributed percentiles without a global sort.

``approx_percentile`` answers fast but approximately;
``F.median``/``percentile`` plan a full sort of every group. The
two-pass bracket-and-rank pattern gets the EXACT answer at a scan's
cost: pass 1 computes, per group, the row count and an approximate
bracket that provably contains the target rank (the sketch's rank
error is bounded by ``n / accuracy``, so a ±5-percentile bracket at
accuracy 10000 has ~500x margin); pass 2 counts rows below the
bracket and ranks only the rows INSIDE it — a window over ~10% of the
data per group, never a global sort. The k-th smallest value is then
read off by rank arithmetic.

This is how you take an exact median of 100 TB: the expensive ordering
work collapses onto the bracket slice, everything else is one extra
aggregate on the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_percentile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float = 0.5,
    accuracy: int = 10000,
    bracket: float = 0.05,
    out_col: str = "exact_pct",
) -> DataFrame:
    """Exact per-group p-th percentile, defined as the k-th smallest
    value with k = floor(p * (n - 1)) + 1 (1-based; for p=0.5 and even
    n this is the LOWER middle element — the discrete percentile, no
    interpolation, so the result is always a value that occurs and is
    engine-portable with no float arithmetic).

    Returns one row per group: (group_col, n_rows, out_col).
    """
    lo_q = max(p - bracket, 0.0)
    hi_q = min(p + bracket, 1.0)
    stats = df.groupBy(group_col).agg(
        F.count(value_col).alias("__n"),
        F.approx_percentile(
            value_col, F.array(F.lit(lo_q), F.lit(hi_q)), F.lit(accuracy)
        ).alias("__br"),
    )
    j = df.select(group_col, value_col).join(F.broadcast(stats), group_col)
    v = F.col(value_col)
    lo, hi = F.col("__br")[0], F.col("__br")[1]
    # rows strictly below the bracket — one aggregate, same scan shape
    below = (
        j.filter(v < lo)
        .groupBy(group_col)
        .agg(F.count("*").alias("__n_below"))
    )
    in_bracket = j.filter((v >= lo) & (v <= hi))
    w = Window.partitionBy(group_col).orderBy(v)
    ranked = in_bracket.withColumn("__rn", F.row_number().over(w))
    k = (F.floor(F.lit(p) * (F.col("__n") - 1)) + 1).cast("long")
    return (
        ranked.join(F.broadcast(below), group_col, "left")
        .filter(
            F.col("__rn")
            == k - F.coalesce(F.col("__n_below"), F.lit(0))
        )
        .select(
            group_col,
            F.col("__n").alias("n_rows"),
            v.alias(out_col),
        )
    )
