"""Seeded percentile-bootstrap confidence intervals (Efron 1979).

The resampling pattern for distributed data: per group, B synthetic
resamples of the group's n values, each drawn by a HASH of
(group, seed, b, i) instead of an RNG — deterministic, reproducible,
and (in portable mode) replayable by a SQL oracle, the same
design-for-determinism trade the DP Laplace draw makes
(``operators/privacy.py``). The statistic here is the mean; the CI is
the percentile interval over the B resample means, picked by EXPLICIT
rank selection (no interpolation) so engines can never disagree on a
boundary.

Scale: one shuffle assembles each group's sorted value array (bounded
by the caller's aggregation window — e.g. 30 daily aggregates, never
raw rows); the B×n resample is a JVM-side nested higher-order
expression per group row — embarrassingly parallel across groups, no
Python, no driver loop, no data movement proportional to B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO60 = float(2**60)
_SEP = "\x1f"


def _draw_index(g, seed: int, b, i, n, portable: bool):
    """Resample index in [1, n]: hash(group, seed, b, i) mod n + 1.
    The group component coalesces NULL to a sentinel — ``concat_ws``
    would silently drop it (Spark) while a ``||`` SQL mirror
    propagates, and a NULL group must not share draws with the
    empty-string group. Mirror NULLable groups in SQL with
    ``coalesce(CAST(g AS VARCHAR), chr(0) || 'NULL')``."""
    key = F.concat_ws(
        _SEP,
        F.coalesce(g.cast("string"), F.lit("\x00NULL")),
        F.lit(str(int(seed))),
        b.cast("string"),
        i.cast("string"),
    )
    if portable:
        h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    else:
        # pmod, not abs(%): abs(Long.MIN) overflows (ANSI throws at
        # probability 2^-64); pmod maps negatives into [0, n) directly
        h = F.xxhash64(key)
    return (F.pmod(h, n) + 1).cast("int")


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    B: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Per-group percentile-bootstrap CI of the MEAN: B hash-seeded
    resamples of the group's n values, means folded left-to-right in
    draw order (i = 1..n — the order a mirroring SQL replays), CI =
    the resample means of rank ``floor(B*alpha/2) + 1`` and
    ``B - floor(B*alpha/2)`` (ascending). Feed pre-aggregated /
    integer-valued doubles for cross-engine exactness (trap 13).
    Returns group, n, mean, ci_lo, ci_hi."""
    if B < 2:
        raise ValueError(f"B must be >= 2, got {B}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    k_lo = int(B * alpha / 2) + 1
    k_hi = B - int(B * alpha / 2)
    grouped = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.array_sort(
            F.collect_list(F.col(value_col).cast("double"))
        ).alias("xs")
    )
    sized = grouped.select(
        "__g", "xs", F.size("xs").cast("bigint").alias("__n")
    )
    g, n = F.col("__g"), F.col("__n")
    means = F.transform(
        F.sequence(F.lit(1), F.lit(B)),
        lambda b: F.aggregate(
            F.sequence(F.lit(1), n.cast("int")),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(
                "xs", _draw_index(g, seed, b, i, n, portable)
            ),
        )
        / n,
    )
    with_means = sized.select(
        "__g", "__n", "xs", F.array_sort(means).alias("__ms")
    )
    return with_means.select(
        g.alias(group_col),
        n.alias("n"),
        (
            F.aggregate("xs", F.lit(0.0), lambda a, x: a + x) / n
        ).alias("mean"),
        F.element_at("__ms", k_lo).alias("ci_lo"),
        F.element_at("__ms", k_hi).alias("ci_hi"),
    )
