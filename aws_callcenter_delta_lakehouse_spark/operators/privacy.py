"""Privacy transforms: k-anonymization by global recoding, plus the
Laplace mechanism for differentially-private releases.

The ``dq_k_anonymity`` / ``dq_l_diversity`` queries REPORT
re-identification risk; this module REMOVES it: generalize
quasi-identifier columns up a coarsening ladder until every equivalence
class reaches size k, then suppress whatever still fails at the
coarsest level (the standard global-recoding scheme — Samarati 2001,
Sweeney 2002; Mondrian-style local recoding trades uniformity for
utility and is deliberately out of scope).

``dp_noisy_counts`` / ``dp_noisy_sums`` implement the Laplace
mechanism (Dwork et al. 2006): release ``agg + Laplace(sensitivity /
epsilon)`` per group. Noise is drawn by inverse-CDF from a uniform
derived by HASHING the group key with a caller seed — a deterministic,
reproducible draw (the style used for testable/replayable DP
pipelines; a production release would rotate the seed per release, as
reusing one across releases of the same statistic leaks it).

Scale: each ladder probe is one hash aggregate returning a single
scalar (min class size) to the driver; the chosen level is then one
projection + one semi-join. Never more than ``len(ladder)`` passes.
The DP aggregates are each ONE hash aggregate + a per-group scalar
expression — no extra shuffle over the plain aggregate.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO60 = float(2**60)
_TWO63 = float(2**63)
_TWO64 = float(2**64)
_SEP = "\x1f"


def _uniform01(key: Column, portable: bool) -> Column:
    """Map a key string to a double strictly inside (0, 1).

    Portable = low 60 bits of md5 (engine-identical wherever md5
    exists — the repo-wide PORTABLE-HASH pattern); default = xxhash64
    shifted out of its signed domain. The +0.5 keeps the uniform off
    both endpoints so ``ln(1 - 2|u - 0.5|)`` can never see 0."""
    if portable:
        h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
        return (h.cast("double") + 0.5) / F.lit(_TWO60)
    h = F.xxhash64(key)
    return (h.cast("double") + F.lit(_TWO63) + 0.5) / F.lit(_TWO64)


def laplace_noise(
    key: Column, scale: float, portable: bool = False
) -> Column:
    """Laplace(0, scale) deviate as a pure function of ``key``:
    inverse-CDF ``-scale * sign(v) * ln(1 - 2|v|)`` with
    ``v = uniform - 0.5``. Everything after the hash is plain double
    arithmetic + one ``ln`` (cross-engine-stable per the adamic-adar /
    unigram-logprob precedents)."""
    v = _uniform01(key, portable) - F.lit(0.5)
    mag = -F.lit(float(scale)) * F.log(F.lit(1.0) - 2.0 * F.abs(v))
    return F.when(v >= 0, mag).otherwise(-mag)


_NULL_SENTINEL = "\x00NULL"


def _group_key(group_cols: Sequence[str], seed: int) -> Column:
    """Deterministic per-group noise key. Each component is coalesced
    to a dedicated sentinel BEFORE concatenation: ``concat_ws`` alone
    silently drops NULL values in Spark (while a ``||`` mirror
    propagates them), so without the sentinel two groups differing
    only in a NULL column would collide to the same key — and the same
    noise. The SQL mirror for NULLable group columns is
    ``coalesce(CAST(c AS VARCHAR), chr(0) || 'NULL')``."""
    return F.concat_ws(
        _SEP,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
            for c in group_cols
        ],
        F.lit(str(int(seed))),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """epsilon-DP group counts: ``n + Laplace(1/epsilon)`` per group
    (count has L1 sensitivity 1 under add/remove-one-row adjacency).
    Returns the group columns plus ``n`` (true count, for tests — drop
    it before an actual release) and ``noisy_n``."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n")
    )
    noise = laplace_noise(
        _group_key(group_cols, seed), 1.0 / epsilon, portable
    )
    return counts.withColumn(
        "noisy_n", F.col("n").cast("double") + noise
    )


def dp_noisy_sums(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """epsilon-DP group sums of a non-negative value: each contribution
    is CLIPPED to ``[0, clip]`` (bounding the L1 sensitivity at
    ``clip``), summed, then ``Laplace(clip/epsilon)`` is added. Returns
    group columns + ``clipped_sum`` + ``noisy_sum``."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if clip <= 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(float(clip)),
    )
    sums = df.groupBy(*group_cols).agg(
        F.sum(clipped).alias("clipped_sum")
    )
    noise = laplace_noise(
        _group_key(group_cols, seed), float(clip) / epsilon, portable
    )
    return sums.withColumn("noisy_sum", F.col("clipped_sum") + noise)


def generalize_to_k(
    df: DataFrame,
    ladder: Sequence[Mapping[str, Column]],
    k: int,
) -> tuple[DataFrame, dict]:
    """Return ``(anonymized, info)`` where ``anonymized`` replaces the
    quasi-identifier columns with the FIRST ladder level at which every
    equivalence class has >= k rows; rows whose class still fails at
    the last level are SUPPRESSED (dropped — the textbook fallback,
    counted in ``info``).

    ``ladder`` is a list of {column_name: expression} dicts ordered
    fine -> coarse; every level must define the same column set (level
    0 is typically the identity expressions). All non-QI columns pass
    through untouched.

    ``info`` = {"level": chosen index, "suppressed": row count,
    "min_class_size": the minimum class size at the chosen level
    BEFORE suppression (after suppression the output minimum is >= k
    by construction)}."""
    if not ladder:
        raise ValueError("ladder must have at least one level")
    qi = sorted(ladder[0].keys())
    for i, level in enumerate(ladder):
        if sorted(level.keys()) != qi:
            raise ValueError(
                f"ladder level {i} defines {sorted(level.keys())}, "
                f"expected {qi} — every level must generalize the same "
                "quasi-identifier set"
            )
    passthrough = [c for c in df.columns if c not in qi]
    chosen, min_size = len(ladder) - 1, None
    for i, level in enumerate(ladder):
        g = df.select(
            *passthrough, *[level[c].alias(c) for c in qi]
        )
        row = (
            g.groupBy(*qi)
            .agg(F.count("*").alias("__n"))
            .agg(F.min("__n").alias("m"))
            .first()
        )
        min_size = int(row["m"]) if row["m"] is not None else 0
        if min_size >= k:
            chosen = i
            break
    level = ladder[chosen]
    g = df.select(*passthrough, *[level[c].alias(c) for c in qi])
    ok_classes = (
        g.groupBy(*qi).agg(F.count("*").alias("__n")).filter(F.col("__n") >= k)
    )
    kept = g.join(ok_classes.select(*qi), on=qi, how="left_semi")
    suppressed = g.count() - kept.count() if min_size < k else 0
    return kept, {
        "level": chosen,
        "suppressed": int(suppressed),
        "min_class_size": int(min_size),
    }
