"""Privacy transforms: k-anonymization by global recoding.

The ``dq_k_anonymity`` / ``dq_l_diversity`` queries REPORT
re-identification risk; this module REMOVES it: generalize
quasi-identifier columns up a coarsening ladder until every equivalence
class reaches size k, then suppress whatever still fails at the
coarsest level (the standard global-recoding scheme — Samarati 2001,
Sweeney 2002; Mondrian-style local recoding trades uniformity for
utility and is deliberately out of scope).

Scale: each ladder probe is one hash aggregate returning a single
scalar (min class size) to the driver; the chosen level is then one
projection + one semi-join. Never more than ``len(ladder)`` passes.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
