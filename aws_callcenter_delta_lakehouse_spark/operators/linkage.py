"""Blocked probabilistic record linkage (Fellegi–Sunter-shaped).

Engine extension surface (BASELINE.json north star; the reference's only
matching surface is exact-key MERGE, 01_silver_delta_upsert.py:104-108).
Entity resolution across two tables without a shared key: block on a
cheap exact attribute so the candidate space is Σ block_a × block_b
(never |A| × |B|), score each candidate with per-field similarity
weights, rank matches per left entity.

All built-ins: ``levenshtein`` for string agreement, ``exp`` decay for
numeric closeness, one equi-join on the block key + one per-entity
window. At 100 TB the block key choice bounds the join fan-out exactly
like the dedup blockers (LSH bands / IVF cells) do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import round_portable


def linkage_topk(
    left: DataFrame,
    right: DataFrame,
    block_col: str,
    score: Column,
    left_id: str,
    right_id: str,
    k: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Generic blocked linkage: equi-join on ``block_col``, attach
    ``score`` (built from left/right columns), keep the top ``k``
    matches per left entity. The score is ROUNDED before ranking and
    ties break on the right id, so the k-th match is deterministic."""
    cand = left.join(right, on=block_col)
    scored = cand.select(
        left_id,
        right_id,
        round_portable(score, round_digits).alias("match_score"),
    )
    w = Window.partitionBy(left_id).orderBy(
        F.desc("match_score"), F.asc(right_id)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(left_id, right_id, "match_score", F.col("__rn").alias("rank"))
    )
