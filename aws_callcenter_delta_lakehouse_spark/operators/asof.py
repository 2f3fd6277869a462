"""As-of join (point-in-time join) — an operator the reference's stack
(Athena/Trino) offers but stock Spark lacks (SURVEY.md §2.3 gap row).

Spark-first formulation: instead of a join, tag both sides, union them,
and carry the right side's payload forward with
``last(..., ignorenulls=True)`` over a (key, time)-ordered window.

Scale notes (100 TB): exactly ONE shuffle on the partition key — the
same cost as the sort-merge join Spark would need anyway, but with no
join explosion and no per-row Python. Window state is a single carried
value, so executors stream each key group. Skewed keys behave like any
window skew (AQE cannot split a window partition — pre-salt the key if
one key dominates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (match source), 1 = left (probe)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    tolerance: None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_time <= left_time`` within the same ``on`` key group
    (pandas ``merge_asof`` / Trino ASOF semantics, ties -> right first).

    Returns all left columns plus one ``<payload>_asof`` column per
    requested payload column.
    """
    on = list(on)
    payload = list(payload)
    left_cols = left.columns

    r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias(_SIDE),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
        *[F.lit(None).alias(c) for c in left_cols if c not in on],
    ).select(*on, "__t", _SIDE, *[f"__p_{p}" for p in payload], *[c for c in left_cols if c not in on])

    l = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}") for p in payload],
        *[c for c in left_cols if c not in on],
    )

    # Right rows sort before left rows at equal time, so an exact-time
    # match is visible to the probe row (<= semantics).
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*",
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{p}_asof")
            for p in payload
        ],
    )
    return carried.filter(F.col(_SIDE) == 1).select(
        *on,
        F.col("__t").alias(left_time),
        *[c for c in left_cols if c not in on and c != left_time],
        *[f"{p}_asof" for p in payload],
    )
