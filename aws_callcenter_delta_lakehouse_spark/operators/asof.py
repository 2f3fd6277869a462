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
    tolerance: float | int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_time <= left_time`` within the same ``on`` key group
    (pandas ``merge_asof`` / Trino ASOF semantics, ties -> right first).

    ``direction="forward"`` flips the match to the EARLIEST right row
    with ``right_time >= left_time`` (merge_asof parity). ``tolerance``
    bounds |left_time - matched_time|: a match farther away resolves to
    NULL payload, exactly like merge_asof's tolerance — it requires the
    time columns to be NUMERIC (e.g. ``unix_micros``; subtracting raw
    timestamps yields intervals — CLAUDE.md trap 10).

    Returns all left columns plus one ``<payload>_asof`` column per
    requested payload column. Still exactly ONE shuffle: tolerance and
    direction only change the window order and a final projection.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
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
    # match is visible to the probe row (<=, resp. >= forward).
    time_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(time_order, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = [
        F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{p}_asof")
        for p in payload
    ]
    if tolerance is not None:
        carry.append(
            F.last(
                F.when(F.col(_SIDE) == 0, F.col("__t")), ignorenulls=True
            )
            .over(w)
            .alias("__mt")
        )
    carried = r.unionByName(l).select("*", *carry)
    probe = carried.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        in_tol = F.abs(F.col("__t") - F.col("__mt")) <= F.lit(tolerance)
        probe = probe.select(
            *[c for c in probe.columns if not c.endswith("_asof")],
            *[
                F.when(in_tol, F.col(f"{p}_asof")).alias(f"{p}_asof")
                for p in payload
            ],
        )
    return probe.select(
        *on,
        F.col("__t").alias(left_time),
        *[c for c in left_cols if c not in on and c != left_time],
        *[f"{p}_asof" for p in payload],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
) -> DataFrame:
    """Alternative as-of backend: cogrouped ``applyInPandas`` running
    ``pd.merge_asof`` per key group. The built-in-ops formulation
    (``asof_join``) is preferred — Pandas is the fallback tier for
    operator semantics DataFrame ops can't express; this backend exists
    for parity testing and for the tolerance/nearest variants
    merge_asof supports natively.

    Scale: one shuffle on ``on`` (the cogroup), Arrow-batched transfer;
    each key group must fit in one executor's memory — salt mega-keys.
    The worker fn is self-contained (no module references).
    """
    on = list(on)
    payload = list(payload)
    l_cols = [c for c in left.columns]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{p}_asof {right.schema[p].dataType.simpleString()}" for p in payload]
    )
    lt, rt = left_time, right_time
    pay = payload

    def merge_group(lpdf, rpdf):
        import pandas as _pd

        lpdf = lpdf.sort_values(lt, kind="mergesort")
        rsel = rpdf[[rt, *pay]].sort_values(rt, kind="mergesort")
        rsel = rsel.rename(columns={p: f"{p}_asof" for p in pay})
        merged = _pd.merge_asof(
            lpdf, rsel, left_on=lt, right_on=rt, direction="backward",
            suffixes=("", "__r"),
        )
        drop = [c for c in merged.columns if c.endswith("__r") or (c == rt and rt not in lpdf.columns)]
        return merged.drop(columns=drop)

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(merge_group, schema=out_schema)
    )
