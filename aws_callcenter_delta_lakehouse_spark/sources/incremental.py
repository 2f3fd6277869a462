"""Incremental aggregate maintenance from the change feed.

The materialized-view refresh a lakehouse actually wants: a Gold
count/sum aggregate is SELF-MAINTAINABLE — inserts add, deletes
subtract, updates are a delete+insert pair — so a version-to-version
refresh costs O(|changes|), never a rescan of the fact table. This is
the consumer side of ``managed_table.read_changes`` (Delta CDF
analogue); the reference's Gold job (`02_gold_analytics.py`) recomputes
from the full Silver table every run, which at 100 TB is the dominant
cost of the pipeline — this module replaces that rescan with a diff.

Only distributive/algebraic aggregates refresh this way (count, sum,
and anything derived from them: avg = sum/count). Holistic aggregates
(min/max/distinct) need either a rescan of the affected GROUPS or a
sketch; that trade-off is the textbook materialized-view line and is
deliberately out of scope here.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def refresh_count_sum_aggregate(
    old_agg: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    count_col: str = "n_rows",
    sums: Mapping[str, str] | None = None,
) -> DataFrame:
    """Apply a CDC diff to a grouped count/sum aggregate.

    ``old_agg``: the previous materialization with ``keys``,
    ``count_col`` and the ``sums`` output columns.
    ``changes``: rows from ``read_changes`` (needs ``_change_type``).
    ``sums``: {output_col: source_col} sum columns to maintain.

    insert/update_postimage rows count +1, delete/update_preimage -1;
    the signed per-key delta aggregate (O(|changes|), map-side combined)
    full-outer-joins the old aggregate, and groups whose refreshed count
    reaches zero drop out — exactly the rows a recompute would not
    produce. Returns the refreshed aggregate; parity with a full
    recompute is pinned in tests/test_incremental.py.

    The join is NULL-SAFE on the grouping keys (GROUP BY puts all NULL
    keys in one group, so the delta for a NULL-keyed group must merge
    into the old NULL-keyed row, not dangle beside it).
    """
    sums = dict(sums or {})
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta_aggs = [F.sum(sign).alias("__dcount")] + [
        F.sum(sign * F.col(src)).alias(f"__d_{out}") for out, src in sums.items()
    ]
    delta = changes.groupBy(*keys).agg(*delta_aggs).withColumnsRenamed(
        {k: f"__dk_{k}" for k in keys}
    )
    cond = None
    for k in keys:
        c = old_agg[k].eqNullSafe(delta[f"__dk_{k}"])
        cond = c if cond is None else (cond & c)
    refreshed = (
        old_agg.join(delta, on=cond, how="full_outer")
        .select(
            *[
                F.coalesce(old_agg[k], delta[f"__dk_{k}"]).alias(k)
                for k in keys
            ],
            (
                F.coalesce(F.col(count_col), F.lit(0))
                + F.coalesce(F.col("__dcount"), F.lit(0))
            ).alias(count_col),
            *[
                (
                    F.coalesce(F.col(out), F.lit(0))
                    + F.coalesce(F.col(f"__d_{out}"), F.lit(0))
                ).alias(out)
                for out in sums
            ],
        )
        .filter(F.col(count_col) > 0)
    )
    return refreshed
