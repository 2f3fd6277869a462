"""Time-series operators: gap filling with forward fill, and rolling
time-interval windows.

Engine extension surface (BASELINE.json north star; the reference's
time handling is batch GROUP BY event_date, 02_gold_analytics.py). The
two shapes every metrics/feature pipeline needs:

- gap_fill_forward: densify a per-key daily series (one spine row per
  key per day between that key's own first and last observation — the
  spine is generated per key from its bounds, never a global calendar
  cross join) and carry the last observed value forward.
- rolling over event time: RANGE frame on the epoch-second, so the
  window is "trailing N seconds", not "trailing N rows".

Scale: the spine explode emits (key, day) rows bounded by Σ per-key
span; the fill is one window shuffle on the key — identical partition
profile to the aggregate that produced the daily series, so at 100 TB
the two stages co-partition and AQE coalesces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_forward(
    daily: DataFrame, key_col: str, date_col: str, value_col: str
) -> DataFrame:
    """Densify ``daily`` (one row per key per observed date) to every
    date in each key's [min, max] span; missing dates get the last
    observed value (``last(ignorenulls)`` over an unbounded-preceding
    row frame) and ``is_gap = true``."""
    bounds = daily.groupBy(key_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias(date_col),
    )
    joined = spine.join(daily, on=[key_col, date_col], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        date_col,
        F.last(value_col, ignorenulls=True).over(w).alias("filled_value"),
        F.col(value_col).isNull().alias("is_gap"),
    )


def rolling_time_window(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    trailing_seconds: int,
) -> DataFrame:
    """Trailing event-time aggregate: per row, count/sum of the key's
    rows within the last ``trailing_seconds`` (inclusive both ends,
    RANGE semantics — equal timestamps are peers). One window shuffle
    on the key. The frame is anchored on INTEGER microseconds
    (``unix_micros``) — timestamps carry sub-second precision, and a
    float-seconds epoch would put boundary rows on different sides
    across engines."""
    secs = F.unix_micros(F.col(ts_col)).alias("__usec")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__usec")
        .rangeBetween(-trailing_seconds * 1_000_000, 0)
    )
    return df.select(key_col, ts_col, F.col(value_col), secs).select(
        key_col,
        ts_col,
        F.count("*").over(w).alias("n_trailing"),
        F.sum(value_col).over(w).alias("sum_trailing"),
    )
