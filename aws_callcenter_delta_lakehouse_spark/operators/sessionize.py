"""Gap-based sessionization — the batch analogue of Structured
Streaming's ``session_window`` (engine extension; the reference handles
time only as HH:mm:ss strings, 02_gold_analytics.py:40-42).

Classic two-window formulation, all built-ins: lag() to measure the gap
to the previous event per key, a boolean new-session marker, and a
running sum of markers as the session index. One shuffle on the key;
whole-stage codegen end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign ``session_id`` (0-based per key) so that consecutive events
    whose gap exceeds ``gap_seconds`` start a new session. Pass a unique
    ``order_tiebreak`` column for deterministic ordering under equal
    timestamps."""
    order = [F.col(time_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = F.unix_micros(F.col(time_col)) - F.unix_micros(
        F.lag(time_col).over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    running = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_id", F.sum(new_session).over(running) - 1)
