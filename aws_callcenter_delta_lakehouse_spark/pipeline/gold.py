"""Gold-layer aggregation operators.

Generalizes the reference's three Gold builders
(``/root/reference/glue_jobs/02_gold_analytics.py:51-129``) into
parameterized operators so the same code serves both the call-center
pipeline and any status-typed event table:

- ``daily_summary``      <- gold_call_daily_summary   (02_gold_analytics.py:51-79)
- ``key_performance``    <- gold_agent_performance    (02_gold_analytics.py:83-111)
- ``duration_metrics``   <- gold_call_duration_metrics(02_gold_analytics.py:116-129)

All expressions are Spark built-ins (whole-stage codegen); each
aggregation is a single shuffle on its group keys with map-side partial
aggregation — the plan Spark's HashAggregateExec produces natively, which
is the 100 TB-safe shape (no driver-side loops, no UDFs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import round_portable


def status_counts(status_col: str, statuses: Sequence[str]) -> list[Column]:
    """Conditional counts — one ``sum(when(status==s,1).otherwise(0))``
    per status, the reference's pivot-style counting
    (``02_gold_analytics.py:55-72``). Case-sensitive equality on purpose
    (reference quirk Q3 in SURVEY.md §2.10)."""
    return [
        F.sum(F.when(F.col(status_col) == s, 1).otherwise(0)).alias(f"{s.lower()}_count")
        for s in statuses
    ]


def with_rate(
    df: DataFrame,
    numer: str,
    denom: str = "total_calls",
    out: str = "completion_rate",
) -> DataFrame:
    """Post-aggregation derived metric (``02_gold_analytics.py:77-79``).

    The ``otherwise(0.0)`` branch is dead in the reference (a group always
    has >=1 row — quirk Q7) but kept for shape fidelity.
    """
    return df.withColumn(
        out,
        F.when(
            F.col(denom) > 0, round_portable(F.col(numer) / F.col(denom) * 100, 2)
        ).otherwise(F.lit(0.0)),
    )


def daily_summary(
    df: DataFrame,
    date_col: str,
    status_col: str,
    statuses: Sequence[str],
    rate_status: str,
) -> DataFrame:
    """Single-key hash aggregate + conditional counts + rate
    (gold_call_daily_summary shape, ``02_gold_analytics.py:51-79``)."""
    agg = df.groupBy(date_col).agg(
        F.count("*").alias("total_calls"), *status_counts(status_col, statuses)
    )
    return with_rate(agg, f"{rate_status.lower()}_count")


def key_performance(
    df: DataFrame,
    keys: Sequence[str],
    status_col: str,
    statuses: Sequence[str],
    rate_status: str,
) -> DataFrame:
    """Composite-key aggregate (gold_agent_performance shape,
    ``02_gold_analytics.py:83-111``)."""
    agg = df.groupBy(*keys).agg(
        F.count("*").alias("total_calls"), *status_counts(status_col, statuses)
    )
    return with_rate(agg, f"{rate_status.lower()}_count")


def duration_metrics(df: DataFrame, date_col: str, duration_col: str) -> DataFrame:
    """avg/min/max metrics (gold_call_duration_metrics shape,
    ``02_gold_analytics.py:116-129`` — exactly these three metrics, no
    count). Caller is responsible for the negative-duration filter
    (quirk Q4, ``02_gold_analytics.py:43``)."""
    return df.groupBy(date_col).agg(
        round_portable(F.avg(duration_col), 2).alias("avg_call_duration_seconds"),
        F.min(duration_col).alias("min_call_duration_seconds"),
        F.max(duration_col).alias("max_call_duration_seconds"),
    )
