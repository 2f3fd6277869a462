"""Call-center-shaped queries over the ``events`` table.

The reference's Gold layer (``/root/reference/glue_jobs/
02_gold_analytics.py``) aggregates call records by date / (agent, date).
The testdata star schema has no call table, so these queries apply the
exact same operator shapes to ``events`` (event_type ~ call_status,
user_id ~ agent_id, value ~ duration_sec), which is what makes them
oracle-checkable at sf=0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..pipeline.gold import daily_summary, duration_metrics, key_performance
from .registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# Shared SQL fragment: one CASE-count per event type, matching
# pipeline.gold.status_counts output names.
# CAST: DuckDB promotes SUM(int) to HUGEINT, which pandas renders as
# float (45.0 vs Spark's 45) — pin BIGINT so values compare exactly.
_COUNT_CASES = ",\n       ".join(
    f"CAST(SUM(CASE WHEN event_type = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS {s}_count"
    for s in EVENT_TYPES
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit projection mirrors the reference's "column pruning" selects
    # (02_gold_analytics.py:35-38); Catalyst prunes the parquet scan anyway.
    return load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("event_date"), "user_id", "event_type", "value"
    )


@query(
    "daily_event_summary",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date,
           COUNT(*) AS total_calls,
           {_COUNT_CASES},
           CASE WHEN COUNT(*) > 0
                THEN floor((SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 100.0
                           / COUNT(*)) * 1e2 + 0.5) / 1e2
                ELSE 0.0 END AS completion_rate
    FROM events
    GROUP BY 1
    """,
)
def daily_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — gold_call_daily_summary shape (02_gold_analytics.py:51-79):
    single-key hash aggregate, count(*), 5 conditional counts, derived rate."""
    return daily_summary(
        _events(spark, sf_dir), "event_date", "event_type", EVENT_TYPES, "purchase"
    )


@query(
    "agent_performance",
    oracle=f"""
    SELECT user_id,
           CAST(ts AS DATE) AS event_date,
           COUNT(*) AS total_calls,
           {_COUNT_CASES},
           CASE WHEN COUNT(*) > 0
                THEN floor((SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 100.0
                           / COUNT(*)) * 1e2 + 0.5) / 1e2
                ELSE 0.0 END AS completion_rate
    FROM events
    GROUP BY 1, 2
    """,
)
def agent_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold_agent_performance shape (02_gold_analytics.py:83-111):
    composite-key aggregate keyed (user_id, event_date)."""
    return key_performance(
        _events(spark, sf_dir),
        ["user_id", "event_date"],
        "event_type",
        EVENT_TYPES,
        "purchase",
    )


@query(
    "duration_metrics",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           floor((AVG(value)) * 1e2 + 0.5) / 1e2 AS avg_call_duration_seconds,
           MIN(value) AS min_call_duration_seconds,
           MAX(value) AS max_call_duration_seconds
    FROM events
    WHERE value >= 0
    GROUP BY 1
    """,
)
def duration_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold_call_duration_metrics shape (02_gold_analytics.py:116-129)
    incl. the negative-duration filter (quirk Q4, 02_gold_analytics.py:43)."""
    df = _events(spark, sf_dir).filter(F.col("value") >= 0)
    return duration_metrics(df, "event_date", "value")
