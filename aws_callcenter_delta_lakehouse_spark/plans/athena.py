"""The reference's five Athena analytics queries
(``/root/reference/sql/athena_queries.sql:7-63``), re-expressed over the
testdata ``events`` table.

Athena reads the Gold Delta tables; here each query computes the
gold-shaped aggregate inline (same operator pipeline as
``pipeline.gold``) and applies the reference's SELECT/ORDER/LIMIT on
top. Status mapping for the three counted buckets:
purchase -> completed, click -> dropped, error -> failed.

Determinism note: the reference's ORDER BY ... LIMIT k can tie at the
k-th row; every query here appends a unique tie-break key so the Spark
and DuckDB result *sets* are identical (a test-determinism fix, not a
semantic change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_portable
from ..pipeline.gold import daily_summary, duration_metrics, key_performance
from .registry import query

_GOLD_STATUSES = ("purchase", "click", "error")
_RENAME = {
    "purchase_count": "completed_calls",
    "click_count": "dropped_calls",
    "error_count": "failed_calls",
}

_DAILY_CTE = """
    WITH gold_call_daily_summary AS (
        SELECT CAST(ts AS DATE) AS call_date,
               COUNT(*) AS total_calls,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS completed_calls,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_calls,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed_calls,
               CASE WHEN COUNT(*) > 0
                    THEN floor((SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 100.0
                               / COUNT(*)) * 1e2 + 0.5) / 1e2
                    ELSE 0.0 END AS completion_rate
        FROM events GROUP BY 1)
"""

_AGENT_CTE = """
    WITH gold_agent_performance AS (
        SELECT user_id AS agent_id,
               CAST(ts AS DATE) AS call_date,
               COUNT(*) AS total_calls,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS completed_calls,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_calls,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed_calls,
               CASE WHEN COUNT(*) > 0
                    THEN floor((SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 100.0
                               / COUNT(*)) * 1e2 + 0.5) / 1e2
                    ELSE 0.0 END AS completion_rate
        FROM events GROUP BY 1, 2)
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("call_date"),
        F.col("user_id").alias("agent_id"),
        "event_type",
        "value",
    )


def _gold_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = daily_summary(
        _events(spark, sf_dir), "call_date", "event_type", _GOLD_STATUSES, "purchase"
    )
    return df.withColumnsRenamed(_RENAME)


def _gold_agent(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = key_performance(
        _events(spark, sf_dir),
        ["agent_id", "call_date"],
        "event_type",
        _GOLD_STATUSES,
        "purchase",
    )
    return df.withColumnsRenamed(_RENAME)


@query(
    "athena_q1_daily_summary",
    oracle=_DAILY_CTE
    + """
    SELECT call_date, total_calls, completed_calls, dropped_calls,
           failed_calls, completion_rate
    FROM gold_call_daily_summary
    ORDER BY call_date DESC LIMIT 10
    """,
)
def athena_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q1 (sql/athena_queries.sql:7-16): latest-days-first top-k
    over the daily summary — O1 ORDER BY DESC LIMIT."""
    return (
        _gold_daily(spark, sf_dir)
        .select(
            "call_date",
            "total_calls",
            "completed_calls",
            "dropped_calls",
            "failed_calls",
            "completion_rate",
        )
        .orderBy(F.desc("call_date"))
        .limit(10)
    )


@query(
    "athena_q2_agent_overview",
    oracle=_AGENT_CTE
    + """
    SELECT agent_id, call_date, total_calls, completed_calls, dropped_calls,
           failed_calls, completion_rate
    FROM gold_agent_performance
    ORDER BY call_date DESC, agent_id LIMIT 20
    """,
)
def athena_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q2 (sql/athena_queries.sql:20-30): multi-column
    mixed-direction sort + limit — O2."""
    return (
        _gold_agent(spark, sf_dir)
        .select(
            "agent_id",
            "call_date",
            "total_calls",
            "completed_calls",
            "dropped_calls",
            "failed_calls",
            "completion_rate",
        )
        .orderBy(F.desc("call_date"), F.asc("agent_id"))
        .limit(20)
    )


@query(
    "athena_q3_duration_metrics",
    oracle="""
    WITH gold_call_duration_metrics AS (
        SELECT CAST(ts AS DATE) AS call_date,
               floor((AVG(value)) * 1e2 + 0.5) / 1e2 AS avg_call_duration_seconds,
               MIN(value) AS min_call_duration_seconds,
               MAX(value) AS max_call_duration_seconds
        FROM events WHERE value >= 0 GROUP BY 1)
    SELECT call_date, avg_call_duration_seconds,
           min_call_duration_seconds, max_call_duration_seconds
    FROM gold_call_duration_metrics
    ORDER BY call_date DESC LIMIT 10
    """,
)
def athena_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q3 (sql/athena_queries.sql:34-41): duration metrics,
    latest days first."""
    df = _events(spark, sf_dir).filter(F.col("value") >= 0)
    return (
        duration_metrics(df, "call_date", "value")
        .orderBy(F.desc("call_date"))
        .limit(10)
    )


@query(
    "athena_q4_top_agents",
    oracle=_AGENT_CTE
    + """
    SELECT agent_id,
           floor((AVG(completion_rate)) * 1e4 + 0.5) / 1e4 AS avg_completion_rate
    FROM gold_agent_performance
    GROUP BY agent_id
    ORDER BY avg_completion_rate DESC, agent_id LIMIT 5
    """,
)
def athena_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q4 (sql/athena_queries.sql:45-51): top agents by
    avg-of-rates (unweighted, as the reference computes it) — A8/O3.
    Portable round(.,4) added on both sides for float-hash stability."""
    return (
        _gold_agent(spark, sf_dir)
        .groupBy("agent_id")
        .agg(round_portable(F.avg("completion_rate"), 4).alias("avg_completion_rate"))
        .orderBy(F.desc("avg_completion_rate"), F.asc("agent_id"))
        .limit(5)
    )


@query(
    "athena_q5_high_failure_days",
    oracle=_DAILY_CTE
    + """
    SELECT call_date, failed_calls, total_calls,
           floor(((failed_calls * 100.0) / total_calls) * 1e2 + 0.5) / 1e2 AS failure_rate_pct
    FROM gold_call_daily_summary
    WHERE total_calls > 0
    ORDER BY failure_rate_pct DESC, call_date LIMIT 10
    """,
)
def athena_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Athena Q5 (sql/athena_queries.sql:55-63): failure-rate
    recomputation — P7 WHERE on aggregate + O4 sort by computed expr."""
    return (
        _gold_daily(spark, sf_dir)
        .filter(F.col("total_calls") > 0)
        .select(
            "call_date",
            "failed_calls",
            "total_calls",
            round_portable(F.col("failed_calls") * 100.0 / F.col("total_calls"), 2).alias(
                "failure_rate_pct"
            ),
        )
        .orderBy(F.desc("failure_rate_pct"), F.asc("call_date"))
        .limit(10)
    )
