"""Time-series batch: gap filling + forward fill, and trailing
event-time rolling windows. Both oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_portable
from ..operators.timeseries import gap_fill_forward, rolling_time_window
from .registry import query


@query(
    "events_gap_fill_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             floor(SUM(value) * 1e2 + 0.5) / 1e2 AS v
      FROM events WHERE user_id < 200 GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
               FROM daily GROUP BY 1),
    spine AS (SELECT user_id,
                     CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                          AS DATE) AS day
              FROM bounds),
    j AS (SELECT s.user_id, s.day, d.v
          FROM spine s LEFT JOIN daily d USING (user_id, day))
    SELECT user_id, day,
           last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           v IS NULL AS is_gap
    FROM j
    """,
)
def events_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily value series densified over each user's own
    [first, last] day with forward fill — the feature-engineering
    densification pass. The daily sum is rounded BEFORE the fill so
    both engines carry identical doubles forward."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(round_portable(F.sum("value"), 2).alias("v"))
    return gap_fill_forward(daily, "user_id", "day", "v")


@query(
    "events_rolling_7day",
    oracle="""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           COUNT(*) OVER w AS n_trailing,
           floor(SUM(value) OVER w * 1e2 + 0.5) / 1e2 AS sum_trailing
    FROM events
    WHERE user_id < 100
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day per-user count/sum keyed on EVENT time (RANGE on
    the epoch second — a calendar window, not a row window). One window
    shuffle on user_id."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    rolled = rolling_time_window(
        events, "user_id", "ts", "value", trailing_seconds=604800
    )
    return rolled.select(
        "user_id",
        "ts",
        "n_trailing",
        round_portable(F.col("sum_trailing"), 2).alias("sum_trailing"),
    )
