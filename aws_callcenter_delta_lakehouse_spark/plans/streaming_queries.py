"""Streaming queries for the registry: each runs its stream to
completion on a memory sink (file source + processAllAvailable is
deterministic) and returns the materialized result, so tumbling/session
aggregations get full DuckDB oracles."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..streaming.streams import (
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_events,
    tumbling_counts,
)
from .registry import query


def _sink(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600)
                AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events,
           floor((SUM(value)) * 1e2 + 0.5) / 1e2 AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 6h tumbling windows, complete mode — final state
    equals the batch GROUP BY on the time bucket."""
    return run_to_memory(
        tumbling_counts(stream_events(spark, sf_dir)), _sink("tumbling")
    )


@query(
    "streaming_sliding_counts",
    oracle="""
    WITH buckets AS (
        SELECT epoch(CAST(ts AS TIMESTAMP)) AS es FROM events),
    hits AS (
        SELECT CAST(to_timestamp(floor(es / 21600) * 21600) AS TIMESTAMP) AS window_start,
               es FROM buckets
        UNION ALL
        SELECT CAST(to_timestamp((floor(es / 21600) - 1) * 21600) AS TIMESTAMP) AS window_start,
               es FROM buckets)
    SELECT window_start, COUNT(*) AS n_events
    FROM hits
    WHERE es >= epoch(window_start) AND es < epoch(window_start) + 43200
    GROUP BY 1
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12h windows sliding every 6h — every event lands in exactly two
    windows; the oracle enumerates both candidate windows per event."""
    return run_to_memory(
        sliding_counts(stream_events(spark, sf_dir)), _sink("sliding")
    )


@query(
    "streaming_session_counts",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                         > 3600000000::BIGINT
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    tagged AS (
        SELECT user_id, event_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
        FROM ordered)
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, MIN(event_id) AS first_event_id
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 1h) per user — final state equals batch
    gap-sessionization (same 1h gap)."""
    return run_to_memory(
        session_counts(stream_events(spark, sf_dir)), _sink("session")
    )


@query(
    "streaming_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful in-stream dedup (dropDuplicatesWithinWatermark on
    (user_id, event_type)): state bounded by the 1-day watermark.
    Which physical row survives is arrival-order-dependent, so the
    query projects the KEY COLUMNS — the deduped key set is
    deterministic and equals batch DISTINCT."""
    from ..streaming.streams import dedup_stream

    deduped = dedup_stream(
        stream_events(spark, sf_dir), keys=("user_id", "event_type")
    ).select("user_id", "event_type")
    return run_to_memory(deduped, _sink("dedup"), output_mode="append")


@query(
    "streaming_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS running_events,
           floor((SUM(value)) * 1e2 + 0.5) / 1e2 AS running_value
    FROM events GROUP BY user_id
    """,
)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running (count, sum) across micro-batches. The memory sink holds
    one row per key per batch; the final row per key (max
    running_events — strictly increasing) equals the batch aggregate."""
    from pyspark.sql import functions as F

    from ..functions.scalars import round_portable
    from ..streaming.stateful import running_totals

    totals = run_to_memory(
        running_totals(stream_events(spark, sf_dir)),
        _sink("running"),
        output_mode="update",
    )
    return totals.groupBy("user_id").agg(
        F.max("running_events").alias("running_events"),
        round_portable(
            F.max_by("running_value", "running_events"), 2
        ).alias("running_value"),
    )


@query(
    "streaming_static_enrich",
    oracle="""
    SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
           floor((SUM(value)) * 1e2 + 0.5) / 1e2 AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (stateless join, the dim
    re-resolves per micro-batch) + complete-mode aggregate — drained
    result equals the batch join+GROUP BY."""
    from ..streaming.streams import stream_static_enrich

    return run_to_memory(
        stream_static_enrich(spark, sf_dir), _sink("enrich")
    )


@query(
    "streaming_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events
          WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 3600 SECOND
     AND v.ts <= p.ts
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream attribution join (views within 1h
    before each purchase) — drained result equals the batch interval
    join."""
    from ..streaming.streams import stream_stream_join

    return run_to_memory(
        stream_stream_join(spark, sf_dir), _sink("ssjoin"), output_mode="append"
    )


@query(
    "streaming_stream_join_outer",
    oracle="""
    WITH wm AS (
      SELECT LEAST(
        MAX(CASE WHEN event_type = 'purchase'
                 THEN CAST(ts AS TIMESTAMP) END),
        MAX(CASE WHEN event_type = 'view'
                 THEN CAST(ts AS TIMESTAMP) END)) AS w
      FROM events)
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events
               WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 3600 SECOND
     AND v.ts <= p.ts
    CROSS JOIN wm
    WHERE v.event_id IS NOT NULL OR p.ts < w
    """,
)
def streaming_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER attribution join:
    unconverted purchases surface as null-extended rows once their join
    state can close. The global watermark is the MIN across both
    watermark nodes (multipleWatermarkPolicy=min), i.e. with zero delay
    least(max purchase ts, max view ts), and a left row's state closes
    only when its event time is STRICTLY below it — so even a fully
    drained finite source withholds the null-extended row for an
    unmatched purchase sitting exactly at the slower stream's maximum.
    The oracle states exactly that: batch LEFT JOIN minus null rows at
    or past the final watermark."""
    from ..streaming.streams import stream_stream_join

    return run_to_memory(
        stream_stream_join(spark, sf_dir, watermark="0 seconds", how="left_outer"),
        _sink("ssjoin_outer"),
        output_mode="append",
    )


@query(
    "streaming_stream_join_full",
    oracle="""
    WITH wm AS (
      SELECT LEAST(
        MAX(CASE WHEN event_type = 'purchase'
                 THEN CAST(ts AS TIMESTAMP) END),
        MAX(CASE WHEN event_type = 'view'
                 THEN CAST(ts AS TIMESTAMP) END)) AS w
      FROM events),
    p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events
          WHERE event_type = 'purchase'),
    v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events
          WHERE event_type = 'view'),
    m AS (SELECT p.event_id AS purchase_id, v.event_id AS view_id,
                 p.user_id AS user_id
          FROM p JOIN v
            ON p.user_id = v.user_id
           AND v.ts >= p.ts - INTERVAL 3600 SECOND
           AND v.ts <= p.ts)
    SELECT purchase_id, view_id, user_id FROM m
    UNION ALL
    SELECT p.event_id, NULL, p.user_id FROM p CROSS JOIN wm
    WHERE p.ts < w
      AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.event_id)
    UNION ALL
    SELECT NULL, v.event_id, v.user_id FROM v CROSS JOIN wm
    WHERE v.ts + INTERVAL 3600 SECOND < w
      AND NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.event_id)
    """,
)
def streaming_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream FULL OUTER attribution join: both
    unconverted purchases AND never-attributed views surface as
    null-extended rows when their side's state closes. The two sides
    close at DIFFERENT watermark offsets — a purchase when w passes
    p_ts (no earlier-or-equal view can arrive), a view only when w
    passes v_ts + window (a purchase up to an hour LATER could still
    claim it) — and the oracle states exactly that asymmetry, verified
    empirically against the drained Spark result."""
    from ..streaming.streams import stream_stream_join

    return run_to_memory(
        stream_stream_join(spark, sf_dir, watermark="0 seconds", how="full_outer"),
        _sink("ssjoin_full"),
        output_mode="append",
    )


@query(
    "streaming_window_rollup",
    oracle="""
    WITH e AS (SELECT epoch(CAST(ts AS TIMESTAMP)) AS es, value FROM events),
    mx AS (SELECT max(es) AS m FROM e),
    agg AS (
        SELECT floor(es / 86400) * 86400 AS day_start,
               COUNT(DISTINCT floor(es / 21600)) AS n_subwindows,
               COUNT(*) AS n_events,
               floor(SUM(value) * 1e2 + 0.5) / 1e2 AS sum_value
        FROM e GROUP BY 1)
    SELECT CAST(to_timestamp(day_start) AS TIMESTAMP) AS window_start,
           n_subwindows, n_events, sum_value
    FROM agg, mx
    WHERE day_start + 86400 <= m
    """,
)
def streaming_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained time-window aggregation (Spark 3.5+ multiple stateful
    operators): 6h tumbling pre-aggregate re-aggregated into 1d windows
    inside ONE streaming query (append mode — each tier emits once its
    windows finalize past the watermark). The oracle reproduces the
    append-mode contract: day windows whose end exceeds the final
    watermark (max event time, 0s delay) are never emitted."""
    from ..streaming.streams import windowed_rollup

    return run_to_memory(
        windowed_rollup(stream_events(spark, sf_dir)),
        _sink("rollup"),
        output_mode="append",
    )
