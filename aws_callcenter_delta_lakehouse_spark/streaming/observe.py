"""Streaming observability: a StreamingQueryListener that captures
per-micro-batch progress into queryable rows.

The ops surface a production stream needs — rows/sec, batch duration,
state-store size, watermark lag — is pushed by Spark through
``StreamingQueryListener`` callbacks; this module turns those into a
DataFrame so the same engine that runs the pipeline can monitor it
(alert queries over the metrics table, capacity regression checks in
CI). Listener callbacks run on the driver and only carry small progress
summaries — no data-path overhead at any scale.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_SCHEMA = (
    "query_id string, run_id string, batch_id long, timestamp string, "
    "num_input_rows long, batch_duration_ms long, "
    "state_rows_total long, state_memory_bytes long, "
    "watermark string, sources int, sink string"
)


class ProgressCapture(StreamingQueryListener):
    """Collects every QueryProgress event. Attach with
    ``spark.streams.addListener``; detach with ``removeListener``;
    materialize with :meth:`to_df`."""

    def __init__(self) -> None:
        self.events: list[dict] = []

    # required callbacks
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        states = p.get("stateOperators") or []
        self.events.append(
            {
                "query_id": p.get("id"),
                "run_id": p.get("runId"),
                "batch_id": int(p.get("batchId", -1)),
                "timestamp": p.get("timestamp"),
                "num_input_rows": int(p.get("numInputRows", 0)),
                "batch_duration_ms": int(p.get("batchDuration", 0)),
                "state_rows_total": int(
                    sum(s.get("numRowsTotal", 0) for s in states)
                ),
                "state_memory_bytes": int(
                    sum(s.get("memoryUsedBytes", 0) for s in states)
                ),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
                "sources": int(len(p.get("sources") or [])),
                "sink": (p.get("sink") or {}).get("description"),
            }
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The captured progress log as a DataFrame (schema stable even
        when empty)."""
        return spark.createDataFrame(
            [tuple(e.values()) for e in self.events], _SCHEMA
        )


def capture_progress(spark: SparkSession) -> ProgressCapture:
    """Attach a fresh ProgressCapture listener and return it; caller
    removes it with ``spark.streams.removeListener(listener)``."""
    listener = ProgressCapture()
    spark.streams.addListener(listener)
    return listener
