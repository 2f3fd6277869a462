"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows (streams.py) cover time-bucketed state; this
covers arbitrary per-key running state across micro-batches — the
Structured Streaming escape hatch for operators Spark lacks natively
(SURVEY.md §7.7). Example operator: per-key running totals emitted
every micro-batch.

The state handler is SELF-CONTAINED (no module-global references) so it
pickles by value and workers need no import path. State per key is two
scalars — bounded regardless of stream length; eviction is the
timeout's job if keys churn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("running_events", T.LongType()),
        T.StructField("running_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running (count, sum(value)) maintained across
    micro-batches; one output row per key per batch it appears in."""

    def handle(key_tuple, batches, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key_tuple[0]],
                "running_events": [n],
                "running_value": [total],
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        handle,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
