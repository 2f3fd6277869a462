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
    micro-batches; one output row per key per batch it appears in.

    Only (key, value) cross the Arrow boundary: the stateful operator
    is the one place the full row WOULD otherwise ship to Python per
    batch — projecting first cuts the per-batch transfer to two columns
    (the events stream carries a ~100-byte JSON props column that the
    state handler never reads)."""
    stream = stream.select(key, "value")

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


PEAKS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("peak_value", T.DoubleType()),
    ]
)


def user_peaks(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running (count, max(value)) via transformWithStateInPandas
    — the Spark 4 arbitrary-stateful API (typed value state on a
    versioned state store; supersedes applyInPandasWithState and adds
    timers/TTL/multiple state variables).

    REQUIRES google.protobuf (the Python<->JVM state-server protocol);
    the registry gates the query on that import (absent in this
    container), so ``running_totals`` above remains the exercised
    stateful path here.

    The processor class is defined INSIDE this function so cloudpickle
    ships it by value — executors never import this module."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _Peaks(StatefulProcessor):
        def init(self, handle):
            self._s = handle.getValueState(
                "peak_state", "n BIGINT, peak DOUBLE"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            import pandas as pd

            n, peak = (
                self._s.get() if self._s.exists() else (0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                peak = max(peak, float(pdf["value"].max()))
            self._s.update((n, peak))
            yield pd.DataFrame(
                {
                    "user_id": [key_tuple[0]],
                    "n_events": [n],
                    "peak_value": [peak],
                }
            )

        def close(self):
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=_Peaks(),
        outputStructType=PEAKS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
