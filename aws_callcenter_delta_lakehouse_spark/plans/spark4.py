"""Spark 4 native surface: VARIANT semi-structured type and
transformWithStateInPandas arbitrary stateful streaming — the
current-generation replacements for stringly JSON access and
applyInPandasWithState."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "variant_props_extract",
    oracle="""
    SELECT event_type,
           SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS sum_k,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access: parse_json once into a
    binary variant column, then typed ``variant_get`` paths — unlike
    get_json_object the JSON parses ONCE per row regardless of how many
    fields are extracted, and the variant encoding is columnar-shreddable
    at rest."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_type",
            F.variant_get(v, "$.k", "int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("*").alias("n_events"),
        )
    )


def _has_protobuf() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol; without the google.protobuf package the driver
    worker crashes at init. Gate the query on availability (this
    container has no protobuf — the operator itself is real and the
    test runs wherever the dependency exists)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - env-dependent
        return False


if _has_protobuf():  # pragma: no cover - env-dependent

    @query(
        "streaming_user_peaks",
        oracle="""
        SELECT user_id, COUNT(*) AS n_events, MAX(value) AS peak_value
        FROM events GROUP BY user_id
        """,
    )
    def streaming_user_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
        """transformWithStateInPandas (Spark 4 stateful API): per-user
        running (count, max) in typed value state. The memory sink holds
        one row per key per micro-batch; the final row per key (max
        n_events — strictly increasing) equals the batch aggregate."""
        from ..streaming.stateful import user_peaks
        from ..streaming.streams import run_to_memory, stream_events

        totals = run_to_memory(
            user_peaks(stream_events(spark, sf_dir)),
            f"peaks_{uuid.uuid4().hex[:8]}",
            output_mode="update",
        )
        return totals.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max_by("peak_value", "n_events").alias("peak_value"),
        )
