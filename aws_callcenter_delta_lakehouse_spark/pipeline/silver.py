"""Silver job: CSV ingest -> DQ validation -> valid/invalid split ->
MERGE upsert to Silver -> exception append.

Re-expression of ``/root/reference/glue_jobs/01_silver_delta_upsert.py``
with two deliberate parameterizations (SURVEY.md §7.5):

- ``processing_date`` replaces ``F.current_date()`` so runs are
  replayable/testable (the reference stamps wall-clock date, :83-84);
- ``run_id`` is appended to exception rows so the append-only audit
  sink (quirk Q6) remains append-only but attributable.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.validation import (
    REJECT_COL,
    callcenter_rules,
    split_valid_invalid,
    validate_observed,
)
from ..sources import managed_table

# Explicit DDL read schema — no inference (01_silver_delta_upsert.py:38).
CALL_SCHEMA = (
    "call_id INT,caller_id INT,agent_id INT,"
    "call_start_time STRING,call_end_time STRING,call_status STRING"
)
SILVER_KEYS = ("call_id",)
PARTITIONS = ("year", "month")


def read_raw_calls(spark: SparkSession, csv_path: str) -> DataFrame:
    """S1: CSV scan with header + fixed schema
    (01_silver_delta_upsert.py:38-39). Type-invalid INT fields become
    NULL here and are caught by the not-null rule (quirk Q2)."""
    return spark.read.schema(CALL_SCHEMA).csv(csv_path, header=True)


def _stamp(df: DataFrame, processing_date: dt.date) -> DataFrame:
    """Partition stamps from the processing date
    (01_silver_delta_upsert.py:83-84)."""
    d = F.lit(processing_date)
    return df.withColumns({"year": F.year(d), "month": F.month(d)})


def silver_job(
    spark: SparkSession,
    source_csv: str,
    silver_path: str,
    exception_path: str,
    processing_date: dt.date | None = None,
    run_id: str | None = None,
) -> dict[str, int]:
    """Run the full Silver flow; returns row-count telemetry."""
    processing_date = processing_date or dt.date.today()

    # Telemetry rides the write actions via df.observe — no dedicated
    # count() passes (at 100 TB a metrics count is a second full scan).
    # The observe node sits ABOVE the valid/invalid filters, and every
    # action that can complete it first (the merge path's dup probe, the
    # staged write) contains an aggregate or full write, so the metrics
    # always reflect the complete input.
    observed, obs = validate_observed(
        read_raw_calls(spark, source_csv), callcenter_rules()
    )
    validated = _stamp(observed, processing_date)
    valid_df, invalid_df = split_valid_invalid(validated)
    # the MERGE path consumes the valid branch more than once (dup
    # probe + anti-join write) — share one materialization
    clean_valid_df = valid_df.drop(REJECT_COL).cache()
    try:
        action = managed_table.write_or_merge(
            spark, clean_valid_df, silver_path, SILVER_KEYS, PARTITIONS
        )
        invalid_out = (
            invalid_df.withColumn("run_id", F.lit(run_id))
            if run_id is not None
            else invalid_df
        )
        managed_table.append_partitioned(invalid_out, exception_path, PARTITIONS)
    finally:
        clean_valid_df.unpersist()
    metrics = obs.get
    n_rows = int(metrics["n_rows"] or 0)
    n_invalid = int(metrics["n_invalid"] or 0)
    return {"valid": n_rows - n_invalid, "invalid": n_invalid, "action": action}
