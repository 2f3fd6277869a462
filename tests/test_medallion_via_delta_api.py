"""Reference Glue-job shape run VERBATIM through the ``DeltaTable``
facade — every Silver write goes through :mod:`delta_api`, none through
``silver_job``'s direct ``managed_table`` calls — and the result must
equal what the engine's own pipeline produces.

This turns "we match the reference API" into an executed claim: the
control flow below is a line-for-line re-enactment of
``/root/reference/glue_jobs/01_silver_delta_upsert.py:96-121``
(``isDeltaTable`` probe, else-branch initial partitioned load,
``forPath().alias("t").merge(source=..., condition="t.call_id =
s.call_id").whenMatchedUpdateAll().whenNotMatchedInsertAll()
.execute()``), fed by the same seeded CSV fixtures the medallion
suite uses."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.functions.validation import (
    REJECT_COL,
    callcenter_rules,
    split_valid_invalid,
    validate_observed,
)
from aws_callcenter_delta_lakehouse_spark.pipeline.silver import (
    _stamp,
    read_raw_calls,
    silver_job,
)
from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
from aws_callcenter_delta_lakehouse_spark.sources.delta_api import DeltaTable
from tests.fixtures import make_call_center_csv, make_reprocess_csv

PDATE = dt.date(2025, 3, 15)


def _reference_job(spark, csv_path: str, silver_path: str) -> None:
    """01_silver_delta_upsert.py:96-121, writes via DeltaTable only."""
    observed, _obs = validate_observed(
        read_raw_calls(spark, csv_path), callcenter_rules()
    )
    validated = _stamp(observed, PDATE)
    valid_df, _invalid_df = split_valid_invalid(validated)
    clean_valid_df = valid_df.drop(REJECT_COL)

    if DeltaTable.isDeltaTable(spark, silver_path):
        delta_table = DeltaTable.forPath(spark, silver_path)
        (
            delta_table.alias("t")
            .merge(
                source=clean_valid_df.alias("s"),
                condition="t.call_id = s.call_id",
            )
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    else:
        # the reference's initial load writes a partitioned Delta table
        # (format("delta").partitionBy("year","month").save); the facade
        # equivalent is a partitioned parquet write adopted in place by
        # CONVERT TO DELTA — after which the table IS managed and every
        # later run takes the merge branch above
        clean_valid_df.write.partitionBy("year", "month").parquet(silver_path)
        DeltaTable.convertToDelta(
            spark, silver_path,
            keys=("call_id",), partition_by=("year", "month"),
        )


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("facade_medallion")
    csv1 = str(root / "raw1.csv")
    csv2 = str(root / "raw2.csv")
    make_call_center_csv(csv1)
    make_reprocess_csv(csv2)
    facade_silver = str(root / "facade_silver")
    engine_silver = str(root / "engine_silver")
    engine_exc = str(root / "engine_exc")
    # facade-driven: initial load then upsert, both through DeltaTable
    _reference_job(spark, csv1, facade_silver)
    _reference_job(spark, csv2, facade_silver)
    # engine pipeline on the same inputs
    silver_job(spark, csv1, engine_silver, engine_exc, processing_date=PDATE)
    silver_job(spark, csv2, engine_silver, engine_exc, processing_date=PDATE)
    return facade_silver, engine_silver


def test_facade_and_pipeline_silver_agree(spark, paths):
    facade_silver, engine_silver = paths
    a = mt.read(spark, facade_silver)
    b = mt.read(spark, engine_silver).select(*a.columns)
    assert a.count() == b.count()
    assert a.subtract(b).isEmpty() and b.subtract(a).isEmpty()


def test_facade_silver_is_managed_with_layout(spark, paths):
    facade_silver, _ = paths
    marker = mt._read_marker(facade_silver)
    assert marker["partition_by"] == ["year", "month"]
    assert marker["keys"] == ["call_id"]
    # version advanced: v0 convert + v1 merge
    assert mt.table_version(facade_silver) >= 1


def test_facade_upsert_applied_updates_and_inserts(spark, paths):
    facade_silver, _ = paths
    df = mt.read(spark, facade_silver)
    # reprocess flips call_ids 1..20 to DROPPED and adds 100001..100010
    flipped = df.filter(
        (F.col("call_id") <= 20) & (F.col("call_status") == "DROPPED")
    )
    assert flipped.count() == 20
    assert df.filter(F.col("call_id") >= 100001).count() == 10
