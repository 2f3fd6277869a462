"""Writer-shaped API (`managed_table.write(df)`): the reference's
first-write idiom
(``/root/reference/glue_jobs/01_silver_delta_upsert.py:115-121``)

    df.write.format("delta").mode("overwrite")
      .partitionBy("year", "month").save(path)

restored as a DRIVER-side builder over the commit protocol (the Python
DataSource writer was prototyped and dropped — its commit() runs in a
worker with no SparkSession; CLAUDE.md r8). Save-mode semantics match
Spark's DataFrameWriter; the medallion initial load runs through the
verbatim-shaped chain."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import (
    managed_table as mt,
    txn_catalog,
)


def _df(spark, lo=0, hi=10, mul=2):
    return spark.range(lo, hi).selectExpr("id", f"id * {mul} AS v")


def test_reference_write_shape_verbatim(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, 2025, 1 + i % 3, f"r{i}") for i in range(30)],
        "call_id INT, year INT, month INT, payload STRING",
    )
    (
        mt.write(df)
        .format("delta")
        .mode("overwrite")
        .partitionBy("year", "month")
        .keys("call_id")
        .save(path)
    )
    assert mt.is_table(spark, path)
    marker = mt._read_marker(path)
    assert marker["partition_by"] == ["year", "month"]
    assert marker["keys"] == ["call_id"]
    assert os.path.isdir(os.path.join(path, "year=2025", "month=1"))
    assert mt.read(spark, path).count() == 30


def test_mode_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    mt.write(_df(spark)).save(path)  # errorifexists default, fresh: ok
    with pytest.raises(ValueError, match="already exists"):
        mt.write(_df(spark)).save(path)
    mt.write(_df(spark, 0, 5, 3)).mode("ignore").save(path)  # no-op
    assert mt.read(spark, path).agg(F.sum("v")).first()[0] == sum(
        i * 2 for i in range(10)
    )
    mt.write(_df(spark, 10, 15)).mode("append").save(path)
    assert mt.read(spark, path).count() == 15
    mt.write(_df(spark, 0, 3, 7)).mode("overwrite").save(path)
    assert mt.read(spark, path).count() == 3
    with pytest.raises(ValueError, match="unknown save mode"):
        mt.write(_df(spark)).mode("upsert")
    with pytest.raises(ValueError, match="managed writer"):
        mt.write(_df(spark)).format("csv")


def test_append_creates_when_absent_and_pins_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(10)], "id INT, p INT, v DOUBLE"
    )
    mt.write(df).mode("append").partitionBy("p").save(path)  # Delta shape
    assert mt.is_table(spark, path)
    # appends never re-partition
    with pytest.raises(ValueError, match="never re-partition"):
        mt.write(df).mode("append").partitionBy("id").save(path)
    mt.write(df.withColumn("id", F.col("id") + 100)).mode("append").save(path)
    assert mt.read(spark, path).count() == 20
    assert mt._read_marker(path)["partition_by"] == ["p"]


def test_save_as_table_roundtrip(spark, tmp_path):
    registry = str(tmp_path / "registry")
    spark.conf.set("spark.managedTable.nameRegistry", registry)
    try:
        p1 = mt.write(_df(spark)).keys("id").saveAsTable("wdb.events")
        assert mt.read(spark, p1).count() == 10
        assert txn_catalog.resolve_table_name(registry, "wdb.events") == p1
        # bound name: overwrite goes to the SAME path
        p2 = (
            mt.write(_df(spark, 0, 4))
            .mode("overwrite")
            .saveAsTable("wdb.events")
        )
        assert p1 == p2
        assert mt.read(spark, p1).count() == 4
    finally:
        spark.conf.unset("spark.managedTable.nameRegistry")


def test_writer_txn_option_exactly_once(spark, tmp_path):
    path = str(tmp_path / "t")
    mt.write(_df(spark)).option("txn", {"app": "w", "last_epoch": 1}).save(path)
    assert mt.table_txn(path)["last_epoch"] == 1
    mt.write(_df(spark, 10, 12)).mode("append").option(
        "txn", {"app": "w", "last_epoch": 2}
    ).save(path)
    assert mt.table_txn(path)["last_epoch"] == 2


def test_medallion_initial_load_through_writer(spark, tmp_path):
    """The reference job's ELSE branch through the builder, then the
    merge branch through the facade — end state equals the engine
    pipeline's silver_job on the same inputs."""
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
    from aws_callcenter_delta_lakehouse_spark.sources.delta_api import (
        DeltaTable,
    )
    from tests.fixtures import make_call_center_csv, make_reprocess_csv

    pdate = dt.date(2025, 3, 15)
    csv1 = str(tmp_path / "raw1.csv")
    csv2 = str(tmp_path / "raw2.csv")
    make_call_center_csv(csv1)
    make_reprocess_csv(csv2)
    writer_silver = str(tmp_path / "writer_silver")
    engine_silver = str(tmp_path / "engine_silver")

    def job(csv_path: str) -> None:
        observed, _ = validate_observed(
            read_raw_calls(spark, csv_path), callcenter_rules()
        )
        valid_df, _invalid = split_valid_invalid(_stamp(observed, pdate))
        clean_valid_df = valid_df.drop(REJECT_COL)
        if DeltaTable.isDeltaTable(spark, writer_silver):
            (
                DeltaTable.forPath(spark, writer_silver).alias("t")
                .merge(
                    source=clean_valid_df.alias("s"),
                    condition="t.call_id = s.call_id",
                )
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
        else:
            (
                mt.write(clean_valid_df)
                .format("delta")
                .mode("overwrite")
                .partitionBy("year", "month")
                .keys("call_id")
                .save(writer_silver)
            )

    job(csv1)
    job(csv2)
    silver_job(
        spark, csv1, engine_silver, str(tmp_path / "exc"),
        processing_date=pdate,
    )
    silver_job(
        spark, csv2, engine_silver, str(tmp_path / "exc"),
        processing_date=pdate,
    )
    a = mt.read(spark, writer_silver)
    b = mt.read(spark, engine_silver)
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    assert a.select(cols).subtract(b.select(cols)).count() == 0
    assert b.select(cols).subtract(a.select(cols)).count() == 0


def test_merge_schema_append_evolves(spark, tmp_path):
    path = str(tmp_path / "t")
    mt.write(_df(spark)).keys("id").save(path)
    widened = spark.range(100, 103).selectExpr(
        "id", "id * 2 AS v", "'new' AS tag"
    )
    # without mergeSchema: refused
    with pytest.raises(Exception, match="never evolve|unknown"):
        mt.write(widened).mode("append").save(path)
    mt.write(widened).mode("append").option("mergeSchema", "true").save(path)
    got = mt.read(spark, path)
    assert set(got.columns) == {"id", "v", "tag"}
    rows = {r.id: r.tag for r in got.collect()}
    assert rows[100] == "new" and rows[0] is None  # old rows: typed NULL
    assert got.count() == 13
    # plain append (no new columns) stays on the hot path afterwards
    mt.write(
        spark.range(200, 202).selectExpr("id", "id * 2 AS v", "'x' AS tag")
    ).mode("append").save(path)
    assert mt.read(spark, path).count() == 15
