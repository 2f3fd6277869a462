"""Source/sink format coverage: ORC, JSON, CSV roundtrips preserve data
(the engine is format-agnostic beyond its parquet default)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.catalog import load_table
from tests.conftest import SF001


def test_orc_json_csv_roundtrips(spark, tmp_path):
    src = load_table(spark, SF001, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    n, total = src.count(), src.agg(F.sum("o_orderkey")).collect()[0][0]

    orc = str(tmp_path / "orders_orc")
    src.write.orc(orc)
    got = spark.read.orc(orc)
    assert got.count() == n and got.agg(F.sum("o_orderkey")).collect()[0][0] == total

    js = str(tmp_path / "orders_json")
    src.write.json(js)
    got = spark.read.schema(src.schema).json(js)
    assert got.count() == n and got.agg(F.sum("o_orderkey")).collect()[0][0] == total

    csv = str(tmp_path / "orders_csv")
    src.write.option("header", True).csv(csv)
    got = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
    ).csv(csv, header=True)
    assert got.count() == n and got.agg(F.sum("o_orderkey")).collect()[0][0] == total
