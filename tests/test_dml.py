"""DELETE / UPDATE DML surface on the managed table (the Delta
``DeltaTable.delete``/``update`` analogues)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _make_table(spark, path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        ["id", "name", "bal"],
    )
    mt.initial_write(df, path, partition_by=(), keys=("id",))
    return df


def test_delete_where_removes_only_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    _make_table(spark, path)
    mt.delete_where(spark, path, F.col("bal") > 15)
    left = {r.id for r in mt.read(spark, path).collect()}
    # bal NULL (id=3) must survive: NULL predicate deletes nothing
    assert left == {1, 3}


def test_delete_where_sql_string_condition(spark, tmp_path):
    path = str(tmp_path / "t")
    _make_table(spark, path)
    mt.delete_where(spark, path, "id IN (1, 4)")
    assert {r.id for r in mt.read(spark, path).collect()} == {2, 3}


def test_update_where_touches_only_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    _make_table(spark, path)
    mt.update_where(
        spark,
        path,
        F.col("id") <= 2,
        {"bal": F.col("bal") * 2, "name": F.upper("name")},
    )
    rows = {r.id: (r.name, r.bal) for r in mt.read(spark, path).collect()}
    assert rows[1] == ("A", 20.0)
    assert rows[2] == ("B", 40.0)
    assert rows[3] == ("c", None)  # untouched, incl. NULL-condition rows
    assert rows[4] == ("d", 40.0)


def test_dml_bumps_version_and_time_travel_reads_old(spark, tmp_path):
    path = str(tmp_path / "t")
    _make_table(spark, path)
    v0 = mt.table_version(path)
    mt.delete_where(spark, path, "id = 1")
    assert mt.table_version(path) == v0 + 1
    old = mt.read(spark, path, version=v0)
    assert old.count() == 4
    assert mt.read(spark, path).count() == 3
