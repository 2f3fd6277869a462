"""Write-time schema enforcement (`commit_overwrite(schema_mode=)`) —
the Delta contract: a commit over an existing table refuses to add,
drop, or retype columns unless the writer opts in (mergeSchema /
overwriteSchema). Silent schema drift is the failure mode; the default
must be loud.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _make(spark, path):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i * 10)) for i in range(1, 9)],
        ["id", "name", "bal"],
    )
    mt.initial_write(df, path, keys=("id",))


def test_enforce_refuses_added_and_dropped_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    v0 = mt.table_version(path)
    wider = spark.createDataFrame(
        [(1, "a", 1.0, "x")], ["id", "name", "bal", "extra"]
    )
    with pytest.raises(mt.SchemaEnforcementError, match="extra"):
        mt.commit_overwrite(wider, path, keys=("id",))
    narrower = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(mt.SchemaEnforcementError, match="bal"):
        mt.commit_overwrite(narrower, path, keys=("id",))
    # refused commits leave no version behind
    assert mt.table_version(path) == v0
    assert mt.read(spark, path).count() == 8


def test_enforce_refuses_retype_even_under_merge(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    retyped = spark.createDataFrame(
        [(1, "a", 1)], ["id", "name", "bal"]  # bal: double -> long
    )
    for mode in ("enforce", "merge"):
        with pytest.raises(mt.SchemaEnforcementError, match="bal"):
            mt.commit_overwrite(retyped, path, keys=("id",), schema_mode=mode)
    # overwriteSchema is the explicit escape
    mt.commit_overwrite(retyped, path, keys=("id",), schema_mode="overwrite")
    assert dict(mt.read(spark, path).dtypes)["bal"] == "bigint"


def test_enforce_accepts_reordered_and_renullabled(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    # column order and nullability are not schema drift
    reordered = spark.createDataFrame(
        [(5.0, "z", 99)], ["bal", "name", "id"]
    ).select("bal", "name", "id")
    mt.commit_overwrite(reordered, path, keys=("id",))
    assert mt.read(spark, path).count() == 1


def test_merge_mode_widens_and_null_fills(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    # frame lacks `bal`, brings `extra`: merge NULL-fills bal, adds extra
    evolved = spark.createDataFrame([(99, "z", "x")], ["id", "name", "extra"])
    mt.commit_overwrite(evolved, path, keys=("id",), schema_mode="merge")
    row = mt.read(spark, path).first()
    assert set(mt.read(spark, path).columns) == {"id", "name", "bal", "extra"}
    assert row.bal is None and row.extra == "x"


def test_generated_and_identity_columns_are_exempt(spark, tmp_path):
    path = str(tmp_path / "g")
    df = spark.createDataFrame([(1, 2.0)], ["id", "v"])
    mt.commit_overwrite(
        df, path, keys=("id",), generated={"v2": "v * 2"},
        identity={"rid": {"start": 1, "step": 1}},
    )
    # a later commit supplies only the base columns: generated/identity
    # are recomputed/filled by the commit, not schema drift
    mt.commit_overwrite(spark.createDataFrame([(2, 3.0)], ["id", "v"]), path)
    row = mt.read(spark, path).first()
    assert row.v2 == 6.0 and row.rid is not None


def test_merge_upsert_without_evolution_still_guarded(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "A", 0.0, True)],
                                ["id", "name", "bal", "flag"])
    with pytest.raises(ValueError, match="schema_evolution"):
        mt.merge_upsert(spark, path, src, keys=("id",))
    mt.merge_upsert(spark, path, src, keys=("id",), schema_evolution=True)
    assert "flag" in mt.read(spark, path).columns


def test_restore_reinstates_pre_evolution_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    v0 = mt.table_version(path)
    src = spark.createDataFrame([(1, "A", 0.0, True)],
                                ["id", "name", "bal", "flag"])
    mt.merge_upsert(spark, path, src, keys=("id",), schema_evolution=True)
    mt.restore_table(spark, path, version=v0)
    assert "flag" not in mt.read(spark, path).columns
