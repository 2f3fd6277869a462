"""`appendOnly` table property (Delta `delta.appendOnly`): rows may be
added, never changed or removed — the governance contract audit/event
logs declare. Insert-only merges and data-preserving maintenance pass;
every row-mutating entry point refuses; dropping the property is the
one (audited) escape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import maintenance
from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _make(spark, path):
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(1, 6)], ["id", "name", "v"]
    )
    mt.commit_overwrite(
        df, path, keys=("id",), properties={"appendOnly": True}
    )


def test_insert_only_merge_passes_matched_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    new = spark.createDataFrame([(9, "n9", 90)], ["id", "name", "v"])
    mt.merge_upsert(spark, path, new, keys=("id",))  # pure insert: fine
    assert mt.read(spark, path).count() == 6
    upd = spark.createDataFrame([(1, "CHANGED", 0)], ["id", "name", "v"])
    with pytest.raises(mt.AppendOnlyError, match="insert-only"):
        mt.merge_upsert(spark, path, upd, keys=("id",))
    with pytest.raises(mt.AppendOnlyError, match="not_matched_by_source"):
        mt.merge_upsert(
            spark, path, new, keys=("id",), not_matched_by_source="delete"
        )
    assert mt.read(spark, path).count() == 6


def test_every_mutating_entry_point_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    with pytest.raises(mt.AppendOnlyError, match="DELETE"):
        mt.delete_where(spark, path, "id = 1")
    with pytest.raises(mt.AppendOnlyError, match="DELETE"):
        mt.delete_where(spark, path, "id = 1", deletion_vectors=True)
    with pytest.raises(mt.AppendOnlyError, match="UPDATE"):
        mt.update_where(spark, path, "id = 1", {"v": F.lit(0)})
    with pytest.raises(mt.AppendOnlyError, match="UPDATE"):
        mt.update_where(
            spark, path, "id = 1", {"v": F.lit(0)}, deletion_vectors=True
        )
    with pytest.raises(mt.AppendOnlyError, match="overwrite"):
        mt.commit_overwrite(mt.read(spark, path).limit(1), path, keys=("id",))
    feed = spark.createDataFrame(
        [(1, "x", 0, "delete", 1)], ["id", "name", "v", "_change_type", "s"]
    )
    with pytest.raises(mt.AppendOnlyError, match="APPLY CHANGES"):
        mt.apply_changes(spark, path, feed, keys=("id",), sequence_col="s")
    # purge routes through delete_where and inherits the refusal
    with pytest.raises(mt.AppendOnlyError, match="DELETE"):
        maintenance.purge_rows(spark, path, "id = 1")
    assert mt.read(spark, path).count() == 5


def test_restore_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    v0 = mt.table_version(path)
    mt.merge_upsert(
        spark, path,
        spark.createDataFrame([(9, "n9", 90)], ["id", "name", "v"]),
        keys=("id",),
    )
    with pytest.raises(mt.AppendOnlyError, match="RESTORE"):
        mt.restore_table(spark, path, v0)


def test_data_preserving_maintenance_allowed(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    before = {r.id for r in mt.read(spark, path).collect()}
    maintenance.compact(spark, path, target_file_bytes=1 << 30)
    maintenance.optimize_zorder(spark, path, ["id"], target_file_bytes=1 << 30)
    assert {r.id for r in mt.read(spark, path).collect()} == before
    # table is still appendOnly afterwards (properties carried)
    with pytest.raises(mt.AppendOnlyError):
        mt.delete_where(spark, path, "id = 1")


def test_dropping_the_property_is_the_escape(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.set_table_property(path, "appendOnly", False)
    mt.delete_where(spark, path, "id = 1")
    assert mt.read(spark, path).count() == 4
