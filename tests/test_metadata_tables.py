"""Queryable metadata tables (sources/metadata_tables.py + the
``t$kind`` rewrite in sources/sql_dml.py)."""

from __future__ import annotations

import os

import pytest

from aws_callcenter_delta_lakehouse_spark.sources import (
    managed_table as mt,
    sql_dml,
    txn_catalog,
)
from aws_callcenter_delta_lakehouse_spark.sources.metadata_tables import (
    files_table,
    partitions_table,
    snapshots_table,
)


@pytest.fixture()
def registry(spark, tmp_path):
    reg = str(tmp_path / "registry")
    spark.conf.set("spark.managedTable.nameRegistry", reg)
    yield reg
    spark.conf.unset("spark.managedTable.nameRegistry")


def _seed(spark, tmp_path, registry, name="md.t"):
    df = spark.range(20).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS seg"
    ).repartition(1)
    path = str(tmp_path / "t")
    mt.commit_overwrite(df, path, partition_by=["seg"])
    txn_catalog.register_table_name(registry, name, path)
    return path


def test_files_and_partitions_shapes(spark, registry, tmp_path):
    path = _seed(spark, tmp_path, registry)
    f = files_table(spark, path)
    assert f.columns == ["seg", "file_path", "size_bytes", "n_rows"]
    rows = f.collect()
    assert len(rows) == 3  # repartition(1) -> one file per partition
    assert sum(r["n_rows"] for r in rows) == 20
    assert all(r["size_bytes"] > 0 for r in rows)
    assert all(r["file_path"].startswith(f"seg={r['seg']}") for r in rows)
    p = partitions_table(spark, path)
    assert p.columns == ["seg", "n_files", "n_rows", "size_bytes"]
    by_seg = {r["seg"]: r for r in p.collect()}
    assert set(by_seg) == {"0", "1", "2"}
    assert all(r["n_files"] == 1 for r in by_seg.values())


def test_append_grows_files_snapshot_count(spark, registry, tmp_path):
    path = _seed(spark, tmp_path, registry)
    extra = spark.range(20, 26).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS seg"
    ).repartition(1)
    mt.append_rows(spark, extra, path)
    p = {r["seg"]: r for r in partitions_table(spark, path).collect()}
    assert all(r["n_files"] == 2 for r in p.values())
    assert sum(r["n_rows"] for r in p.values()) == 26
    s = snapshots_table(spark, path)
    assert s.count() == 2  # v0 + append, both retained


def test_files_reports_physical_rows_under_dv(spark, registry, tmp_path):
    path = _seed(spark, tmp_path, registry)
    mt.delete_where(spark, path, "id = 3", deletion_vectors=True)
    f = files_table(spark, path)
    # physical counts: the soft-deleted row is still in its file
    assert sum(r["n_rows"] for r in f.collect()) == 20
    assert mt.read(spark, path).count() == 19


def test_sql_dollar_rewrite_and_join(spark, registry, tmp_path):
    _seed(spark, tmp_path, registry)
    out = sql_dml.sql(
        spark,
        "SELECT p.seg, p.n_files, f.nf FROM md.t$partitions p JOIN "
        "(SELECT seg, COUNT(*) AS nf FROM md.t$files GROUP BY seg) f "
        "ON p.seg = f.seg ORDER BY p.seg",
    )
    rows = [(r["seg"], r["n_files"], r["nf"]) for r in out.collect()]
    assert rows == [("0", 1, 1), ("1", 1, 1), ("2", 1, 1)]
    # unknown registry name passes through untouched -> Spark errors
    with pytest.raises(Exception):
        sql_dml.sql(spark, "SELECT * FROM nosuch.table$files")


def test_unpartitioned_partitions_table(spark, registry, tmp_path):
    df = spark.range(7).repartition(1)
    path = str(tmp_path / "flat")
    mt.commit_overwrite(df, path)
    p = partitions_table(spark, path).collect()
    assert len(p) == 1
    assert p[0]["n_rows"] == 7
