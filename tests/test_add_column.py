"""ALTER TABLE ADD COLUMN [DEFAULT] (`add_column`) — metadata-only like
Delta: zero data files touched at ALTER time, pre-ALTER rows read the
declared default (their files lack the column — no NULL/missing
ambiguity), the next rewriting commit materializes the column and sheds
the declaration, DV commits carry it (files unchanged), and the
declaration is protocol-gated (columnDefaults reader+writer feature).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _inodes(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(root, f), path)
                out[rel] = os.stat(os.path.join(root, f)).st_ino
    return out


def _make(spark, path):
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 6)], ["id", "name"]
    )
    mt.initial_write(df, path, keys=("id",))


def test_add_column_is_metadata_only_and_reads_default(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    before = _inodes(path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    assert _inodes(path) == before  # zero files touched
    rows = mt.read(spark, path).collect()
    assert all(r.tier == "bronze" for r in rows) and len(rows) == 5
    assert mt._read_marker(path)["reader_features"] == ["columnDefaults"]


def test_default_none_reads_null(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "score", "double")
    assert all(r.score is None for r in mt.read(spark, path).collect())


def test_next_commit_materializes_and_sheds(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    mt.update_where(spark, path, "id = 1", {"tier": F.lit("gold")})
    m = mt._read_marker(path)
    assert "added_columns" not in m or not m["added_columns"]
    assert "reader_features" not in m
    # physically present now: a raw parquet read sees the column
    assert "tier" in spark.read.parquet(path).columns
    got = {r.id: r.tier for r in mt.read(spark, path).collect()}
    assert got[1] == "gold" and got[2] == "bronze"


def test_merge_source_can_supply_values(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    src = spark.createDataFrame(
        [(2, "n2", "silver"), (9, "n9", "gold")], ["id", "name", "tier"]
    )
    mt.merge_upsert(spark, path, src, keys=("id",))
    got = {r.id: r.tier for r in mt.read(spark, path).collect()}
    assert got == {1: "bronze", 2: "silver", 3: "bronze", 4: "bronze",
                   5: "bronze", 9: "gold"}


def test_dv_delete_carries_declaration(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    mt.delete_where(spark, path, "id = 5", deletion_vectors=True)
    assert mt._read_marker(path)["added_columns"]["tier"]["default"] == "bronze"
    rows = mt.read(spark, path).collect()
    assert len(rows) == 4 and all(r.tier == "bronze" for r in rows)


def test_dv_update_refuses_pending_column_assignment(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    with pytest.raises(ValueError, match="pending ADD COLUMN"):
        mt.update_where(
            spark, path, "id = 1", {"tier": F.lit("gold")},
            deletion_vectors=True,
        )


def test_rename_and_drop_pending_column(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    mt.rename_column(spark, path, "tier", "level")
    assert {r.level for r in mt.read(spark, path).collect()} == {"bronze"}
    mt.drop_column(spark, path, "level")
    assert "level" not in mt.read(spark, path).columns
    assert "added_columns" not in mt._read_marker(path) or not mt._read_marker(
        path
    )["added_columns"]


def test_duplicate_and_unstorable_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    with pytest.raises(ValueError, match="already exists"):
        mt.add_column(spark, path, "name", "string")
    with pytest.raises(TypeError):
        mt.add_column(spark, path, "blob", "binary", default=b"\x00")
    # a bad declaration fails the ALTER, not every later read
    with pytest.raises(ValueError, match="invalid type"):
        mt.add_column(spark, path, "x", "strnig", default="a")
    with pytest.raises(ValueError, match="incompatible default"):
        mt.add_column(spark, path, "y", "array<int>", default="nope")
    assert "added_columns" not in mt._read_marker(path)


def test_stripped_build_refuses_read_and_write(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_READER_FEATURES",
            mt.SUPPORTED_READER_FEATURES - {"columnDefaults"},
        )
        mp.setattr(
            mt,
            "SUPPORTED_WRITER_FEATURES",
            mt.SUPPORTED_WRITER_FEATURES - {"columnDefaults"},
        )
        with pytest.raises(mt.ProtocolError, match="columnDefaults"):
            mt.read(spark, path).count()
        with pytest.raises(mt.ProtocolError, match="columnDefaults"):
            mt.delete_where(spark, path, "id = 1")
    assert mt.read(spark, path).count() == 5


def test_dv_update_with_cdf_and_pending_column(spark, tmp_path):
    """The DV UPDATE's change record must union pre/post images even
    while a pending ADD COLUMN is synthesized on the logical side only
    (regression: phys-cast post-images lost the column and the
    unionByName threw)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 5)], ["id", "v"])
    mt.commit_overwrite(
        df, path, keys=("id",),
        properties={"enableChangeDataFeed": True},
    )
    mt.add_column(spark, path, "tier", "string", default="bronze")
    mt.update_where(
        spark, path, "id = 2", {"v": F.lit(9.0)}, deletion_vectors=True
    )
    ch = mt.table_changes(spark, path, mt.table_version(path) - 1)
    rows = {r._change_type: r for r in ch.collect()}
    assert rows["update_preimage"].tier == "bronze"
    assert rows["update_postimage"].tier == "bronze"
    assert rows["update_postimage"].v == 9.0


def test_merge_source_without_pending_column_gets_default(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    # old-schema source: no tier column — must not throw, inserts/updates
    # take the declared default
    src = spark.createDataFrame([(2, "upd"), (9, "new")], ["id", "name"])
    mt.merge_upsert(spark, path, src, keys=("id",))
    got = {r.id: r.tier for r in mt.read(spark, path).collect()}
    assert got[9] == "bronze" and got[2] == "bronze"


def test_apply_changes_feed_without_pending_column(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_column(spark, path, "tier", "string", default="bronze")
    feed = spark.createDataFrame(
        [(1, "u1", "update_postimage", 10), (9, "n9", "insert", 11)],
        ["id", "name", "_change_type", "seq"],
    )
    mt.apply_changes(spark, path, feed, keys=("id",), sequence_col="seq")
    got = {r.id: r.tier for r in mt.read(spark, path).collect()}
    assert got[1] == "bronze" and got[9] == "bronze"
