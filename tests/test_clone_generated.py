"""Shallow clone, generated columns, identity columns on the managed
table — the Delta CLONE / GENERATED ALWAYS AS / IDENTITY analogues."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _base(spark, path, n=100):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("x"),
    )
    mt.commit_overwrite(df, path, keys=("k",))
    return df


# ---------------------------------------------------------------- clone

def test_clone_reads_equal_and_shares_inodes(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _base(spark, src)
    info = mt.clone_table(src, dst)
    assert info["files_linked"] > 0
    assert mt.read(spark, dst).subtract(mt.read(spark, src)).isEmpty()
    assert mt.read(spark, src).subtract(mt.read(spark, dst)).isEmpty()
    # zero-copy: at least one parquet file shares an inode with the src
    src_parquets = {
        os.path.basename(p): os.stat(p).st_ino
        for p in glob.glob(os.path.join(src, "*.parquet"))
    }
    shared = [
        p
        for p in glob.glob(os.path.join(dst, "*.parquet"))
        if src_parquets.get(os.path.basename(p)) == os.stat(p).st_ino
    ]
    assert shared, "clone copied bytes instead of hardlinking"
    # fresh identity: version restarts at 0 with provenance
    assert mt.table_version(dst) == 0
    prov = mt._read_marker(dst)["cloned_from"]
    assert prov["path"] == os.path.abspath(src)


def test_clone_diverges_independently(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _base(spark, src)
    mt.clone_table(src, dst)
    patch = spark.createDataFrame([(0, 999.0)], ["k", "x"])
    mt.merge_upsert(spark, dst, patch, keys=["k"])
    assert mt.read(spark, dst).filter("k = 0").first()["x"] == 999.0
    assert mt.read(spark, src).filter("k = 0").first()["x"] == 0.0
    # dropping the source must not strand the clone (hardlink refcount)
    shutil.rmtree(src)
    assert mt.read(spark, dst).count() == 100


def test_clone_carries_constraints(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _base(spark, src)
    mt.add_constraint(spark, src, "x_nonneg", "x >= 0")
    mt.clone_table(src, dst)
    bad = spark.createDataFrame([(0, -1.0)], ["k", "x"])
    with pytest.raises(mt.ConstraintViolationError):
        mt.merge_upsert(spark, dst, bad, keys=["k"])


def test_clone_refuses_existing_destination(spark, tmp_path):
    src = str(tmp_path / "src")
    _base(spark, src)
    with pytest.raises(ValueError, match="already exists"):
        mt.clone_table(src, src)


# ---------------------------------------------------- generated columns

def test_generated_column_computed_and_maintained(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], ["k", "price"]
    )
    mt.commit_overwrite(
        df, path, keys=("k",), generated={"price_cents": "CAST(price * 100 AS BIGINT)"}
    )
    got = {r.k: r.price_cents for r in mt.read(spark, path).collect()}
    assert got == {1: 1000, 2: 2000}
    # MERGE without the derived column: recomputed for new + kept rows
    patch = spark.createDataFrame([(2, 25.0), (3, 30.0)], ["k", "price"])
    mt.merge_upsert(spark, path, patch, keys=["k"])
    got = {r.k: r.price_cents for r in mt.read(spark, path).collect()}
    assert got == {1: 1000, 2: 2500, 3: 3000}


def test_generated_column_recomputed_after_update(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0)], ["k", "price"])
    mt.commit_overwrite(
        df, path, keys=("k",), generated={"price_cents": "CAST(price * 100 AS BIGINT)"}
    )
    mt.update_where(spark, path, "k = 1", {"price": F.lit(99.0)})
    row = mt.read(spark, path).first()
    assert row["price_cents"] == 9900  # no stale derived value


def test_generated_column_overrides_writer_value(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0)], ["k", "price"])
    mt.commit_overwrite(
        df, path, keys=("k",), generated={"price_cents": "CAST(price * 100 AS BIGINT)"}
    )
    lying = spark.createDataFrame(
        [(1, 10.0, 42)], ["k", "price", "price_cents"]
    )
    mt.commit_overwrite(lying, path, keys=("k",))
    assert mt.read(spark, path).first()["price_cents"] == 1000


# ----------------------------------------------------- identity columns

def test_identity_fills_nulls_on_lattice_above_high_water(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", None), ("b", None), ("c", None)],
        "name string, uid bigint",
    )
    mt.commit_overwrite(
        df, path, keys=("name",), identity={"uid": {"start": 100, "step": 5}}
    )
    ids1 = {r.name: r.uid for r in mt.read(spark, path).collect()}
    assert len(set(ids1.values())) == 3  # unique
    assert all(v >= 100 and (v - 100) % 5 == 0 for v in ids1.values())
    hw1 = mt.table_identity_columns(path)["uid"]["high_water"]
    assert hw1 == max(ids1.values())
    # second commit: existing ids stable, new rows strictly above hw
    patch = spark.createDataFrame([("d", None)], "name string, uid bigint")
    mt.merge_upsert(spark, path, patch, keys=["name"])
    ids2 = {r.name: r.uid for r in mt.read(spark, path).collect()}
    for k, v in ids1.items():
        assert ids2[k] == v
    assert ids2["d"] > hw1 and (ids2["d"] - 100) % 5 == 0
    assert len(set(ids2.values())) == 4


def test_identity_source_may_omit_column(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", None)], "name string, uid bigint"
    )
    mt.commit_overwrite(
        df, path, keys=("name",), identity={"uid": {"start": 1, "step": 1}}
    )
    patch = spark.createDataFrame([("b",)], "name string")  # no uid at all
    mt.merge_upsert(spark, path, patch, keys=["name"])
    ids = {r.name: r.uid for r in mt.read(spark, path).collect()}
    assert len(set(ids.values())) == 2 and None not in ids.values()


# -------------------------------------------------------------- restore

def test_restore_rolls_content_forward_as_new_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path, n=10)                                   # v0
    mt.commit_overwrite(
        mt.read(spark, path).filter(F.col("k") < 5), path, keys=("k",)
    )                                                          # v1
    mt.commit_overwrite(
        mt.read(spark, path).filter(F.col("k") < 2), path, keys=("k",)
    )                                                          # v2
    info = mt.restore_table(spark, path, version=1)
    assert info == {"restored_version": 1, "new_version": 3}
    # content equals v1, served as a NEW version — history moved forward
    assert mt.read(spark, path).count() == 5
    assert mt.table_txn(path) == {"restore_of": 1}
    # the pre-restore state (v2) is retained: a restore can be undone
    assert 2 in mt.list_versions(path)
    mt.restore_table(spark, path, version=2)
    assert mt.read(spark, path).count() == 2
    assert mt.table_version(path) == 4


def test_restore_unknown_version_is_loud(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path, n=4)
    with pytest.raises(ValueError):
        mt.restore_table(spark, path, version=7)


def test_identity_high_water_survives_restore(spark, tmp_path):
    """Delta contract: rolling data back never re-issues identity
    values. Restore to a version whose max id is lower, then insert a
    NULL-id row — it must mint an id ABOVE the all-time high water."""
    path = str(tmp_path / "t")
    df0 = spark.range(3).select(
        F.col("id").alias("k"), F.lit(None).cast("bigint").alias("rid")
    )
    mt.commit_overwrite(
        df0, path, keys=("k",), identity={"rid": {"start": 1, "step": 1}}
    )                                                          # v0: rids minted
    high0 = max(r.rid for r in mt.read(spark, path).collect())
    # v1: more rows -> higher rids
    more = spark.range(3, 6).select(
        F.col("id").alias("k"),
        F.lit(None).cast("bigint").alias("rid"),
    )
    mt.commit_overwrite(
        mt.read(spark, path).unionByName(more), path, keys=("k",)
    )
    high1 = max(r.rid for r in mt.read(spark, path).collect())
    assert high1 > high0
    mt.restore_table(spark, path, version=0)
    assert mt.table_identity_columns(path)["rid"]["high_water"] >= high1
    add = spark.range(10, 11).select(
        F.col("id").alias("k"), F.lit(None).cast("bigint").alias("rid")
    )
    mt.commit_overwrite(
        mt.read(spark, path).unionByName(add), path, keys=("k",)
    )
    new_rid = [r.rid for r in mt.read(spark, path).filter(F.col("k") == 10).collect()]
    assert all(r > high1 for r in new_rid)


# ----------------------------------------------------------- primary key

def test_unique_keys_enforced_on_every_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("x"))
    mt.commit_overwrite(df, path, keys=("k",), unique_keys=True)
    # clean second commit (flag persists without re-declaring)
    mt.commit_overwrite(df, path, keys=("k",))
    assert mt._read_marker(path)["unique_keys"] is True
    # duplicate key tuple -> abort, table untouched
    dup = df.unionByName(spark.range(1).select(
        F.col("id").alias("k"), F.lit(9.0).alias("x")))
    with pytest.raises(mt.ConstraintViolationError, match="PRIMARY KEY"):
        mt.commit_overwrite(dup, path, keys=("k",))
    assert mt.read(spark, path).count() == 5
    assert mt.table_version(path) == 1


def test_unique_keys_requires_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="unique_keys"):
        mt.commit_overwrite(df, path, unique_keys=True)


def test_unique_keys_off_by_default(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(3).select((F.col("id") % 2).alias("k"))
    mt.commit_overwrite(df, path, keys=("k",))  # dups allowed: no PK
    assert mt.read(spark, path).count() == 3
