"""Round-10 commit-CAS hardening (advice items 1-4).

1. Hardlinking commits SHED an exported ``_delta_log`` (a carried log
   would hand external Delta engines a stale file inventory).
2. Stale-lock steal is an ATOMIC RENAME, never a blind remove (two
   stealers can no longer delete each other's fresh lock), release is
   ownership-verified, and a VERSION CLAIM (put-if-absent, the
   filesystem analogue of Delta's conditional log PUT) makes
   two-writers-same-version structurally impossible even across a
   lock breach.
3. ``DeltaTableBuilder.clusterBy()`` with no columns fails at
   declaration time.
4. A DV-enabling commit drops registered raw-parquet SQL views.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from aws_callcenter_delta_lakehouse_spark.sources import (
    maintenance,
    managed_table as mt,
)


def _mk(spark, path, n=20):
    df = spark.range(0, n).selectExpr("id", "id * 2 AS v")
    mt.commit_overwrite(df, path, keys=("id",))
    return df


# -- 1. _delta_log shed by hardlinking commits ---------------------------


def test_append_sheds_exported_delta_log(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    maintenance.export_delta_log(spark, path)
    assert os.path.isdir(os.path.join(path, "_delta_log"))
    mt.append_rows(
        spark, spark.range(100, 105).selectExpr("id", "id * 2 AS v"), path
    )
    # the stale log (describing the pre-append snapshot) must be GONE
    assert not os.path.exists(os.path.join(path, "_delta_log"))
    assert mt.read(spark, path).count() == 25


def test_dv_delete_sheds_exported_delta_log(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    maintenance.export_delta_log(spark, path)
    mt.delete_where(spark, path, "id < 5", deletion_vectors=True)
    assert not os.path.exists(os.path.join(path, "_delta_log"))
    assert mt.read(spark, path).count() == 15


# -- 2a. atomic stale steal ----------------------------------------------


def test_steal_stale_removes_genuinely_stale_lock(tmp_path):
    lock = str(tmp_path / "t__commitlock")
    with open(lock, "w") as f:
        f.write(json.dumps({"token": "dead", "ts": 0.0}))
    old = time.time() - 3600
    os.utime(lock, (old, old))
    mt._steal_stale(lock)
    assert not os.path.exists(lock)


def test_steal_stale_restores_fresh_victim(tmp_path):
    # a FRESH lock captured in the probe->rename TOCTOU window is put
    # back, so the live holder keeps its exclusion
    lock = str(tmp_path / "t__commitlock")
    payload = json.dumps({"token": "alive", "ts": time.time()})
    with open(lock, "w") as f:
        f.write(payload)
    mt._steal_stale(lock)
    assert os.path.exists(lock)
    assert json.loads(open(lock).read())["token"] == "alive"
    # no tombstone droppings
    assert [p for p in os.listdir(tmp_path) if ".steal." in p] == []


def test_release_is_ownership_verified(tmp_path):
    # holder whose lock was stolen must NOT remove the thief's
    # successor's lock on release
    path = str(tmp_path / "t")
    cm = mt._commit_lock(path)
    cm.__enter__()
    lock = path + mt._LOCK_SUFFIX
    os.remove(lock)  # simulate a steal...
    with open(lock, "w") as f:  # ...and a new holder
        f.write(json.dumps({"token": "thief", "ts": time.time()}))
    cm.__exit__(None, None, None)
    assert os.path.exists(lock)  # foreign lock survives our release
    os.remove(lock)


# -- 2b. version claim CAS ------------------------------------------------


def test_fresh_claim_blocks_same_version_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    v = mt.table_version(path)
    claim = f"{path}{mt._CLAIM_SUFFIX}{v + 1:06d}"
    with open(claim, "w") as f:  # a concurrent writer mid-publish
        f.write(json.dumps({"pid": 0, "ts": time.time()}))
    df = spark.range(0, 5).selectExpr("id", "id * 3 AS v")
    with pytest.raises(mt.ConcurrentWriteError):
        mt.commit_overwrite(df, path, keys=("id",), expected_version=v)
    os.remove(claim)
    mt.commit_overwrite(df, path, keys=("id",), expected_version=v)
    assert mt.read(spark, path).count() == 5


def test_stale_claim_is_stolen_and_commit_proceeds(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    v = mt.table_version(path)
    claim = f"{path}{mt._CLAIM_SUFFIX}{v + 1:06d}"
    with open(claim, "w") as f:  # crashed writer's orphan
        f.write(json.dumps({"pid": 0, "ts": 0.0}))
    old = time.time() - 3600
    os.utime(claim, (old, old))
    df = spark.range(0, 5).selectExpr("id", "id * 3 AS v")
    mt.commit_overwrite(df, path, keys=("id",), expected_version=v)
    assert mt.read(spark, path).count() == 5


def test_claims_swept_past_keep_horizon(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 3).selectExpr("id", "id AS v")
    n = mt._CLAIM_KEEP + 3
    for i in range(n):
        mt.commit_overwrite(df, path, keys=("id",))
    claims = sorted(
        p
        for p in os.listdir(tmp_path)
        if mt._CLAIM_SUFFIX.lstrip("/") in p and ".steal." not in p
    )
    versions = [int(c.rsplit("_v", 1)[1]) for c in claims]
    live = mt.table_version(path)
    assert max(versions) == live
    assert min(versions) > live - mt._CLAIM_KEEP  # old ones swept
    # failed publish releases its claim: conflicting commit leaves none
    v = mt.table_version(path)
    claim = f"{path}{mt._CLAIM_SUFFIX}{v + 1:06d}"
    with open(claim, "w") as f:
        f.write("{}")
    with pytest.raises(mt.ConcurrentWriteError):
        mt.commit_overwrite(df, path, keys=("id",), expected_version=v)
    os.remove(claim)


def test_vacuum_sweeps_stale_claims_and_tombstones(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    stale_claim = f"{path}{mt._CLAIM_SUFFIX}000099"
    tomb = path + mt._LOCK_SUFFIX + ".steal.123.abc"
    for p in (stale_claim, tomb):
        with open(p, "w") as f:
            f.write("{}")
        old = time.time() - 3600
        os.utime(p, (old, old))
    removed = maintenance.vacuum(path, retain_history=True)
    assert stale_claim in removed and tomb in removed
    assert not os.path.exists(stale_claim) and not os.path.exists(tomb)


# -- 3. clusterBy validation ----------------------------------------------


def test_clusterby_empty_raises(spark, tmp_path):
    from aws_callcenter_delta_lakehouse_spark.sources.delta_api import (
        DeltaTable,
    )

    b = DeltaTable.create(spark).location(str(tmp_path / "t")).addColumn(
        "id", "bigint"
    )
    with pytest.raises(ValueError, match="at least one column"):
        b.clusterBy()


# -- 4. DV commit invalidates registered SQL views ------------------------


def test_dv_delete_drops_registered_sql_view(spark, tmp_path):
    from aws_callcenter_delta_lakehouse_spark.sources import (
        delta_api,
        txn_catalog,
    )

    registry = str(tmp_path / "registry")
    path = str(tmp_path / "t")
    _mk(spark, path)
    txn_catalog.register_table_name(registry, "cas_db.cas_t", path)
    try:
        spark.conf.set("spark.managedTable.nameRegistry", registry)
        quoted = delta_api.register_sql_view(spark, "cas_db.cas_t")
        assert spark.sql(f"SELECT count(*) c FROM {quoted}").first()["c"] == 20
        with pytest.warns(UserWarning, match="deletion vectors"):
            mt.delete_where(spark, path, "id < 5", deletion_vectors=True)
        # the raw view is GONE (would have served the deleted rows)
        assert not spark.catalog.tableExists(quoted.replace("`", ""))
        # engine reads serve the post-delete rows
        assert mt.read(spark, path).count() == 15
        assert not os.path.exists(path + mt._SQL_VIEWS_SUFFIX)
    finally:
        spark.conf.unset("spark.managedTable.nameRegistry")
        spark.sql("DROP DATABASE IF EXISTS cas_db CASCADE")
