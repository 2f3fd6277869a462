"""Row tracking (`enableRowTracking` — Delta's stable row IDs): a
hidden BIGINT id per row, materialized in the data files, preserved
across every data-preserving mutation and assigned fresh above a
monotonic high-water mark for inserts. The substrate for incremental
materialized-view maintenance: consumers join versions on `_row_id`.

Invariants pinned:
- ids are unique and hidden from plain reads; `read(with_row_ids=True)`
  exposes `_row_id`;
- UPDATE / MERGE-matched / apply_changes-surviving rows KEEP their id;
- DELETE survivors keep ids; inserts draw fresh ids above high-water;
- OPTIMIZE/compact and DV commits carry ids (and the high-water mark);
- RESTORE keeps the restored rows' ids and never re-issues used ids;
- the change feed never leaks the internal column;
- rowTracking is a writer-only protocol feature.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import maintenance
from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _make(spark, path, n=8):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i * 10)) for i in range(1, n + 1)],
        ["id", "name", "bal"],
    ).repartition(2)
    mt.commit_overwrite(
        df, path, keys=("id",), properties={"enableRowTracking": True}
    )


def _ids(spark, path):
    return {
        r.id: r._row_id
        for r in mt.read(spark, path, with_row_ids=True).collect()
    }


def test_ids_assigned_unique_and_hidden(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    assert "__row_id" not in mt.read(spark, path).columns
    assert "_row_id" not in mt.read(spark, path).columns
    ids = _ids(spark, path)
    assert len(ids) == 8 and len(set(ids.values())) == 8
    assert all(v is not None for v in ids.values())
    hw = mt._read_marker(path)["row_tracking"]["high_water"]
    assert hw >= max(ids.values())
    assert mt._read_marker(path)["writer_features"] == ["rowTracking"]
    detail = mt.table_detail(path)
    assert detail["writer_features"] == ["rowTracking"]
    assert detail["row_tracking_high_water"] == hw


def test_update_and_delete_preserve_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    before = _ids(spark, path)
    mt.update_where(spark, path, "id = 3", {"bal": F.lit(999.0)})
    mt.delete_where(spark, path, "id >= 7")
    after = _ids(spark, path)
    assert set(after) == {1, 2, 3, 4, 5, 6}
    for k in after:
        assert after[k] == before[k], f"id drifted for key {k}"


def test_merge_matched_keep_ids_inserts_fresh(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    before = _ids(spark, path)
    hw0 = mt._read_marker(path)["row_tracking"]["high_water"]
    src = spark.createDataFrame(
        [(3, "upd", 0.0), (99, "new", 1.0)], ["id", "name", "bal"]
    )
    mt.merge_upsert(spark, path, src, keys=("id",))
    after = _ids(spark, path)
    assert after[3] == before[3]  # matched row keeps its identity
    assert all(after[k] == before[k] for k in before)
    assert after[99] > hw0  # insert drew above the high-water mark
    assert len(set(after.values())) == len(after)


def test_apply_changes_preserves_surviving_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    before = _ids(spark, path)
    feed = spark.createDataFrame(
        [(3, "u3", 5.0, "update_postimage", 10),
         (8, "d8", 0.0, "delete", 11),
         (50, "i50", 2.0, "insert", 12)],
        ["id", "name", "bal", "_change_type", "seq"],
    )
    mt.apply_changes(spark, path, feed, keys=("id",), sequence_col="seq")
    after = _ids(spark, path)
    assert 8 not in after and 50 in after
    assert after[3] == before[3]
    assert all(after[k] == before[k] for k in after if k in before)


def test_optimize_and_dv_carry_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    before = _ids(spark, path)
    maintenance.compact(spark, path, target_file_bytes=1 << 30)
    assert _ids(spark, path) == before
    mt.delete_where(spark, path, "id = 5", deletion_vectors=True)
    after = _ids(spark, path)
    assert 5 not in after and all(after[k] == before[k] for k in after)
    mt.update_where(
        spark, path, "id = 2", {"bal": F.lit(-1.0)}, deletion_vectors=True
    )
    dv_after = _ids(spark, path)
    assert dv_after[2] == before[2]
    maintenance.materialize_deletes(spark, path)
    assert _ids(spark, path) == dv_after


def test_restore_keeps_ids_and_high_water_monotonic(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    v0 = mt.table_version(path)
    before = _ids(spark, path)
    src = spark.createDataFrame([(99, "new", 1.0)], ["id", "name", "bal"])
    mt.merge_upsert(spark, path, src, keys=("id",))
    id99 = _ids(spark, path)[99]
    mt.restore_table(spark, path, version=v0)
    assert _ids(spark, path) == before
    # re-inserting after the rollback must NOT reuse 99's old id
    mt.merge_upsert(
        spark, path,
        spark.createDataFrame([(77, "x", 0.0)], ["id", "name", "bal"]),
        keys=("id",),
    )
    assert _ids(spark, path)[77] > id99


def test_cdf_never_leaks_row_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 5)], ["id", "v"]
    )
    mt.commit_overwrite(
        df, path, keys=("id",),
        properties={"enableRowTracking": True, "enableChangeDataFeed": True},
    )
    mt.update_where(spark, path, "id = 2", {"v": F.lit(9.0)})
    mt.delete_where(spark, path, "id = 3", deletion_vectors=True)
    ch = mt.table_changes(spark, path, 0, mt.table_version(path))
    assert "__row_id" not in ch.columns and "_row_id" not in ch.columns
    assert ch.filter(F.col("_change_type") == "delete").count() == 1


def test_enable_later_materializes_on_next_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["id", "v"])
    mt.commit_overwrite(df, path, keys=("id",))
    mt.set_table_property(path, "enableRowTracking", True)
    # enabled but unmaterialized: ids read NULL
    assert all(
        r._row_id is None
        for r in mt.read(spark, path, with_row_ids=True).collect()
    )
    mt.update_where(spark, path, "id = 1", {"v": F.lit(0.0)})
    ids = _ids(spark, path)
    assert all(v is not None for v in ids.values())


def test_with_row_ids_refuses_untracked_table(spark, tmp_path):
    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.createDataFrame([(1, 1.0)], ["id", "v"]), path, keys=("id",)
    )
    with pytest.raises(ValueError, match="enableRowTracking"):
        mt.read(spark, path, with_row_ids=True)


def test_row_tracking_is_a_gated_writer_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_WRITER_FEATURES",
            mt.SUPPORTED_WRITER_FEATURES - {"rowTracking"},
        )
        # reads stay open (writer-only feature)...
        assert mt.read(spark, path).count() == 8
        # ...but a commit that couldn't maintain ids refuses
        with pytest.raises(mt.ProtocolError, match="rowTracking"):
            mt.delete_where(spark, path, "id = 1")


@pytest.mark.slow
def test_row_id_stability_soak(spark, tmp_path):
    """Model soak of the STABILITY contract: a seeded random DML stream
    (merge / rewriting+DV delete / rewriting+DV update / restore /
    compact / overwrite) against a rowTracking+CDF table, asserting
    after every op that (a) the table equals a dict model, (b) row ids
    stay unique, (c) every key that SURVIVED the op kept its id —
    except across overwrite (reassignment allowed) and restore (ids
    revert to the restored snapshot's map), and (d) freshly inserted
    keys draw ids strictly above the prior high-water mark."""
    import random

    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
        compact,
    )

    rng = random.Random(20260815)
    path = str(tmp_path / "t")

    def _df(model):
        if not model:
            return spark.createDataFrame([], "id long, v string")
        return spark.createDataFrame(sorted(model.items()), "id long, v string")

    model = {i: f"v{i}" for i in range(16)}
    mt.commit_overwrite(
        _df(model), path, keys=("id",),
        properties={"enableRowTracking": True, "enableChangeDataFeed": True},
        max_history=4,
    )

    def _ids():
        out = {}
        for r in mt.read(spark, path, with_row_ids=True).collect():
            out[r.id] = r._row_id
        assert len(set(out.values())) == len(out), "duplicate row ids"
        assert all(v is not None for v in out.values())
        return out

    id_model = _ids()
    id_history = {0: dict(id_model)}
    model_history = {0: dict(model)}
    ops_run = []
    for step in range(22):
        op = rng.choice(
            ["merge", "delete", "delete_dv", "update", "update_dv",
             "restore", "compact", "overwrite"]
        )
        ops_run.append(op)
        hw_before = mt._read_marker(path)["row_tracking"]["high_water"]
        survivors_keep = True  # ids of surviving keys must not move
        if op == "merge":
            delta = {
                i: f"m{step}_{i}"
                for i in rng.sample(range(30), rng.randint(1, 6))
            }
            mt.merge_upsert(
                spark, path, _df(delta), keys=("id",), max_history=4
            )
            model.update(delta)
        elif op in ("delete", "delete_dv"):
            cutoff = rng.randint(0, 30)
            mt.delete_where(
                spark, path, F.col("id") < cutoff,
                deletion_vectors=(op == "delete_dv"), max_history=4,
            )
            model = {i: v for i, v in model.items() if not i < cutoff}
        elif op in ("update", "update_dv"):
            mt.update_where(
                spark, path, F.col("id") % 3 == 0,
                {"v": F.concat(F.col("v"), F.lit("!"))},
                deletion_vectors=(op == "update_dv"), max_history=4,
            )
            model = {
                i: (v + "!" if i % 3 == 0 else v) for i, v in model.items()
            }
        elif op == "restore":
            targets = [
                v for v in mt.list_versions(path)[:-1] if v in id_history
            ]
            if not targets:
                continue
            tgt = rng.choice(targets)
            mt.restore_table(spark, path, tgt, max_history=4)
            model = dict(model_history[tgt])
            id_model = dict(id_history[tgt])
            survivors_keep = None  # checked against the restored map below
        elif op == "compact":
            if mt._read_marker(path).get("dv"):
                continue  # binpack/compact refuse DV tables by contract
            compact(spark, path, target_file_bytes=1 << 20)
        else:  # overwrite: reassignment allowed, uniqueness still holds
            model = {
                i: f"o{step}_{i}"
                for i in rng.sample(range(30), rng.randint(1, 8))
            }
            mt.commit_overwrite(
                _df(model), path, keys=("id",), max_history=4
            )
            survivors_keep = False

        got = {r.id: r.v for r in mt.read(spark, path).collect()}
        assert got == model, (step, ops_run)
        new_ids = _ids()
        assert set(new_ids) == set(model), (step, ops_run)
        if survivors_keep is None:  # restore: exact revert
            assert new_ids == id_model, (step, ops_run)
        elif survivors_keep:
            for k in set(id_model) & set(new_ids):
                assert new_ids[k] == id_model[k], (step, op, k, ops_run)
            for k in set(new_ids) - set(id_model):
                assert new_ids[k] > hw_before, (step, op, k, ops_run)
        hw_after = mt._read_marker(path)["row_tracking"]["high_water"]
        assert hw_after >= hw_before, (step, ops_run)
        id_model = new_ids
        ver = mt.table_version(path)
        id_history[ver] = dict(id_model)
        model_history[ver] = dict(model)
        retained = set(mt.list_versions(path))
        id_history = {v: s for v, s in id_history.items() if v in retained}
        model_history = {
            v: s for v, s in model_history.items() if v in retained
        }
