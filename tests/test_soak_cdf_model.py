"""Model-based soak of the CHANGE-FEED composition (round 13): a
seeded random DML stream (merge / delete / update — each sometimes via
deletion vectors — append / restore / compaction / REORG) runs on a
CDF- and row-tracking-enabled table against a plain-Python model, and
after EVERY step two reconstruction invariants must hold:

1. the live table equals the model (the plain soak's invariant);
2. folding ``table_changes(-1, head)`` — every change sidecar since
   creation — rebuilds the model exactly. This is the CDC consumer's
   contract: any divergence means a sidecar recorded the wrong rows
   for some interleaving (the class of bug the per-op CDF tests can't
   see, because it only appears in composition: DV delete after
   restore, compaction between updates, ...).
3. row-tracking ids of rows UNTOUCHED by an op never change, and ids
   never collide — the stable-row-id contract maintenance and DML
   rewrites must preserve through ``_read_logical``.

The plain soak (test_soak_model.py) pins the storage protocol;
this one pins the sidecar/bookkeeping layers stacked on top of it."""

from __future__ import annotations

import random

import pytest

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

# depth matters: the round-13 compaction-of-emptied-table find needed a
# 60-op interleaving (delete-all -> no-match DV update -> binpack) that
# a 22-op run never composed; 40 balances coverage against battery time
# (one-off sweeps at other seeds/depths run before each round's freeze)
N_OPS = 40
SEED = 20260816
H = 200  # retain everything: the fold reads back to the creation commit


def _df(spark, model: dict[int, str]):
    if not model:
        return spark.createDataFrame([], "id long, v string")
    return spark.createDataFrame(sorted(model.items()), "id long, v string")


def _snapshot(spark, path):
    return {r.id: r.v for r in mt.read(spark, path).collect()}


def _row_ids(spark, path):
    return {
        r.id: r._row_id
        for r in mt.read(spark, path, with_row_ids=True).collect()
    }


def _fold_changes(spark, path):
    """Rebuild the table state purely from the change feed: per commit
    version in order, insert/update_postimage set the key, delete
    removes it (update_preimage is informational)."""
    rows = mt.table_changes(
        spark, path, -1, mt.table_version(path)
    ).collect()
    byver: dict[int, list] = {}
    for r in rows:
        byver.setdefault(r._commit_version, []).append(r)
    state: dict[int, str] = {}
    for v in sorted(byver):
        for r in byver[v]:
            if r._change_type in ("insert", "update_postimage"):
                state[r.id] = r.v
            elif r._change_type == "delete":
                state.pop(r.id, None)
    return state


@pytest.mark.slow
def test_random_cdf_dml_soak_fold_matches_model(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
        compact_binpack,
        materialize_deletes,
    )

    rng = random.Random(SEED)
    path = str(tmp_path / "c")
    model: dict[int, str] = {i: f"v{i}" for i in range(12)}
    mt.commit_overwrite(
        _df(spark, model),
        path,
        keys=("id",),
        properties={
            "enableChangeDataFeed": True,
            "enableRowTracking": True,
        },
    )
    history: dict[int, dict[int, str]] = {0: dict(model)}
    dv_active = False
    ops_run: list[str] = []

    for step in range(N_OPS):
        op = rng.choice(
            ["merge", "delete", "update", "append", "restore",
             "compact", "reorg"]
        )
        ops_run.append(op)
        ver = mt.table_version(path)
        prev_ids = _row_ids(spark, path)
        touched: set[int] = set()

        if op == "merge":
            delta = {
                i: f"m{step}_{i}"
                for i in rng.sample(range(30), rng.randint(1, 6))
            }
            mt.merge_upsert(
                spark, path, _df(spark, delta), keys=("id",), max_history=H
            )
            model.update(delta)
            touched = set(delta)
        elif op == "delete":
            cutoff = rng.randint(0, 30)
            dv = rng.random() < 0.5
            mt.delete_where(
                spark, path, F.col("id") < cutoff,
                max_history=H, deletion_vectors=dv,
            )
            touched = {i for i in model if i < cutoff}
            model = {i: v for i, v in model.items() if not i < cutoff}
            dv_active = dv_active or (dv and bool(touched))
        elif op == "update":
            dv = rng.random() < 0.5
            mt.update_where(
                spark, path, F.col("id") % 3 == 0,
                {"v": F.concat(F.col("v"), F.lit("!"))},
                max_history=H, deletion_vectors=dv,
            )
            touched = {i for i in model if i % 3 == 0}
            model = {
                i: (v + "!" if i % 3 == 0 else v) for i, v in model.items()
            }
            dv_active = dv_active or (dv and bool(touched))
        elif op == "append":
            delta = {
                100 + step * 5 + j: f"a{step}_{j}"
                for j in range(rng.randint(1, 4))
            }
            mt.append_rows(spark, _df(spark, delta), path, max_history=H)
            model.update(delta)
            touched = set(delta)
        elif op == "restore":
            targets = [
                v for v in mt.list_versions(path)[:-1] if v in history
            ]
            if not targets:
                continue
            tgt = rng.choice(targets)
            mt.restore_table(spark, path, tgt, max_history=H)
            model = dict(history[tgt])
            touched = set(model) | set(prev_ids)  # rewrite of everything
            dv_active = False  # rewriting commits clear the DV
        elif op == "compact":
            if dv_active:
                continue  # binpack refuses DV tables by contract
            compact_binpack(spark, path, target_file_bytes=1 << 20)
            assert mt.table_version(path) == ver, (step, ops_run)
        elif op == "reorg":
            if not dv_active:
                continue
            materialize_deletes(spark, path)
            dv_active = False

        # invariant 1: live table == model
        assert _snapshot(spark, path) == model, (step, ops_run)
        # invariant 2: the change feed folds back to the model
        assert _fold_changes(spark, path) == model, (step, ops_run)
        # invariant 3: untouched rows keep their row ids; no collisions
        cur_ids = _row_ids(spark, path)
        assigned = [i for i in cur_ids.values() if i is not None]
        assert len(assigned) == len(set(assigned)), (step, ops_run)
        for key, rid in prev_ids.items():
            if key in touched or key not in cur_ids or rid is None:
                continue
            assert cur_ids[key] == rid, (key, step, ops_run)

        new_ver = mt.table_version(path)
        assert new_ver >= ver, (step, ops_run)
        history[new_ver] = dict(model)
        retained = set(mt.list_versions(path))
        history = {v: s for v, s in history.items() if v in retained}
