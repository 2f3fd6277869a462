"""Model-based soak of the managed-table protocol: a seeded random
sequence of DML ops (overwrite / merge / delete / update / restore)
runs against both the real table and a plain-Python dict model, with a
crash injected at a random rename every few ops — after every step the
table must equal the model exactly and the version must move the way
the model predicts. The targeted crash tests pin each rename site; this
pins the COMPOSITION: no operation sequence, crashed or clean, may
leave the table diverged from its spec."""

from __future__ import annotations

import os
import random

import pytest

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

N_OPS = 28
SEED = 20260814


def _df(spark, model: dict[int, str]):
    if not model:
        return spark.createDataFrame([], "id long, v string")
    return spark.createDataFrame(sorted(model.items()), "id long, v string")


def _snapshot(spark, path):
    return {r.id: r.v for r in mt.read(spark, path).collect()}


class _CrashOnce:
    """Raise on the first rename touching the table path, then pass
    everything through (the crashed writer is gone; recovery runs)."""

    def __init__(self, prefix: str):
        self.real = os.rename
        self.prefix = prefix
        self.armed = True

    def __call__(self, src, dst):
        if self.armed and (
            str(src).startswith(self.prefix) or str(dst).startswith(self.prefix)
        ):
            self.armed = False
            raise RuntimeError("injected crash")
        return self.real(src, dst)


@pytest.mark.slow
def test_random_dml_soak_matches_model(spark, tmp_path, monkeypatch):
    rng = random.Random(SEED)
    path = str(tmp_path / "t")
    model: dict[int, str] = {i: f"v{i}" for i in range(20)}
    mt.commit_overwrite(_df(spark, model), path, keys=("id",))
    # model of retained history: version -> contents (bounded like the
    # table's max_history=2 default, so RESTORE targets stay readable)
    history: dict[int, dict[int, str]] = {0: dict(model)}

    ops_run = []
    for step in range(N_OPS):
        op = rng.choice(
            ["overwrite", "merge", "delete", "update", "restore", "crash_merge",
             "compact", "append", "crash_append"]
        )
        ops_run.append(op)
        ver = mt.table_version(path)
        if op == "overwrite":
            model = {
                i: f"o{step}_{i}"
                for i in rng.sample(range(40), rng.randint(1, 12))
            }
            mt.commit_overwrite(_df(spark, model), path, keys=("id",))
        elif op == "merge":
            delta = {
                i: f"m{step}_{i}"
                for i in rng.sample(range(40), rng.randint(1, 8))
            }
            mt.merge_upsert(spark, path, _df(spark, delta), keys=("id",))
            model.update(delta)
        elif op == "delete":
            cutoff = rng.randint(0, 40)
            from pyspark.sql import functions as F

            mt.delete_where(spark, path, F.col("id") < cutoff)
            model = {i: v for i, v in model.items() if not i < cutoff}
        elif op == "update":
            from pyspark.sql import functions as F

            mt.update_where(
                spark,
                path,
                F.col("id") % 3 == 0,
                {"v": F.concat(F.col("v"), F.lit("!"))},
            )
            model = {
                i: (v + "!" if i % 3 == 0 else v) for i, v in model.items()
            }
        elif op == "restore":
            targets = [v for v in mt.list_versions(path)[:-1] if v in history]
            if not targets:
                continue
            tgt = rng.choice(targets)
            mt.restore_table(spark, path, tgt)
            model = dict(history[tgt])
        elif op == "compact":
            # OPTIMIZE in the middle of a DML stream: bytes rewritten,
            # logical table untouched — model is a NO-OP and the version
            # must not move (r6: metadata-preserving compaction markers)
            from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
                compact,
                compact_binpack,
            )

            if rng.random() < 0.5:
                compact(spark, path, target_file_bytes=1 << 20)
            else:
                compact_binpack(spark, path, target_file_bytes=1 << 20)
            assert mt.table_version(path) == ver, (step, ops_run)
        elif op == "append":
            # blind append: fresh ids only (append never updates) —
            # the 100+ id space is untouchable by the delete op's
            # cutoff < 40, so appended rows persist until overwritten
            delta = {
                100 + step * 5 + j: f"a{step}_{j}"
                for j in range(rng.randint(1, 5))
            }
            mt.append_rows(spark, _df(spark, delta), path)
            model.update(delta)
        elif op == "crash_append":
            delta = {
                300 + step * 5 + j: f"ca{step}_{j}"
                for j in range(rng.randint(1, 4))
            }
            crasher = _CrashOnce(path)
            monkeypatch.setattr(os, "rename", crasher)
            try:
                with pytest.raises(RuntimeError, match="injected crash"):
                    mt.append_rows(spark, _df(spark, delta), path)
            finally:
                monkeypatch.setattr(os, "rename", crasher.real)
            mt.recover(path)
            got = _snapshot(spark, path)
            appended = {**model, **delta}
            assert got in (model, appended), (step, ops_run)
            if got == appended:  # crash landed after the publish
                model = appended
        elif op == "crash_merge":
            delta = {
                i: f"c{step}_{i}"
                for i in rng.sample(range(40), rng.randint(1, 6))
            }
            crasher = _CrashOnce(path)
            monkeypatch.setattr(os, "rename", crasher)
            try:
                with pytest.raises(RuntimeError, match="injected crash"):
                    mt.merge_upsert(
                        spark, path, _df(spark, delta), keys=("id",)
                    )
            finally:
                monkeypatch.setattr(os, "rename", crasher.real)
            mt.recover(path)
            got = _snapshot(spark, path)
            merged = {**model, **delta}
            assert got in (model, merged), (step, ops_run)
            if got == merged:  # crash landed after the publish
                model = merged
        # invariant: table == model, version moved monotonically
        assert _snapshot(spark, path) == model, (step, ops_run)
        new_ver = mt.table_version(path)
        assert new_ver >= ver, (step, ops_run)
        history[new_ver] = dict(model)
        # prune model history to what the table still retains
        retained = set(mt.list_versions(path))
        history = {v: s for v, s in history.items() if v in retained}


@pytest.mark.slow
def test_version_scale_soak(spark, tmp_path):
    """Marker/version scale (r9, VERDICT item 6): 150 retained versions
    on one table. Pins that the per-version protocol surfaces stay
    O(versions)-bounded and correct at depth — history() serves every
    version from marker reads alone, mid-history time travel and
    read_as_of resolve, exactly-once txn reads stay O(1), and a
    retention vacuum prunes the whole tail. The 1000-version timing
    profile is documented in SCALING.md (commit cost stays flat; the
    hardlink fan-out is bounded by file count, not version count)."""
    N = 150
    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "0 AS v"), path,
        keys=("id",), max_history=N + 5,
    )
    for i in range(1, N + 1):
        mt.append_rows(
            spark,
            spark.createDataFrame([(1000 + i, i)], "id long, v long"),
            path,
            max_history=N + 5,
            txn={"epoch": i},
        )
    assert mt.table_version(path) == N
    # history: one row per retained version, pure marker reads
    h = mt.history(spark, path).collect()
    assert len(h) == N + 1
    assert sorted(r.version for r in h) == list(range(N + 1))
    ops = {r.version: r.operation for r in h}
    assert ops[0] == "initial" and all(
        ops[v] == "append" for v in range(1, N + 1)
    )
    assert {r.version: r.n_rows for r in h}[N] == 10 + N
    # mid-history time travel + as-of
    mid = N // 2
    assert mt.read(spark, path, version=mid).count() == 10 + mid
    mid_ts = mt._read_marker(
        os.path.join(path + "__history", f"v{mid:06d}")
    )["ts"]
    assert mt.read_as_of(spark, path, mid_ts + 1e-4).count() == 10 + mid
    # txn is the LIVE marker only — O(1) no matter the depth
    assert mt.table_txn(path) == {"epoch": N}
    # retention vacuum prunes the whole tail in one sweep
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
        vacuum,
    )

    removed = vacuum(path)
    assert any(r.endswith("__history") for r in removed)
    assert mt.read(spark, path).count() == 10 + N  # live untouched
