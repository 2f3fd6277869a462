"""Cross-process managed-TABLE commit race (two real Spark JVMs).

Layering contract (mirrors Delta): the per-table stage-and-swap gives
ATOMICITY — a reader, and the final state, always see one writer's
(data, marker) pair, never a mix — while optimistic concurrency
(``expected_version``) narrows but does not close the lost-update
window (rename alone cannot build CAS). EXCLUSION for concurrent
writers is the txn CATALOG's job, whose put-if-absent versioned
manifest is raced cross-process in ``test_txn_catalog``.

This test pins the table-level half: two OS processes, each with its
own SparkSession, race ``commit_overwrite(expected_version=0)`` on one
table. Whatever interleaving happens, the invariants are:
- every process reports a clean outcome (win / ConcurrentWriteError /
  the rename-pair OSError backstop), never a corrupted table;
- at least one writer wins;
- the final table is SELF-CONSISTENT: the marker's txn identifies one
  winner and every row carries exactly that writer's payload;
- recover() + vacuum() leave no staging/backup leftovers.
"""

from __future__ import annotations

import glob
import multiprocessing as mp
import os

import pytest


def _table_race_writer(path: str, tag: int, barrier, out):
    from pyspark.sql import SparkSession

    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"race-writer-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        df = spark.range(0, 20).selectExpr("id", f"id * {tag} AS v")
        barrier.wait()  # overlap the commit windows
        try:
            mt.commit_overwrite(
                df, path, keys=("id",), expected_version=0, txn={"writer": tag}
            )
            out.put(("win", tag))
        except mt.ConcurrentWriteError:
            out.put(("conflict", tag))
        except OSError:
            # the rename-pair backstop: the other writer swapped first
            out.put(("oserr", tag))
    except Exception as e:  # pragma: no cover - diagnostics
        out.put(("error", repr(e)))
    finally:
        spark.stop()


@pytest.mark.slow
def test_cross_process_table_commit_race_is_atomic(spark, tmp_path):
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import vacuum

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "id * 0 AS v"), path, keys=("id",)
    )
    assert mt.table_version(path) == 0

    ctx = mp.get_context("spawn")  # fork would inherit the parent JVM
    barrier = ctx.Barrier(2)
    out = ctx.Queue()
    procs = [
        ctx.Process(target=_table_race_writer, args=(path, tag, barrier, out))
        for tag in (3, 7)
    ]
    for p in procs:
        p.start()
    results = [out.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(timeout=300)

    kinds = sorted(k for k, _ in results)
    assert all(k in ("win", "conflict", "oserr") for k in kinds), results
    winners = [tag for k, tag in results if k == "win"]
    assert len(winners) >= 1, results

    # SELF-CONSISTENCY: the marker's txn names one winner and every row
    # carries exactly that writer's payload — marker and data swapped
    # as one unit, whatever the interleaving
    mt.recover(path)
    committed = mt.table_txn(path).get("writer")
    assert committed in winners, (committed, results)
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    assert rows == {(i, i * committed) for i in range(20)}, committed
    assert mt.table_version(path) == 1

    # losers' staging dirs are inert and sweepable
    vacuum(path)
    assert not glob.glob(path + "__staging_*")
    assert not glob.glob(path + "__old_*")


def _append_race_writer(path: str, tag: int, barrier, out):
    from pyspark.sql import SparkSession

    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"append-race-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        df = spark.range(100 * tag, 100 * tag + 10).selectExpr(
            "id", f"{tag} AS v"
        )
        barrier.wait()
        try:
            mt.append_rows(spark, df, path, txn={"writer": tag})
            out.put(("win", tag))
        except mt.ConcurrentWriteError:
            out.put(("conflict", tag))
        except OSError:
            out.put(("oserr", tag))
    except Exception as e:  # pragma: no cover - diagnostics
        out.put(("error", repr(e)))
    finally:
        spark.stop()


@pytest.mark.slow
def test_cross_process_append_race_is_atomic(spark, tmp_path):
    """Two processes blind-append DISJOINT batches concurrently. The
    protocol's layering contract (atomicity per table; exclusion in the
    txn catalog) pins: every outcome is clean, >= 1 writer wins, the
    base rows survive untouched, and each batch is ALL-or-NOTHING — a
    torn half-batch or a corrupted base is the failure this hunts."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import vacuum

    path = str(tmp_path / "t")
    base = {(i, 0) for i in range(20)}
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "0 AS v"), path, keys=("id",)
    )

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    out = ctx.Queue()
    procs = [
        ctx.Process(target=_append_race_writer, args=(path, tag, barrier, out))
        for tag in (3, 7)
    ]
    for p in procs:
        p.start()
    results = [out.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(timeout=300)

    kinds = sorted(k for k, _ in results)
    assert all(k in ("win", "conflict", "oserr") for k in kinds), results
    winners = {tag for k, tag in results if k == "win"}
    assert winners, results

    mt.recover(path)
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    assert rows >= base  # the hardlinked base can never tear
    extra = rows - base
    batches = {
        tag: {(100 * tag + i, tag) for i in range(10)} for tag in (3, 7)
    }
    visible = {tag for tag in (3, 7) if batches[tag] & extra}
    for tag in visible:  # all-or-nothing per batch
        assert batches[tag] <= extra, (tag, sorted(extra))
    want_extra = set().union(*(batches[t] for t in visible)) if visible else set()
    assert extra == want_extra, (sorted(extra), visible)
    assert visible <= winners, (visible, winners)
    vacuum(path)
    assert not glob.glob(path + "__staging_*")
    assert not glob.glob(path + "__old_*")


# ---------------------------------------------------------------------------
# Round 9: blind appends COMMUTE (Delta append-vs-append OCC semantics).
# The deterministic tests below inject a concurrent commit into the
# victim's staging window by hooking _link_snapshot_files (the first
# staging step, after the base version was read) — no process juggling,
# the interleaving is exact.
# ---------------------------------------------------------------------------


def test_append_rebase_commutes_with_concurrent_append(spark, tmp_path, monkeypatch):
    """An append that loses the version CAS to ANOTHER blind append
    auto-rebases and commits: both batches land exactly once, and on a
    CDF table each commit's insert sidecar is recorded once."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "0 AS v"),
        path,
        keys=("id",),
        properties={"enableChangeDataFeed": True},
    )

    real = mt._link_snapshot_files
    fired = {"done": False}

    def hooked(src, staging):
        if not fired["done"]:
            fired["done"] = True  # guard BEFORE the inner append recurses
            mt.append_rows(
                spark,
                spark.range(100, 110).selectExpr("id", "1 AS v"),
                path,
                txn={"writer": "inner"},
            )
        return real(src, staging)

    monkeypatch.setattr(mt, "_link_snapshot_files", hooked)
    mt.append_rows(
        spark,
        spark.range(200, 210).selectExpr("id", "2 AS v"),
        path,
        txn={"writer": "outer"},
    )

    assert mt.table_version(path) == 2
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    want = (
        {(i, 0) for i in range(20)}
        | {(i, 1) for i in range(100, 110)}
        | {(i, 2) for i in range(200, 210)}
    )
    assert rows == want
    # the rebased commit's marker: still a blind append, watermark intact
    marker = mt._read_marker(path)
    assert marker["operation"] == "append"
    assert marker["last_rewrite_version"] == 0
    assert mt.table_txn(path) == {"writer": "outer"}
    # CDF: each commit recorded its own insert sidecar exactly once
    ch1 = mt.table_changes(spark, path, 0, 1).collect()
    ch2 = mt.table_changes(spark, path, 1, 2).collect()
    assert {r.id for r in ch1} == set(range(100, 110))
    assert {r.id for r in ch2} == set(range(200, 210))
    assert all(r["_change_type"] == "insert" for r in ch1 + ch2)


def test_append_rebase_refuses_after_rewrite(spark, tmp_path, monkeypatch):
    """A REWRITING commit (overwrite) landing inside the append's
    staging window is a real conflict: no silent rebase, the append
    raises and the table holds exactly the rewrite's rows."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "0 AS v"), path, keys=("id",)
    )

    real = mt._link_snapshot_files
    fired = {"done": False}

    def hooked(src, staging):
        if not fired["done"]:
            fired["done"] = True
            mt.commit_overwrite(
                spark.range(0, 5).selectExpr("id", "9 AS v"), path, keys=("id",)
            )
        return real(src, staging)

    monkeypatch.setattr(mt, "_link_snapshot_files", hooked)
    with pytest.raises(mt.ConcurrentWriteError):
        mt.append_rows(
            spark, spark.range(200, 210).selectExpr("id", "2 AS v"), path
        )
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    assert rows == {(i, 9) for i in range(5)}
    import glob as _glob

    assert not _glob.glob(path + "__staging_*")  # loser cleaned up


def test_append_rebase_reassigns_identity_and_row_ids(spark, tmp_path, monkeypatch):
    """The rebase is a FRESH append against the new snapshot: identity
    slots and row-tracking ids re-derive from the winner's advanced
    high-water marks, so ids stay globally unique across the race."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "0 AS v"),
        path,
        keys=("id",),
        identity={"rid": {"start": 1, "step": 1}},
        properties={"enableRowTracking": True},
    )

    real = mt._link_snapshot_files
    fired = {"done": False}

    def hooked(src, staging):
        if not fired["done"]:
            fired["done"] = True
            mt.append_rows(
                spark, spark.range(100, 110).selectExpr("id", "1 AS v"), path
            )
        return real(src, staging)

    monkeypatch.setattr(mt, "_link_snapshot_files", hooked)
    mt.append_rows(
        spark, spark.range(200, 210).selectExpr("id", "2 AS v"), path
    )

    out = mt.read(spark, path, with_row_ids=True).collect()
    assert len(out) == 40
    rids = [r.rid for r in out]
    assert len(set(rids)) == 40, "identity values collided across the race"
    row_ids = [r._row_id for r in out]
    assert len(set(row_ids)) == 40, "row-tracking ids collided across the race"


def test_threaded_appends_all_commit(spark, tmp_path):
    """Four same-JVM threads blind-append disjoint batches with no
    coordination: under the commit lock + auto-rebase ALL of them must
    commit, each batch exactly once — the Delta append-commute
    contract, in-process edition."""
    import threading

    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "0 AS v"), path, keys=("id",)
    )

    errors = []
    barrier = threading.Barrier(4)

    def worker(tag: int):
        try:
            barrier.wait(timeout=60)
            mt.append_rows(
                spark,
                spark.range(100 * tag, 100 * tag + 10).selectExpr(
                    "id", f"{tag} AS v"
                ),
                path,
                txn={"writer": tag},
            )
        except Exception as e:  # pragma: no cover - diagnostics
            errors.append((tag, repr(e)))

    threads = [threading.Thread(target=worker, args=(t,)) for t in (1, 2, 3, 4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    assert mt.table_version(path) == 4
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    want = {(i, 0) for i in range(20)}
    for tag in (1, 2, 3, 4):
        want |= {(100 * tag + i, tag) for i in range(10)}
    assert rows == want
    assert not glob.glob(path + "__staging_*")
    assert not glob.glob(path + "__old_*")
    assert not os.path.exists(path + "__commitlock")


def _append_commute_writer(path: str, tag: int, barrier, out):
    from pyspark.sql import SparkSession

    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"append-commute-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        df = spark.range(100 * tag, 100 * tag + 10).selectExpr(
            "id", f"{tag} AS v"
        )
        barrier.wait()
        try:
            mt.append_rows(spark, df, path, txn={"writer": tag})
            out.put(("win", tag))
        except Exception as e:
            out.put(("error", f"{tag}: {e!r}"))
    finally:
        spark.stop()


@pytest.mark.slow
def test_cross_process_appends_all_commit(spark, tmp_path):
    """Three OS processes (own JVMs) blind-append disjoint batches
    concurrently. Auto-rebase means NO writer loses: every append
    commits exactly once and the final version counts all three — the
    'N racing appenders all commit' contract real Delta's logical
    conflict detection gives blind appends."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import vacuum

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "0 AS v"), path, keys=("id",),
        max_history=8,
    )

    tags = (3, 5, 7)
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(len(tags))
    out = ctx.Queue()
    procs = [
        ctx.Process(target=_append_commute_writer, args=(path, tag, barrier, out))
        for tag in tags
    ]
    for p in procs:
        p.start()
    results = [out.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(timeout=300)

    assert sorted(results) == sorted(("win", t) for t in tags), results

    mt.recover(path)
    assert mt.table_version(path) == len(tags)
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    want = {(i, 0) for i in range(20)}
    for tag in tags:
        want |= {(100 * tag + i, tag) for i in range(10)}
    assert rows == want
    vacuum(path)
    assert not glob.glob(path + "__staging_*")
    assert not glob.glob(path + "__old_*")


def test_merge_auto_retries_after_concurrent_append(spark, tmp_path, monkeypatch):
    """Delta-style DML commit retry (r9): an append landing inside a
    merge's staging window no longer fails the merge — the merge
    re-executes against the new snapshot (WriteSerializable) and the
    final table holds the appended row AND the merged rows."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "CAST(0 AS BIGINT) AS v"),
        path, keys=("id",),
    )

    real = mt._snapshot_stats
    fired = {"done": False}

    def hooked(dirpath):
        if not fired["done"]:
            fired["done"] = True
            mt.append_rows(
                spark,
                spark.createDataFrame([(100, 1)], "id long, v long"),
                path,
            )
        return real(dirpath)

    monkeypatch.setattr(mt, "_snapshot_stats", hooked)
    mt.merge_upsert(
        spark,
        path,
        spark.createDataFrame([(0, 9), (50, 9)], "id long, v long"),
        keys=("id",),
    )
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    want = {(i, 0) for i in range(1, 10)} | {(0, 9), (50, 9), (100, 1)}
    assert rows == want
    assert mt.table_version(path) == 2  # append + retried merge


def test_delete_auto_retries_and_sees_winner_rows(spark, tmp_path, monkeypatch):
    """The retried DELETE serializes AFTER the concurrent append: an
    appended row matching the predicate is deleted too (the
    WriteSerializable read-your-winner contract)."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "0 AS v"), path, keys=("id",)
    )

    real = mt._snapshot_stats
    fired = {"done": False}

    def hooked(dirpath):
        if not fired["done"]:
            fired["done"] = True
            mt.append_rows(
                spark,
                spark.createDataFrame([(100, 1)], "id long, v long"),
                path,
            )
        return real(dirpath)

    monkeypatch.setattr(mt, "_snapshot_stats", hooked)
    mt.delete_where(spark, path, "id >= 5")
    rows = {(r.id, r.v) for r in mt.read(spark, path).collect()}
    assert rows == {(i, 0) for i in range(5)}  # 100 deleted by the retry


def test_append_rebase_partitioned_table(spark, tmp_path, monkeypatch):
    """Commute on a Hive-PARTITIONED table: the rebase re-links the new
    base's partition dirs and re-writes the appended rows partitionBy —
    both batches land in their right partitions, nothing forks."""
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.range(0, 20).selectExpr(
            "id", "CAST(id % 2 AS INT) AS p", "CAST(0 AS BIGINT) AS v"
        ),
        path,
        keys=("id",),
        partition_by=("p",),
    )

    real = mt._link_snapshot_files
    fired = {"done": False}

    def hooked(src, staging):
        if not fired["done"]:
            fired["done"] = True
            mt.append_rows(
                spark,
                spark.createDataFrame(
                    [(100, 0, 1), (101, 1, 1)], "id long, p int, v long"
                ),
                path,
            )
        return real(src, staging)

    monkeypatch.setattr(mt, "_link_snapshot_files", hooked)
    mt.append_rows(
        spark,
        spark.createDataFrame(
            [(200, 0, 2), (201, 1, 2)], "id long, p int, v long"
        ),
        path,
    )

    assert mt.table_version(path) == 2
    rows = {(r.id, r.p, r.v) for r in mt.read(spark, path).collect()}
    want = {(i, i % 2, 0) for i in range(20)} | {
        (100, 0, 1), (101, 1, 1), (200, 0, 2), (201, 1, 2)
    }
    assert rows == want
    # partition dirs hold exactly their rows (no layout fork)
    p0 = spark.read.option("basePath", path).parquet(path + "/p=0")
    assert {r.id for r in p0.collect()} == {
        i for i in range(0, 20, 2)
    } | {100, 200}
