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
