"""Cross-table snapshot isolation: the multi-table catalog commit must
publish all tables at once — a crash between the per-table commits and
the pointer flip leaves readers on the OLD versions of EVERY table,
never a mix."""

from __future__ import annotations

import os

import pytest

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
from aws_callcenter_delta_lakehouse_spark.sources import txn_catalog as tc


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _vals(spark, cat, name, manifest=None):
    return {
        (r.id, r.v) for r in tc.read_table(spark, cat, name, manifest).collect()
    }


def test_commit_tables_publishes_both_atomically(spark, tmp_path):
    cat = str(tmp_path / "cat")
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    v = tc.commit_tables(
        {
            "a": (_df(spark, [(1, "a0")]), a_path, ("id",)),
            "b": (_df(spark, [(1, "b0")]), b_path, ("id",)),
        },
        cat,
    )
    assert v == 0
    assert _vals(spark, cat, "a") == {(1, "a0")}
    assert _vals(spark, cat, "b") == {(1, "b0")}

    v = tc.commit_tables(
        {
            "a": (_df(spark, [(1, "a1")]), a_path, ("id",)),
            "b": (_df(spark, [(1, "b1")]), b_path, ("id",)),
        },
        cat,
    )
    assert v == 1
    assert _vals(spark, cat, "a") == {(1, "a1")}
    assert _vals(spark, cat, "b") == {(1, "b1")}


def test_crash_before_versioned_commit_keeps_old_everywhere(
    spark, tmp_path, monkeypatch
):
    """Kill the transaction after table A's data committed but before
    the versioned manifest (the commit point) was created: the catalog
    must serve OLD A and OLD B (even though A's table head advanced),
    and a retry completes the transaction."""
    cat = str(tmp_path / "cat")
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    tc.commit_tables(
        {
            "a": (_df(spark, [(1, "a0")]), a_path, ("id",)),
            "b": (_df(spark, [(1, "b0")]), b_path, ("id",)),
        },
        cat,
    )

    from aws_callcenter_delta_lakehouse_spark.sources import fs as table_fs

    real_excl = table_fs.LocalTableFS.write_exclusive

    def boom(self, path, data):
        if str(path).startswith(cat):
            raise RuntimeError("injected crash")
        return real_excl(self, path, data)  # pragma: no cover - guard

    monkeypatch.setattr(table_fs.LocalTableFS, "write_exclusive", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        tc.commit_tables(
            {
                "a": (_df(spark, [(1, "a1")]), a_path, ("id",)),
                "b": (_df(spark, [(1, "b1")]), b_path, ("id",)),
            },
            cat,
        )
    monkeypatch.setattr(table_fs.LocalTableFS, "write_exclusive", real_excl)

    # table A's HEAD moved, but the catalog still pins the pre-image
    assert mt.table_version(a_path) == 1
    assert tc.catalog_version(cat) == 0
    assert _vals(spark, cat, "a") == {(1, "a0")}
    assert _vals(spark, cat, "b") == {(1, "b0")}

    # retry publishes everything
    tc.commit_tables(
        {
            "a": (_df(spark, [(1, "a1")]), a_path, ("id",)),
            "b": (_df(spark, [(1, "b1")]), b_path, ("id",)),
        },
        cat,
    )
    assert _vals(spark, cat, "a") == {(1, "a1")}
    assert _vals(spark, cat, "b") == {(1, "b1")}


def test_crash_after_versioned_commit_is_committed(
    spark, tmp_path, monkeypatch
):
    """Kill the transaction AFTER the versioned manifest landed but
    before the ``_latest`` cache refresh: the transaction is COMMITTED
    (the versioned log entry is the record — Delta semantics), readers
    resolve past the stale cache, and both tables serve the NEW
    versions together — still never a mix."""
    cat = str(tmp_path / "cat")
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    tc.commit_tables(
        {
            "a": (_df(spark, [(1, "a0")]), a_path, ("id",)),
            "b": (_df(spark, [(1, "b0")]), b_path, ("id",)),
        },
        cat,
    )

    real_replace = os.replace

    def boom(src, dst):
        if str(dst).startswith(cat):  # only the _latest cache refresh
            raise RuntimeError("injected crash")
        return real_replace(src, dst)

    monkeypatch.setattr(tc.os, "replace", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        tc.commit_tables(
            {
                "a": (_df(spark, [(1, "a1")]), a_path, ("id",)),
                "b": (_df(spark, [(1, "b1")]), b_path, ("id",)),
            },
            cat,
        )
    monkeypatch.setattr(tc.os, "replace", real_replace)

    assert tc.catalog_version(cat) == 1  # log of record wins over cache
    assert _vals(spark, cat, "a") == {(1, "a1")}
    assert _vals(spark, cat, "b") == {(1, "b1")}


def test_snapshot_pins_a_consistent_session(spark, tmp_path):
    cat = str(tmp_path / "cat")
    a_path = str(tmp_path / "a")
    tc.commit_tables({"a": (_df(spark, [(1, "a0")]), a_path, ("id",))}, cat)
    snap = tc.snapshot(cat)
    tc.commit_tables({"a": (_df(spark, [(1, "a1")]), a_path, ("id",))}, cat)
    # the pinned session still reads the old version; a fresh read sees new
    assert _vals(spark, cat, "a", snap) == {(1, "a0")}
    assert _vals(spark, cat, "a") == {(1, "a1")}


def test_expected_version_conflict_raises_before_writes(spark, tmp_path):
    cat = str(tmp_path / "cat")
    a_path = str(tmp_path / "a")
    tc.commit_tables({"a": (_df(spark, [(1, "a0")]), a_path, ("id",))}, cat)
    with pytest.raises(tc.CatalogConflictError):
        tc.commit_tables(
            {"a": (_df(spark, [(1, "a1")]), a_path, ("id",))},
            cat,
            expected_version=5,
        )
    # no data was touched: table head unchanged
    assert mt.table_version(a_path) == 0


def test_torn_catalog_pointer_falls_back_to_versioned_log(spark, tmp_path):
    """A torn _latest.json (power crash mid-write) must not take the
    catalog down: version/manifest/txn reads fall back to the highest
    parseable versioned manifest — the log of record — and the next
    commit heals the pointer."""
    from aws_callcenter_delta_lakehouse_spark.sources import txn_catalog as tc

    cat = str(tmp_path / "cat")
    t1 = str(tmp_path / "t1")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    tc.commit_tables({"t1": (df, t1, ("id",))}, cat, txn={"e": 7})

    with open(tc._latest_path(cat), "w") as fh:
        fh.write('{"version": ')  # torn mid-JSON

    assert tc.catalog_version(cat) == 0
    assert tc.read_manifest(cat)["t1"]["version"] == 0
    assert tc.catalog_txn(cat)["e"] == 7
    got = {(r.id, r.v) for r in tc.read_table(spark, cat, "t1").collect()}
    assert got == {(1, "a")}

    # next commit heals the pointer
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    tc.commit_tables({"t1": (df2, t1, ("id",))}, cat, expected_version=0)
    assert tc.catalog_version(cat) == 1


# -- cross-process commit race (r5 verdict #5) ---------------------------

def _race_writer(cat: str, rounds: int, barrier, out):
    """One OS process: try `rounds` catalog commits, retrying on
    conflict; report how many it WON. No Spark needed — the contested
    resource is the catalog pointer (updates={} carries tables
    forward)."""
    wins = 0
    barrier.wait()  # maximize overlap: all writers start together
    for _ in range(rounds):
        while True:
            current = tc.catalog_version(cat)
            try:
                tc.commit_tables({}, cat, expected_version=current)
                wins += 1
                break
            except tc.CatalogConflictError:
                continue  # somebody else took this version; re-read, retry
    out.put(wins)


def test_cross_process_commit_race_exactly_one_wins_per_version(tmp_path):
    """Two+ real OS processes hammer one catalog dir: the put-if-absent
    versioned-manifest write makes every version number have EXACTLY
    one winner — total wins equals the version advance, the version
    chain is contiguous and parseable, and no loser leaves a temp file
    behind. (The in-process interleaving test above covers the
    monkeypatched window; this covers true cross-process interleaving.)
    """
    import glob
    import json
    import multiprocessing as mp

    cat = str(tmp_path / "cat")
    tc.commit_tables({}, cat)  # v0 exists before the race
    n_procs, rounds = 4, 5

    # spawn, not fork: the pytest process carries a live JVM's threads
    # (py4j, logging) and fork()ing it can deadlock or crash children
    # on inherited locks under load (observed flaking in the full-suite
    # run). The workers are pure Python — a clean interpreter is cheap.
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_procs)
    out = ctx.Queue()
    procs = [
        ctx.Process(target=_race_writer, args=(cat, rounds, barrier, out))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    wins = [out.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0

    assert sum(wins) == n_procs * rounds  # every attempted commit landed
    assert tc.catalog_version(cat) == n_procs * rounds  # v0 + 20 race wins
    vfiles = sorted(glob.glob(os.path.join(cat, "v*.json")))
    assert len(vfiles) == n_procs * rounds + 1
    versions = []
    for vf in vfiles:
        with open(vf) as fh:
            versions.append(json.load(fh)["version"])  # parseable, whole
    assert versions == list(range(n_procs * rounds + 1))  # contiguous
    assert not glob.glob(os.path.join(cat, "*.tmp"))  # losers swept


def test_register_existing_crawler(spark, tmp_path):
    """register_existing (Glue-crawler analogue): managed tables ->
    TABLE bindings, raw parquet dirs/files -> read-only VIEW bindings,
    engine sidecars skipped, CREATE semantics per name."""
    import pytest

    from aws_callcenter_delta_lakehouse_spark.sources import (
        managed_table as mt,
        sql_dml,
        txn_catalog as tc,
    )

    wh = tmp_path / "wh"
    wh.mkdir()
    registry = str(tmp_path / "reg")
    # managed table (marker present) + its __history sidecar
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, s STRING")
    mt.commit_overwrite(df, str(wh / "managed"), keys=("k",))
    mt.merge_upsert(
        spark,
        str(wh / "managed"),
        spark.createDataFrame([(3, "c")], "k INT, s STRING"),
        keys=("k",),
    )
    # raw parquet directory
    df.write.parquet(str(wh / "rawdir"))
    # bare parquet file
    import shutil as _sh

    pq = [p for p in (wh / "rawdir").iterdir() if p.suffix == ".parquet"]
    _sh.copy(pq[0], wh / "RawFile.parquet")
    # junk that must be skipped
    (wh / "notes.txt").write_text("not a table")
    (wh / "emptydir").mkdir()
    (wh / "_hidden").mkdir()

    found = tc.register_existing(registry, str(wh), database="crawl")
    assert sorted(found) == [
        "crawl.managed", "crawl.rawdir", "crawl.rawfile",
    ]
    # managed -> TABLE binding (DML-capable), raw -> VIEW binding
    assert "crawl.managed" in tc.list_table_names(registry)
    assert "crawl.rawdir" in tc.list_view_names(registry)
    assert "crawl.rawfile" in tc.list_view_names(registry)
    with pytest.raises(tc.TableNameError, match="VIEW"):
        tc.resolve_table_name(registry, "crawl.rawdir")

    spark.conf.set("spark.managedTable.nameRegistry", registry)
    try:
        n = sql_dml.sql(
            spark, "SELECT count(*) AS n FROM crawl.managed"
        ).first()["n"]
        assert n == 3
        n = sql_dml.sql(
            spark, "SELECT count(*) AS n FROM crawl.rawdir"
        ).first()["n"]
        assert n == 2
    finally:
        spark.conf.unset("spark.managedTable.nameRegistry")

    # CREATE semantics: re-crawl refuses, replace re-points
    with pytest.raises(tc.TableNameError):
        tc.register_existing(registry, str(wh), database="crawl")
    again = tc.register_existing(
        registry, str(wh), database="crawl", replace=True
    )
    assert sorted(again) == sorted(found)
    # non-directory prefix raises
    with pytest.raises(tc.TableNameError, match="not a directory"):
        tc.register_existing(registry, str(wh / "notes.txt"))
