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


def test_crash_before_pointer_flip_keeps_old_everywhere(
    spark, tmp_path, monkeypatch
):
    """Kill the transaction after table A's data committed but before
    the catalog pointer flipped: the catalog must serve OLD A and OLD
    B (even though A's table head advanced), and a retry completes the
    transaction."""
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
        if str(dst).startswith(cat):
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
