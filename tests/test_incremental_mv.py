"""Incremental MV maintenance (`sources/incremental_mv.py`): a grouped
sum/count MV over a CDF-enabled base refreshes O(changes) and always
equals the full recompute — across merge inserts/updates, rewriting
and DV deletes, group migrations, and vanished groups. Integer
measures make the retraction algebra exact (no FP drift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import incremental_mv as imv
from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _base(spark, path):
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 100) for i in range(1, 11)],
        ["id", "grp", "cents"],
    )
    mt.commit_overwrite(
        df, path, keys=("id",), properties={"enableChangeDataFeed": True}
    )


AGGS = {"total_cents": ("sum", "cents"), "n_rows": ("count", None)}


def _recompute(spark, path):
    return {
        r.grp: (r.total, r.n)
        for r in mt.read(spark, path)
        .groupBy("grp")
        .agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
        .collect()
    }


def _mv_state(spark, mv_path):
    return {
        r.grp: (r.total_cents, r.n_rows)
        for r in mt.read(spark, mv_path).collect()
    }


def test_create_requires_cdf(spark, tmp_path):
    base = str(tmp_path / "b")
    mt.commit_overwrite(
        spark.createDataFrame([(1, "a", 1)], ["id", "grp", "cents"]),
        base,
        keys=("id",),
    )
    with pytest.raises(ValueError, match="enableChangeDataFeed"):
        imv.create_agg_mv(spark, base, str(tmp_path / "mv"), ["grp"], AGGS)


def test_unsupported_aggregate_kind_refused(spark, tmp_path):
    base = str(tmp_path / "b")
    _base(spark, base)
    with pytest.raises(ValueError, match="unsupported kind"):
        imv.create_agg_mv(
            spark, base, str(tmp_path / "mv"), ["grp"],
            {"m": ("stddev", "cents")},
        )


def test_minmax_refresh_recomputes_touched_groups_only(spark, tmp_path):
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(
        spark, base, mv, ["grp"],
        {"mx": ("max", "cents"), "mn": ("min", "cents"),
         "total": ("sum", "cents")},
    )
    # delete the CURRENT max of group 'b' (id=10, cents=1000) — the
    # non-retractable case a delta fold cannot handle
    mt.delete_where(spark, base, "id = 10", max_history=10)
    # and touch group 'a' via an update
    mt.update_where(
        spark, base, "id = 1", {"cents": F.lit(7)}, max_history=10
    )
    out = imv.refresh_agg_mv(spark, base, mv)
    assert out["strategy"] == "touched_groups"
    expect = {
        r.grp: (r.mx, r.mn, r.total)
        for r in mt.read(spark, base)
        .groupBy("grp")
        .agg(F.max("cents").alias("mx"), F.min("cents").alias("mn"),
             F.sum("cents").alias("total"))
        .collect()
    }
    got = {
        r.grp: (r.mx, r.mn, r.total) for r in mt.read(spark, mv).collect()
    }
    assert got == expect
    # vanished group leaves the MV under this strategy too
    mt.delete_where(spark, base, "grp = 'a'", max_history=10)
    imv.refresh_agg_mv(spark, base, mv)
    assert {r.grp for r in mt.read(spark, mv).collect()} == {"b"}


def test_bootstrap_matches_direct_aggregate(spark, tmp_path):
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)
    assert _mv_state(spark, mv) == _recompute(spark, base)


def test_refresh_tracks_dml_chain_exactly(spark, tmp_path):
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)

    # merge: one update (same group), one group MIGRATION, one insert.
    # max_history must retain the whole refresh range — sidecars prune
    # with their snapshots (the documented Delta retention coupling).
    src = spark.createDataFrame(
        [(2, "a", 9999), (3, "b", 300), (42, "a", 4200)],
        ["id", "grp", "cents"],
    )
    mt.merge_upsert(spark, base, src, keys=("id",), max_history=10)
    # rewriting delete + DV delete + DV update
    mt.delete_where(spark, base, "id = 6", max_history=10)
    mt.delete_where(spark, base, "id = 7", deletion_vectors=True,
                    max_history=10)
    mt.update_where(
        spark, base, "id = 8", {"cents": F.lit(1)}, deletion_vectors=True,
        max_history=10,
    )

    out = imv.refresh_agg_mv(spark, base, mv)
    assert out["refreshed"] is True
    assert _mv_state(spark, mv) == _recompute(spark, base)
    # cursor advanced atomically with the data
    assert mt.table_txn(mv)["mv_base_version"] == mt.table_version(base)


def test_vanished_group_leaves_mv(spark, tmp_path):
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)
    mt.delete_where(spark, base, "grp = 'a'")
    imv.refresh_agg_mv(spark, base, mv)
    state = _mv_state(spark, mv)
    assert "a" not in state and state == _recompute(spark, base)


def test_refresh_is_idempotent_noop_at_head(spark, tmp_path):
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)
    mt.delete_where(spark, base, "id = 1")
    assert imv.refresh_agg_mv(spark, base, mv)["refreshed"] is True
    again = imv.refresh_agg_mv(spark, base, mv)
    assert again == {
        "refreshed": False,
        "base_version": mt.table_version(base),
        "changes": 0,
    }


def test_feed_hole_refuses_instead_of_partial_refresh(spark, tmp_path):
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)
    # a generic overwrite whose diff nobody computed: CDF hole
    mt.commit_overwrite(
        mt.read(spark, base).filter("id > 2"), base, keys=("id",)
    )
    with pytest.raises(ValueError):
        imv.refresh_agg_mv(spark, base, mv)


@pytest.mark.slow
def test_refresh_cost_independent_of_base_size(spark, tmp_path):
    """The whole point of IVM: refresh reads the change sidecars and the
    MV, never the base. Same fixed-size change batch against a 1x and a
    10x base — wall-clock must stay flat (generous bound: host noise,
    not a benchmark)."""
    import time

    def build_and_time(n, d):
        base = spark.range(n).select(
            F.col("id"),
            F.pmod(F.col("id"), 20).alias("grp"),
            F.pmod(F.col("id"), 1000).alias("cents"),
        )
        mt.commit_overwrite(
            base, f"{d}/t", keys=("id",),
            properties={"enableChangeDataFeed": True},
        )
        imv.create_agg_mv(
            spark, f"{d}/t", f"{d}/mv", ["grp"],
            {"total_cents": ("sum", "cents"), "n_rows": ("count", None)},
        )
        # fixed-size change batch regardless of base size (DV: O(matches))
        mt.delete_where(
            spark, f"{d}/t", "id < 100", deletion_vectors=True, max_history=5
        )
        t0 = time.perf_counter()
        imv.refresh_agg_mv(spark, f"{d}/t", f"{d}/mv")
        return time.perf_counter() - t0

    build_and_time(20_000, str(tmp_path / "warm"))  # JIT/codegen warm
    t1 = max(build_and_time(20_000, str(tmp_path / "x1")), 0.5)
    t10 = build_and_time(200_000, str(tmp_path / "x10"))
    assert t10 / t1 < 6.0, f"refresh scaled with base size: {t1:.2f}s -> {t10:.2f}s"


def test_null_group_keys_refresh_correctly(spark, tmp_path):
    """A NULL dimension value is a legitimate group: an equality join
    would fork it into duplicate MV rows (full_outer never matches
    NULL=NULL) or never refresh it (semi-join). Both refresh paths use
    null-safe joins."""
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 30), (4, "a", 40)],
        "id int, grp string, cents long",
    )
    mt.commit_overwrite(
        df, base, keys=("id",), properties={"enableChangeDataFeed": True}
    )
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)
    mt.delete_where(spark, base, "id = 1", max_history=10)  # NULL group
    mt.update_where(
        spark, base, "id = 2", {"cents": F.lit(99).cast("long")},
        max_history=10,
    )
    imv.refresh_agg_mv(spark, base, mv)
    rows = mt.read(spark, mv).collect()
    assert len(rows) == 2  # exactly one NULL-group row, not a fork
    state = {r.grp: (r.total_cents, r.n_rows) for r in rows}
    assert state[None] == (99, 1) and state["a"] == (70, 2)
    # min/max path: NULL group must recompute too
    mv2 = str(tmp_path / "mv2")
    imv.create_agg_mv(
        spark, base, mv2, ["grp"],
        {"mx": ("max", "cents"), "total": ("sum", "cents")},
    )
    mt.update_where(
        spark, base, "id = 2", {"cents": F.lit(5).cast("long")},
        max_history=10,
    )
    imv.refresh_agg_mv(spark, base, mv2)
    rows2 = {r.grp: (r.mx, r.total) for r in mt.read(spark, mv2).collect()}
    assert rows2[None] == (5, 5) and rows2["a"] == (40, 70)


def test_wrong_base_refused(spark, tmp_path):
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)
    other = str(tmp_path / "other")
    _base(spark, other)
    with pytest.raises(ValueError, match="not an MV over"):
        imv.refresh_agg_mv(spark, other, mv)


def test_streaming_cdf_to_mv_sink(spark, tmp_path):
    """The full loop: DML on a CDF base -> table_changes_stream ->
    foreach_batch_mv_from_cdf folds the deltas -> the MV equals the
    direct aggregate of the live base. Restarting the stream from its
    checkpoint after more DMLs continues without double-counting."""
    from aws_callcenter_delta_lakehouse_spark.sources.pydatasource import (
        make_table_changes_stream_source,
    )
    from aws_callcenter_delta_lakehouse_spark.streaming.streams import (
        foreach_batch_mv_from_cdf,
    )

    base = str(tmp_path / "b")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 100) for i in range(1, 11)],
        ["id", "grp", "cents"],
    )
    # CDF on at creation: v0 records the initial load as inserts, so the
    # MV builds purely from the feed (no bootstrap)
    mt.commit_overwrite(
        df, base, keys=("id",), properties={"enableChangeDataFeed": True}
    )
    mt.delete_where(spark, base, "id = 1", max_history=10)
    mt.update_where(
        spark, base, "id = 2", {"cents": F.lit(9999)}, max_history=10
    )

    spark.dataSource.register(make_table_changes_stream_source())

    def _tail():
        return (
            spark.readStream.format("table_changes_stream")
            .option("path", base)
            .option("startingversion", 0)
            .load()
        )

    q = foreach_batch_mv_from_cdf(
        _tail(), mv, ["grp"], AGGS, checkpoint=ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _mv_state(spark, mv) == _recompute(spark, base)

    # more DML while the stream is down; restart from the checkpoint
    mt.delete_where(
        spark, base, "grp = 'a' AND id < 8", deletion_vectors=True,
        max_history=10,
    )
    mt.merge_upsert(
        spark, base,
        spark.createDataFrame([(42, "b", 7)], ["id", "grp", "cents"]),
        keys=("id",), max_history=10,
    )
    q2 = foreach_batch_mv_from_cdf(
        _tail(), mv, ["grp"], AGGS, checkpoint=ckpt
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _mv_state(spark, mv) == _recompute(spark, base)
    # epoch cursor advanced with the data (exactly-once contract)
    assert int(mt.table_txn(mv)["last_epoch"]) >= 1


def test_refresh_crash_never_double_applies(spark, tmp_path, monkeypatch):
    """Exactly-once across a crash: inject a failure at the MV's swap
    renames during refresh; after recover, a re-run must land on
    exactly the recompute — whether the crash hit before the publish
    (cursor old, deltas re-applied onto the pre-image) or after
    (cursor new, re-run no-ops). Cursor and data move atomically or
    not at all."""
    import os as _os

    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)
    mt.delete_where(spark, base, "grp = 'a' AND id <= 5", max_history=10)
    mt.update_where(
        spark, base, "id = 6", {"cents": F.lit(1)}, max_history=10
    )

    class _CrashOnce:
        def __init__(self, prefix):
            self.real = _os.rename
            self.prefix = prefix
            self.armed = True

        def __call__(self, src, dst):
            if self.armed and (
                str(src).startswith(self.prefix)
                or str(dst).startswith(self.prefix)
            ):
                self.armed = False
                raise RuntimeError("injected crash")
            return self.real(src, dst)

    crasher = _CrashOnce(mv)
    monkeypatch.setattr(_os, "rename", crasher)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            imv.refresh_agg_mv(spark, base, mv)
    finally:
        monkeypatch.setattr(_os, "rename", crasher.real)
    mt.recover(mv)
    # the crashed refresh left (old MV, old cursor) or (new MV, new
    # cursor) — never a mix; a re-run converges either way
    imv.refresh_agg_mv(spark, base, mv)
    assert _mv_state(spark, mv) == _recompute(spark, base)
    assert mt.table_txn(mv)["mv_base_version"] == mt.table_version(base)
    # and a further re-run is a no-op (no double-apply)
    assert imv.refresh_agg_mv(spark, base, mv)["refreshed"] is False
    assert _mv_state(spark, mv) == _recompute(spark, base)


def test_refresh_over_blind_appends(spark, tmp_path):
    """The full ingest loop at its intended cost profile: blind APPENDS
    land O(appended) (hardlinked base, insert sidecars), and the MV
    refresh folds exactly those sidecars — O(changes) end to end, never
    a base rescan. Two append commits + one mixed DML between refreshes
    must leave the MV equal to the direct aggregate."""
    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    imv.create_agg_mv(spark, base, mv, ["grp"], AGGS)

    mt.append_rows(
        spark,
        spark.createDataFrame(
            [(100, "a", 1000), (101, "c", 50)], ["id", "grp", "cents"]
        ),
        base,
        max_history=10,
    )
    out = imv.refresh_agg_mv(spark, base, mv)
    assert out["refreshed"] is True
    assert _mv_state(spark, mv) == _recompute(spark, base)  # new group 'c'

    mt.append_rows(
        spark,
        spark.createDataFrame([(102, "b", 7)], ["id", "grp", "cents"]),
        base,
        max_history=10,
    )
    mt.delete_where(spark, base, "id = 1", max_history=10)
    out = imv.refresh_agg_mv(spark, base, mv)
    assert out["refreshed"] is True
    assert _mv_state(spark, mv) == _recompute(spark, base)
    assert mt.table_txn(mv)["mv_base_version"] == mt.table_version(base)


def test_bootstrap_pins_probed_base_version(spark, tmp_path, monkeypatch):
    """create_agg_mv evaluates its base scan INSIDE commit_overwrite —
    a base commit landing between the version probe and that evaluation
    must not leak into the bootstrapped MV (round 13: the scan is now
    pinned to the probed version; unpinned, the MV reflected v_new with
    the cursor at v_old and the next refresh double-applied v_new's
    changes). Injected interleaving, same style as test_table_race."""
    base = str(tmp_path / "b")
    mvp = str(tmp_path / "mv")
    _base(spark, base)
    real = mt.commit_overwrite

    def racing(df, path, **kw):
        if path == mvp and not getattr(racing, "fired", False):
            racing.fired = True
            mt.append_rows(
                spark,
                spark.createDataFrame([(99, "a", 700)], ["id", "grp", "cents"]),
                base,
            )
        return real(df, path, **kw)

    monkeypatch.setattr(imv.mt, "commit_overwrite", racing)
    out = imv.create_agg_mv(spark, base, mvp, ["grp"], AGGS)
    monkeypatch.undo()
    assert racing.fired
    # the MV reflects the PROBED version, not the racing append
    assert out["base_version"] == mt.table_txn(mvp)["mv_base_version"]
    assert mt.table_txn(mvp)["mv_base_version"] == mt.table_version(base) - 1
    # one refresh lands the append exactly once
    assert imv.refresh_agg_mv(spark, base, mvp)["refreshed"] is True
    assert _mv_state(spark, mvp) == _recompute(spark, base)
