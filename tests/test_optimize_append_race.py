"""OPTIMIZE/compaction vs concurrent append (round 10, VERDICT r9 #6).

Data-preserving rewrites (compact / compact_binpack / the partition-
scoped zorder) swap snapshots WITHOUT bumping the version — before this
round their swaps ran unguarded, so an append landing mid-staging was
silently destroyed (the swap replaced the appended snapshot with a
compaction of the PRE-append files). Now:

- every compaction swap runs under the table's commit lock with a
  version recheck (`_compaction_swap_guard`) — conflict aborts the
  compaction, never the data;
- optimize_zorder/hilbert pin `expected_version` (no more
  last-writer-wins clobber);
- the autoCompact/autoOptimize post-commit hooks swallow the conflict
  (deferred maintenance: the triggering append already shipped; the
  next commit's probe re-triggers) — including the FileNotFound shape
  a mid-job swap produces, separated from real bugs by a version probe.

Interleavings are DETERMINISTIC: hooks injected at the compaction's
marker-write / stats-probe seams run a real commit mid-staging.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import (
    maintenance,
    managed_table as mt,
)


def _seed(spark, path, n_files=6, properties=None):
    df = spark.range(0, 60).selectExpr("id", "id * 2 AS v")
    mt.commit_overwrite(df.repartition(n_files), path, keys=("id",),
                        properties=properties)


def _append(spark, path, lo, hi):
    mt.append_rows(
        spark, spark.range(lo, hi).selectExpr("id", "id * 2 AS v"), path
    )


def _ids(spark, path):
    return sorted(r.id for r in mt.read(spark, path).collect())


def test_binpack_swap_aborts_when_append_lands_mid_staging(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    _seed(spark, path)
    orig = mt._write_marker_like
    fired = []

    def hook(staging, marker, partition_by=None, **kw):
        if not fired:  # one-shot: the racer lands while binpack stages
            fired.append(1)
            _append(spark, path, 1000, 1010)
        return orig(staging, marker, partition_by, **kw)

    monkeypatch.setattr(mt, "_write_marker_like", hook)
    with pytest.raises(mt.ConcurrentWriteError, match="compaction"):
        maintenance.compact_binpack(spark, path, target_file_bytes=1 << 20)
    monkeypatch.undo()
    # the APPEND survived; the compaction output is fully discarded
    assert _ids(spark, path) == list(range(60)) + list(range(1000, 1010))
    import glob

    assert glob.glob(f"{path}__compact*") == []
    # and a re-run with no racer succeeds
    out = maintenance.compact_binpack(spark, path, target_file_bytes=1 << 20)
    assert out["rewritten"] > 0
    assert _ids(spark, path) == list(range(60)) + list(range(1000, 1010))


def test_full_compact_swap_aborts_on_mid_staging_commit(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    _seed(spark, path)
    orig = mt._write_marker_like
    fired = []

    def hook(staging, marker, partition_by=None, **kw):
        if not fired:
            fired.append(1)
            mt.delete_where(spark, path, "id >= 50")  # a REWRITE racer
        return orig(staging, marker, partition_by, **kw)

    monkeypatch.setattr(mt, "_write_marker_like", hook)
    with pytest.raises(mt.ConcurrentWriteError, match="compaction"):
        maintenance.compact(spark, path)
    monkeypatch.undo()
    assert _ids(spark, path) == list(range(50))  # the delete stands


def test_optimize_zorder_loses_cas_never_clobbers(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    _seed(spark, path)
    orig = maintenance.table_file_stats
    fired = []

    def hook(p):
        if not fired:
            fired.append(1)
            _append(spark, path, 2000, 2005)
        return orig(p)

    monkeypatch.setattr(maintenance, "table_file_stats", hook)
    with pytest.raises(mt.ConcurrentWriteError):
        maintenance.optimize_zorder(spark, path, ["v"])
    monkeypatch.undo()
    assert _ids(spark, path) == list(range(60)) + list(range(2000, 2005))


def test_autocompact_race_never_fails_the_triggering_append(
    spark, tmp_path, monkeypatch
):
    """The exact VERDICT shape: an append racing the compaction its own
    predecessor triggered retries/commits cleanly — the append call
    whose autoCompact lost the race returns success (its data shipped),
    the racer's rows land exactly once, no deadlock/livelock."""
    path = str(tmp_path / "t")
    _seed(spark, path, properties={"autoCompact": {"min_files": 2}})
    orig = mt._write_marker_like
    state = {"fired": False}

    def hook(staging, marker, partition_by=None, **kw):
        if not state["fired"]:
            state["fired"] = True
            # racer B: lands while A's autoCompact binpack is staging.
            # B's own autoCompact hook also runs (recursion bounded by
            # the one-shot flag) — it may compact successfully.
            _append(spark, path, 3000, 3010)
        return orig(staging, marker, partition_by, **kw)

    monkeypatch.setattr(mt, "_write_marker_like", hook)
    # append A: crosses the threshold, triggers autoCompact, whose swap
    # loses to racer B — and A still returns cleanly
    _append(spark, path, 4000, 4010)
    monkeypatch.undo()
    assert _ids(spark, path) == (
        list(range(60)) + list(range(3000, 3010)) + list(range(4000, 4010))
    )
    import glob

    assert glob.glob(f"{path}__compact*") == []


@pytest.mark.slow
def test_threaded_append_storm_on_autocompact_table(spark, tmp_path):
    """3 appenders × live autoCompact: every append commits exactly
    once whatever interleaves with the follow-up binpacks."""
    path = str(tmp_path / "t")
    _seed(spark, path, properties={"autoCompact": {"min_files": 3}})
    barrier = threading.Barrier(3)
    errors: list = []

    def run(k):
        try:
            barrier.wait(timeout=120)
            for j in range(3):
                lo = 10_000 * (k + 1) + 100 * j
                _append(spark, path, lo, lo + 10)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(k,)) for k in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    want = list(range(60))
    for k in range(3):
        for j in range(3):
            lo = 10_000 * (k + 1) + 100 * j
            want += list(range(lo, lo + 10))
    assert _ids(spark, path) == sorted(want)
