"""Blind-APPEND commit (`managed_table.append_rows` — Delta
``mode("append")``): new rows land as fresh files in an otherwise
HARDLINKED staging — O(appended) write cost, never a table rewrite —
while every table invariant holds: schema enforcement, generated/
identity/row-id maintenance, CHECK + PK validation, CDF insert records,
txn atomicity, appendOnly acceptance, DV carry, time travel."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _make(spark, path, n=4, **kw):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i * 10)) for i in range(1, n + 1)],
        ["id", "name", "bal"],
    )
    mt.commit_overwrite(df, path, keys=("id",), **kw)
    return df


def _new(spark, rows):
    return spark.createDataFrame(rows, ["id", "name", "bal"])


def test_append_adds_rows_without_rewriting_files(spark, tmp_path):
    """The pre-append data files survive byte-identical (same inode —
    hardlinks), proving the commit never rewrote them."""
    path = str(tmp_path / "t")
    _make(spark, path)
    before = {
        f: os.stat(f).st_ino for f in glob.glob(os.path.join(path, "*.parquet"))
    }
    mt.append_rows(spark, _new(spark, [(9, "n9", 90.0)]), path)
    after = {
        os.path.basename(f): os.stat(f).st_ino
        for f in glob.glob(os.path.join(path, "*.parquet"))
    }
    assert len(after) > len(before)
    for f, ino in before.items():
        assert after[os.path.basename(f)] == ino  # same physical file
    got = sorted((r.id, r.bal) for r in mt.read(spark, path).collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (9, 90.0)]
    # version advanced; pre-append snapshot is time-travel readable
    assert mt.table_version(path) == 1
    assert mt.read(spark, path, version=0).count() == 4


def test_append_schema_enforced(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    with pytest.raises(mt.SchemaEnforcementError, match="missing"):
        mt.append_rows(
            spark, spark.createDataFrame([(9, "x")], ["id", "name"]), path
        )
    with pytest.raises(mt.SchemaEnforcementError, match="unknown"):
        mt.append_rows(
            spark,
            spark.createDataFrame(
                [(9, "x", 1.0, True)], ["id", "name", "bal", "extra"]
            ),
            path,
        )
    assert mt.read(spark, path).count() == 4  # untouched


def test_append_on_append_only_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, properties={"appendOnly": True})
    mt.append_rows(spark, _new(spark, [(9, "n9", 90.0)]), path)
    assert mt.read(spark, path).count() == 5


def test_append_check_constraint_enforced_on_batch(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_constraint(spark, path, "pos_bal", "bal >= 0")
    with pytest.raises(mt.ConstraintViolationError, match="pos_bal"):
        mt.append_rows(spark, _new(spark, [(9, "n9", -1.0)]), path)
    assert mt.read(spark, path).count() == 4
    assert not glob.glob(f"{path}__staging_*")  # staging cleaned up
    mt.append_rows(spark, _new(spark, [(9, "n9", 9.0)]), path)
    assert mt.read(spark, path).count() == 5


def test_append_primary_key_probes(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, unique_keys=True)
    with pytest.raises(mt.ConstraintViolationError, match="already exists"):
        mt.append_rows(spark, _new(spark, [(1, "dup", 0.0)]), path)
    with pytest.raises(mt.ConstraintViolationError, match="within the appended"):
        mt.append_rows(
            spark, _new(spark, [(9, "a", 0.0), (9, "b", 0.0)]), path
        )
    assert mt.read(spark, path).count() == 4


def test_append_records_cdf_inserts_and_streams(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, properties={"enableChangeDataFeed": True})
    v0 = mt.table_version(path)
    mt.append_rows(spark, _new(spark, [(9, "n9", 90.0), (10, "n10", 100.0)]), path)
    ch = mt.table_changes(spark, path, v0, mt.table_version(path))
    got = sorted((r.id, r["_change_type"]) for r in ch.collect())
    assert got == [(9, "insert"), (10, "insert")]


def test_append_generated_and_identity_maintained(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0)], ["id", "bal"])
    mt.commit_overwrite(
        df, path, keys=("id",),
        generated={"bal2": "bal * 2"},
        identity={"seq": {"start": 1, "step": 1}},
    )
    hw0 = mt.table_identity_columns(path)["seq"]["high_water"]
    mt.append_rows(
        spark, spark.createDataFrame([(2, 20.0), (3, 30.0)], ["id", "bal"]), path
    )
    rows = {r.id: r for r in mt.read(spark, path).collect()}
    assert rows[2].bal2 == 40.0 and rows[3].bal2 == 60.0
    assert rows[2].seq != rows[3].seq  # fresh, distinct identity slots
    assert min(rows[2].seq, rows[3].seq) > hw0
    assert mt.table_identity_columns(path)["seq"]["high_water"] >= max(
        rows[2].seq, rows[3].seq
    )


def test_append_row_tracking_fresh_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, properties={"enableRowTracking": True})
    before = {
        r.id: r[mt._ROWID_COL]
        for r in mt._read_logical(spark, path).collect()
    }
    mt.append_rows(spark, _new(spark, [(9, "n9", 90.0)]), path)
    after = {
        r.id: r[mt._ROWID_COL]
        for r in mt._read_logical(spark, path).collect()
    }
    for k, v in before.items():
        assert after[k] == v  # existing ids untouched (same files!)
    assert after[9] not in set(before.values())


def test_append_txn_atomic_and_dv_carry(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.delete_where(spark, path, "id = 2", deletion_vectors=True)
    mt.append_rows(
        spark, _new(spark, [(9, "n9", 90.0)]), path,
        txn={"app": "sink", "last_epoch": 7},
    )
    assert mt.table_txn(path)["last_epoch"] == 7
    got = sorted(r.id for r in mt.read(spark, path).collect())
    assert got == [1, 3, 4, 9]  # DV delete still hides id=2


def test_append_partitioned_routes_new_dirs(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1")], ["id", "v", "part"]
    )
    mt.commit_overwrite(df, path, keys=("id",), partition_by=("part",))
    mt.append_rows(
        spark,
        spark.createDataFrame([(3, "c", "p2")], ["id", "v", "part"]),
        path,
    )
    assert sorted(
        d for d in os.listdir(path) if d.startswith("part=")
    ) == ["part=p1", "part=p2"]
    assert mt.read(spark, path).count() == 3


def test_append_concurrency_and_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    with pytest.raises(mt.ConcurrentWriteError):
        mt.append_rows(
            spark, _new(spark, [(9, "n9", 90.0)]), path, expected_version=5
        )
    mt.append_rows(
        spark, _new(spark, [(9, "n9", 90.0)]), path, expected_version=0
    )
    d = mt.table_detail(path)
    assert d["num_rows"] == 5  # marker stats, no listing


def test_append_into_builder_created_empty_table(spark, tmp_path):
    from aws_callcenter_delta_lakehouse_spark.sources.delta_api import (
        DeltaTable,
    )

    path = str(tmp_path / "t")
    (
        DeltaTable.create(spark)
        .location(path)
        .addColumn("id", "bigint")
        .addColumn("v", "double")
        .execute()
    )
    mt.append_rows(
        spark, spark.createDataFrame([(1, 1.5)], ["id", "v"]), path
    )
    got = [(r.id, r.v) for r in mt.read(spark, path).collect()]
    assert got == [(1, 1.5)]
    assert "schema_json" not in mt._read_marker(path)  # files exist now


@pytest.mark.parametrize("crash_at", [1, 2])
def test_append_crash_serves_old_or_new(spark, tmp_path, monkeypatch, crash_at):
    """Kill the append between stage completion and swap (and mid-swap):
    the table serves exactly the pre- or post-append version, never a
    mix; recover() heals and the retried append converges."""
    path = str(tmp_path / "t")
    _make(spark, path, n=2)

    class _Crash:
        def __init__(self, n, prefix):
            self.real, self.n, self.prefix, self.count = os.rename, n, prefix, 0

        def __call__(self, src, dst):
            if str(src).startswith(self.prefix) or str(dst).startswith(self.prefix):
                self.count += 1
                if self.count == self.n:
                    raise RuntimeError("injected crash")
            return self.real(src, dst)

    crash = _Crash(crash_at, path)
    monkeypatch.setattr(mt.os, "rename", crash)
    with pytest.raises(RuntimeError, match="injected crash"):
        mt.append_rows(spark, _new(spark, [(9, "n9", 90.0)]), path)
    monkeypatch.setattr(mt.os, "rename", crash.real)

    pre = {(1, 10.0), (2, 20.0)}
    post = pre | {(9, 90.0)}
    snap = {(r.id, r.bal) for r in mt.read(spark, path).collect()}
    assert snap in (pre, post)
    if snap == pre:
        mt.append_rows(spark, _new(spark, [(9, "n9", 90.0)]), path)
    assert {(r.id, r.bal) for r in mt.read(spark, path).collect()} == post


@pytest.mark.slow  # redundancy-class battery: covered by faster siblings in the default run
def test_foreach_batch_append_sink_exactly_once(spark, tmp_path):
    """The streaming append sink: batches land as blind appends, a
    replayed epoch (same checkpoint, restarted query) is skipped, and
    the end table equals the full input exactly once."""
    from aws_callcenter_delta_lakehouse_spark.streaming.streams import (
        foreach_batch_append,
    )

    src_dir = str(tmp_path / "in")
    target = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df1.coalesce(1).write.mode("append").parquet(src_dir)

    def run_once():
        stream = spark.readStream.schema("id long, v string").parquet(src_dir)
        q = foreach_batch_append(stream, target, ckpt, keys=("id",))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    assert mt.read(spark, target).count() == 2
    # second file arrives; restart from the same checkpoint
    spark.createDataFrame([(3, "c")], "id long, v string").coalesce(
        1
    ).write.mode("append").parquet(src_dir)
    run_once()
    got = sorted((r.id, r.v) for r in mt.read(spark, target).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # a third run with no new data replays nothing
    run_once()
    assert mt.read(spark, target).count() == 3
    # epoch recorded atomically with the data
    assert "last_epoch" in mt.table_txn(target)


@pytest.mark.slow  # redundancy-class battery: covered by faster siblings in the default run
def test_append_auto_compact_property(spark, tmp_path):
    """Delta autoCompact: continuous appends accrete one small file set
    per commit; the table property triggers a data-preserving binpack
    once the marker's file count crosses the threshold — rows, version
    continuity, and txn survive, and the file count stays bounded."""
    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.createDataFrame([(0, "base")], "id long, v string").coalesce(1),
        path,
        keys=("id",),
        properties={"autoCompact": {"min_files": 5}},
    )
    for i in range(1, 9):
        mt.append_rows(
            spark,
            spark.createDataFrame([(i, f"v{i}")], "id long, v string")
            .coalesce(1),
            path,
            txn={"last_epoch": i},
        )
    d = mt.table_detail(path)
    assert d["num_rows"] == 9
    assert d["num_files"] < 5, d  # binpacked below the threshold
    got = sorted(r.id for r in mt.read(spark, path).collect())
    assert got == list(range(9))
    # the compaction follow-ups carried txn forward (exactly-once sinks
    # must not replay) and never reset the version
    assert mt.table_txn(path)["last_epoch"] == 8
    assert mt.table_version(path) == 8  # one bump per append only
