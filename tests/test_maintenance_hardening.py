"""Round-12 maintenance review fixes, each pinned:

1. compact_binpack carries pending logical-schema metadata
   (column_mapping / dropped_columns / added_columns) — a physical
   file carry must not un-rename, resurrect dropped payloads, or drop
   a declared ADD COLUMN;
2. purge_rows staging/backup dirs live OUTSIDE __history and a crash
   window heals on the next purge; stray non-numeric 'v*' dirs never
   crash list_versions;
3. vacuum never sweeps the SQL-view canary;
4. table_file_stats counts DATA only (no _change_data/_delta_history);
5. compact() with the default partition_by falls back to the marker's
   layout instead of silently un-partitioning;
6. partition-scoped compaction sheds the now-stale root _delta_log
   export (re-exporting on auto tables);
7. purge_rows pre-flights the predicate on every retained snapshot and
   aborts BEFORE any mutation when it cannot resolve.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import (
    maintenance,
    managed_table as mt,
)
from aws_callcenter_delta_lakehouse_spark.sources.fs import get_fs as _fs


def _mk(spark, path, n=6, props=None, partition_by=()):
    df = spark.createDataFrame(
        [(i, f"s{i}", i % 2) for i in range(n)], "k INT, s STRING, p INT"
    )
    mt.commit_overwrite(
        df, path, keys=("k",), properties=props,
        partition_by=tuple(partition_by),
    )
    return df


def test_binpack_carries_pending_schema_metadata(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    # accrete small files so binpack has work
    for i in range(3):
        mt.append_rows(
            spark,
            spark.createDataFrame(
                [(100 + i, f"a{i}", 0)], "k INT, s STRING, p INT"
            ),
            path,
        )
    mt.rename_column(spark, path, "s", "label")
    mt.add_column(spark, path, "flag", "int", default=7)
    before = {
        tuple(sorted(r.asDict().items()))
        for r in mt.read(spark, path).collect()
    }
    out = maintenance.compact_binpack(spark, path, target_file_bytes=1 << 20)
    assert out["rewritten"] >= 2
    after_df = mt.read(spark, path)
    # the rename and the pending ADD COLUMN must survive the physical carry
    assert "label" in after_df.columns and "flag" in after_df.columns
    after = {
        tuple(sorted(r.asDict().items())) for r in after_df.collect()
    }
    assert after == before


def test_list_versions_ignores_stray_history_dirs(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    mt.merge_upsert(
        spark, path,
        spark.createDataFrame([(1, "x", 0)], "k INT, s STRING, p INT"),
        keys=("k",),
    )
    hist = mt._history_dir(path)
    _fs().makedirs(os.path.join(hist, "v000000__junk"))
    try:
        assert mt.list_versions(path) == [0, 1]
    finally:
        _fs().rmtree(os.path.join(hist, "v000000__junk"))


def test_purge_staging_is_outside_history_and_heals(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    mt.merge_upsert(
        spark, path,
        spark.createDataFrame([(99, "zz", 1)], "k INT, s STRING, p INT"),
        keys=("k",), max_history=4,
    )
    hist = mt._history_dir(path)
    # simulate a crash window: v0 renamed to its backup, snap missing
    snap0 = os.path.join(hist, "v000000")
    backup0 = f"{hist}__purgeold_v000000"
    _fs().rename_dir(snap0, backup0)
    assert not _fs().isdir(snap0)
    out = maintenance.purge_rows(spark, path, F.col("k") == 2)
    # the heal restored v0 before purging, and the purge then erased k=2
    assert _fs().isdir(snap0) and not _fs().isdir(backup0)
    assert out["live_removed"] == 1
    assert mt.read(spark, path, version=0).filter("k = 2").count() == 0
    # no purge artifacts inside __history
    assert all(
        d[1:].isdigit() for d in _fs().listdir(hist) if d.startswith("v")
    )


def test_vacuum_keeps_sql_view_canary(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    canary = mt._sql_view_canary_dir(path)
    _fs().makedirs(canary, exist_ok=True)
    spark.range(1).write.mode("overwrite").parquet(canary)
    removed = maintenance.vacuum(path)
    assert canary not in removed and _fs().isdir(canary)


def test_table_file_stats_excludes_sidecars(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, props={"enableChangeDataFeed": True})
    base = maintenance.table_file_stats(path)
    mt.delete_where(spark, path, F.col("k") == 0)  # writes _change_data
    maintenance.export_delta_log(spark, path, versioned=True)
    stats = maintenance.table_file_stats(path)
    # sidecar parquet (_change_data, _delta_history hardlinks) excluded
    data_files = [
        f
        for f in _fs().glob(os.path.join(path, "*.parquet"))
        if _fs().isfile(f)
    ]
    assert stats["n_files"] == len(data_files)
    assert stats["total_bytes"] <= base["total_bytes"] * 2


def test_compact_default_preserves_partitioning(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, partition_by=("p",))
    maintenance.compact(spark, path)  # no partition_by argument
    marker = mt._read_marker(path)
    assert list(marker.get("partition_by", [])) == ["p"]
    assert any(
        d.startswith("p=") for d in _fs().listdir(path) if _fs().isdir(
            os.path.join(path, d)
        )
    )
    assert mt.read(spark, path).count() == 6


def test_partition_compact_sheds_stale_root_export(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, partition_by=("p",))
    maintenance.export_delta_log(spark, path)
    assert _fs().isdir(os.path.join(path, "_delta_log"))
    maintenance.compact(spark, path, ("p",), where="p = 1")
    # the export named files the swap retired — it must be gone
    assert not _fs().isdir(os.path.join(path, "_delta_log"))


def test_binpack_reexports_on_auto_tables(spark, tmp_path):
    import json

    path = str(tmp_path / "t")
    _mk(spark, path)
    mt.set_table_property(path, mt._LOG_EXPORT_PROP, True)
    for i in range(3):
        mt.append_rows(
            spark,
            spark.createDataFrame(
                [(200 + i, f"b{i}", 1)], "k INT, s STRING, p INT"
            ),
            path,
        )
    maintenance.compact_binpack(spark, path, target_file_bytes=1 << 20)
    log = os.path.join(path, "_delta_log")
    assert _fs().isdir(log), "auto-export table lost its _delta_log"
    # every add path in the freshest commit resolves under the root
    newest = sorted(
        f for f in _fs().listdir(log) if f.endswith(".json")
    )[-1]
    for line in _fs().read_text(os.path.join(log, newest)).splitlines():
        action = json.loads(line)
        if "add" in action:
            from urllib.parse import unquote

            assert _fs().exists(
                os.path.join(path, unquote(action["add"]["path"]))
            )


def test_purge_preflight_aborts_before_mutation(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    mt.merge_upsert(
        spark, path,
        spark.createDataFrame([(50, "new", 1)], "k INT, s STRING, p INT"),
        keys=("k",), max_history=4,
    )
    mt.rename_column(spark, path, "s", "label")
    hist_before = {
        v: mt.read(spark, path, version=v).count()
        for v in mt.list_versions(path)[:-1]
    }
    with pytest.raises(ValueError, match="does not resolve on retained"):
        maintenance.purge_rows(spark, path, "label = 's1'")
    # nothing mutated
    for v, n in hist_before.items():
        assert mt.read(spark, path, version=v).count() == n
    assert mt.read(spark, path).filter("label = 's1'").count() == 1


def test_binpack_of_emptied_table_stays_readable(spark, tmp_path):
    """Round-13 soak find: delete-all leaves empty-FOOTER parquet files
    (readable); a later binpack coalesces them into ZERO files
    (partitionBy of nothing writes nothing) and the metadata-preserving
    marker carried no schema — the swap stranded the table with
    UNABLE_TO_INFER_SCHEMA forever. The marker now records the physical
    schema as schema-in-log when staging holds no data files."""
    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ),
        path,
        keys=("id",),
        properties={"enableChangeDataFeed": True},
    )
    mt.delete_where(spark, path, F.lit(True), max_history=10)
    # a no-match DV update appends a second empty file — the exact
    # soak interleaving (>= 2 smalls, so binpack proceeds)
    mt.update_where(
        spark, path, F.col("id") < 0, {"v": F.lit("x")},
        max_history=10, deletion_vectors=True,
    )
    out = maintenance.compact_binpack(spark, path, target_file_bytes=1 << 20)
    assert out["after"]["n_files"] == 0 or out["rewritten"] >= 0
    got = mt.read(spark, path)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "v"]
    # and the table still accepts new data afterwards
    mt.merge_upsert(
        spark, path,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        keys=("id",), max_history=10,
    )
    assert {(r.id, r.v) for r in mt.read(spark, path).collect()} == {(1, "a")}


def test_materialize_all_dv_partitioned_stays_readable(spark, tmp_path):
    """compact()'s sibling of the binpack find: REORG PURGE of a
    PARTITIONED table whose deletion vector covers every row rewrites
    0 rows — a partitioned write of nothing emits no files — and the
    carried marker held no schema. The logical-schema fallback keeps
    the emptied table readable."""
    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.createDataFrame(
            [(i, "ab"[i % 2], f"v{i}") for i in range(8)],
            "id long, p string, v string",
        ),
        path,
        keys=("id",),
        partition_by=["p"],
    )
    mt.delete_where(
        spark, path, F.lit(True), max_history=10, deletion_vectors=True
    )
    assert mt.read(spark, path).count() == 0  # DV-masked, files intact
    out = maintenance.materialize_deletes(spark, path)
    assert out["materialized"] is True
    got = mt.read(spark, path)
    assert got.count() == 0
    assert set(got.columns) == {"id", "p", "v"}


def test_purge_emptying_partitioned_history_snapshot_stays_readable(
    spark, tmp_path
):
    """purge_rows sibling of the binpack find: a purge matching EVERY
    row of a retained PARTITIONED snapshot rewrites it to zero files —
    schema-in-log now keeps that history version readable."""
    path = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(i, "ab"[i % 2], "pii") for i in range(6)],
        "id long, p string, tag string",
    )
    mt.commit_overwrite(v0, path, keys=("id",), partition_by=["p"])
    v1 = spark.createDataFrame(
        [(i, "ab"[i % 2], "clean") for i in range(10, 14)],
        "id long, p string, tag string",
    )
    mt.commit_overwrite(v1, path, keys=("id",), partition_by=["p"],
                        max_history=10)
    out = maintenance.purge_rows(spark, path, "tag = 'pii'")
    assert out["history_rewritten"] == 1
    hist = mt.read(spark, path, version=0)
    assert hist.count() == 0  # fully erased, but still readable
    assert set(hist.columns) == {"id", "p", "tag"}
    assert {r.id for r in mt.read(spark, path).collect()} == {10, 11, 12, 13}
