"""export_delta_log: a REAL Delta transaction log (public delta-io
PROTOCOL.md shapes) over the live snapshot. No external Delta reader
ships in this sandbox, so the contract is pinned structurally — parse
the NDJSON actions, check the add-file inventory byte-for-byte against
the snapshot, round-trip the schemaString through StructType.fromJson,
verify partitionValues against the Hive layout — and an external read
is REPLAYED the way a Delta reader would execute it (DuckDB scanning
exactly the add-listed files)."""

from __future__ import annotations

import glob
import json
import os
from urllib.parse import unquote

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
from aws_callcenter_delta_lakehouse_spark.sources.delta_api import DeltaTable
from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
    export_delta_log,
)


def _actions(log_file: str) -> list[dict]:
    with open(log_file) as f:
        return [json.loads(line) for line in f if line.strip()]


def _one(actions, key):
    found = [a[key] for a in actions if key in a]
    assert len(found) == 1, (key, actions)
    return found[0]


def test_export_unpartitioned_structure(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "bal"]
    )
    mt.commit_overwrite(df.repartition(2), path, keys=("id",))
    log_file = DeltaTable.forPath(spark, path).exportDeltaLog()
    assert log_file.endswith(os.path.join("_delta_log", f"{0:020d}.json"))

    actions = _actions(log_file)
    proto = _one(actions, "protocol")
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = _one(actions, "metaData")
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == []
    # schemaString is Spark-JSON (the exact format Delta uses) and
    # round-trips to the table's public schema
    assert StructType.fromJson(json.loads(meta["schemaString"])) == (
        mt.read(spark, path).schema
    )
    adds = [a["add"] for a in actions if "add" in a]
    snap_files = sorted(
        os.path.relpath(f, path)
        for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    assert sorted(unquote(a["path"]) for a in adds) == snap_files
    for a in adds:
        assert a["partitionValues"] == {}
        assert a["dataChange"] is True
        assert a["size"] == os.path.getsize(
            os.path.join(path, unquote(a["path"]))
        )


def test_export_partitioned_partition_values(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(20)], "id long, p int, v string"
    )
    mt.commit_overwrite(df, path, keys=("id",), partition_by=("p",))
    log_file = export_delta_log(spark, path)
    actions = _actions(log_file)
    meta = _one(actions, "metaData")
    assert meta["partitionColumns"] == ["p"]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds
    for a in adds:
        rel = unquote(a["path"])
        assert rel.split("/")[0] in ("p=0", "p=1")
        assert a["partitionValues"] == {"p": rel.split("/")[0].split("=")[1]}
    # partition columns are IN the schemaString (Delta keeps them
    # logical even though the files omit them)
    names = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    assert "p" in names


def test_export_external_read_replay(spark, tmp_path):
    """Replay the read an external Delta engine would run: scan exactly
    the add-listed files with DuckDB and compare to the table."""
    import duckdb

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(50)], ["id", "name", "bal"]
    )
    mt.commit_overwrite(df.repartition(3), path, keys=("id",))
    log_file = export_delta_log(spark, path)
    adds = [a["add"] for a in _actions(log_file) if "add" in a]
    files = [os.path.join(path, unquote(a["path"])) for a in adds]
    ext = duckdb.sql(
        f"SELECT id, name, bal FROM read_parquet({files!r}) ORDER BY id"
    ).fetchall()
    ours = sorted(
        (r.id, r.name, r.bal) for r in mt.read(spark, path).collect()
    )
    assert [tuple(r) for r in ext] == ours


def test_export_hides_row_id_and_carries_properties(spark, tmp_path):
    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.createDataFrame([(1, "a")], ["id", "v"]),
        path,
        keys=("id",),
        properties={"enableRowTracking": True, "comment": "hello"},
    )
    log_file = export_delta_log(spark, path)
    meta = _one(_actions(log_file), "metaData")
    names = [f["name"] for f in json.loads(meta["schemaString"])["fields"]]
    assert "__row_id" not in names  # engine-internal, stays hidden
    assert meta["configuration"]["comment"] == "hello"


def test_export_refuses_reader_features_and_regenerates(spark, tmp_path):
    path = str(tmp_path / "t")
    mt.commit_overwrite(
        spark.createDataFrame([(i, i) for i in range(10)], ["id", "v"]),
        path,
        keys=("id",),
    )
    first = export_delta_log(spark, path)
    assert os.path.exists(first)
    # a rewriting commit REPLACES the snapshot dir: the stale log is
    # gone with it (a reader can never see old log over new files)
    mt.delete_where(spark, path, "id >= 5")
    assert not os.path.exists(first)
    second = export_delta_log(spark, path)
    adds = [a for a in _actions(second) if "add" in a]
    assert adds
    # DV table refuses
    mt.delete_where(spark, path, "id = 0", deletion_vectors=True)
    with pytest.raises(mt.ProtocolError, match="deletionVectors"):
        export_delta_log(spark, path)
