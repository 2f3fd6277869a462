"""Protocol table features (Delta readerFeatures/writerFeatures
analogue, delta PROTOCOL.md "Table Features").

The contract pinned here:
- plain tables carry NO feature lists (markers stay minimal; any build
  can read/write them);
- a DV commit stamps `deletionVectors` as a READER feature: a build
  without DV support must REFUSE the read (else it would resurrect
  deleted rows from the raw files) — simulated by stripping the
  supported set;
- CDF / CHECK constraints / identity / unique-keys are WRITER-ONLY
  features: reads stay open to any build, but a non-understanding
  writer must refuse to commit (it would hole the feed / skip
  enforcement);
- features are CANONICAL per marker: a rewriting commit that
  materializes a column mapping (or a REORG that clears the DV) sheds
  the feature instead of carrying a stale flag;
- unknown future features in a hand-edited marker refuse by NAME;
- legacy markers without stamped lists still derive and refuse;
- data-preserving maintenance (compact/binpack) carries writer
  features forward via _write_marker_like.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import maintenance
from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt


def _marker(path):
    return json.loads(open(os.path.join(path, mt._MARKER)).read())


def _make(spark, path, **kw):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i * 10)) for i in range(1, 9)],
        ["id", "name", "bal"],
    ).repartition(2)
    mt.initial_write(df, path, keys=("id",), **kw)


def test_plain_table_has_no_feature_lists(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    m = _marker(path)
    assert "reader_features" not in m and "writer_features" not in m
    # and a build with EVERYTHING stripped still reads/writes it
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mt, "SUPPORTED_READER_FEATURES", frozenset())
        mp.setattr(mt, "SUPPORTED_WRITER_FEATURES", frozenset())
        assert mt.read(spark, path).count() == 8
        mt.delete_where(spark, path, "id = 8")
    assert mt.read(spark, path).count() == 7


def test_dv_table_stamps_reader_feature_and_refuses_stripped_build(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.delete_where(spark, path, "bal > 50", deletion_vectors=True)
    m = _marker(path)
    assert m["reader_features"] == ["deletionVectors"]
    assert m["writer_features"] == ["deletionVectors"]
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_READER_FEATURES",
            mt.SUPPORTED_READER_FEATURES - {"deletionVectors"},
        )
        with pytest.raises(mt.ProtocolError, match="deletionVectors"):
            mt.read(spark, path).count()
    # full build still fine
    assert mt.read(spark, path).count() == 5


def test_reorg_sheds_the_dv_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.delete_where(spark, path, "id = 1", deletion_vectors=True)
    assert _marker(path).get("reader_features") == ["deletionVectors"]
    maintenance.materialize_deletes(spark, path)
    m = _marker(path)
    assert "reader_features" not in m
    assert mt.read(spark, path).count() == 7


def test_cdf_is_writer_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.set_table_property(path, "enableChangeDataFeed", True)
    m = _marker(path)
    assert m["writer_features"] == ["changeDataFeed"]
    assert "reader_features" not in m
    stripped = mt.SUPPORTED_WRITER_FEATURES - {"changeDataFeed"}
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mt, "SUPPORTED_WRITER_FEATURES", stripped)
        # reads stay open
        assert mt.read(spark, path).count() == 8
        # but a commit (which would have to record a change sidecar)
        # refuses rather than hole the feed
        with pytest.raises(mt.ProtocolError, match="changeDataFeed"):
            mt.delete_where(spark, path, "id = 1")
        with pytest.raises(mt.ProtocolError, match="changeDataFeed"):
            mt.delete_where(spark, path, "id = 1", deletion_vectors=True)
    # untouched: the refused commits left no version behind
    assert mt.read(spark, path).count() == 8
    mt.delete_where(spark, path, "id = 1")
    assert mt.read(spark, path).count() == 7


def test_constraint_feature_stamped_and_shed(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_constraint(spark, path, "bal_pos", "bal >= 0")
    assert _marker(path)["writer_features"] == ["checkConstraints"]
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_WRITER_FEATURES",
            mt.SUPPORTED_WRITER_FEATURES - {"checkConstraints"},
        )
        with pytest.raises(mt.ProtocolError, match="checkConstraints"):
            mt.delete_where(spark, path, "id = 1")
    mt.drop_constraint(path, "bal_pos")
    assert "writer_features" not in _marker(path)
    mt.delete_where(spark, path, "id = 1")
    assert mt.read(spark, path).count() == 7


def test_column_mapping_is_a_reader_feature_until_materialized(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.rename_column(spark, path, "bal", "balance")
    m = _marker(path)
    assert m["reader_features"] == ["columnMapping"]
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_READER_FEATURES",
            mt.SUPPORTED_READER_FEATURES - {"columnMapping"},
        )
        with pytest.raises(mt.ProtocolError, match="columnMapping"):
            mt.read(spark, path).count()
    # the next rewriting commit materializes the rename and sheds the
    # feature — exactly the canonical-stamp contract
    mt.update_where(spark, path, "id = 1", {"balance": F.lit(0.0)})
    m = _marker(path)
    assert "reader_features" not in m
    assert "balance" in mt.read(spark, path).columns


def test_unknown_future_feature_refuses_by_name(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    m = _marker(path)
    m["reader_features"] = ["v2Checkpoints"]
    # hand-edit (a future engine wrote this marker)
    open(os.path.join(path, mt._MARKER), "w").write(json.dumps(m))
    with pytest.raises(mt.ProtocolError, match="v2Checkpoints"):
        mt.read(spark, path).count()
    m["reader_features"] = []
    m["writer_features"] = ["icebergCompatV3"]
    open(os.path.join(path, mt._MARKER), "w").write(json.dumps(m))
    assert mt.read(spark, path).count() == 8  # reads negotiate separately
    with pytest.raises(mt.ProtocolError, match="icebergCompatV3"):
        mt.delete_where(spark, path, "id = 1")


def test_legacy_marker_without_lists_still_derives(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.delete_where(spark, path, "id = 1", deletion_vectors=True)
    # simulate a marker written by the pre-features engine: strip lists
    m = _marker(path)
    m.pop("reader_features", None)
    m.pop("writer_features", None)
    open(os.path.join(path, mt._MARKER), "w").write(json.dumps(m))
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_READER_FEATURES",
            mt.SUPPORTED_READER_FEATURES - {"deletionVectors"},
        )
        with pytest.raises(mt.ProtocolError, match="deletionVectors"):
            mt.read(spark, path).count()
    assert mt.read(spark, path).count() == 7


def test_maintenance_carries_writer_features(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.add_constraint(spark, path, "bal_pos", "bal >= 0")
    maintenance.compact(spark, path, target_file_bytes=1 << 30)
    assert _marker(path)["writer_features"] == ["checkConstraints"]
    # and the carried feature still gates a stripped writer
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_WRITER_FEATURES",
            mt.SUPPORTED_WRITER_FEATURES - {"checkConstraints"},
        )
        with pytest.raises(mt.ProtocolError, match="checkConstraints"):
            maintenance.compact(spark, path, target_file_bytes=1 << 30)


def test_clone_carries_canonical_features(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _make(spark, src)
    mt.add_constraint(spark, src, "bal_pos", "bal >= 0")
    mt.delete_where(spark, src, "id = 1", deletion_vectors=True)
    mt.clone_table(src, dst)
    m = _marker(dst)
    assert m["reader_features"] == ["deletionVectors"]
    assert m["writer_features"] == ["checkConstraints", "deletionVectors"]
    # and the clone's gates actually bite
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(
            mt,
            "SUPPORTED_READER_FEATURES",
            mt.SUPPORTED_READER_FEATURES - {"deletionVectors"},
        )
        with pytest.raises(mt.ProtocolError, match="deletionVectors"):
            mt.read(spark, dst).count()
    assert mt.read(spark, dst).count() == 7
