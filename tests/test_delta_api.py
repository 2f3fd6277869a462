"""delta-spark ``DeltaTable`` facade contract tests.

Mirrors the reference's literal Glue-job idioms
(``/root/reference/glue_jobs/01_silver_delta_upsert.py:99-112`` —
``isDeltaTable`` branch, ``forPath().alias("t").merge(source=...,
condition="t.call_id = s.call_id").whenMatchedUpdateAll()
.whenNotMatchedInsertAll().execute()``) plus the full delta-spark
clause surface the facade claims: conditional update/delete/insert,
by-source clauses, the multiple-source-match error, plan routing
(classic combo -> merge_upsert key joins, anything else ->
general_merge), caller-supplied source aliases, CDF change-set
recording, row-tracking id preservation, appendOnly gating,
ADD COLUMN DEFAULT parity between the two routes, convertToDelta,
and the maintenance pass-throughs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import delta_api as da
from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
from aws_callcenter_delta_lakehouse_spark.sources.delta_api import DeltaTable


def _make(spark, path, properties=None, keys=("id",)):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )
    mt.commit_overwrite(df, path, keys=keys, properties=properties or {})
    return df


def _rows(spark, path):
    return sorted(
        (r.id, r.name, r.v) for r in mt.read(spark, path).collect()
    )


# ---------------------------------------------------------------------------
# The reference's literal Silver idiom
# ---------------------------------------------------------------------------

def test_reference_silver_merge_idiom(spark, tmp_path):
    """01_silver_delta_upsert.py:99-112 verbatim shape: existence probe,
    alias("t"), merge(source=..., condition=...), updateAll+insertAll."""
    path = str(tmp_path / "silver")
    assert DeltaTable.isDeltaTable(spark, path) is False
    _make(spark, path)
    assert DeltaTable.isDeltaTable(spark, path) is True

    src = spark.createDataFrame(
        [(2, "B!", 99), (4, "d", 40)], ["id", "name", "v"]
    )
    delta_table = DeltaTable.forPath(spark, path)
    (
        delta_table.alias("t")
        .merge(source=src.alias("s"), condition="t.id = s.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert _rows(spark, path) == [
        (1, "a", 10), (2, "B!", 99), (3, "c", 30), (4, "d", 40)
    ]


def test_for_path_rejects_non_table(spark, tmp_path):
    with pytest.raises(ValueError, match="not a managed table"):
        DeltaTable.forPath(spark, str(tmp_path / "nope"))


# ---------------------------------------------------------------------------
# Plan routing: classic combo -> merge_upsert, anything else -> general
# ---------------------------------------------------------------------------

def test_classic_combo_routes_to_merge_upsert(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(3, "C", 33)], ["id", "name", "v"])
    calls = {}
    real = mt.merge_upsert

    def spy(*a, **kw):
        calls["hit"] = kw.get("keys") or a[3]
        return real(*a, **kw)

    monkeypatch.setattr(da.managed_table, "merge_upsert", spy)
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert list(calls["hit"]) == ["id"]
    assert _rows(spark, path) == [(1, "a", 10), (2, "b", 20), (3, "C", 33)]


def test_classic_with_by_source_delete_routes_classic(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "A", 11), (9, "i", 90)], ["id", "name", "v"])
    hit = []
    real = mt.merge_upsert
    monkeypatch.setattr(
        da.managed_table, "merge_upsert",
        lambda *a, **kw: (hit.append(kw), real(*a, **kw))[1],
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .whenNotMatchedBySourceDelete()
        .execute()
    )
    assert hit and hit[0]["not_matched_by_source"] == "delete"
    assert _rows(spark, path) == [(1, "A", 11), (9, "i", 90)]


def test_conditional_clause_routes_general(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "A", 11)], ["id", "name", "v"])
    monkeypatch.setattr(
        da.managed_table, "merge_upsert",
        lambda *a, **kw: pytest.fail("classic path must not be taken"),
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedUpdateAll(condition="s.v > 5")
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert _rows(spark, path) == [(1, "A", 11), (2, "b", 20), (3, "c", 30)]


def test_tautology_condition_is_not_equi_key(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "A", 11)], ["id", "name", "v"])
    b = (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = t.id")
        .whenMatchedUpdateAll()
    )
    assert b._equi_keys() is None
    b2 = (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "s.id = s.id")
        .whenMatchedUpdateAll()
    )
    assert b2._equi_keys() is None


def test_composite_equi_keys_any_order(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, keys=("id", "name"))
    src = spark.createDataFrame([(1, "a", 99)], ["id", "name", "v"])
    b = (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id AND s.name = t.name")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
    )
    assert b._equi_keys() == ["id", "name"]


# ---------------------------------------------------------------------------
# Caller-supplied source aliases (delta-spark accepts any alias)
# ---------------------------------------------------------------------------

def test_non_s_source_alias_classic(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(2, "B", 99), (5, "e", 50)], ["id", "name", "v"])
    b = (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src.alias("u"), "t.id = u.id")
    )
    assert b._equi_keys() == ["id"]
    b.whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert _rows(spark, path) == [
        (1, "a", 10), (2, "B", 99), (3, "c", 30), (5, "e", 50)
    ]


def test_non_s_source_alias_general_path(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "A1", 111), (3, "C3", 3)], ["id", "name", "v"])
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src.alias("u"), "t.id = u.id")
        .whenMatchedUpdate(condition="u.v > 100", set={"v": "u.v"})
        .execute()
    )
    assert _rows(spark, path) == [(1, "a", 111), (2, "b", 20), (3, "c", 30)]


def test_source_alias_colliding_with_target_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "A", 11)], ["id", "name", "v"])
    with pytest.raises(ValueError, match="collides"):
        DeltaTable.forPath(spark, path).alias("t").merge(
            src.alias("t"), "t.id = t.id"
        )


# ---------------------------------------------------------------------------
# Clause semantics (general executor)
# ---------------------------------------------------------------------------

def test_first_applicable_matched_clause_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame(
        [(1, "x", 100), (2, "x", 1)], ["id", "name", "v"]
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedUpdate(condition="s.v > 50", set={"name": F.lit("big")})
        .whenMatchedUpdate(set={"name": F.lit("small")})
        .execute()
    )
    assert _rows(spark, path) == [
        (1, "big", 10), (2, "small", 20), (3, "c", 30)
    ]


def test_matched_delete_with_condition(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame(
        [(1, "_", 0), (2, "_", 0), (3, "_", 0)], ["id", "name", "v"]
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedDelete(condition="t.v >= 20")
        .execute()
    )
    assert _rows(spark, path) == [(1, "a", 10)]


def test_not_matched_insert_values_and_condition(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame(
        [(8, "keep", 80), (9, "drop", -1)], ["id", "name", "v"]
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenNotMatchedInsert(
            condition="s.v > 0",
            values={"id": "s.id", "name": F.upper("s.name"), "v": "s.v * 2"},
        )
        .execute()
    )
    assert _rows(spark, path) == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (8, "KEEP", 160)
    ]


def test_by_source_update_and_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "_", 0)], ["id", "name", "v"])
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenNotMatchedBySourceUpdate(
            condition="t.v < 25", set={"name": F.lit("stale")}
        )
        .whenNotMatchedBySourceDelete(condition="t.v >= 25")
        .execute()
    )
    assert _rows(spark, path) == [(1, "a", 10), (2, "stale", 20)]


def test_multiple_source_rows_matching_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame(
        [(1, "d1", 1), (1, "d2", 2)], ["id", "name", "v"]
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        (
            DeltaTable.forPath(spark, path).alias("t")
            .merge(src, "t.id = s.id")
            .whenMatchedUpdate(set={"v": "s.v"})
            .execute()
        )
    # insert-only merges tolerate duplicate matches (the Delta rule)
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert _rows(spark, path) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_non_equi_merge_condition(spark, tmp_path):
    """A range condition runs through the general executor untouched."""
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(15, "mid", 0)], ["lo", "name", "v"])
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.v > s.lo AND t.v < s.lo + 10")
        .whenMatchedUpdate(set={"name": "s.name"})
        .execute()
    )
    assert _rows(spark, path) == [(1, "a", 10), (2, "mid", 20), (3, "c", 30)]


# ---------------------------------------------------------------------------
# Engine integration: CDF, row tracking, appendOnly, defaults, unpersist
# ---------------------------------------------------------------------------

def test_general_merge_records_cdf_change_set(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, properties={"enableChangeDataFeed": True})
    v0 = mt.table_version(path)
    src = spark.createDataFrame(
        [(1, "A", 11), (7, "g", 70), (3, "_", 0)], ["id", "name", "v"]
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedUpdate(condition="s.id = 1", set={"v": "s.v"})
        .whenMatchedDelete(condition="s.id = 3")
        .whenNotMatchedInsertAll()
        .execute()
    )
    ch = mt.table_changes(spark, path, v0, mt.table_version(path))
    got = sorted((r["_change_type"], r["id"]) for r in ch.collect())
    assert got == [
        ("delete", 3),
        ("insert", 7),
        ("update_postimage", 1),
        ("update_preimage", 1),
    ]


def test_general_merge_preserves_row_tracking_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, properties={"enableRowTracking": True})
    before = {
        r.id: r[mt._ROWID_COL]
        for r in mt._read_logical(spark, path).collect()
    }
    src = spark.createDataFrame([(2, "B", 99), (6, "f", 60)], ["id", "name", "v"])
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedUpdate(set={"v": "s.v"})
        .whenNotMatchedInsertAll()
        .execute()
    )
    after = {
        r.id: r[mt._ROWID_COL]
        for r in mt._read_logical(spark, path).collect()
    }
    for k in (1, 2, 3):  # surviving rows keep their ids (update included)
        assert after[k] == before[k]
    assert after[6] not in set(before.values())  # insert got a fresh id


def test_append_only_gating(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path, properties={"appendOnly": True})
    src = spark.createDataFrame([(7, "g", 70)], ["id", "name", "v"])
    dt = DeltaTable.forPath(spark, path).alias("t")
    # pure insert (conditional, so it routes general): allowed
    (
        dt.merge(src, "t.id = s.id")
        .whenNotMatchedInsert(condition="s.v > 0", values={
            "id": "s.id", "name": "s.name", "v": "s.v"})
        .execute()
    )
    assert len(_rows(spark, path)) == 4
    with pytest.raises(mt.AppendOnlyError):
        dt.merge(src, "t.id = s.id").whenMatchedUpdate(
            set={"v": "s.v"}
        ).execute()
    with pytest.raises(mt.AppendOnlyError):
        dt.delete("id = 1")


def test_insert_fills_add_column_default_both_routes(spark, tmp_path):
    """The same logical merge must insert the declared DEFAULT whether
    it routes classic (merge_upsert) or general (conditional insert)."""
    for route in ("classic", "general"):
        path = str(tmp_path / f"t_{route}")
        mt.commit_overwrite(
            spark.createDataFrame([(1, "a")], ["id", "name"]),
            path, keys=("id",),
        )
        mt.add_column(spark, path, "tier", "string", default="bronze")
        src = spark.createDataFrame([(5, "e")], ["id", "name"])
        b = DeltaTable.forPath(spark, path).alias("t").merge(
            src, "t.id = s.id"
        )
        if route == "classic":
            b.whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        else:
            b.whenNotMatchedInsert(
                condition="s.id > 0", values={"id": "s.id", "name": "s.name"}
            ).execute()
        got = {(r.id, r.tier) for r in mt.read(spark, path).collect()}
        assert got == {(1, "bronze"), (5, "bronze")}, route


def test_no_persistent_rdd_blocks_after_execute(spark, tmp_path):
    """perf trap 4: general_merge's lazy localCheckpoint must be
    unpersisted after the commit — a many-merges loop would otherwise
    pin executor memory."""
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keys())
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, "A", 11)], ["id", "name", "v"])
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .whenMatchedUpdate(set={"v": "s.v"})
        .execute()
    )
    leaked = set(sc._jsc.getPersistentRDDs().keys()) - before
    assert not leaked


def test_generated_column_assignment_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10)], ["id", "v"])
    mt.commit_overwrite(
        df, path, keys=("id",), generated={"v2": "v * 2"}
    )
    src = spark.createDataFrame([(1, 99)], ["id", "v"])
    with pytest.raises(ValueError, match="generated/identity"):
        (
            DeltaTable.forPath(spark, path).alias("t")
            .merge(src, "t.id = s.id")
            .whenMatchedUpdate(set={"v2": "s.v"})
            .execute()
        )


def test_schema_evolution_general_conditional_clauses(spark, tmp_path):
    """withSchemaEvolution on NON-classic shapes (r9): explicit
    update/insert clauses assigning a column the target lacks widen the
    schema; pre-existing rows read NULL, CDF records the widened change
    set, and survivors keep their row-tracking ids."""
    path = str(tmp_path / "t")
    _make(
        spark,
        path,
        properties={"enableChangeDataFeed": True, "enableRowTracking": True},
    )
    ids_before = {
        r.id: r._row_id
        for r in mt.read(spark, path, with_row_ids=True).collect()
    }
    v0 = mt.table_version(path)
    src = spark.createDataFrame(
        [(1, 11, 100), (4, 40, 400)], ["id", "v", "score"]
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .withSchemaEvolution()
        .whenMatchedUpdate(set={"v": "s.v", "score": "s.score"})
        .whenNotMatchedInsert(
            values={
                "id": "s.id",
                "name": "'new'",
                "v": "s.v",
                "score": "s.score * 2",
            }
        )
        .execute()
    )
    out = {r.id: r for r in mt.read(spark, path).collect()}
    assert "score" in mt.read(spark, path).columns
    assert (out[1].v, out[1].score) == (11, 100)  # updated, evolved col set
    assert (out[2].score, out[3].score) == (None, None)  # pre-existing: NULL
    assert (out[4].name, out[4].v, out[4].score) == ("new", 40, 800)
    # row-tracking ids survive the evolving rewrite for untouched+updated rows
    ids_after = {
        r.id: r._row_id
        for r in mt.read(spark, path, with_row_ids=True).collect()
    }
    for i in (1, 2, 3):
        assert ids_after[i] == ids_before[i]
    # CDF: the widened change set was recorded in the same commit
    ch = mt.table_changes(spark, path, v0, v0 + 1)
    kinds = {
        (r.id, r["_change_type"]): r for r in ch.collect()
    }
    assert kinds[(1, "update_postimage")].score == 100
    assert kinds[(1, "update_preimage")].score is None
    assert kinds[(4, "insert")].score == 800


def test_schema_evolution_general_update_all_new_source_col(spark, tmp_path):
    """A CONDITIONAL updateAll/insertAll (general route) with evolution:
    every new source column widens the target; rows no clause touches
    read NULL."""
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame(
        [(1, "A", 11, "x1"), (2, "B", 21, "x2"), (4, "D", 40, "x4")],
        ["id", "name", "v", "tag"],
    )
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .withSchemaEvolution()
        .whenMatchedUpdateAll(condition="s.v > 15")  # condition => general
        .whenNotMatchedInsertAll()
        .execute()
    )
    out = {r.id: r for r in mt.read(spark, path).collect()}
    assert out[1].tag is None and out[1].v == 10  # condition false: kept
    assert (out[2].v, out[2].tag) == (21, "x2")  # updated, evolved col
    assert out[3].tag is None  # never matched: NULL
    assert (out[4].name, out[4].tag) == ("D", "x4")  # inserted


def test_schema_evolution_assigned_expression_type(spark, tmp_path):
    """An evolved column assigned from an EXPRESSION over both aliases
    takes the expression's resolved type."""
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, 5.5)], ["id", "bonus"])
    (
        DeltaTable.forPath(spark, path).alias("t")
        .merge(src, "t.id = s.id")
        .withSchemaEvolution()
        .whenMatchedUpdate(set={"total": "t.v + s.bonus"})
        .execute()
    )
    df = mt.read(spark, path)
    assert dict(df.dtypes)["total"] == "double"
    out = {r.id: r.total for r in df.collect()}
    assert out[1] == 15.5 and out[2] is None


def test_schema_evolution_off_still_refuses_unknown_column(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    src = spark.createDataFrame([(1, 9)], ["id", "score"])
    with pytest.raises(ValueError, match="unknown target column"):
        (
            DeltaTable.forPath(spark, path).alias("t")
            .merge(src, "t.id = s.id")
            .whenMatchedUpdate(set={"score": "s.score"})
            .execute()
        )


# ---------------------------------------------------------------------------
# convertToDelta
# ---------------------------------------------------------------------------

def test_convert_to_delta_unpartitioned(spark, tmp_path):
    raw = str(tmp_path / "raw")
    spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"]).write.parquet(raw)
    dt = DeltaTable.convertToDelta(spark, raw)
    assert DeltaTable.isDeltaTable(spark, raw)
    assert dt.toDF().count() == 2
    # post-conversion DML runs the normal commit path
    dt.delete("id = 1")
    assert dt.toDF().count() == 1


def test_convert_to_delta_partitioned(spark, tmp_path):
    raw = str(tmp_path / "raw")
    spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], ["id", "v", "part"]
    ).write.partitionBy("part").parquet(raw)
    DeltaTable.convertToDelta(spark, raw, partition_by=("part",))
    assert mt._read_marker(raw)["partition_by"] == ["part"]
    # the declared layout survives a rewriting commit (the live
    # snapshot is the table directory itself)
    DeltaTable.forPath(spark, raw).update("id = 2", set={"v": F.lit("Y")})
    assert any(
        d.startswith("part=") for d in os.listdir(raw)
        if not d.startswith("_")
    )
    got = {(r.id, r.v, r.part) for r in mt.read(spark, raw).collect()}
    assert got == {(1, "x", "a"), (2, "Y", "b")}


def test_convert_to_delta_rejects_bad_partition_and_double_convert(spark, tmp_path):
    raw = str(tmp_path / "raw")
    spark.createDataFrame([(1, "x")], ["id", "v"]).write.parquet(raw)
    with pytest.raises(ValueError, match="partition column"):
        DeltaTable.convertToDelta(spark, raw, partition_by=("nope",))
    DeltaTable.convertToDelta(spark, raw)
    with pytest.raises(ValueError, match="already a managed table"):
        DeltaTable.convertToDelta(spark, raw)


# ---------------------------------------------------------------------------
# Pass-throughs: DML, maintenance, history/detail, restore, clone
# ---------------------------------------------------------------------------

def test_update_delete_history_detail(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    dt = DeltaTable.forPath(spark, path)
    dt.update("id = 1", set={"v": F.lit(111)})
    dt.delete("id = 3")
    assert _rows(spark, path) == [(1, "a", 111), (2, "b", 20)]
    h = dt.history()
    assert h.count() >= 3
    assert dt.history(limit=1).count() == 1
    d = dt.detail()  # delta-spark shape: a one-row DataFrame
    row = d.collect()[0]
    assert d.count() == 1 and row["num_rows"] == 2 and row["version"] >= 2


def test_restore_and_clone(spark, tmp_path):
    path = str(tmp_path / "t")
    _make(spark, path)
    v0 = mt.table_version(path)
    dt = DeltaTable.forPath(spark, path)
    dt.delete("id = 2")
    assert len(_rows(spark, path)) == 2
    dt.restoreToVersion(v0)
    assert len(_rows(spark, path)) == 3
    cl = dt.clone(str(tmp_path / "t2"))
    assert _rows(spark, str(tmp_path / "t2")) == _rows(spark, path)
    assert cl.toDF().count() == 3


def test_optimize_compaction_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 200).withColumn("v", F.col("id") * 2)
    mt.commit_overwrite(df.repartition(8), path, keys=("id",))
    dt = DeltaTable.forPath(spark, path)
    res = dt.optimize().executeCompaction()
    assert res["after"]["n_files"] <= res["before"]["n_files"]
    assert dt.toDF().count() == 200
    removed = dt.vacuum(retentionHours=0.0, dry_run=True)
    assert isinstance(removed, list)


# ---------------------------------------------------------------------------
# DDL builders: create / createIfNotExists / createOrReplace / replace
# ---------------------------------------------------------------------------

def test_create_builder_schema_partition_properties(spark, tmp_path):
    path = str(tmp_path / "t")
    dt = (
        DeltaTable.create(spark)
        .location(path)
        .addColumn("id", "bigint")
        .addColumn("v", "double")
        .addColumn("part", "string")
        .addColumn("v2", "double", generatedAlwaysAs="v * 2")
        .partitionedBy("part")
        .property("enableChangeDataFeed", True)
        .comment("builder-made")
        .primaryKeys("id")
        .execute()
    )
    assert DeltaTable.isDeltaTable(spark, path)
    assert dt.toDF().count() == 0
    marker = mt._read_marker(path)
    assert marker["partition_by"] == ["part"]
    assert marker["keys"] == ["id"]
    assert marker["generated"] == {"v2": "v * 2"}
    assert marker["properties"]["enableChangeDataFeed"] is True
    assert marker["properties"]["comment"] == "builder-made"
    # the declared schema is live: a merge into the empty table works
    src = spark.createDataFrame([(1, 1.5, "a")], ["id", "v", "part"])
    (
        dt.alias("t").merge(src, "t.id = s.id")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    )
    row = dt.toDF().collect()[0]
    assert (row.id, row.v, row.part, row.v2) == (1, 1.5, "a", 3.0)


def test_create_modes(spark, tmp_path):
    path = str(tmp_path / "t")

    def builder(mode):
        b = getattr(DeltaTable, mode)(spark)
        return b.location(path).addColumn("id", "bigint")

    with pytest.raises(ValueError, match="not a managed table"):
        builder("replace").execute()
    builder("create").execute()
    with pytest.raises(ValueError, match="already a managed table"):
        builder("create").execute()
    # IfNotExists no-ops: the existing (empty) table is untouched
    mt.merge_upsert(
        spark, path, spark.createDataFrame([(1,)], ["id"]), keys=("id",)
    )
    builder("createIfNotExists").execute()
    assert mt.read(spark, path).count() == 1
    # createOrReplace replaces
    builder("createOrReplace").execute()
    assert mt.read(spark, path).count() == 0
    # replace now succeeds too
    builder("replace").execute()
    assert mt.read(spark, path).count() == 0


def test_create_builder_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="location|tableName"):
        DeltaTable.create(spark).addColumn("id", "bigint").execute()
    with pytest.raises(ValueError, match="addColumn"):
        DeltaTable.create(spark).location(str(tmp_path / "x")).execute()
    # tableName without a session registry conf: actionable error
    spark.conf.unset("spark.managedTable.nameRegistry")
    with pytest.raises(ValueError, match="nameRegistry"):
        (
            DeltaTable.create(spark)
            .tableName("db.t")
            .addColumn("id", "bigint")
            .execute()
        )


# ---------------------------------------------------------------------------
# Name-addressed tables (r9): forName / tableName / spark.sql by name
# ---------------------------------------------------------------------------

def test_name_first_create_merge_sql(spark, tmp_path):
    """The reference's catalog idiom end to end WITHOUT a path in user
    code: create by name (managed placement under the registry), merge
    by name, query by name through spark.sql."""
    from aws_callcenter_delta_lakehouse_spark.sources.delta_api import (
        register_sql_view,
    )

    registry = str(tmp_path / "registry")
    spark.conf.set("spark.managedTable.nameRegistry", registry)
    try:
        (
            DeltaTable.create(spark)
            .tableName("cc_analytics.silver_calls")
            .addColumn("id", "bigint")
            .addColumn("status", "string")
            .primaryKeys("id")
            .execute()
        )
        # managed placement: data landed under the registry warehouse
        assert mt.is_table(
            spark, os.path.join(registry, "tables", "cc_analytics.silver_calls")
        )

        src = spark.createDataFrame(
            [(1, "COMPLETED"), (2, "DROPPED")], ["id", "status"]
        )
        (
            DeltaTable.forName(spark, "CC_Analytics.Silver_Calls")  # case-insensitive
            .alias("t")
            .merge(src, "t.id = s.id")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        assert sorted(
            (r.id, r.status)
            for r in DeltaTable.forName(spark, "cc_analytics.silver_calls")
            .toDF()
            .collect()
        ) == [(1, "COMPLETED"), (2, "DROPPED")]

        # SQL by name — and the view tracks LATER commits (path-stable swap)
        register_sql_view(spark, "cc_analytics.silver_calls")
        got = spark.sql(
            "SELECT status, COUNT(*) AS n FROM cc_analytics.silver_calls "
            "GROUP BY status ORDER BY status"
        ).collect()
        assert [(r.status, r.n) for r in got] == [("COMPLETED", 1), ("DROPPED", 1)]
        mt.append_rows(
            spark,
            spark.createDataFrame([(3, "DROPPED")], ["id", "status"]),
            os.path.join(registry, "tables", "cc_analytics.silver_calls"),
        )
        assert (
            spark.sql("SELECT COUNT(*) AS n FROM cc_analytics.silver_calls")
            .first().n == 3
        )
    finally:
        spark.sql("DROP DATABASE IF EXISTS cc_analytics CASCADE")
        spark.conf.unset("spark.managedTable.nameRegistry")


def test_name_registry_bindings(spark, tmp_path):
    """Binding semantics: create is put-if-absent, rebinding to another
    path refuses, external location registers under the name too,
    forName on an unknown name lists what exists."""
    from aws_callcenter_delta_lakehouse_spark.sources import txn_catalog as tc

    registry = str(tmp_path / "registry")
    spark.conf.set("spark.managedTable.nameRegistry", registry)
    try:
        ext = str(tmp_path / "ext")
        (
            DeltaTable.create(spark)
            .tableName("db.ext_table")
            .location(ext)  # EXTERNAL: explicit path + name binding
            .addColumn("id", "bigint")
            .execute()
        )
        assert tc.resolve_table_name(registry, "db.ext_table") == ext
        assert DeltaTable.forName(spark, "db.ext_table").path == ext

        # same name at a DIFFERENT path refuses
        with pytest.raises(ValueError, match="already bound"):
            (
                DeltaTable.createOrReplace(spark)
                .tableName("db.ext_table")
                .location(str(tmp_path / "other"))
                .addColumn("id", "bigint")
                .execute()
            )
        # createIfNotExists by the SAME name no-ops cleanly
        (
            DeltaTable.createIfNotExists(spark)
            .tableName("db.ext_table")
            .addColumn("id", "bigint")
            .execute()
        )
        with pytest.raises(KeyError, match="unknown table name"):
            DeltaTable.forName(spark, "db.nope")
        assert tc.list_table_names(registry) == {"db.ext_table": ext}
        tc.unregister_table_name(registry, "db.ext_table")
        assert tc.list_table_names(registry) == {}
        assert mt.is_table(spark, ext)  # DROP of the NAME keeps the data
    finally:
        spark.conf.unset("spark.managedTable.nameRegistry")


def test_register_sql_view_refuses_reader_features(spark, tmp_path):
    """A raw SQL view over a DV table would resurrect deleted rows —
    the registration refuses, same contract as external manifests."""
    from aws_callcenter_delta_lakehouse_spark.sources import txn_catalog as tc
    from aws_callcenter_delta_lakehouse_spark.sources.delta_api import (
        register_sql_view,
    )

    registry = str(tmp_path / "registry")
    path = str(tmp_path / "t")
    _make(spark, path)
    mt.delete_where(spark, path, "id = 1", deletion_vectors=True)
    tc.register_table_name(registry, "db.dv_table", path)
    with pytest.raises(mt.ProtocolError, match="deletionVectors"):
        register_sql_view(spark, "db.dv_table", registry_dir=registry)


def test_create_builder_add_columns_struct_type(spark, tmp_path):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    path = str(tmp_path / "t")
    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
    ])
    dt = (
        DeltaTable.createOrReplace(spark)
        .location(path)
        .addColumns(schema)
        .execute()
    )
    assert [f.name for f in dt.toDF().schema.fields] == ["id", "name"]


def test_empty_table_lifecycle_partitioned(spark, tmp_path):
    """CREATE TABLE of an empty PARTITIONED table emits zero parquet
    files — the schema must live in the marker (Delta's schema-in-log):
    reads serve the declared empty frame, DML populates it, and a
    delete-to-empty round-trips back to marker-held schema."""
    path = str(tmp_path / "t")
    (
        DeltaTable.createOrReplace(spark)
        .location(path)
        .addColumn("id", "bigint")
        .addColumn("v", "string")
        .addColumn("part", "string")
        .partitionedBy("part")
        .primaryKeys("id")
        .execute()
    )
    dt = DeltaTable.forPath(spark, path)
    assert dt.toDF().count() == 0
    assert dt.toDF().columns == ["id", "v", "part"]
    marker = mt._read_marker(path)
    assert marker.get("schema_json")
    assert "emptyTableSchema" in marker["reader_features"]
    assert marker["stats"]["n_rows"] == 0

    src = spark.createDataFrame([(1, "x", "a"), (2, "y", "b")], ["id", "v", "part"])
    (
        dt.alias("t").merge(src, "t.id = s.id")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    )
    assert dt.toDF().count() == 2
    # data exists now: the schema rides in the files again
    assert "schema_json" not in mt._read_marker(path)

    # delete back to empty: a partitioned overwrite of zero rows emits
    # zero files — the marker must pick the schema back up
    dt.delete()
    assert dt.toDF().count() == 0
    assert dt.toDF().columns == ["id", "v", "part"]
    assert mt._read_marker(path).get("schema_json")
    # ... and the populated snapshot stays time-travel readable
    assert mt.read(spark, path, version=1).count() == 2


def test_empty_table_detail_history_clone(spark, tmp_path):
    path = str(tmp_path / "t")
    (
        DeltaTable.create(spark)
        .location(path)
        .addColumn("id", "bigint")
        .addColumn("part", "string")
        .partitionedBy("part")
        .execute()
    )
    dt = DeltaTable.forPath(spark, path)
    assert dt.detail().collect()[0]["num_rows"] == 0
    assert dt.history().count() == 1
    cl = dt.clone(str(tmp_path / "t2"))
    assert cl.toDF().count() == 0
    assert cl.toDF().columns == ["id", "part"]


def test_optimize_zorder(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 500).withColumn(
        "k", (F.col("id") * 7919) % 100
    ).withColumn("v", F.col("id") * 2)
    mt.commit_overwrite(df.repartition(4), path, keys=("id",))
    dt = DeltaTable.forPath(spark, path)
    dt.optimize().executeZOrderBy("k")
    assert dt.toDF().count() == 500


def test_optimize_where_zorder_partition_scoped(spark, tmp_path):
    """OPTIMIZE ... WHERE ... ZORDER BY (r9): only the selected Hive
    partition's files are rewritten, and the rewritten files are
    z-clustered (non-overlapping per-file Morton ranges); the other
    partition's files are byte-identical on disk."""
    import glob as _glob

    from aws_callcenter_delta_lakehouse_spark.operators.layout import (
        zorder_key,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 600)
        .withColumn("p", (F.col("id") % 2).cast("int"))
        .withColumn("x", (F.col("id") * 7919) % 256)
        .withColumn("y", (F.col("id") * 104729) % 256)
    )
    mt.commit_overwrite(
        df.repartition(6), path, keys=("id",), partition_by=("p",)
    )
    before_rows = sorted(
        (r.id, r.p, r.x, r.y) for r in mt.read(spark, path).collect()
    )
    cold = sorted(_glob.glob(os.path.join(path, "p=1", "*.parquet")))
    cold_m = [os.path.getmtime(f) for f in cold]
    hot_before = sorted(_glob.glob(os.path.join(path, "p=0", "*.parquet")))

    dt = DeltaTable.forPath(spark, path)
    dt.optimize().where("p = 0").executeZOrderBy("x", "y")

    # untouched partition: same files, same mtimes
    assert sorted(_glob.glob(os.path.join(path, "p=1", "*.parquet"))) == cold
    assert [os.path.getmtime(f) for f in cold] == cold_m
    hot_after = sorted(_glob.glob(os.path.join(path, "p=0", "*.parquet")))
    assert hot_after != hot_before  # rewritten
    # no data loss anywhere
    assert before_rows == sorted(
        (r.id, r.p, r.x, r.y) for r in mt.read(spark, path).collect()
    )
    # clusteredness: per-file Morton ranges of the rewritten partition
    # don't overlap (each file reads a contiguous z-range)
    ranges = []
    for f in hot_after:
        zs = (
            spark.read.parquet(f)
            .select(zorder_key([F.col("x"), F.col("y")]).alias("z"))
            .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
            .first()
        )
        ranges.append((zs.lo, zs.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges
    # no staging/backup leftovers
    assert _glob.glob(f"{path}__compact*") == []


def test_generate_symlink_manifest_duckdb_readable(spark, tmp_path):
    """GENERATE symlink_format_manifest: the listed files, read by an
    EXTERNAL engine (DuckDB raw parquet scan), equal the table."""
    import duckdb

    path = str(tmp_path / "t")
    _make(spark, path)
    manifests = DeltaTable.forPath(spark, path).generate(
        "symlink_format_manifest"
    )
    assert len(manifests) == 1 and manifests[0].endswith("manifest")
    files = open(manifests[0]).read().splitlines()
    assert files and all(f.endswith(".parquet") for f in files)
    ext = duckdb.sql(
        f"SELECT id, name, v FROM read_parquet({files!r}) ORDER BY id"
    ).fetchall()
    ours = sorted(
        (r.id, r.name, r.v) for r in mt.read(spark, path).collect()
    )
    assert [tuple(r) for r in ext] == ours


def test_generate_symlink_manifest_partitioned_and_dv_refusal(spark, tmp_path):
    import duckdb

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2"), (3, "c", "p2")],
        ["id", "v", "part"],
    )
    mt.commit_overwrite(df, path, keys=("id",), partition_by=("part",))
    manifests = DeltaTable.forPath(spark, path).generate(
        "symlink_format_manifest"
    )
    assert len(manifests) == 2  # one per partition dir
    all_files = [
        f for m in manifests for f in open(m).read().splitlines()
    ]
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet({all_files!r})"
    ).fetchone()[0]
    assert n == 3
    # DV-active tables refuse: the external scan would resurrect rows
    mt.delete_where(spark, path, "id = 1", deletion_vectors=True)
    with pytest.raises(ValueError, match="deletion vector"):
        DeltaTable.forPath(spark, path).generate("symlink_format_manifest")
    with pytest.raises(ValueError, match="unsupported mode"):
        DeltaTable.forPath(spark, path).generate("nope")


def test_optimize_where_zorder_multi_file_ranges(spark, tmp_path):
    """Same, but forcing MULTIPLE output files per partition (tiny
    target_file_bytes) so the non-overlap assertion has teeth."""
    import glob as _glob

    from aws_callcenter_delta_lakehouse_spark.operators.layout import (
        zorder_key,
    )
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
        optimize_zorder_partitions,
    )

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 4000)
        .withColumn("p", (F.col("id") % 2).cast("int"))
        .withColumn("x", (F.col("id") * 7919) % 1024)
        .withColumn("y", (F.col("id") * 104729) % 1024)
    )
    mt.commit_overwrite(
        df.repartition(6), path, keys=("id",), partition_by=("p",)
    )
    n_before = mt.read(spark, path).count()
    optimize_zorder_partitions(
        spark, path, ["x", "y"], where="p = 0", target_file_bytes=8_000
    )
    hot = sorted(_glob.glob(os.path.join(path, "p=0", "*.parquet")))
    assert len(hot) >= 3, hot  # genuinely multi-file
    ranges = []
    for f in hot:
        zs = (
            spark.read.parquet(f)
            .select(zorder_key([F.col("x"), F.col("y")]).alias("z"))
            .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
            .first()
        )
        ranges.append((zs.lo, zs.hi))
    ranges.sort()
    for (_lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges
    assert mt.read(spark, path).count() == n_before


def test_cluster_by_liquid_maintenance(spark, tmp_path):
    """DeltaTableBuilder.clusterBy (r9, delta-spark 3.x liquid
    clustering): the created table self-maintains a MULTI-column
    layout — a scattering rewrite is auto-followed by a Morton
    re-cluster on both declared columns; partitionedBy+clusterBy
    refuses (Delta's rule)."""
    from aws_callcenter_delta_lakehouse_spark.sources.layout import (
        write_stats_manifest,
    )
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
        clustering_depth,
    )

    path = str(tmp_path / "t")
    (
        DeltaTable.create(spark)
        .location(path)
        .addColumn("k", "bigint")
        .addColumn("j", "bigint")
        .addColumn("v", "bigint")
        .clusterBy("k", "j")
        .primaryKeys("k")
        .execute()
    )
    assert mt.table_properties(path)["autoOptimize"]["columns"] == ["k", "j"]

    base = spark.range(0, 8000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7919) % 8000).alias("j"),
        (F.col("id") * 2).alias("v"),
    )
    # first data commit: clustered well by construction, manifest fresh
    from aws_callcenter_delta_lakehouse_spark.operators.layout import (
        zorder_layout,
    )

    mt.commit_overwrite(zorder_layout(base, ["k", "j"], 8), path)
    write_stats_manifest(path, ["k", "j"])
    assert clustering_depth(path, "k")["avg_depth"] <= 2.0

    # a round-robin rewrite scatters BOTH columns; the property's
    # trigger re-clusters automatically in a follow-up commit
    mt.commit_overwrite(mt.read(spark, path).repartition(6), path)
    assert clustering_depth(path, "k")["avg_depth"] <= 2.0
    assert clustering_depth(path, "j")["avg_depth"] <= 4.0  # interleaved key
    assert mt.read(spark, path).count() == 8000

    with pytest.raises(ValueError, match="mutually exclusive"):
        (
            DeltaTable.create(spark)
            .location(str(tmp_path / "t2"))
            .addColumn("k", "bigint")
            .partitionedBy("k")
            .clusterBy("k")
            .execute()
        )


# -- cross-session raw-view invalidation (canary guard) ----------------------


def _canary_view_child(registry: str, barrier, out):
    """Child JVM: register a raw SQL view, query it, wait for the
    parent's DV commit, query again — the second query must fail on
    the deleted canary guard."""
    from pyspark.sql import SparkSession

    from aws_callcenter_delta_lakehouse_spark.sources.delta_api import (
        register_sql_view,
    )

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("canary-child")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        quoted = register_sql_view(spark, "xdb.t", registry_dir=registry)
        n = spark.sql(f"SELECT count(*) AS c FROM {quoted}").first()["c"]
        out.put(("first", int(n)))
        barrier.wait(timeout=300)  # parent commits DV delete, then joins
        try:
            n2 = spark.sql(f"SELECT count(*) AS c FROM {quoted}").first()["c"]
            out.put(("served", int(n2)))  # silent wrong rows — the bug
        except Exception as e:
            out.put(("invalidated", "sql_view_canary" in str(e)))
    except Exception as e:  # pragma: no cover - diagnostics
        out.put(("error", repr(e)))
    finally:
        spark.stop()


@pytest.mark.slow
def test_view_canary_invalidates_other_process_sessions(spark, tmp_path):
    """Cross-SESSION view invalidation (closes the documented r10
    hazard): a raw SQL view registered by a DIFFERENT process's
    SparkSession — whose catalog this session can never reach — fails
    its next query after this session's DV-enabling commit, because
    the view's scalar-subquery guard reads a sibling canary parquet
    that the commit deletes. No silent soft-deleted-row service."""
    import multiprocessing as mp

    from aws_callcenter_delta_lakehouse_spark.sources import (
        txn_catalog as tc,
    )

    registry = str(tmp_path / "registry")
    path = str(tmp_path / "t")
    _make(spark, path)
    tc.register_table_name(registry, "xdb.t", path)

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    out = ctx.Queue()
    child = ctx.Process(
        target=_canary_view_child, args=(registry, barrier, out)
    )
    child.start()
    try:
        kind, val = out.get(timeout=300)
        assert (kind, val) == ("first", 3), (kind, val)
        with pytest.warns(UserWarning, match="deletion vectors"):
            mt.delete_where(spark, path, "id = 1", deletion_vectors=True)
        import os

        assert not os.path.isdir(path + "__sql_view_canary")
        barrier.wait(timeout=300)
        kind, val = out.get(timeout=300)
        assert kind == "invalidated", (kind, val)
        assert val is True  # the error names the canary
    finally:
        child.join(timeout=300)


def test_view_canary_same_session_and_ddl_invalidation(spark, tmp_path):
    """Same-session invalidation still works via the sentinel DROP, and
    the column-mapping DDLs (rename/drop/add column) now invalidate
    views too — each deletes the canary and drops recorded views."""
    import os

    from aws_callcenter_delta_lakehouse_spark.sources import (
        txn_catalog as tc,
    )
    from aws_callcenter_delta_lakehouse_spark.sources.delta_api import (
        register_sql_view,
    )

    registry = str(tmp_path / "registry")
    path = str(tmp_path / "t")
    _make(spark, path)
    tc.register_table_name(registry, "ddldb.t", path)
    quoted = register_sql_view(spark, "ddldb.t", registry_dir=registry)
    assert os.path.isdir(path + "__sql_view_canary")
    assert spark.sql(f"SELECT count(*) AS c FROM {quoted}").first()["c"] == 3

    with pytest.warns(UserWarning, match="RENAME COLUMN"):
        mt.rename_column(spark, path, "name", "label")
    assert not spark.catalog.tableExists(quoted.replace("`", ""))
    assert not os.path.isdir(path + "__sql_view_canary")

    # reads by the engine still serve the renamed schema fine
    assert "label" in mt.read(spark, path).columns


def test_builder_refuses_view_bound_name(spark, tmp_path):
    """A name bound to a logical VIEW refuses table creation UPFRONT
    (round 13): resolve_table_name raises the same error for 'unbound'
    and 'bound to a view', and treating the view as unbound committed a
    whole empty-table snapshot before failing at the name binding."""
    import os

    from aws_callcenter_delta_lakehouse_spark.sources import txn_catalog as tc

    registry = str(tmp_path / "registry")
    tc.register_view_name(registry, "db.v", "SELECT 1 AS one")
    spark.conf.set("spark.managedTable.nameRegistry", registry)
    try:
        for mode in ("create", "createIfNotExists", "createOrReplace"):
            with pytest.raises(ValueError, match="registered VIEW"):
                (
                    getattr(DeltaTable, mode)(spark)
                    .tableName("db.v")
                    .addColumn("id", "bigint")
                    .execute()
                )
        # no orphaned snapshot at the managed placement, binding intact
        assert not os.path.isdir(os.path.join(registry, "tables", "db.v"))
        assert tc.list_view_names(registry) == {"db.v": "SELECT 1 AS one"}
    finally:
        spark.conf.unset("spark.managedTable.nameRegistry")
