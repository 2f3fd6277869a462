"""Golden end-to-end medallion pipeline tests with a pinned
processing_date — covers reference quirks Q1-Q7 (SURVEY.md §2.10)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.pipeline.gold_job import gold_job
from aws_callcenter_delta_lakehouse_spark.pipeline.silver import silver_job
from aws_callcenter_delta_lakehouse_spark.sources import managed_table
from tests.fixtures import make_call_center_csv, make_reprocess_csv

PDATE = dt.date(2026, 8, 13)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    """Run silver+gold once on the fixture; share outputs across tests."""
    root = tmp_path_factory.mktemp("medallion")
    csv1 = str(root / "call_center_raw.csv")
    meta = make_call_center_csv(csv1)
    paths = {
        "csv1": csv1,
        "csv2": str(root / "call_center_raw_v2.csv"),
        "silver": str(root / "silver"),
        "exception": str(root / "exception"),
        "gold": str(root / "gold"),
    }
    stats = silver_job(spark, csv1, paths["silver"], paths["exception"],
                       processing_date=PDATE, run_id="r1")
    actions = gold_job(spark, paths["silver"], paths["gold"], processing_date=PDATE)
    return {"meta": meta, "paths": paths, "stats": stats, "actions": actions}


def test_silver_counts_and_initial_load(pipeline):
    assert pipeline["stats"]["action"] == "initial"
    assert pipeline["stats"]["valid"] == pipeline["meta"]["n_valid"]
    assert pipeline["stats"]["invalid"] == pipeline["meta"]["n_invalid"]


def test_silver_schema_and_partitions(spark, pipeline):
    silver = managed_table.read(spark, pipeline["paths"]["silver"])
    assert set(silver.columns) == {
        "call_id", "caller_id", "agent_id", "call_start_time",
        "call_end_time", "call_status", "year", "month",
    }
    ym = silver.select("year", "month").distinct().collect()
    assert [(r.year, r.month) for r in ym] == [(2026, 8)]


def test_exception_reasons(spark, pipeline):
    """Q1/Q2: exact Reject_reason strings, incl. negative-id numeric
    rejection and multi-error ' | ' fold."""
    exc = spark.read.parquet(pipeline["paths"]["exception"])
    got = {str(r.call_id): r.Reject_reason for r in exc.collect() if r.call_id is not None}
    for call_id, reason in pipeline["meta"]["expected_reasons"].items():
        assert got[call_id] == reason, f"call_id={call_id}"
    # NULL-id rows: reason starts with the null message
    null_rows = [r for r in exc.collect() if r.call_id is None]
    assert all(r.Reject_reason.startswith("call_id must not be NULL") for r in null_rows)
    assert len(null_rows) == 3  # blank, 'ABC12' (NULL under INT schema), multi-error


def test_gold_daily_summary_quirks(spark, pipeline):
    """Q3 (case-sensitive counting) + Q5 (one processing-date group)."""
    gold = managed_table.read(
        spark, pipeline["paths"]["gold"] + "/gold_call_daily_summary"
    ).collect()
    assert len(gold) == 1
    row = gold[0]
    assert row.call_date == PDATE
    assert row.total_calls == pipeline["meta"]["n_valid"]
    # 'Completed' (mixed case) + '25:61:99' row are in total but only the
    # 25:61:99 row (status COMPLETED) is in completed_calls.
    assert row.completed_calls + row.dropped_calls + row.failed_calls == row.total_calls - 1
    expected_rate = round(row.completed_calls / row.total_calls * 100, 2)
    assert abs(row.completion_rate - expected_rate) < 1e-9


def test_gold_duration_drops_midnight_and_unparseable(spark, pipeline):
    """Q4: midnight-crossing (negative duration) and unparseable
    25:61:99 rows are excluded from duration metrics only."""
    dur = managed_table.read(
        spark, pipeline["paths"]["gold"] + "/gold_call_duration_metrics"
    ).collect()
    assert len(dur) == 1
    assert dur[0].min_call_duration_seconds >= 0
    assert dur[0].max_call_duration_seconds <= 3600
    assert set(dur[0].asDict()) == {
        "call_date", "avg_call_duration_seconds", "min_call_duration_seconds",
        "max_call_duration_seconds", "year", "month",
    }


def test_agent_grain(spark, pipeline):
    agent = managed_table.read(
        spark, pipeline["paths"]["gold"] + "/gold_agent_performance"
    )
    total = agent.agg(F.sum("total_calls")).collect()[0][0]
    assert total == pipeline["meta"]["n_valid"]
    assert agent.count() == agent.select("agent_id", "call_date").distinct().count()


def test_rerun_idempotent_silver_duplicating_exceptions(spark, pipeline):
    """Q6: re-running the same file leaves Silver unchanged (MERGE) but
    appends duplicate exception rows (append-only audit)."""
    p = pipeline["paths"]
    before = managed_table.read(spark, p["silver"]).count()
    exc_before = spark.read.parquet(p["exception"]).count()

    stats2 = silver_job(spark, p["csv1"], p["silver"], p["exception"],
                        processing_date=PDATE, run_id="r2")
    assert stats2["action"] == "merged"
    assert managed_table.read(spark, p["silver"]).count() == before
    assert spark.read.parquet(p["exception"]).count() == exc_before * 2


def test_reprocess_merge_updates_and_inserts(spark, pipeline):
    """Q6/MERGE: v2 file updates 20 overlapping call_ids (status ->
    DROPPED) and inserts 10 new ones."""
    p = pipeline["paths"]
    meta2 = make_reprocess_csv(p["csv2"])
    before = managed_table.read(spark, p["silver"]).count()

    silver_job(spark, p["csv2"], p["silver"], p["exception"],
               processing_date=PDATE, run_id="r3")
    silver = managed_table.read(spark, p["silver"])
    assert silver.count() == before + meta2["n_inserts"]
    updated = silver.filter(F.col("call_id") <= meta2["n_updates"])
    assert updated.count() == meta2["n_updates"]
    assert updated.filter(F.col("call_status") == "DROPPED").count() == meta2["n_updates"]
    # key uniqueness preserved after merge
    assert silver.select("call_id").distinct().count() == silver.count()


def test_gold_rerun_merges_single_date(spark, pipeline):
    """Q5: gold re-run after reprocess re-merges onto the same
    processing date — still one row per grain."""
    p = pipeline["paths"]
    actions = gold_job(spark, p["silver"], p["gold"], processing_date=PDATE)
    assert actions["gold_call_daily_summary"] == "merged"
    daily = managed_table.read(spark, p["gold"] + "/gold_call_daily_summary")
    assert daily.count() == 1
    # total now includes the 10 inserted rows
    assert daily.collect()[0].total_calls == pipeline["meta"]["n_valid"] + 10


def test_compact_and_vacuum(spark, pipeline, tmp_path):
    """Maintenance ops (reference future-work: README.md:186): compaction
    reduces exception-sink file count without changing row count; vacuum
    clears leftover staging dirs."""
    import os
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import (
        compact, table_file_stats, vacuum,
    )
    exc = pipeline["paths"]["exception"]
    before_rows = spark.read.parquet(exc).count()
    before = table_file_stats(exc)
    stats = compact(spark, exc, partition_by=("year", "month"), target_file_bytes=10**9)
    assert stats["after"]["n_files"] <= before["n_files"]
    assert spark.read.parquet(exc).count() == before_rows

    leftover = exc + "__staging_zombie"
    os.makedirs(leftover, exist_ok=True)
    assert leftover in vacuum(exc)
    assert not os.path.exists(leftover)


def test_compact_where_is_partition_scoped(spark, tmp_path):
    """compact(where=...) rewrites ONLY the matching partition dirs:
    total row count is preserved, non-matching partitions' files are
    untouched on disk, and where without partition_by is a loud error."""
    import glob
    import os
    import pytest as _pytest
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import compact

    path = str(tmp_path / "part_table")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(300)], "id long, bucket long, v string"
    )
    # many small files per partition
    df.repartition(8).write.partitionBy("bucket").parquet(path)
    before_rows = spark.read.parquet(path).count()

    untouched_files = sorted(glob.glob(os.path.join(path, "bucket=2", "*.parquet")))
    untouched_mtimes = [os.path.getmtime(f) for f in untouched_files]

    stats = compact(
        spark, path, partition_by=("bucket",), where="bucket < 2",
        target_file_bytes=10**9,
    )
    assert stats["after"]["n_files"] < stats["before"]["n_files"]
    # no data loss: every row of every partition still present
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.groupBy("bucket").count().count() == 3
    # bucket=2 was not rewritten: same files, same mtimes
    assert sorted(glob.glob(os.path.join(path, "bucket=2", "*.parquet"))) == untouched_files
    assert [os.path.getmtime(f) for f in untouched_files] == untouched_mtimes
    # matching partitions were compacted to one file each
    assert len(glob.glob(os.path.join(path, "bucket=0", "*.parquet"))) == 1
    # no staging/backup siblings left behind
    assert glob.glob(f"{path}__*") == []

    with _pytest.raises(ValueError, match="partition_by"):
        compact(spark, path, where="bucket = 0")


def test_compact_where_bool_and_timestamp_partitions(spark, tmp_path):
    """Partition dirs whose on-disk rendering differs from Python's
    str() — bool (true vs True) and timestamp (: is %3A-escaped) — must
    actually compact, not silently no-op: the dir lookup matches the
    filesystem's unescaped names against the Spark-rendered key."""
    import datetime
    import glob
    import os
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import compact

    path = str(tmp_path / "bt_table")
    df = spark.createDataFrame(
        [
            (
                i,
                i % 2 == 0,
                datetime.datetime(2024, 1, 1 + i % 2, 3, 30, 0),
                f"v{i}",
            )
            for i in range(200)
        ],
        "id long, flag boolean, ts timestamp, v string",
    )
    df.repartition(6).write.partitionBy("flag", "ts").parquet(path)
    before_rows = spark.read.parquet(path).count()

    stats = compact(
        spark, path, partition_by=("flag", "ts"), where="flag = true",
        target_file_bytes=10**9,
    )
    # the bool/timestamp partitions were REWRITTEN (the old Python
    # f-string dir probe missed them and returned before == after)
    assert stats["after"]["n_files"] < stats["before"]["n_files"]
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    for ts_dir in glob.glob(os.path.join(path, "flag=true", "ts=*")):
        assert len(glob.glob(os.path.join(ts_dir, "*.parquet"))) == 1
    # flag=false untouched (still multiple files)
    false_files = [
        f
        for d in glob.glob(os.path.join(path, "flag=false", "ts=*"))
        for f in glob.glob(os.path.join(d, "*.parquet"))
    ]
    assert len(false_files) > len(glob.glob(os.path.join(path, "flag=false", "ts=*")))
    # no staging/backup siblings left behind
    assert glob.glob(f"{path}__*") == []


def test_analytics_queries_over_gold(spark, pipeline):
    """The reference's five Athena queries run unchanged (minus catalog
    prefix) over our Gold tables via spark.sql."""
    from aws_callcenter_delta_lakehouse_spark.pipeline.cli import run_analytics
    results = run_analytics(spark, pipeline["paths"]["gold"])
    assert set(results) == {1, 2, 3, 4, 5}
    q1 = results[1].collect()
    assert len(q1) >= 1 and q1[0].total_calls > 0
    q5 = results[5].collect()
    assert all(r.failure_rate_pct is not None for r in q5)


def test_merge_schema_evolution(spark, tmp_path):
    """mergeSchema parity: an evolved source widens the table; without
    the flag, widening is a loud error."""
    import pytest as _pytest
    from aws_callcenter_delta_lakehouse_spark.sources.managed_table import (
        initial_write, merge_upsert, read,
    )
    path = str(tmp_path / "evolving")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    initial_write(base, path, keys=("id",))

    evolved = spark.createDataFrame(
        [(2, "b2", 9.5), (3, "c", 1.0)], "id long, v string, score double"
    )
    with _pytest.raises(ValueError, match="schema_evolution"):
        merge_upsert(spark, path, evolved, ["id"])

    merge_upsert(spark, path, evolved, ["id"], schema_evolution=True)
    got = {r.id: (r.v, r.score) for r in read(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b2", 9.5), 3: ("c", 1.0)}


def test_merge_duplicate_source_match_is_error(spark, tmp_path):
    """Documented Delta MERGE contract: > 1 source row matching the same
    target row raises (the update would be nondeterministic); duplicate
    source keys that match NO target row insert normally."""
    import pytest as _pytest
    from aws_callcenter_delta_lakehouse_spark.sources.managed_table import (
        initial_write, merge_upsert, read,
    )
    path = str(tmp_path / "t")
    initial_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        path, keys=("id",),
    )
    dup_on_match = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, v string"
    )
    with _pytest.raises(ValueError, match="MULTIPLE_SOURCE_ROW"):
        merge_upsert(spark, path, dup_on_match, ["id"])
    # table unchanged by the failed merge
    assert {r.v for r in read(spark, path).collect()} == {"a", "b"}
    # duplicate keys matching NOTHING are plain inserts (both rows)
    dup_no_match = spark.createDataFrame(
        [(9, "p"), (9, "q")], "id long, v string"
    )
    merge_upsert(spark, path, dup_no_match, ["id"])
    assert read(spark, path).filter(F.col("id") == 9).count() == 2


def test_merge_time_travel_versions(spark, tmp_path):
    """Time-travel-lite: each merge retains the replaced snapshot as
    version N-1, bounded by max_history; vacuum prunes history."""
    import pytest as _pytest
    from aws_callcenter_delta_lakehouse_spark.sources.managed_table import (
        initial_write, list_versions, merge_upsert, read, table_version,
    )
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import vacuum

    path = str(tmp_path / "t")
    initial_write(
        spark.createDataFrame([(1, "v0")], "id long, v string"), path, keys=("id",)
    )
    assert table_version(path) == 0
    merge_upsert(spark, path, spark.createDataFrame([(1, "v1")], "id long, v string"), ["id"])
    merge_upsert(spark, path, spark.createDataFrame([(1, "v2")], "id long, v string"), ["id"])
    assert table_version(path) == 2
    assert list_versions(path) == [0, 1, 2]
    assert read(spark, path).collect()[0].v == "v2"
    assert read(spark, path, version=2).collect()[0].v == "v2"  # live
    assert read(spark, path, version=1).collect()[0].v == "v1"
    assert read(spark, path, version=0).collect()[0].v == "v0"

    # bounded retention: a third merge with max_history=2 prunes v0
    merge_upsert(spark, path, spark.createDataFrame([(1, "v3")], "id long, v string"), ["id"])
    assert list_versions(path) == [1, 2, 3]
    with _pytest.raises(ValueError, match="not retained"):
        read(spark, path, version=0)

    # vacuum(retain_history=True) keeps snapshots; plain vacuum prunes
    vacuum(path, retain_history=True)
    assert read(spark, path, version=2).collect()[0].v == "v2"
    vacuum(path)
    with _pytest.raises(ValueError, match="not retained"):
        read(spark, path, version=2)
    assert read(spark, path).collect()[0].v == "v3"  # live unaffected


def test_interrupted_swap_leaves_table_readable(spark, tmp_path):
    """Crash-consistency: a leftover staging dir from an interrupted
    merge never corrupts the live table; vacuum clears it and a
    subsequent merge succeeds."""
    import os
    from aws_callcenter_delta_lakehouse_spark.sources.managed_table import (
        initial_write, merge_upsert, read,
    )
    from aws_callcenter_delta_lakehouse_spark.sources.maintenance import vacuum

    path = str(tmp_path / "t")
    initial_write(spark.createDataFrame([(1, "a")], "id long, v string"), path, keys=("id",))

    # simulate a crashed writer: stale staging next to the live table
    stale = f"{path}__staging_dead"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")

    assert read(spark, path).count() == 1  # live table unaffected
    assert stale in vacuum(path)

    merge_upsert(spark, path, spark.createDataFrame([(2, "b")], "id long, v string"), ["id"])
    assert {r.id for r in read(spark, path).collect()} == {1, 2}


def test_validate_observed_single_pass_metrics(spark):
    """df.observe folds DQ metrics into the existing action — the
    Observation must report (n_rows, n_invalid) matching the split,
    with no second scan issued by the engine code."""
    from aws_callcenter_delta_lakehouse_spark.functions.validation import (
        ColumnRule,
        not_null,
        numeric,
        split_valid_invalid,
        validate_observed,
    )

    df = spark.createDataFrame(
        [("1", "a"), ("x", "b"), ("2", None), ("4", "d")],
        "num string, name string",
    )
    rules = [
        ColumnRule("name", [not_null("name")]),
        ColumnRule("num", [numeric("num")]),
    ]
    observed, obs = validate_observed(df, rules)
    valid, invalid = split_valid_invalid(observed)
    n_valid = valid.count()
    m = obs.get
    assert m["n_rows"] == 4
    assert m["n_invalid"] == 2
    assert n_valid == 2 and invalid.count() == 2


def test_read_changes_cdc_between_versions(spark, tmp_path):
    """CDF-lite: merging a source with one update + one insert against
    v0 must yield exactly update_pre/postimage for the changed key and
    insert for the new key; an untouched key produces no change rows."""
    from aws_callcenter_delta_lakehouse_spark.sources.managed_table import (
        initial_write,
        merge_upsert,
        read_changes,
    )

    path = str(tmp_path / "cdc")
    initial_write(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
        path,
        keys=("id",),
    )
    merge_upsert(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (4, "d")], "id long, v string"),
        ["id"],
    )
    changes = {
        (r.id, r.v, r._change_type)
        for r in read_changes(spark, path, from_version=0, keys=["id"]).collect()
    }
    assert changes == {
        (2, "b", "update_preimage"),
        (2, "B", "update_postimage"),
        (4, "d", "insert"),
    }
    # keyless mode: pure bag diff
    from pyspark.sql import functions as F
    keyless = read_changes(spark, path, from_version=0)
    assert keyless.filter(F.col("_change_type") == "insert").count() == 2
    assert keyless.filter(F.col("_change_type") == "delete").count() == 1


def test_history_lists_versions(spark, tmp_path):
    """DESCRIBE HISTORY analogue: one row per retained version with
    operation tag, row count, and exactly one live version."""
    from aws_callcenter_delta_lakehouse_spark.sources.managed_table import (
        history, initial_write, merge_upsert,
    )

    path = str(tmp_path / "t")
    initial_write(
        spark.createDataFrame([(1, "v0")], "id long, v string"), path, keys=("id",)
    )
    merge_upsert(
        spark, path,
        spark.createDataFrame([(1, "v1"), (2, "x")], "id long, v string"),
        ["id"],
    )
    h = {r.version: r for r in history(spark, path).collect()}
    assert sorted(h) == [0, 1]
    assert h[0].operation == "initial" and h[1].operation == "merge"
    assert h[0].n_rows == 1 and h[1].n_rows == 2
    assert not h[0].is_live and h[1].is_live
    assert h[1].ts >= h[0].ts > 0


def test_gold_job_txn_matches_merge_gold(spark, tmp_path):
    """The transactional Gold publish produces the same three tables as
    the per-table MERGE loop, visible through the catalog in one
    version. Self-contained silver build (the module fixture's tables
    are mutated by the reprocess tests)."""
    from aws_callcenter_delta_lakehouse_spark.pipeline.gold_job import (
        gold_job_txn,
    )
    from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
    from aws_callcenter_delta_lakehouse_spark.sources import txn_catalog as tc

    csv1 = str(tmp_path / "raw.csv")
    make_call_center_csv(csv1)
    silver = str(tmp_path / "silver")
    silver_job(spark, csv1, silver, str(tmp_path / "exc"),
               processing_date=PDATE, run_id="rt")
    gold_merge = str(tmp_path / "gold_merge")
    gold_job(spark, silver, gold_merge, processing_date=PDATE)

    cat = str(tmp_path / "cat")
    groot = str(tmp_path / "gold_txn")
    v = gold_job_txn(spark, silver, groot, cat, processing_date=PDATE)
    assert v == 0
    for name in (
        "gold_call_daily_summary",
        "gold_agent_performance",
        "gold_call_duration_metrics",
    ):
        got = tc.read_table(spark, cat, name)
        want = mt.read(spark, f"{gold_merge}/{name}").drop("year", "month")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), name
