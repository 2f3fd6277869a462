"""SCD2 operator tests: close/carry/open semantics and idempotency."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.operators.scd2 import (
    OPEN_END,
    scd2_apply,
    scd2_init,
)

D0, D1, D2 = dt.date(2026, 1, 1), dt.date(2026, 2, 1), dt.date(2026, 3, 1)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "agent_id long, team string, grade string")


def test_scd2_close_carry_open(spark):
    hist = scd2_init(
        _snap(spark, [(1, "alpha", "A"), (2, "beta", "B"), (3, "gamma", "C")]), D0
    )
    updates = _snap(
        spark,
        [
            (1, "alpha", "A"),   # identical -> no new version
            (2, "beta", "A"),    # changed  -> close old, open new
            (4, "delta", "D"),   # new key  -> open
        ],
    )
    out = scd2_apply(hist, updates, ["agent_id"], D1)
    rows = {(r.agent_id, r.effective_from): r for r in out.collect()}

    assert len(rows) == 5  # 3 originals + 1 closed-replacement + 1 new
    assert rows[(1, D0)].is_current and rows[(1, D0)].effective_to == OPEN_END
    assert not rows[(2, D0)].is_current and rows[(2, D0)].effective_to == D1
    assert rows[(2, D1)].is_current and rows[(2, D1)].grade == "A"
    assert rows[(3, D0)].is_current
    assert rows[(4, D1)].is_current and rows[(4, D1)].team == "delta"


def test_scd2_identical_batch_is_noop_and_history_accumulates(spark):
    hist = scd2_init(_snap(spark, [(1, "alpha", "A")]), D0)
    hist = scd2_apply(hist, _snap(spark, [(1, "alpha", "B")]), ["agent_id"], D1)
    # same batch again: identical to current -> nothing changes
    again = scd2_apply(hist, _snap(spark, [(1, "alpha", "B")]), ["agent_id"], D2)
    assert again.count() == hist.count() == 2
    # a third change adds one more version, preserving the closed chain
    final = scd2_apply(again, _snap(spark, [(1, "omega", "B")]), ["agent_id"], D2)
    chain = sorted(
        (r.effective_from, r.effective_to, r.is_current) for r in final.collect()
    )
    assert chain == [(D0, D1, False), (D1, D2, False), (D2, OPEN_END, True)]


# ------------------------------------------------- scd2_from_changes (CDC)

def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, _change_type string, seq long"
    )


def test_scd2_from_changes_chains_versions_in_one_feed(spark):
    from aws_callcenter_delta_lakehouse_spark.operators.scd2 import (
        scd2_from_changes,
    )

    feed = _feed(spark, [
        (1, "v1", "insert", 10),
        (1, "v2", "update_postimage", 20),
        (1, "v2x", "update_preimage", 20),   # ignored
        (1, None, "delete", 30),
        (2, "w1", "insert", 15),
    ])
    hist = scd2_from_changes(None, feed, keys=["id"], sequence_col="seq")
    rows = {
        (r["id"], r["name"]): (r["__start_at"], r["__end_at"])
        for r in hist.collect()
    }
    assert rows == {
        (1, "v1"): (10, 20),
        (1, "v2"): (20, 30),   # closed by the delete
        (2, "w1"): (15, None), # still current
    }


def test_scd2_from_changes_incremental_matches_single_shot(spark):
    """Chunked application == one-shot application (same feed)."""
    from aws_callcenter_delta_lakehouse_spark.operators.scd2 import (
        scd2_from_changes,
    )

    all_rows = [
        (1, "v1", "insert", 10),
        (2, "w1", "insert", 10),
        (1, "v2", "update_postimage", 20),
        (3, "x1", "insert", 25),
        (2, None, "delete", 30),
    ]
    one_shot = scd2_from_changes(
        None, _feed(spark, all_rows), keys=["id"], sequence_col="seq"
    )
    h = scd2_from_changes(
        None, _feed(spark, all_rows[:2]), keys=["id"], sequence_col="seq"
    ).localCheckpoint()
    h = scd2_from_changes(
        h, _feed(spark, all_rows[2:]), keys=["id"], sequence_col="seq"
    )
    a = sorted(map(tuple, one_shot.collect()))
    b = sorted(map(tuple, h.select(one_shot.columns).collect()))
    assert a == b
    # current rows: id=1 v2 open, id=3 open; id=2 deleted
    cur = {r.id: r.name for r in h.filter(F.col("__end_at").isNull()).collect()}
    assert cur == {1: "v2", 3: "x1"}


def test_scd2_from_changes_rejects_backfill(spark):
    from aws_callcenter_delta_lakehouse_spark.operators.scd2 import (
        scd2_from_changes,
    )

    h = scd2_from_changes(
        None, _feed(spark, [(1, "v1", "insert", 10)]),
        keys=["id"], sequence_col="seq",
    ).localCheckpoint()
    with pytest.raises(ValueError, match="nondecreasing"):
        scd2_from_changes(
            h, _feed(spark, [(1, "v0", "update_postimage", 5)]),
            keys=["id"], sequence_col="seq",
        )
