"""SCD2 operator tests: close/carry/open semantics and idempotency."""

from __future__ import annotations

import datetime as dt

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
