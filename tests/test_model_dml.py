"""Model-based testing of the managed-table DML surface: a random
sequence of merge/delete/update ops runs against both the real table
and a plain Python dict model; after every op the table must equal the
model exactly, the version must equal the commit count, and history
retention must stay bounded.

This is the differential-testing idea the oracle suite applies to
queries, applied to the WRITE path — where a wrong result is silent
corruption rather than a failed diff.
"""

from __future__ import annotations

import pytest

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt

_KEYS = st.integers(0, 9)
_VALS = st.sampled_from(["a", "b", "c", "d"])

_MERGE = st.dictionaries(_KEYS, _VALS, min_size=1, max_size=4).map(
    lambda d: ("merge", sorted(d.items()))
)
_DELETE = st.integers(0, 9).map(lambda t: ("delete", t))
_UPDATE = st.tuples(st.integers(0, 2), _VALS).map(lambda p: ("update", p))

_OPS = st.lists(st.one_of(_MERGE, _DELETE, _UPDATE), min_size=1, max_size=5)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # redundancy-class battery: covered by faster siblings in the default run
@given(ops=_OPS)
def test_dml_sequence_matches_dict_model(spark, ops):
    tmp = tempfile.mkdtemp(prefix="mt_model_")
    path = tmp + "/t"
    model: dict[int, str] = {}
    commits = 0
    try:
        for op, arg in ops:
            if op == "merge":
                src = spark.createDataFrame(arg, "id long, v string")
                if mt.is_table(spark, path):
                    mt.merge_upsert(spark, path, src, keys=("id",))
                else:
                    mt.initial_write(src, path, keys=("id",))
                model.update(arg)
                commits += 1
            elif not mt.is_table(spark, path):
                continue  # delete/update on a nonexistent table: skip
            elif op == "delete":
                mt.delete_where(spark, path, f"id >= {arg}")
                model = {k: v for k, v in model.items() if k < arg}
                commits += 1
            else:
                m, newv = arg
                mt.update_where(
                    spark, path, f"id % 3 = {m}", {"v": F.lit(newv)}
                )
                model = {
                    k: (newv if k % 3 == m else v) for k, v in model.items()
                }
                commits += 1

            got = {(r.id, r.v) for r in mt.read(spark, path).collect()}
            assert got == set(model.items()), (op, arg)
            assert mt.table_version(path) == commits - 1
        # retention: live + retained history only, bounded by default
        # max_history=2 (initial_write keeps none)
        assert len(mt.list_versions(path)) <= 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SCD_BATCH = st.dictionaries(_KEYS, _VALS, min_size=1, max_size=4).map(
    lambda d: sorted(d.items())
)
_SCD_SEQ = st.lists(_SCD_BATCH, min_size=1, max_size=5)


def _scd2_model_apply(model, batch, date):
    """Dict model of SCD2: model[key] = list of [seg, from, to, current]."""
    for k, v in batch:
        hist = model.setdefault(k, [])
        cur = next((r for r in hist if r[3]), None)
        if cur is None:
            hist.append([v, date, "9999-12-31", True])
        elif cur[0] != v:
            cur[2] = date
            cur[3] = False
            hist.append([v, date, "9999-12-31", True])
        # unchanged attr: no new version


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # redundancy-class battery: covered by faster siblings in the default run
@given(batches=_SCD_SEQ)
def test_scd2_sequence_matches_dict_model(spark, batches):
    """Model-based SCD2: every random batch sequence must produce
    exactly the history the dict model predicts — one open row per
    live key, closed rows chained on change dates, unchanged updates
    producing NO new version."""
    import datetime as dt

    from aws_callcenter_delta_lakehouse_spark.operators.scd2 import (
        scd2_apply,
        scd2_init,
    )

    model: dict[int, list] = {}
    hist_df = None
    for i, batch in enumerate(batches):
        date = dt.date(2024, 1, 1) + dt.timedelta(days=i)
        src = spark.createDataFrame(batch, "id long, seg string")
        if hist_df is None:
            hist_df = scd2_init(src, date)
        else:
            hist_df = scd2_apply(hist_df, src, ["id"], date)
        hist_df = hist_df.localCheckpoint(eager=True)
        _scd2_model_apply(model, batch, str(date))

    got = {
        (r.id, r.seg, str(r.effective_from), str(r.effective_to), r.is_current)
        for r in hist_df.collect()
    }
    want = {
        (k, seg, f, t, cur)
        for k, rows in model.items()
        for seg, f, t, cur in map(tuple, rows)
    }
    assert got == want


_DELETE_DV = st.tuples(st.integers(0, 9), st.booleans()).map(
    lambda t: ("delete", t)
)
_UPDATE_DV = st.tuples(st.integers(0, 2), _VALS, st.booleans()).map(
    lambda p: ("update", p)
)
_MATERIALIZE = st.just(("materialize", None))

_OPS_DV = st.lists(
    st.one_of(_MERGE, _DELETE_DV, _UPDATE_DV, _MATERIALIZE),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS_DV)
def test_dv_cdf_sequence_matches_model_and_feed_replays(spark, ops):
    """The DV/CDF surface under the same differential model: random
    merge / delete / update sequences where each delete/update flips a
    coin for deletion-vector mode, interleaved with REORG materialize.
    After every commit (a) the table equals the dict model, and (b)
    replaying that commit's change feed onto the PREVIOUS model state
    reproduces the new state — the CDC contract checked for every
    random interleaving, not just the handcrafted cases."""
    from aws_callcenter_delta_lakehouse_spark.sources import maintenance

    tmp = tempfile.mkdtemp(prefix="mt_dvmodel_")
    path = tmp + "/t"
    model: dict[int, str] = {}
    commits = 0
    try:
        for op, arg in ops:
            prev = dict(model)
            if op == "merge":
                src = spark.createDataFrame(arg, "id long, v string")
                if mt.is_table(spark, path):
                    mt.merge_upsert(spark, path, src, keys=("id",))
                else:
                    mt.commit_overwrite(
                        src, path, keys=("id",),
                        properties={"enableChangeDataFeed": True},
                    )
                model.update(arg)
                commits += 1
            elif not mt.is_table(spark, path):
                continue
            elif op == "materialize":
                maintenance.materialize_deletes(spark, path)
                got = {(r.id, r.v) for r in mt.read(spark, path).collect()}
                assert got == set(model.items())
                assert not mt._read_marker(path).get("dv")
                continue
            elif op == "delete":
                thr, dv = arg
                mt.delete_where(
                    spark, path, f"id >= {thr}", deletion_vectors=dv
                )
                model = {k: v for k, v in model.items() if k < thr}
                commits += 1
            else:
                m, newv, dv = arg
                mt.update_where(
                    spark, path, f"id % 3 = {m}", {"v": F.lit(newv)},
                    deletion_vectors=dv,
                )
                model = {
                    k: (newv if k % 3 == m else v) for k, v in model.items()
                }
                commits += 1

            got = {(r.id, r.v) for r in mt.read(spark, path).collect()}
            assert got == set(model.items()), (op, arg)
            # CDC contract: this commit's feed replays prev -> model
            feed = mt.table_changes(
                spark, path, commits - 2, commits - 1
            ).collect()
            replay = dict(prev)
            for r in feed:
                if r._change_type == "delete":
                    replay.pop(r.id, None)
                elif r._change_type in ("insert", "update_postimage"):
                    replay[r.id] = r.v
            assert replay == model, (op, arg, sorted(feed))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
