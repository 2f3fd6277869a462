"""Property-based fuzz of the MERGE INTO front-end (round 13, extends
the r12 rewriter fuzz to the DML side): generated MERGE statements —
random clause combinations, keyword-poisoned string literals, CASE
expressions inside SET and conditions — run through ``sql_dml.sql`` on a
fresh managed table and the resulting table state is diffed against a
pure-Python merge executor applying Delta's documented semantics
(first-true clause wins per row; source must be unique on the join key).

Every condition/action is drawn from a menu where the SQL text and a
Python lambda are authored TOGETHER, so the expectation is independent
of every parser under test."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

pytestmark = pytest.mark.slow  # menu-mirror fuzz: ratchet battery, run with -m slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_callcenter_delta_lakehouse_spark.sources import (
    managed_table as mt,
    sql_dml,
    txn_catalog,
)

# (sql, fn(t_row, s_row) -> bool) — t/s are (id, v, note) tuples
_M_CONDS = [
    (None, lambda t, s: True),
    ("s.v > 50", lambda t, s: s[1] > 50),
    ("t.v < s.v", lambda t, s: t[1] < s[1]),
    ("t.note = 'a THEN b'", lambda t, s: t[2] == "a THEN b"),
]
# (sql_action, fn(t, s) -> new row or None for delete)
_M_ACTS = [
    ("UPDATE SET v = s.v, note = s.note", lambda t, s: (t[0], s[1], s[2])),
    (
        "UPDATE SET v = CASE WHEN s.v > t.v THEN s.v ELSE t.v END",
        lambda t, s: (t[0], max(t[1], s[1]), t[2]),
    ),
    ("UPDATE SET note = 'x WHEN y'", lambda t, s: (t[0], t[1], "x WHEN y")),
    ("DELETE", lambda t, s: None),
]
_NM_CONDS = [
    (None, lambda s: True),
    ("s.v >= 30", lambda s: s[1] >= 30),
]
_NM_ACTS = [
    ("INSERT *", lambda s: s),
    (
        "INSERT (id, v, note) VALUES (s.id, s.v + 1, 'ins THEN')",
        lambda s: (s[0], s[1] + 1, "ins THEN"),
    ),
]
_BS_CLAUSES = [
    None,
    ("DELETE", None, lambda t: None),
    ("UPDATE SET v = -1", None, lambda t: (t[0], -1, t[2])),
    ("DELETE", ("t.v > 50", lambda t: t[1] > 50), lambda t: None),
]

_NOTES = ["a", "a THEN b", "WHEN MATCHED", "end"]

_row = st.tuples(
    st.integers(0, 7), st.integers(0, 100), st.sampled_from(_NOTES)
)
_rows = st.lists(_row, min_size=0, max_size=6, unique_by=lambda r: r[0])


def _py_merge(tgt, src, m_clauses, nm_clauses, bs):
    """Reference executor: Delta semantics, first-true clause per row."""
    smap = {r[0]: r for r in src}
    out = []
    for t in tgt:
        if t[0] in smap:
            s = smap[t[0]]
            for cond, act in m_clauses:
                if cond(t, s):
                    new = act(t, s)
                    if new is not None:
                        out.append(new)
                    break
            else:
                out.append(t)
        elif bs is not None:
            _, bcond, bact = bs
            if bcond is None or bcond[1](t):
                new = bact(t)
                if new is not None:
                    out.append(new)
            else:
                out.append(t)
        else:
            out.append(t)
    tids = {t[0] for t in tgt}
    for s in src:
        if s[0] not in tids:
            for cond, act in nm_clauses:
                if cond(s):
                    out.append(act(s))
                    break
    return sorted(out)


@pytest.fixture(scope="module")
def merge_env(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mergefuzz")
    registry = str(tmp / "reg")
    spark.conf.set("spark.managedTable.nameRegistry", registry)
    yield str(tmp)
    spark.conf.unset("spark.managedTable.nameRegistry")


@given(
    tgt=_rows,
    src=_rows,
    m_idx=st.lists(
        st.tuples(st.sampled_from(range(len(_M_CONDS))), st.sampled_from(range(len(_M_ACTS)))),
        min_size=0,
        max_size=2,
    ),
    nm_idx=st.lists(
        st.tuples(st.sampled_from(range(len(_NM_CONDS))), st.sampled_from(range(len(_NM_ACTS)))),
        min_size=0,
        max_size=1,
    ),
    bs_idx=st.sampled_from(range(len(_BS_CLAUSES))),
    alias_kw=st.sampled_from(["AS ", ""]),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_merge_statements_match_python_executor(
    spark, merge_env, tgt, src, m_idx, nm_idx, bs_idx, alias_kw
):
    bs = _BS_CLAUSES[bs_idx]
    if not m_idx and not nm_idx and bs is None:
        return  # MERGE requires at least one WHEN clause
    # a second MATCHED clause is only reachable when the first carries a
    # condition; dedupe unconditional-first shapes for the mirror
    m_clauses = [(_M_CONDS[c][1], _M_ACTS[a][1]) for c, a in m_idx]
    if len(m_idx) == 2 and m_idx[0][0] == 0:
        m_idx = m_idx[:1]
        m_clauses = m_clauses[:1]

    name = f"fz_{uuid.uuid4().hex[:10]}"
    path = os.path.join(merge_env, name)
    registry = os.path.join(merge_env, "reg")
    mt.commit_overwrite(
        spark.createDataFrame(tgt or [], "id INT, v INT, note STRING"),
        path,
        keys=("id",),
    )
    txn_catalog.register_table_name(registry, name, path)
    try:
        src_sql = (
            "(SELECT * FROM VALUES "
            + ", ".join(f"({i}, {v}, '{n}')" for i, v, n in src)
            + " AS x(id, v, note)) AS s"
            if src
            else "(SELECT CAST(NULL AS INT) id, CAST(NULL AS INT) v, "
            "CAST(NULL AS STRING) note WHERE 1 = 0) AS s"
        )
        whens = []
        for c, a in m_idx:
            cond_sql = _M_CONDS[c][0]
            whens.append(
                "WHEN MATCHED"
                + (f" AND {cond_sql}" if cond_sql else "")
                + f" THEN {_M_ACTS[a][0]}"
            )
        for c, a in nm_idx:
            cond_sql = _NM_CONDS[c][0]
            whens.append(
                "WHEN NOT MATCHED"
                + (f" AND {cond_sql}" if cond_sql else "")
                + f" THEN {_NM_ACTS[a][0]}"
            )
        if bs is not None:
            act_sql, bcond, _ = bs
            whens.append(
                "WHEN NOT MATCHED BY SOURCE"
                + (f" AND {bcond[0]}" if bcond else "")
                + f" THEN {act_sql}"
            )
        stmt = (
            f"MERGE INTO {name} {alias_kw}t USING {src_sql} "
            f"ON t.id = s.id " + " ".join(whens)
        )
        sql_dml.sql(spark, stmt)
        got = sorted(
            (r.id, r.v, r.note) for r in mt.read(spark, path).collect()
        )
        want = _py_merge(
            sorted(tgt),
            sorted(src),
            m_clauses,
            [(_NM_CONDS[c][1], _NM_ACTS[a][1]) for c, a in nm_idx],
            bs,
        )
        assert got == want, stmt
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(f"{path}__history", ignore_errors=True)


# --- UPDATE / DELETE fuzz (same menu-mirror scheme) ---------------------------

# (sql_set, fn(row) -> row)
_SETS = [
    ("v = v + 1", lambda r: (r[0], r[1] + 1, r[2])),
    ("note = 'a THEN b', v = 0", lambda r: (r[0], 0, "a THEN b")),
    (
        "v = CASE WHEN v > 50 THEN 1 ELSE 0 END",
        lambda r: (r[0], 1 if r[1] > 50 else 0, r[2]),
    ),
    ("note = upper(note)", lambda r: (r[0], r[1], r[2].upper())),
]
# (sql_where, fn(row) -> bool)
_WHERES = [
    (None, lambda r: True),
    ("v > 50", lambda r: r[1] > 50),
    ("note = 'a THEN b'", lambda r: r[2] == "a THEN b"),
    ("id IN (1, 2, 3)", lambda r: r[0] in (1, 2, 3)),
    ("v > 20 AND note <> 'WHEN MATCHED'", lambda r: r[1] > 20 and r[2] != "WHEN MATCHED"),
]


@given(
    rows=_rows,
    set_i=st.sampled_from(range(len(_SETS))),
    where_i=st.sampled_from(range(len(_WHERES))),
    verb=st.sampled_from(["update", "delete"]),
    alias=st.sampled_from(["", " t", " AS t"]),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_update_delete_statements_match_python(
    spark, merge_env, rows, set_i, where_i, verb, alias
):
    set_sql, set_fn = _SETS[set_i]
    where_sql, where_fn = _WHERES[where_i]
    name = f"ud_{uuid.uuid4().hex[:10]}"
    path = os.path.join(merge_env, name)
    registry = os.path.join(merge_env, "reg")
    mt.commit_overwrite(
        spark.createDataFrame(rows or [], "id INT, v INT, note STRING"),
        path,
        keys=("id",),
    )
    txn_catalog.register_table_name(registry, name, path)
    try:
        if verb == "update":
            stmt = f"UPDATE {name}{alias} SET {set_sql}"
            want = sorted(
                set_fn(r) if where_fn(r) else r for r in rows
            )
        else:
            stmt = f"DELETE FROM {name}{alias}"
            want = sorted(r for r in rows if not where_fn(r))
        if where_sql:
            stmt += f" WHERE {where_sql}"
        else:
            want = sorted(set_fn(r) for r in rows) if verb == "update" else []
        sql_dml.sql(spark, stmt)
        got = sorted(
            (r.id, r.v, r.note) for r in mt.read(spark, path).collect()
        )
        assert got == want, stmt
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(f"{path}__history", ignore_errors=True)


# --- INSERT INTO / OVERWRITE fuzz (same menu-mirror scheme) -------------------

# spellings of the column list + the tuple positions they draw from
_INS_COLS = [
    (None, ("id", "v", "note")),
    ("(id, v, note)", ("id", "v", "note")),
    ("(id, note, v)", ("id", "note", "v")),
    ("(id, v)", ("id", "v")),
    ("(id)", ("id",)),
]
_POS = {"id": 0, "v": 1, "note": 2}


def _lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def _ins_row(cols, r):
    """Full (id, v, note) row from the named-column subset of ``r`` —
    omitted columns are NULL (the ANSI INSERT contract)."""
    full = {"id": None, "v": None, "note": None}
    for c in cols:
        full[c] = r[_POS[c]]
    return (full["id"], full["v"], full["note"])


_ins_notes = st.sampled_from(["a", "a THEN b", "WHEN MATCHED", "it's, fine"])
_ins_row_st = st.tuples(
    st.integers(0, 7), st.integers(0, 100), _ins_notes
)
_ins_rows = st.lists(_ins_row_st, min_size=1, max_size=5)


@given(
    tgt=_rows,
    src=_ins_rows,
    cols_i=st.sampled_from(range(len(_INS_COLS))),
    verb=st.sampled_from(["INTO", "OVERWRITE", "OVERWRITE TABLE"]),
    kind=st.sampled_from(["values", "select_values", "with_cte", "select_self"]),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_insert_statements_match_python(
    spark, merge_env, tgt, src, cols_i, verb, kind
):
    col_sql, cols = _INS_COLS[cols_i]
    if kind == "select_self":
        col_sql, cols = None, ("id", "v", "note")
    name = f"ins_{uuid.uuid4().hex[:10]}"
    path = os.path.join(merge_env, name)
    registry = os.path.join(merge_env, "reg")
    mt.commit_overwrite(
        spark.createDataFrame(tgt or [], "id INT, v INT, note STRING"),
        path,
        keys=("id",),
    )
    txn_catalog.register_table_name(registry, name, path)
    try:
        tuples_sql = ", ".join(
            "(" + ", ".join(_lit(r[_POS[c]]) for c in cols) + ")" for r in src
        )
        if kind == "values":
            source_sql = f"VALUES {tuples_sql}"
        elif kind == "select_values":
            source_sql = (
                f"SELECT * FROM (VALUES {tuples_sql}) "
                f"AS x({', '.join(cols)})"
            )
        elif kind == "with_cte":
            source_sql = (
                f"WITH feed AS (SELECT * FROM (VALUES {tuples_sql}) "
                f"AS x({', '.join(cols)})) SELECT * FROM feed"
            )
        else:  # select_self: source is the TARGET's own pre-state
            source_sql = f"SELECT id + 100 AS id, v, note FROM {name}"
        stmt = (
            f"INSERT {verb} {name}"
            + (f" {col_sql}" if col_sql else "")
            + f" {source_sql}"
        )
        if kind == "select_self":
            inserted = [(i + 100, v, n) for i, v, n in tgt]
        else:
            inserted = [_ins_row(cols, r) for r in src]
        want = inserted if verb.startswith("OVERWRITE") else list(tgt) + inserted
        sql_dml.sql(spark, stmt)
        got = [(r.id, r.v, r.note) for r in mt.read(spark, path).collect()]
        assert sorted(got, key=repr) == sorted(want, key=repr), stmt
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(f"{path}__history", ignore_errors=True)
