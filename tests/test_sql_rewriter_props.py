"""Property-based hardening of the passthrough-SQL rewrite layer
(sources/sql_dml.py). The round-12 backtracking bug (`FROM range(10)`
matching name='rang' past the no-function-call lookahead) is exactly
the class a grammar fuzz catches and example tests miss — these
properties pin the rewriter's contracts over generated statements:

1. masking is shape-preserving and literal-opaque;
2. statements with no resolvable names come back byte-identical
   (whatever mix of keywords/parens/quotes/commas they contain);
3. a registered name splices wherever it appears as a relation
   reference, and NEVER when it appears inside a string literal or as
   scalar-FROM function syntax;
4. splicing preserves all surrounding text.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_callcenter_delta_lakehouse_spark.sources import sql_dml


# -- pure text properties (no Spark) ------------------------------------------

# SQL-ish soup: identifiers, keywords, punctuation, string literals,
# unbalanced fragments included on purpose — the rewriter must never
# crash on malformed text (it may leave it for spark.sql to reject)
_sql_atoms = st.one_of(
    st.sampled_from(
        [
            "SELECT", "FROM", "JOIN", "WHERE", "GROUP BY", "ORDER BY",
            "UNION", "MINUS", "EXTRACT(YEAR", "TRIM(BOTH 'x'", "COUNT(*)",
            "(", ")", ",", "*", "=", "1", "t1", "a.b", "`q id`",
            "'lit''eral'", "\"dq\"", "range(3)", "AS", "x", "sum(v)",
        ]
    ),
    st.text(
        alphabet="abcXYZ_09.,()'\" `\n\t",
        min_size=0,
        max_size=12,
    ),
)
_sql_soup = st.lists(_sql_atoms, min_size=0, max_size=25).map(" ".join)


@given(_sql_soup)
@settings(max_examples=300, deadline=None)
def test_mask_literals_is_shape_preserving(s):
    masked = sql_dml._mask_literals(s)
    assert len(masked) == len(s)
    # outside-literal characters are untouched; inside-literal ones are
    # NUL — so positions always line up for span extraction
    for orig, m in zip(s, masked):
        assert m == orig or m == "\x00"


@given(_sql_soup)
@settings(max_examples=300, deadline=None)
def test_func_paren_flags_shape(s):
    masked = sql_dml._mask_literals(s)
    flags = sql_dml._func_paren_flags(masked)
    assert len(flags) == len(masked)
    if "(" not in masked:
        assert not any(flags)


@given(_sql_soup)
@settings(max_examples=200, deadline=None)
def test_parse_ts_utc_never_hangs_on_soup(s):
    # any non-timestamp text raises ValueError (never a crash / hang)
    try:
        sql_dml._parse_ts_utc(s)
    except ValueError:
        pass


def test_parse_ts_utc_naive_is_utc():
    assert sql_dml._parse_ts_utc("1970-01-01T00:00:00") == 0.0
    assert sql_dml._parse_ts_utc("1970-01-01T02:00:00+02:00") == 0.0


# -- rewrite identity & splice properties (Spark session, no jobs) -------------


@pytest.fixture(scope="module")
def reg_env(spark, tmp_path_factory):
    """A registry with one real managed table bound to two names."""
    from aws_callcenter_delta_lakehouse_spark.sources import (
        managed_table as mt,
        txn_catalog,
    )

    tmp = tmp_path_factory.mktemp("props")
    registry = str(tmp / "reg")
    path = str(tmp / "t")
    mt.commit_overwrite(
        spark.createDataFrame([(1, "a")], "id INT, s STRING"),
        path,
        keys=("id",),
    )
    txn_catalog.register_table_name(registry, "pdb.tbl", path)
    txn_catalog.register_table_name(registry, "solo", path)
    spark.conf.set("spark.managedTable.nameRegistry", registry)
    yield registry
    spark.conf.unset("spark.managedTable.nameRegistry")


@given(_sql_soup)
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rewrite_without_resolvable_names_is_identity(spark, reg_env, s):
    # the soup alphabet cannot spell the registered names ('pdb.tbl' /
    # 'solo' appear only if generated verbatim — excluded below), so
    # the rewrite must be byte-identical, malformed SQL included
    if "pdb.tbl" in s.lower() or "solo" in s.lower():
        return
    views: list[str] = []
    out = sql_dml._rewrite_bare_names(spark, s, None, views)
    assert out == s
    assert views == []


_ctx_before = st.sampled_from(
    [
        "SELECT * ",
        "SELECT a, b ",
        "SELECT count(*) AS n ",
        "WITH c AS (SELECT 1 AS one) SELECT * ",
        "SELECT EXTRACT(YEAR FROM DATE '2024-01-02') AS y ",
    ]
)
_ctx_after = st.sampled_from(
    [
        "",
        " WHERE id = 1",
        " ORDER BY id",
        " GROUP BY id",
        " a WHERE a.id > 0",
        " AS z",
        ", range(2) r",
        ", (SELECT 1 AS k) s",
    ]
)
_kw = st.sampled_from(["FROM", "from", "From"])


@given(_ctx_before, _kw, _ctx_after)
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_registered_name_always_splices(spark, reg_env, before, kw, after):
    stmt = f"{before}{kw} pdb.tbl{after}"
    views: list[str] = []
    try:
        out = sql_dml._rewrite_bare_names(spark, stmt, None, views)
        # the bare reference is gone, a view ref took its place, and
        # every other byte of the statement is preserved
        assert "pdb.tbl" not in out
        assert len(views) >= 1
        rebuilt = out
        for v in views:
            rebuilt = rebuilt.replace(v, "pdb.tbl", 1)
        assert rebuilt == stmt
    finally:
        for v in views:
            spark.catalog.dropTempView(v)


@given(_ctx_before, _ctx_after)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_name_inside_literal_never_splices(spark, reg_env, before, after):
    stmt = f"{before}FROM solo WHERE s = 'FROM pdb.tbl'{after}"
    views: list[str] = []
    try:
        out = sql_dml._rewrite_bare_names(spark, stmt, None, views)
        assert "'FROM pdb.tbl'" in out  # literal untouched
        assert "FROM solo" not in out  # the real relation spliced
    finally:
        for v in views:
            spark.catalog.dropTempView(v)
