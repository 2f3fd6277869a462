"""Unit tests for the MATCH_RECOGNIZE-lite sequence pattern operator
(registry ``events_pattern_match`` carries the cross-engine diff)."""

from __future__ import annotations

import datetime as dt

import pytest

from aws_callcenter_delta_lakehouse_spark.operators.patterns import (
    encode_symbols,
    match_event_pattern,
)

MAP = {"view": "v", "click": "c", "purchase": "p"}


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (k, base + dt.timedelta(seconds=s), t) for k, s, t in rows
    ]
    return spark.createDataFrame(data, "k string, ts timestamp, t string")


def test_non_overlapping_skip_past_last_row(spark):
    # v c p v p  -> two matches: "vcp" and "vp"
    df = _events(
        spark,
        [("a", i, t) for i, t in enumerate(
            ["view", "click", "purchase", "view", "purchase"]
        )],
    )
    row = match_event_pattern(df, "k", "ts", "t", MAP, "v[cv]*p").first()
    assert row["n_matches"] == 2
    assert row["total_matched"] == 5
    assert row["longest"] == 3
    assert row["seq_len"] == 5


def test_zero_match_keys_are_reported(spark):
    df = _events(spark, [("a", 0, "click"), ("b", 0, "view"),
                         ("b", 1, "purchase")])
    out = {r["k"]: r for r in
           match_event_pattern(df, "k", "ts", "t", MAP, "v[cv]*p").collect()}
    assert out["a"]["n_matches"] == 0
    assert out["a"]["longest"] == 0
    assert out["b"]["n_matches"] == 1


def test_same_timestamp_ties_order_by_symbol(spark):
    # both events at t=0: sequence must be "cv" (symbol order), not
    # insertion order — pinned so engines can never disagree
    df = _events(spark, [("a", 0, "view"), ("a", 0, "click")])
    row = match_event_pattern(df, "k", "ts", "t", MAP, "cv").first()
    assert row["n_matches"] == 1


def test_unmapped_type_becomes_dot_and_breaks_runs(spark):
    df = _events(
        spark,
        [("a", 0, "view"), ("a", 1, "refund"), ("a", 2, "purchase")],
    )
    row = match_event_pattern(df, "k", "ts", "t", MAP, "v[cv]*p").first()
    assert row["n_matches"] == 0
    assert row["seq_len"] == 3


def test_encode_symbols_rejects_multichar(spark):
    with pytest.raises(ValueError):
        encode_symbols(None, {"view": "vv"})


def test_encode_symbols_rejects_empty_and_duplicate_mappings(spark):
    with pytest.raises(ValueError, match="non-empty"):
        encode_symbols(None, {})
    with pytest.raises(ValueError, match="duplicate symbols"):
        encode_symbols(None, {"view": "x", "click": "x"})


# -- PATTERN clause compiler -------------------------------------------------


def test_compile_pattern_quantifiers_and_alternation():
    from aws_callcenter_delta_lakehouse_spark.operators.patterns import (
        compile_pattern,
    )

    m = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
    assert compile_pattern("view click{2,3} purchase", m) == "vc{2,3}p"
    assert compile_pattern("view (click|view)* purchase", m) == "v(?:c|v)*p"
    assert compile_pattern("signup view+ purchase?", m) == "sv+p?"
    assert compile_pattern("(view|click){2} purchase", m) == "(?:v|c){2}p"
    assert compile_pattern("view click{1,} purchase", m) == "vc{1,}p"


def test_compile_pattern_rejects_malformed():
    from aws_callcenter_delta_lakehouse_spark.operators.patterns import (
        compile_pattern,
    )

    m = {"view": "v", "click": "c"}
    with pytest.raises(ValueError, match="unknown pattern variable"):
        compile_pattern("view frobnicate", m)
    with pytest.raises(ValueError, match="must follow"):
        compile_pattern("* view", m)
    with pytest.raises(ValueError, match="unbalanced"):
        compile_pattern("view (click", m)
    with pytest.raises(ValueError, match="unbalanced"):
        compile_pattern("view)", m)
    with pytest.raises(ValueError, match="non-empty"):
        compile_pattern("   ", m)
    with pytest.raises(ValueError, match="must follow"):
        # reluctant quantifiers are rejected (Java/RE2 divergence)
        compile_pattern("view click*? purchase", m)


def test_compiled_pattern_end_to_end(spark):
    """signup (view|click){2,3} purchase over a literal sequence."""
    from aws_callcenter_delta_lakehouse_spark.operators.patterns import (
        compile_pattern,
    )

    m = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
    # s v c p  -> match (2 middles); s v p -> no match (1 middle)
    df = _events(
        spark,
        [("a", i, t) for i, t in enumerate(
            ["signup", "view", "click", "purchase"]
        )]
        + [("b", i, t) for i, t in enumerate(["signup", "view", "purchase"])],
    )
    pat = compile_pattern("signup (view|click){2,3} purchase", m)
    out = {r["k"]: r for r in
           match_event_pattern(df, "k", "ts", "t", m, pat).collect()}
    assert out["a"]["n_matches"] == 1 and out["a"]["longest"] == 4
    assert out["b"]["n_matches"] == 0


def test_match_spans_positions_and_timestamps(spark):
    """Per-match MEASURES: positions and FIRST/LAST event times."""
    from aws_callcenter_delta_lakehouse_spark.operators.patterns import (
        match_event_spans,
    )

    df = _events(
        spark,
        [("a", i, t) for i, t in enumerate(
            ["view", "click", "purchase", "refund", "view", "purchase"]
        )]
        + [("b", 0, "click")],  # zero matches -> no rows
    )
    out = match_event_spans(
        df, "k", "ts", "t",
        {**MAP, "refund": "r"}, "v[cv]*p",
    ).orderBy("k", "match_idx").collect()
    assert [(r["k"], r["match_idx"], r["start_pos"], r["end_pos"],
             r["n_events"]) for r in out] == [
        ("a", 1, 1, 3, 3), ("a", 2, 5, 6, 2),
    ]
    assert out[0]["end_us"] - out[0]["start_us"] == 2_000_000
    assert out[1]["end_us"] - out[1]["start_us"] == 1_000_000


def test_match_spans_adjacent_matches(spark):
    """Back-to-back matches (empty segment between) position correctly."""
    from aws_callcenter_delta_lakehouse_spark.operators.patterns import (
        match_event_spans,
    )

    df = _events(
        spark,
        [("a", i, t) for i, t in enumerate(
            ["view", "purchase", "view", "purchase"]
        )],
    )
    out = match_event_spans(
        df, "k", "ts", "t", MAP, "v[cv]*p"
    ).orderBy("match_idx").collect()
    assert [(r["start_pos"], r["end_pos"]) for r in out] == [(1, 2), (3, 4)]


def test_overlapping_matches_skip_to_next_row(spark):
    """SKIP TO NEXT ROW: 'v v p p' has overlapping matches starting
    at positions 1 AND 2 (the non-overlapping scan reports only one)."""
    from aws_callcenter_delta_lakehouse_spark.operators.patterns import (
        match_event_pattern, match_event_starts,
    )

    df = _events(
        spark,
        [("a", i, t) for i, t in enumerate(
            ["view", "view", "purchase", "purchase"]
        )],
    )
    over = match_event_starts(df, "k", "ts", "t", MAP, "v[cv]*p").first()
    assert (over["n_matches"], over["first_start"], over["last_start"]) \
        == (2, 1, 2)
    non = match_event_pattern(df, "k", "ts", "t", MAP, "v[cv]*p").first()
    assert non["n_matches"] == 1  # the skip-past-last scan sees one
