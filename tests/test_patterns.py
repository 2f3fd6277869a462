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
