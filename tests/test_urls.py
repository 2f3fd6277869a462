"""Unit tests for URL canonicalization (registry
``dedup_url_canonical`` carries the cross-engine diff)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.operators.urls import (
    canonicalize_url,
)

CASES = [
    # (raw, canonical)
    ("HTTP://Www.Site.com/a/?utm_source=x", "http://www.site.com/a"),
    ("http://www.site.com/a", "http://www.site.com/a"),
    ("https://example.com:443/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
    ("http://example.com:80/", "http://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("https://h.io/p#frag", "https://h.io/p"),
    ("https://h.io", "https://h.io/"),
    ("https://h.io/p?fbclid=abc&gclid=x&id=7", "https://h.io/p?id=7"),
    ("https://h.io/p///", "https://h.io/p"),
    ("https://h.io/?utm_campaign=q", "https://h.io/"),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(
            canonicalize_url(F.col("url")).alias("c")
        ).toLocalIterator()
    ]
    assert got == [c for _, c in CASES]


def test_canonical_equality_is_the_dedup_key(spark):
    variants = [
        "HTTPS://News.Example.com/story/42?utm_source=tw&ref=1",
        "https://news.example.com/story/42/?ref=1",
        "https://news.example.com:443/story/42?ref=1#top",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    n = (
        df.select(canonicalize_url(F.col("url")).alias("c"))
        .distinct()
        .count()
    )
    assert n == 1


def test_valueless_tracking_params_are_dropped(spark):
    """'?fbclid' / '?utm_source&id=1' — tracking params without '='
    must canonicalize away too (round-11 advice fix)."""
    cases = [
        ("https://h.io/p?fbclid", "https://h.io/p"),
        ("https://h.io/p?utm_source&id=1", "https://h.io/p?id=1"),
        ("https://h.io/p?utm_campaign", "https://h.io/p"),
        # a non-tracking valueless param survives
        ("https://h.io/p?flag", "https://h.io/p?flag"),
        # prefix-only similarity does not match
        ("https://h.io/p?fbclid2=1", "https://h.io/p?fbclid2=1"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(
            canonicalize_url(F.col("url")).alias("c")
        ).toLocalIterator()
    ]
    assert got == [c for _, c in cases]
