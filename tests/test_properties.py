"""Hypothesis property tests for the pure helpers (no SparkSession —
these check the engine-portability invariants the oracle suite relies
on)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _round_portable_py(x: float, d: int) -> float:
    """Reference implementation of functions.scalars.round_portable —
    identical IEEE ops to the Column expression and the SQL oracle form."""
    scale = float(10**d)
    return math.floor(x * scale + 0.5) / scale


@settings(max_examples=300)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), st.integers(0, 6))
def test_round_portable_is_idempotent_and_bounded(x, d):
    r = _round_portable_py(x, d)
    assert _round_portable_py(r, d) == r  # idempotent
    assert abs(r - x) <= 10.0**-d + 1e-9  # within one unit of last place


@settings(max_examples=200)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_round_portable_matches_duckdb_formulation(x):
    """The SQL oracle writes floor(x*1e2+0.5)/1e2 with a float literal
    1e2 — must equal the Python/Column 10**d scaling bit-for-bit."""
    assert _round_portable_py(x, 2) == math.floor(x * 1e2 + 0.5) / 1e2


@settings(max_examples=200)
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=5)
)
def test_shingle_count_formula(texts):
    """shingle() emits max(0, n_words - 2) trigrams per doc (pre-
    distinct) — the SQL-oracle formulation's row count."""
    for t in texts:
        words = t.split(" ")  # Spark split(" ") semantics: keeps empties
        n = len(words)
        expected = max(0, n - 2)
        grams = [" ".join(words[i : i + 3]) for i in range(n - 2)] if n >= 3 else []
        assert len(grams) == expected


@settings(max_examples=100)
@given(
    st.sets(st.integers(0, 500), min_size=1, max_size=60),
    st.sets(st.integers(0, 500), min_size=1, max_size=60),
)
def test_jaccard_bounds_and_symmetry(a, b):
    inter = len(a & b)
    j = inter / (len(a) + len(b) - inter)
    j_sym = inter / (len(b) + len(a) - inter)
    assert 0.0 <= j <= 1.0 and j == j_sym
    if a == b:
        assert j == 1.0


def test_portable_hash_contract_spark_vs_python(spark):
    """The portable 60-bit md5 hash now underpins six oracle-backed
    queries (winnow, simhash, bloom, both KMV sketches, ann-lsh
    constants). Pin the contract on adversarial inputs: Spark's
    conv(substr(md5(x),1,15),16,10) must equal Python's
    int(hashlib.md5(x).hexdigest()[:15], 16) for every string —
    including empties, unicode, digits-only, and '0x'-prefix lookalikes
    — and the hyperplane constants must round-trip through repr."""
    import hashlib

    from pyspark.sql import functions as F

    from aws_callcenter_delta_lakehouse_spark.operators.similarity import (
        hyperplane_constants,
    )

    samples = [
        "", "a", "0x1f", "deadbeef", "0", "000000000000000",
        "héllo wörld", "The quick brown fox", "123456789012345678",
        " lead", "trail ", "two  spaces", "\tTAB", "ünïcödé-текст-文字",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r.s: r.h
        for r in df.select(
            "s",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        ).collect()
    }
    for s in samples:
        want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        assert got[s] == want, s
        assert 0 <= want < (1 << 60)

    # hyperplane constants: in [-1, 1), deterministic, repr-exact
    for p in range(3):
        a = hyperplane_constants(16, p)
        assert a == hyperplane_constants(16, p)
        assert all(-1.0 <= v < 1.0 for v in a)
        assert all(float(repr(v)) == v for v in a)
