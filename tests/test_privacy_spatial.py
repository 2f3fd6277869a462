"""Unit tests for the Laplace-mechanism DP aggregates and the geohash
encoder (registry queries ``dq_dp_noisy_counts`` /
``spatial_geohash_cells`` carry the cross-engine oracle diff; these pin
the operator-level contracts)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.operators.privacy import (
    dp_noisy_counts,
    dp_noisy_sums,
    laplace_noise,
)
from aws_callcenter_delta_lakehouse_spark.operators.spatial import (
    geohash,
    geohash_oracle_sql,
)


def _people(spark):
    rows = [(i, "a" if i % 3 else "b", float(i % 7) * 10.0) for i in range(60)]
    return spark.createDataFrame(rows, "id long, grp string, val double")


def test_dp_noisy_counts_deterministic_and_centered(spark):
    df = _people(spark)
    out = {
        r["grp"]: r
        for r in dp_noisy_counts(df, ["grp"], epsilon=1.0, seed=3).collect()
    }
    again = {
        r["grp"]: r
        for r in dp_noisy_counts(df, ["grp"], epsilon=1.0, seed=3).collect()
    }
    assert out.keys() == {"a", "b"}
    assert out["a"]["n"] == 40 and out["b"]["n"] == 20
    for g in out:
        # same seed -> identical draw; noise is bounded in probability,
        # but deterministically it is just |noisy - n| = |Laplace inv-CDF|
        assert out[g]["noisy_n"] == again[g]["noisy_n"]
        assert out[g]["noisy_n"] != out[g]["n"]  # noise actually applied


def test_dp_noisy_counts_seed_changes_draw(spark):
    df = _people(spark)
    a = {r["grp"]: r["noisy_n"] for r in dp_noisy_counts(df, ["grp"], seed=1).collect()}
    b = {r["grp"]: r["noisy_n"] for r in dp_noisy_counts(df, ["grp"], seed=2).collect()}
    assert a != b


def test_dp_noisy_sums_clips_before_noise(spark):
    df = _people(spark)
    out = {
        r["grp"]: r
        for r in dp_noisy_sums(
            df, ["grp"], "val", clip=30.0, epsilon=5.0, seed=9
        ).collect()
    }
    # group a: ids with i%3 != 0 -> vals (i%7)*10 clipped at 30
    expect_a = sum(min(max((i % 7) * 10.0, 0.0), 30.0) for i in range(60) if i % 3)
    assert out["a"]["clipped_sum"] == pytest.approx(expect_a)
    assert out["a"]["noisy_sum"] != out["a"]["clipped_sum"]


def test_dp_epsilon_scales_noise(spark):
    """Same uniform (same key+seed) at two epsilons: noise magnitude is
    exactly inversely proportional."""
    df = _people(spark)
    lo = {r["grp"]: r for r in dp_noisy_counts(df, ["grp"], epsilon=0.5, seed=4).collect()}
    hi = {r["grp"]: r for r in dp_noisy_counts(df, ["grp"], epsilon=2.0, seed=4).collect()}
    for g in lo:
        n_lo = lo[g]["noisy_n"] - lo[g]["n"]
        n_hi = hi[g]["noisy_n"] - hi[g]["n"]
        assert n_lo == pytest.approx(4.0 * n_hi, rel=1e-9)


def test_dp_rejects_bad_params(spark):
    df = _people(spark)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["grp"], epsilon=0.0)
    with pytest.raises(ValueError):
        dp_noisy_sums(df, ["grp"], "val", clip=-1.0)


def test_laplace_noise_portable_matches_duckdb(spark):
    """The portable draw is the md5-low-60 uniform: recompute one value
    end-to-end in plain Python from the md5 hex and compare."""
    import hashlib

    key = "k1"
    row = (
        spark.range(1)
        .select(laplace_noise(F.lit(key), 2.0, portable=True).alias("x"))
        .first()
    )
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    u = (h + 0.5) / float(2**60)
    v = u - 0.5
    expect = -2.0 * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v))
    assert row["x"] == pytest.approx(expect, rel=1e-12)


# -- geohash -----------------------------------------------------------------

CANONICAL = [
    # public geohash test vectors
    (57.64911, 10.40744, "u4pruyd"),
    (-25.382708, -49.265506, "6gkzwgj"),
    (0.0, 0.0, "s000000"),
]


def test_geohash_canonical_vectors(spark):
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _ in CANONICAL], "lat double, lon double"
    )
    got = (
        df.select(geohash(F.col("lat"), F.col("lon"), 7).alias("gh"))
        .toLocalIterator()
    )
    assert [r["gh"] for r in got] == [gh for _, _, gh in CANONICAL]


def test_geohash_is_hierarchical(spark):
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _ in CANONICAL], "lat double, lon double"
    )
    rows = df.select(
        geohash(F.col("lat"), F.col("lon"), 3).alias("g3"),
        geohash(F.col("lat"), F.col("lon"), 7).alias("g7"),
    ).collect()
    for r in rows:
        assert r["g7"].startswith(r["g3"])


def test_geohash_oracle_sql_mirrors_spark(spark):
    import duckdb

    con = duckdb.connect()
    for lat, lon, gh in CANONICAL:
        sql = "SELECT " + geohash_oracle_sql(repr(lat), repr(lon), 7) + " AS g"
        assert con.execute(sql).fetchone()[0] == gh
    con.close()


def test_geohash_rejects_bad_precision(spark):
    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 13)


def test_dp_null_group_values_get_distinct_noise(spark):
    """NULL group values must not collide with other groups' noise
    keys (concat_ws silently drops NULLs — round-11 advice fix): a
    (NULL,) group and an ('',) group draw DIFFERENT noise, and NULL
    groups appear in the release."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, ""), (5, "x")],
        "id long, grp string",
    )
    out = {r["grp"]: r for r in dp_noisy_counts(df, ["grp"], seed=5).collect()}
    assert set(out) == {None, "", "x"}
    n_null = out[None]["noisy_n"] - out[None]["n"]
    n_empty = out[""]["noisy_n"] - out[""]["n"]
    assert n_null != n_empty  # distinct keys -> distinct deviates
