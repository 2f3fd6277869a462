"""Unit tests for the Holt linear-trend operator (the registry query
``forecast_holt_linear`` carries the cross-engine oracle diff; these
pin the operator contract on a hand-checkable series)."""

from __future__ import annotations

import pytest

from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (
    holt_linear,
)


def _py_holt(xs, alpha=0.25, beta=0.125):
    # state after the textbook t=2 update: l_2 = x_2, b_2 = x_2 - x_1
    lvl, tr = float(xs[1]), float(xs[1]) - float(xs[0])
    for x in xs[2:]:
        lnew = alpha * x + (1.0 - alpha) * (lvl + tr)
        tr = beta * (lnew - lvl) + (1.0 - beta) * tr
        lvl = lnew
    return lvl, tr


def _series_df(spark, rows):
    return spark.createDataFrame(rows, "g string, t int, x double")


def test_holt_matches_python_reference(spark):
    xs = [10.0, 12.0, 11.0, 15.0, 16.0, 14.0, 18.0, 21.0]
    df = _series_df(spark, [("a", i, v) for i, v in enumerate(xs)])
    row = holt_linear(df, "g", "t", "x", horizons=(1, 3)).first()
    lvl, tr = _py_holt(xs)
    assert row["level"] == pytest.approx(lvl, rel=1e-12)
    assert row["trend"] == pytest.approx(tr, rel=1e-12)
    assert row["f_1"] == pytest.approx(lvl + tr, rel=1e-12)
    assert row["f_3"] == pytest.approx(lvl + 3.0 * tr, rel=1e-12)


def test_holt_linear_series_is_exact(spark):
    # a perfectly linear series: level tracks the last point, trend the
    # slope, forecasts continue the line (Holt is exact on lines)
    df = _series_df(spark, [("a", i, 5.0 + 2.0 * i) for i in range(10)])
    row = holt_linear(df, "g", "t", "x").first()
    assert row["level"] == pytest.approx(5.0 + 2.0 * 9, rel=1e-12)
    assert row["trend"] == pytest.approx(2.0, rel=1e-12)
    assert row["f_7"] == pytest.approx(5.0 + 2.0 * 16, rel=1e-12)


def test_holt_n_steps_uses_last_window_and_filters_short(spark):
    rows = [("long", i, float(i)) for i in range(10)]
    rows += [("short", i, float(i)) for i in range(3)]
    df = _series_df(spark, rows)
    out = holt_linear(df, "g", "t", "x", n_steps=5)
    got = {r["g"]: r for r in out.collect()}
    assert set(got) == {"long"}  # short series excluded at n_steps=5
    lvl, tr = _py_holt([5.0, 6.0, 7.0, 8.0, 9.0])
    assert got["long"]["level"] == pytest.approx(lvl, rel=1e-12)


def test_holt_two_point_series_returns_init(spark):
    df = _series_df(spark, [("a", 0, 4.0), ("a", 1, 10.0)])
    row = holt_linear(df, "g", "t", "x").first()
    assert row["level"] == 10.0
    assert row["trend"] == 6.0


# -- Theil-Sen ---------------------------------------------------------------

from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (  # noqa: E402
    theil_sen,
)


def test_theil_sen_exact_on_line(spark):
    df = _series_df(spark, [("a", i, 3.0 + 2.0 * i) for i in range(8)])
    row = theil_sen(df, "g", "t", "x").first()
    assert row["n_points"] == 8
    assert row["slope"] == pytest.approx(2.0, rel=1e-12)
    assert row["intercept"] == pytest.approx(3.0, rel=1e-12)


def test_theil_sen_ignores_one_outlier(spark):
    # OLS would tilt badly; the pairwise-median slope stays 2
    pts = [(i, 3.0 + 2.0 * i) for i in range(9)]
    pts[4] = (4, 500.0)
    df = _series_df(spark, [("a", t, v) for t, v in pts])
    row = theil_sen(df, "g", "t", "x").first()
    assert row["slope"] == pytest.approx(2.0, rel=1e-12)
    assert row["intercept"] == pytest.approx(3.0, rel=1e-12)


def test_theil_sen_even_count_median_averages(spark):
    # 3 points -> 3 pairwise slopes (odd, element median); intercept
    # over 3 residuals (odd). 4 points -> 6 slopes (even): median is
    # the mean of the 3rd and 4th smallest
    df = _series_df(
        spark, [("a", 0, 0.0), ("a", 1, 1.0), ("a", 2, 4.0), ("a", 3, 5.0)]
    )
    # pairwise slopes sorted: [1, 1, 5/3, 2, 2, 3] -> even count,
    # median = (5/3 + 2) / 2 = 11/6
    row = theil_sen(df, "g", "t", "x").first()
    assert row["slope"] == pytest.approx(11.0 / 6.0, rel=1e-12)


def test_theil_sen_multiple_groups_independent(spark):
    rows = [("up", i, float(i)) for i in range(5)]
    rows += [("down", i, float(-2 * i)) for i in range(5)]
    df = _series_df(spark, rows)
    got = {r["g"]: r for r in theil_sen(df, "g", "t", "x").collect()}
    assert got["up"]["slope"] == pytest.approx(1.0)
    assert got["down"]["slope"] == pytest.approx(-2.0)


# -- bootstrap CI ------------------------------------------------------------

from aws_callcenter_delta_lakehouse_spark.operators.bootstrap import (  # noqa: E402
    bootstrap_mean_ci,
)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    rows = [("a", i, float(10 + (i % 5))) for i in range(30)]
    df = _series_df(spark, rows)
    r1 = bootstrap_mean_ci(df, "g", "x", B=50, seed=3).first()
    r2 = bootstrap_mean_ci(df, "g", "x", B=50, seed=3).first()
    assert r1["n"] == 30
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]
    assert (r1["ci_lo"], r1["ci_hi"]) == (r2["ci_lo"], r2["ci_hi"])
    r3 = bootstrap_mean_ci(df, "g", "x", B=50, seed=4).first()
    assert (r1["ci_lo"], r1["ci_hi"]) != (r3["ci_lo"], r3["ci_hi"])


def test_bootstrap_ci_degenerate_constant_series(spark):
    df = _series_df(spark, [("a", i, 7.0) for i in range(10)])
    row = bootstrap_mean_ci(df, "g", "x", B=20).first()
    assert row["mean"] == 7.0
    assert row["ci_lo"] == 7.0 and row["ci_hi"] == 7.0


def test_bootstrap_ci_rejects_bad_params(spark):
    df = _series_df(spark, [("a", 0, 1.0)])
    import pytest as _pt

    with _pt.raises(ValueError):
        bootstrap_mean_ci(df, "g", "x", B=1)
    with _pt.raises(ValueError):
        bootstrap_mean_ci(df, "g", "x", alpha=1.5)


# -- changepoint -------------------------------------------------------------

from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (  # noqa: E402
    single_changepoint,
)


def test_changepoint_finds_obvious_level_shift(spark):
    rows = [("a", i, 10.0) for i in range(10)]
    rows += [("a", 10 + i, 50.0) for i in range(10)]
    df = _series_df(spark, rows)
    row = single_changepoint(df, "g", "t", "x").first()
    assert row["split_at"] == 9  # last point of the left segment
    assert row["mean_left"] == 10.0
    assert row["mean_right"] == 50.0
    assert row["n"] == 20


def test_changepoint_constant_series_scores_zero_earliest_split(spark):
    df = _series_df(spark, [("a", i, 3.0) for i in range(6)])
    row = single_changepoint(df, "g", "t", "x").first()
    assert row["score"] == 0.0
    assert row["split_at"] == 0  # all splits tie at 0; earliest wins


def test_changepoint_per_group(spark):
    rows = [("flat", i, 5.0) for i in range(8)]
    rows += [("step", i, 0.0 if i < 3 else 9.0) for i in range(8)]
    df = _series_df(spark, rows)
    got = {r["g"]: r for r in single_changepoint(df, "g", "t", "x").collect()}
    assert got["step"]["split_at"] == 2
    assert got["flat"]["score"] == 0.0


# -- Holt-Winters ------------------------------------------------------------

from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (  # noqa: E402
    holt_winters_additive,
)


def _py_hw(xs, m=7, a=0.25, b=0.125, g=0.25):
    s1 = 0.0
    for i in range(m):
        s1 = s1 + xs[i]
    s2 = 0.0
    for i in range(m, 2 * m):
        s2 = s2 + xs[i]
    lvl, tr = s1 / m, (s2 / m - s1 / m) / m
    s = [xs[i] - lvl for i in range(m)]
    for t in range(m, len(xs)):
        slot = t % m
        so = s[slot]
        lnew = a * (xs[t] - so) + (1 - a) * (lvl + tr)
        bnew = b * ((a * (xs[t] - so) + (1 - a) * (lvl + tr)) - lvl) \
            + (1 - b) * tr
        snew = g * (xs[t] - (a * (xs[t] - so) + (1 - a) * (lvl + tr))) \
            + (1 - g) * so
        lvl, tr, s[slot] = lnew, bnew, snew
    return lvl, tr, s


def test_hw_matches_python_reference(spark):
    xs = [
        50.0 + 3.0 * t + [5, -2, 0, 4, -5, 1, -3][t % 7] + (t % 3) * 0.5
        for t in range(28)
    ]
    df = _series_df(spark, [("a", t, v) for t, v in enumerate(xs)])
    row = holt_winters_additive(df, "g", "t", "x").first()
    lvl, tr, s = _py_hw(xs)
    assert row["level"] == pytest.approx(lvl, rel=1e-12)
    assert row["trend"] == pytest.approx(tr, rel=1e-12)
    assert row["f_1"] == pytest.approx(lvl + tr + s[28 % 7], rel=1e-12)
    assert row["f_7"] == pytest.approx(
        lvl + 7 * tr + s[(28 + 6) % 7], rel=1e-12
    )


def test_hw_exact_on_stationary_seasonal(spark):
    # zero-trend exact weekly pattern (season sums to 0): the simple
    # init recovers (l=10, b=0, s=season) exactly and every update is a
    # fixed point, so forecasts continue the pattern exactly. (On a
    # TRENDED series the simple init absorbs trend into the seasonal
    # state — a known bias of this init, deliberately not asserted.)
    season = [4.0, -1.0, 0.0, 3.0, -2.0, 1.0, -5.0]
    xs = [10.0 + season[t % 7] for t in range(28)]
    df = _series_df(spark, [("a", t, v) for t, v in enumerate(xs)])
    row = holt_winters_additive(df, "g", "t", "x").first()
    assert row["level"] == pytest.approx(10.0, rel=1e-12)
    assert row["trend"] == pytest.approx(0.0, abs=1e-12)
    assert row["f_1"] == pytest.approx(10.0 + season[0], rel=1e-12)
    assert row["f_7"] == pytest.approx(10.0 + season[6], rel=1e-12)


def test_hw_rejects_bad_shape(spark):
    df = _series_df(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        holt_winters_additive(df, "g", "t", "x", period=7, n_steps=10)
    with pytest.raises(ValueError):
        holt_winters_additive(df, "g", "t", "x", horizons=(8,))


# -- Mann-Kendall ------------------------------------------------------------

from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (  # noqa: E402
    mann_kendall,
)


def test_mann_kendall_monotone_series(spark):
    # strictly increasing: S = C(n,2), no ties
    df = _series_df(spark, [("a", i, float(i)) for i in range(10)])
    row = mann_kendall(df, "g", "t", "x").first()
    assert row["s"] == 45
    assert row["var_s"] == pytest.approx(10 * 9 * 25 / 18.0)
    assert row["z"] == pytest.approx(44.0 / (10 * 9 * 25 / 18.0) ** 0.5)


def test_mann_kendall_constant_series_zero(spark):
    # all tied: S = 0, variance fully tie-corrected to 0, z = 0
    df = _series_df(spark, [("a", i, 5.0) for i in range(6)])
    row = mann_kendall(df, "g", "t", "x").first()
    assert row["s"] == 0
    assert row["var_s"] == 0.0
    assert row["z"] == 0.0


def test_mann_kendall_matches_scipy_style_reference(spark):
    import itertools
    import math

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = _series_df(spark, [("a", i, v) for i, v in enumerate(xs)])
    row = mann_kendall(df, "g", "t", "x").first()
    s = sum(
        (0 if a == b else (1 if b > a else -1))
        for a, b in itertools.combinations(xs, 2)
    )
    n = len(xs)
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    assert row["s"] == s
    assert row["var_s"] == pytest.approx(var)
    assert row["z"] == pytest.approx(z, rel=1e-12)


def test_theil_sen_degenerate_all_equal_x_surfaces_null(spark):
    """A group whose x values are ALL equal has no defined slope — it
    must surface with NULL slope/intercept, not vanish from the
    output (round-11 advice fix)."""
    df = _series_df(
        spark,
        [("flat", 5, 1.0), ("flat", 5, 2.0), ("flat", 5, 3.0)]
        + [("ok", i, 2.0 * i) for i in range(4)],
    )
    out = {r["g"]: r for r in theil_sen(df, "g", "t", "x").collect()}
    assert set(out) == {"flat", "ok"}
    assert out["flat"]["n_points"] == 3
    assert out["flat"]["slope"] is None
    assert out["flat"]["intercept"] is None
    assert out["ok"]["slope"] == pytest.approx(2.0, rel=1e-12)


def test_classical_decompose_recovers_planted_seasonality(spark):
    """Pure seasonal series (no trend): trend = grand level, seasonal
    = planted phase effect, remainder = 0 — all exactly (integer
    micro-unit algebra)."""
    from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (
        classical_decompose,
    )

    rows = [("a", i, 10.0 + float(i % 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = classical_decompose(df, "g", "t", "y", period=3).collect()
    inner = [r for r in out if r["trend"] is not None]
    assert len(inner) == 10
    assert all(r["trend"] == 11.0 for r in inner)
    assert all(r["remainder"] == 0.0 for r in inner)
    by_phase = {r["phase"]: r["seasonal"] for r in inner}
    assert by_phase == {0: -1.0, 1: 0.0, 2: 1.0}
    # boundary rows surface with NULL decomposition, not dropped
    assert sum(1 for r in out if r["trend"] is None) == 2


def test_classical_decompose_rejects_even_period():
    from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (
        classical_decompose,
    )

    with pytest.raises(ValueError, match="odd"):
        classical_decompose(None, "g", "t", "y", period=4)


def test_mad_anomalies_flags_spike_and_guards_zero_mad(spark):
    from aws_callcenter_delta_lakehouse_spark.operators.timeseries import (
        mad_anomalies,
    )

    rows = (
        [("a", i, 5.0 + (1.0 if i % 2 else 0.0)) for i in range(20)]
        + [("a", 99, 100.0)]
        + [("b", i, 7.0) for i in range(5)]
        + [("b", 9, 8.0)]
    )
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = mad_anomalies(df, "g", "t", "y").collect()
    a = [r for r in out if r["g"] == "a"]
    assert [r["t"] for r in a if r["is_anomaly"]] == [99]
    # n = 21 (ten 5s, ten 6s, one spike): median = 11th = 6.0;
    # deviations are ten 1s, ten 0s, one 94 -> MAD = 11th = 1.0
    assert all(r["med"] == 6.0 and r["mad"] == 1.0 for r in a)
    # group b: over half identical -> mad 0 -> NULL z, nothing flagged
    b = [r for r in out if r["g"] == "b"]
    assert all(r["z"] is None and not r["is_anomaly"] for r in b)
