"""regression_ols_battery: the integer-moment OLS must agree with
Spark's native Welford-merge regression aggregates (regr_slope /
regr_intercept / regr_r2 / corr) to floating tolerance — the registry
query avoids the built-ins only for cross-engine bit-exactness, not
because it computes something different.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.plans.llm16 import (
    regression_ols_battery,
)

from tests.conftest import SF01


def test_moment_ols_matches_native_regr_aggregates(spark):
    mine = {r["flag"]: r for r in regression_ols_battery(spark, SF01).collect()}

    from aws_callcenter_delta_lakehouse_spark.catalog import load_table

    li = load_table(spark, SF01, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice").cast("double") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    native = {
        r["flag"]: r
        for r in pts.groupBy("flag")
        .agg(
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("intercept"),
            F.regr_r2("y", "x").alias("r2"),
            F.corr("y", "x").alias("corr"),
        )
        .collect()
    }
    assert set(mine) == set(native) and len(mine) == 3
    for flag, m in mine.items():
        n = native[flag]
        assert math.isclose(m["slope_cents"], n["slope"], rel_tol=1e-9)
        assert math.isclose(m["intercept_cents"], n["intercept"], rel_tol=1e-9)
        assert math.isclose(m["r2"], n["r2"], rel_tol=1e-9)
        assert math.isclose(m["corr_xy"], n["corr"], rel_tol=1e-9)
        # sanity: a well-formed correlation (this synthetic corpus draws
        # price independently of quantity, so the value itself is ~0)
        assert abs(m["corr_xy"]) <= 1.0 and m["r2"] >= 0.0
