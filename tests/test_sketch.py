"""Count-min sketch: upper-bound guarantee, mergeability, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.operators.sketch import (
    cms_build,
    cms_probe,
)


def _tokens(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["term"])


def test_cms_exact_when_no_collisions(spark):
    words = ["a"] * 5 + ["b"] * 3 + ["c"]
    sk = cms_build(_tokens(spark, words), "term", depth=4, width=1024)
    est = {r.term: r.est_count for r in cms_probe(sk, ["a", "b", "c", "zzz"], depth=4, width=1024).collect()}
    assert est["a"] == 5 and est["b"] == 3 and est["c"] == 1
    assert est["zzz"] == 0


def test_cms_never_underestimates_under_forced_collisions(spark):
    # width=2 forces heavy collisions: every estimate must still be >=
    # the true count (CMS errors are one-sided), and the total mass
    # bounds every estimate above
    words = [w for i, w in enumerate(["x", "y", "z", "w", "v"]) for _ in range(i + 1)]
    true = {"x": 1, "y": 2, "z": 3, "w": 4, "v": 5}
    sk = cms_build(_tokens(spark, words), "term", depth=3, width=2)
    est = {r.term: r.est_count for r in cms_probe(sk, list(true), depth=3, width=2).collect()}
    n = sum(true.values())
    for t, c in true.items():
        assert c <= est[t] <= n, (t, c, est[t])


def test_cms_is_mergeable(spark):
    # sketch(A ++ B) == sketch(A) + sketch(B) cell-wise: the property
    # that lets executors build partial sketches independently
    a = ["a", "b", "a"]
    b = ["b", "c"]
    whole = cms_build(_tokens(spark, a + b), "term", depth=2, width=8)
    parts = (
        cms_build(_tokens(spark, a), "term", depth=2, width=8)
        .unionAll(cms_build(_tokens(spark, b), "term", depth=2, width=8))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert {tuple(r) for r in whole.collect()} == {tuple(r) for r in parts.collect()}
