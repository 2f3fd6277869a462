"""Count-min sketch: upper-bound guarantee, mergeability, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.operators.sketch import (
    cms_build,
    cms_heavy_hitters,
    cms_probe,
    cms_probe_df,
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


def _corpus_tokens(spark):
    from aws_callcenter_delta_lakehouse_spark.catalog import load_table
    from tests.conftest import SF001

    return load_table(spark, SF001, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )


def test_cms_upper_bound_over_real_corpus(spark):
    # the guarantee the registered query relies on, pinned against the
    # ACTUAL corpus (which the driver regenerates between rounds):
    # for every vocabulary term, estimate >= exact count
    toks = _corpus_tokens(spark)
    exact = toks.groupBy("term").agg(F.count("*").alias("exact"))
    sk = cms_build(toks, "term")
    est = cms_probe_df(sk, exact.select("term"), "term")
    bad = (
        est.join(exact, "term")
        .filter(F.col("est_count") < F.col("exact"))
        .collect()
    )
    assert bad == [], bad


def test_cms_heavy_hitters_exact_under_forced_collisions(spark):
    # width=2 forces every term to collide, yet the two-pass output must
    # STILL equal the exact phi-heavy-hitters — the property that makes
    # the registry oracle collision-proof
    toks = _corpus_tokens(spark)
    phi = 0.02
    got = {
        (r.term, r.exact_count)
        for r in cms_heavy_hitters(toks, "term", phi=phi, depth=2, width=2).collect()
    }
    n = toks.count()
    want = {
        (r.term, r.exact)
        for r in toks.groupBy("term")
        .agg(F.count("*").alias("exact"))
        .filter(F.col("exact") >= phi * n)
        .collect()
    }
    assert got == want
