"""Count-min sketch: upper-bound guarantee, mergeability, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.catalog import load_table
from aws_callcenter_delta_lakehouse_spark.operators.sketch import (
    cms_build,
    cms_heavy_hitters,
    cms_probe,
    cms_probe_df,
)
from tests.conftest import SF01


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


# ------------------------------------------------------- KMV theta sketch

def test_kmv_estimate_within_error_bound(spark):
    """k=256 KMV over the real per-event-type user sets: every
    estimate within 4x the theoretical RSE (1/sqrt(k-2) ~ 6.3%)."""
    from aws_callcenter_delta_lakehouse_spark.operators.sketch import (
        kmv_estimate, kmv_sketch,
    )

    events = load_table(spark, SF01, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    sk = kmv_estimate(kmv_sketch(events, "user_id", ["event_type"], k=256))
    for r in sk.collect():
        rel = abs(r.est_distinct - exact[r.event_type]) / exact[r.event_type]
        assert rel <= 0.25, (r.event_type, r.est_distinct, exact[r.event_type])


def test_kmv_partial_fill_is_exact(spark):
    """A group with fewer than k distinct keys holds its whole value
    set: estimate and pairwise overlap are EXACT."""
    from aws_callcenter_delta_lakehouse_spark.operators.sketch import (
        kmv_estimate, kmv_overlap_pairs, kmv_sketch,
    )

    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(20, 70)]
    df = spark.createDataFrame(rows, "seg string, uid long")
    sk = kmv_sketch(df, "uid", ["seg"], k=256)
    est = {r.seg: r.est_distinct for r in kmv_estimate(sk, k=256).collect()}
    assert est == {"a": 40.0, "b": 50.0}
    ov = kmv_overlap_pairs(sk, "seg", k=256).collect()[0]
    assert ov.est_intersection == 20.0
    assert ov.est_union == 70.0
    assert abs(ov.est_jaccard - 20 / 70) < 1e-12


def test_kmv_overlap_accuracy_and_determinism(spark):
    from aws_callcenter_delta_lakehouse_spark.operators.sketch import (
        kmv_overlap_pairs, kmv_sketch,
    )

    events = load_table(spark, SF01, "events")
    exact_pairs = {}
    users = events.select("event_type", "user_id").distinct()
    a = users.withColumnsRenamed({"event_type": "g1"})
    b = users.withColumnsRenamed({"event_type": "g2"})
    for r in (
        a.join(b, on="user_id")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(F.count("*").alias("n"))
        .collect()
    ):
        exact_pairs[(r.g1, r.g2)] = r.n
    sk = kmv_sketch(events, "user_id", ["event_type"], k=256)
    got = kmv_overlap_pairs(sk, "event_type", k=256).collect()
    assert len(got) == len(exact_pairs)
    for r in got:
        want = exact_pairs[(r.g1, r.g2)]
        assert abs(r.est_intersection - want) / want <= 0.3, (
            r.g1, r.g2, r.est_intersection, want,
        )
    again = kmv_overlap_pairs(sk, "event_type", k=256).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_kmv_merge_equals_direct_sketch(spark):
    """Mergeability is exact: union-merging per-part sketches equals
    sketching the unioned raw data directly."""
    from aws_callcenter_delta_lakehouse_spark.operators.sketch import (
        kmv_merge, kmv_sketch,
    )

    rows = [("s", i % 3, i * 7 + 1) for i in range(900)]
    df = spark.createDataFrame(rows, "seg string, part int, uid long")
    per_part = kmv_sketch(df, "uid", ["seg", "part"], k=64).drop("part")
    merged = kmv_merge(per_part, ["seg"], k=64).collect()[0]
    direct = kmv_sketch(df, "uid", ["seg"], k=64).collect()[0]
    assert merged.kmv == direct.kmv and merged.n_seen == direct.n_seen


def test_kmv_rolling_estimate_tracks_exact(spark):
    """Merged-daily-sketch rolling estimates within 4x RSE of the exact
    rolling distinct query on the real corpus."""
    from aws_callcenter_delta_lakehouse_spark.plans.all import REGISTRY

    exact = {
        (r.event_type, r.wend): r.distinct_users_7d
        for r in REGISTRY["events_rolling_distinct_users"].fn(spark, SF01).collect()
    }
    est = REGISTRY["sketch_kmv_rolling_users"].fn(spark, SF01).collect()
    assert len(est) == len(exact)
    for r in est:
        want = exact[(r.event_type, r.wend)]
        assert abs(r.est_users_7d - want) / want <= 0.25, (
            r.event_type, r.wend, r.est_users_7d, want,
        )
