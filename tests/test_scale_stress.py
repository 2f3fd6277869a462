"""Scale-stress harness: the heavy LLM-pipeline operators must scale
near-LINEARLY in input rows.

``tests/test_scale_plans.py`` pins shuffle SHAPE (what gets exchanged);
this pins the CONSTANT: a synthetic corpus is generated at 1x and 10x
(pure Spark column expressions, seeded hashes — no dependency on the
driver's testdata), each heavy registry query runs against both, and
the wall-clock ratio is bounded. A quadratic all-pairs regression shows
up as a ~100x ratio; genuine linear scaling lands well under the bound
even with scheduler noise (fixed per-job overhead makes the small run
look relatively slower, pushing ratios DOWN).

The bound is deliberately generous (25x for 10x data) because
wall-clock on a shared machine is noisy — this is a tripwire for
complexity regressions, not a benchmark.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.plans.all import REGISTRY

_VOCAB = (
    "join hash row batch scan customer column filter small slow merge "
    "order vector line data table agg value key stream window spark a "
    "group part big sort query fast the dup"
).split()

N_SMALL = 1500
SCALE = 10
RATIO_BOUND = 25.0

STRESS_QUERIES = (
    "dedup_minhash_lsh",
    "dedup_cluster_summary",
    "similarity_ivf_kmeans",
    "similarity_pq_adc",
    "bpe_merges",
    # round-4 additions over the documents table
    "dedup_segment_reassemble",
    "curation_dsir_weights",
    # exact prefix-filter join (output-sensitive: 2.5x measured at 10x
    # rows even on the saturated 31-word vocab) and the IVFADC composite
    "dedup_prefix_filter",
    "similarity_ivfpq_adc",
    # round-5: directional containment shares jaccard_pairs' df-blocked
    # self-join shape — quadratic if the blocking regresses
    "dedup_containment",
    # round-6: the graph family — the most expensive registry queries
    # (BENCH_DETAIL_r05) had no superlinearity tripwire; a lost
    # checkpoint truncation or a regressed co-supply projection would
    # go unseen. Edges scale linearly with orders by construction (see
    # _synth_corpus: 25-order supplier groups -> 6 distinct pairs per
    # group, chained for BFS connectivity).
    "pagerank_suppliers",
    "graph_kcore_suppliers",
    "graph_bfs_hops",
    "graph_community_labels",
    # round-6: the LSH-recall eval composes the banding shape with the
    # df-blocked truth join AND a 16x portable-md5 signature pass — a
    # regression in any of the three (hot-shingle cap lost, bucket
    # fan-out, per-element md5 re-evaluation) would superlinearize it
    "dedup_lsh_recall_eval",
    # round-8: corpus x benchmark near-dup decontamination — the bucket
    # join must stay corpus x bench (the synthetic corpus's every-17th
    # near-dup structure makes the bench slice real); a lost side
    # filter degrades it to the full self-join
    "decontaminate_near_dup",
    # round-11: the round-10 analytics families (per the r10 verdict).
    # geohash = per-row bit algebra + cell-keyed join (a lost
    # hierarchical-substr would force a re-encode); phash = banded
    # Hamming join (regression -> all-pairs); RAKE = gaps-and-islands
    # phrase build (regression -> per-word window re-sort); Holt-
    # Winters = daily agg + constant-length fold (regression -> the
    # fold going per-row)
    "spatial_geohash_cells",
    "multimodal_phash_neardup",
    "text_rake_keywords",
    "forecast_holt_winters",
)


def _synth_corpus(spark, out_dir: str, n_docs: int, seed: int = 7) -> None:
    """documents + embeddings parquet with the testdata schema, fully
    deterministic (hash-derived), ~6% near-duplicate docs (every 17th
    doc re-generates from its predecessor's id so dedup ops have real
    clusters to find)."""
    base = F.when(
        (F.pmod(F.col("doc_id"), 17) == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    words_per_doc = 80
    word = lambda i: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in _VOCAB]),
        (F.pmod(F.xxhash64(base, F.lit(i), F.lit(seed)), len(_VOCAB)) + 1).cast(
            "int"
        ),
    )
    docs = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "text", F.concat_ws(" ", *[word(i) for i in range(words_per_doc)])
        )
        .select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.concat(
                F.lit("src"), F.pmod(F.col("doc_id"), 4).cast("string")
            ).alias("source"),
            F.length("text").alias("n_chars"),
        )
    )
    docs.write.mode("overwrite").parquet(out_dir + "/documents.parquet")
    emb = (
        spark.range(n_docs)
        .withColumnRenamed("id", "vec_id")
        .select(
            "vec_id",
            F.array(
                *[
                    (
                        F.xxhash64(F.col("vec_id"), F.lit(j), F.lit(seed))
                        / F.lit(float(1 << 63))
                    ).cast("float")
                    for j in range(64)
                ]
            ).alias("embedding"),
            F.pmod(F.col("vec_id"), 8).cast("int").alias("label"),
        )
    )
    emb.write.mode("overwrite").parquet(out_dir + "/embeddings.parquet")
    # orders + lineitem for the graph family, edge-count LINEAR in rows:
    # orders come in groups of 25 sharing one 4-supplier set (so every
    # co-supply pair recurs 25 times — past graph_bfs_hops' >=5-shared-
    # orders threshold), supplier ids stride by 3 per group (4-wide set
    # overlaps the next group by one supplier -> one connected chain for
    # BFS), customers cycle over n/10 ids for the bipartite queries.
    orders = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("o_orderkey"),
            F.pmod(F.col("id"), F.lit(max(n_docs // 10, 10))).alias("o_custkey"),
        )
    )
    orders.write.mode("overwrite").parquet(out_dir + "/orders.parquet")
    li = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(
                F.array(
                    *[
                        ((F.col("id") / 25).cast("long") * 3 + F.lit(j)).alias(
                            "s"
                        )
                        for j in range(4)
                    ]
                )
            ).alias("l_suppkey"),
        )
    )
    li.write.mode("overwrite").parquet(out_dir + "/lineitem.parquet")
    # customer / supplier key columns for the geohash co-location query
    # (it derives synthetic lat/lon from the keys; counts scale linearly)
    spark.range(n_docs).select(
        F.col("id").alias("c_custkey")
    ).write.mode("overwrite").parquet(out_dir + "/customer.parquet")
    spark.range(max(n_docs // 4, 10)).select(
        F.col("id").alias("s_suppkey")
    ).write.mode("overwrite").parquet(out_dir + "/supplier.parquet")
    # events: 5 types x 45 days (the DAY count stays fixed as rows
    # scale — Holt-Winters' fold length is constant, only the pre-agg
    # scan grows), microsecond timestamps
    spark.range(n_docs).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), F.lit(max(n_docs // 10, 10))).alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.pmod(F.col("id"), 45) * F.lit(86_400_000_000)
            + F.col("id") * F.lit(1_000_000)
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "signup", "error")]),
            (F.pmod(F.col("id"), 5) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("id"), 97).cast("double") / 10.0).alias("value"),
    ).write.mode("overwrite").parquet(out_dir + "/events.parquet")


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


@pytest.mark.slow
def test_heavy_ops_scale_near_linearly(spark, tmp_path):
    small = str(tmp_path / "x1")
    big = str(tmp_path / "x10")
    _synth_corpus(spark, small, N_SMALL)
    _synth_corpus(spark, big, N_SMALL * SCALE)

    failures = []
    for name in STRESS_QUERIES:
        _run(spark, name, small)  # warm codegen/JIT for this plan shape
        t_small = max(_run(spark, name, small), 0.5)
        t_big = _run(spark, name, big)
        ratio = t_big / t_small
        if ratio > RATIO_BOUND:
            failures.append((name, round(t_small, 2), round(t_big, 2), round(ratio, 1)))
    assert not failures, (
        f"superlinear scaling at {SCALE}x rows (bound {RATIO_BOUND}x): "
        f"{failures}"
    )


@pytest.mark.slow
def test_append_cost_invariant_to_table_size(spark, tmp_path):
    """`append_rows` must cost O(appended): the SAME batch appended to a
    100x-larger table (similar file count — hardlink metadata is the
    only table-size-coupled work) must not cost proportionally more. A
    regression that rescans or rewrites the table shows up as a ~10x+
    ratio; the bound is generous for scheduler noise."""
    from aws_callcenter_delta_lakehouse_spark.sources import (
        managed_table as mt,
    )

    small, big = str(tmp_path / "small"), str(tmp_path / "big")
    for n, p in ((20_000, small), (2_000_000, big)):
        mt.commit_overwrite(
            spark.range(n).withColumn("v", F.col("id") * 2).repartition(8),
            p,
            keys=("id",),
        )
    batch = spark.range(9_000_000, 9_001_000).withColumn(
        "v", F.col("id") * 2
    )

    def t(path):
        t0 = time.perf_counter()
        mt.append_rows(spark, batch, path)
        return time.perf_counter() - t0

    t(small), t(big)  # warm both plan shapes
    t_small = max(min(t(small), t(small)), 0.2)
    t_big = min(t(big), t(big))
    assert t_big / t_small < 5.0, (t_small, t_big)
