"""Product quantization: recall vs brute force, determinism, codebook
shape, and the zero-shuffle encode plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.catalog import load_table
from aws_callcenter_delta_lakehouse_spark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_train,
    _normalize,
)
from aws_callcenter_delta_lakehouse_spark.operators.similarity import (
    brute_force_topk,
)
from tests.conftest import SF001


def _exact_top10(spark, emb, qdf):
    corpus_q = emb.join(F.broadcast(qdf))
    return [r.vec_id for r in brute_force_topk(corpus_q, F.col("q"), k=10).collect()]


def test_pq_recall_and_self_retrieval(spark):
    emb = load_table(spark, SF001, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    exact = _exact_top10(spark, emb, qdf)
    approx = [
        r.vec_id
        for r in pq_topk(emb, qdf, m=16, num_codes=16, k=10, iterations=0).collect()
    ]
    # the query IS vec 0: its own quantized reconstruction must win
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) / 10 >= 0.5


def test_pq_deterministic(spark):
    emb = load_table(spark, SF001, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("q"))
    a = [tuple(r) for r in pq_topk(emb, qdf, m=16, num_codes=16, k=5).collect()]
    b = [tuple(r) for r in pq_topk(emb, qdf, m=16, num_codes=16, k=5).collect()]
    assert a == b


def test_pq_codebook_and_codes_shape(spark):
    emb = load_table(spark, SF001, "embeddings")
    cb = pq_train(emb, m=8, num_codes=4, iterations=0)
    rows = cb.collect()
    assert len(rows) == 8 * 4
    assert all(len(r.cvec) == 8 for r in rows)
    assert {(r.s, r.j) for r in rows} == {(s, j) for s in range(8) for j in range(4)}
    enc = pq_encode(
        _normalize(emb, ["vec_id"], "embedding"), cb, m=8
    ).select("vec_id", "codes")
    got = enc.limit(20).collect()
    assert all(len(r.codes) == 8 and all(0 <= c < 4 for c in r.codes) for r in got)


def test_pq_encode_is_shuffle_free(spark):
    # encoding must be a broadcast-join projection: no Exchange between
    # the corpus scan and the code projection (the codebook side's tiny
    # exchange feeds the broadcast)
    emb = load_table(spark, SF001, "embeddings")
    cb = pq_train(emb, m=8, num_codes=4, iterations=0)
    enc = pq_encode(_normalize(emb, ["vec_id"], "embedding"), cb, m=8)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # corpus side: scan feeds the projection directly — the only
    # exchanges in the plan belong to the (tiny) codebook aggregation
    scan_branch = plan.split("Scan parquet")[0]
    assert "Exchange hashpartitioning(vec_id" not in plan


def test_ivfpq_recall_self_retrieval_and_determinism(spark):
    """IVFADC: every query retrieves ITSELF first (its own cell is the
    first probe and base + residual-ADC of a vector against its own
    codes dominates), mean recall@10 vs brute force clears a floor, and
    the whole pipeline is deterministic (seeded coarse + PQ codebooks,
    no RNG)."""
    from collections import defaultdict

    from aws_callcenter_delta_lakehouse_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, SF001, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = ivfpq_topk(
        emb, queries, num_centroids=16, nprobe=4, m=16, num_codes=16, k=10
    )
    rows = res.collect()
    got = defaultdict(list)
    for r in rows:
        got[r.q_id].append(r.vec_id)
    recalls = []
    for q in range(5):
        qdf = emb.filter(F.col("vec_id") == q).select(F.col("embedding").alias("q"))
        exact = _exact_top10(spark, emb, qdf)
        assert got[q][0] == q  # exact self-retrieval
        recalls.append(len(set(exact) & set(got[q])) / 10)
    # measured 0.32 on this corpus (residual PQ ≈ raw PQ here: the
    # synthetic embeddings have no cluster structure for residuals to
    # exploit); generous floor so a driver testdata regen can't flap
    assert sum(recalls) / len(recalls) >= 0.15
    again = [tuple(r) for r in ivfpq_topk(
        emb, queries, num_centroids=16, nprobe=4, m=16, num_codes=16, k=10
    ).collect()]
    assert sorted(map(tuple, rows)) == sorted(again)


def test_pq_train_reliable_checkpoint_parity(spark, tmp_path):
    # checkpoint_dir mode (reliable df.checkpoint, cluster-safe) must
    # train the exact same codebook as the localCheckpoint fast path —
    # one Lloyd iteration exercises the per-round materialization
    emb = load_table(spark, SF001, "embeddings")
    fast = sorted(
        (r.s, r.j, tuple(r.cvec))
        for r in pq_train(emb, m=8, num_codes=4, iterations=1).collect()
    )
    reliable = sorted(
        (r.s, r.j, tuple(r.cvec))
        for r in pq_train(
            emb, m=8, num_codes=4, iterations=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect()
    )
    assert fast == reliable
