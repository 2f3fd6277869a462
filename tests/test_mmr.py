"""Unit tests for MMR diversified re-ranking (registry
``similarity_mmr_rerank`` carries the cross-engine oracle diff)."""

from __future__ import annotations

import math
import random

import pytest

from aws_callcenter_delta_lakehouse_spark.operators.similarity import (
    mmr_select,
)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def _ref_mmr(qv, docs, k=3, lam=0.75, pool=8):
    rel = sorted(((_cos(v, qv), -i) for i, v in docs), reverse=True)[:pool]
    cands = {-ni: [r, None] for r, ni in rel}
    vecs = dict(docs)
    res = []
    for t in range(1, k + 1):
        best = None
        for i, (r, ms) in cands.items():
            sc = lam * r if ms is None else lam * r - (1 - lam) * ms
            key = (sc, -i)
            if best is None or key > best[0]:
                best = (key, i, sc, r)
        _, bi, bsc, br = best
        res.append((t, bi, br, bsc))
        del cands[bi]
        for i in cands:
            s = _cos(vecs[i], vecs[bi])
            cands[i][1] = s if cands[i][1] is None else max(cands[i][1], s)
    return res


def test_mmr_matches_python_reference_multi_query(spark):
    random.seed(7)
    corpus = [
        (i, [random.uniform(-1, 1) for _ in range(4)]) for i in range(20)
    ]
    queries = [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0, 0.0])]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(queries, "q_id long, qvec array<double>")
    out = mmr_select(qdf, cdf, k=3, lam=0.75, pool=8).collect()
    byq = {}
    for r in out:
        byq.setdefault(r["q_id"], []).append(
            (r["rank"], r["vec_id"], r["rel"], r["score"])
        )
    for qid, qv in queries:
        got = sorted(byq[qid])
        exp = _ref_mmr(qv, corpus)
        for g, e in zip(got, exp):
            assert g[0] == e[0] and g[1] == e[1]
            assert g[2] == pytest.approx(e[2], rel=1e-12)
            assert g[3] == pytest.approx(e[3], rel=1e-12)


def test_mmr_diversifies_against_redundant_cluster(spark):
    # 3 near-identical highly relevant docs + 1 orthogonal moderately
    # relevant doc: pure relevance would take the clones; MMR takes one
    # clone then the orthogonal doc
    corpus = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.998, 0.02]),
        (3, [0.3, 1.0]),
    ]
    qdf = spark.createDataFrame([(9, [1.0, 0.05])], "q_id long, qvec array<double>")
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    got = [
        r["vec_id"]
        for r in sorted(
            mmr_select(qdf, cdf, k=2, lam=0.5, pool=4).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got[0] in (0, 1, 2)
    assert got[1] == 3


def test_mmr_exclude_query_ids(spark):
    corpus = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame([(0, [1.0, 0.0])], "q_id long, qvec array<double>")
    got = {
        r["vec_id"]
        for r in mmr_select(
            qdf, cdf, k=2, pool=3, exclude_query_ids=True
        ).collect()
    }
    assert 0 not in got
