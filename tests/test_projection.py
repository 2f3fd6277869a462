"""Dimensionality reduction + label propagation: numpy parity and
handcrafted-structure pins for the operators behind
embedding_random_projection / embedding_pca_scores /
graph_community_labels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.catalog import load_table
from aws_callcenter_delta_lakehouse_spark.operators.components import (
    label_propagation,
)
from aws_callcenter_delta_lakehouse_spark.operators.projection import (
    pca_fit,
    pca_transform,
    rademacher_matrix,
    random_project,
)
from tests.conftest import SF001


def test_rademacher_matrix_is_balanced_and_deterministic():
    m1 = rademacher_matrix(64, 8)
    m2 = rademacher_matrix(64, 8)
    assert m1 == m2
    flat = [s for row in m1 for s in row]
    assert set(flat) == {1.0, -1.0}
    # roughly balanced signs (LCG high bits) — not all-same, not alternating
    pos = sum(1 for s in flat if s > 0)
    assert 0.3 * len(flat) < pos < 0.7 * len(flat)


def test_random_projection_preserves_pairwise_distances(spark):
    """JL property: with k=16 of 64 dims, scaled pairwise distances stay
    within a loose multiplicative band for a sample of vector pairs."""
    emb = load_table(spark, SF001, "embeddings").limit(40)
    k = 16
    proj = random_project(emb, "embedding", dim=64, k=k, prefix="p")
    rows = proj.collect()
    X = np.array([np.array(r["embedding"], dtype=np.float64) for r in rows])
    P = np.array([[r[f"p{j}"] for j in range(k)] for r in rows]) / np.sqrt(k)
    rng = np.random.default_rng(7)
    ratios = []
    for _ in range(200):
        i, j = rng.integers(0, len(rows), 2)
        if i == j:
            continue
        d_orig = np.linalg.norm(X[i] - X[j])
        d_proj = np.linalg.norm(P[i] - P[j])
        if d_orig > 1e-9:
            ratios.append(d_proj / d_orig)
    ratios = np.array(ratios)
    # JL with k=16: expect concentration around 1 — loose 3-sigma band
    assert 0.4 < ratios.mean() < 1.6
    assert (ratios > 0.2).all() and (ratios < 2.5).all()


def test_pca_matches_numpy(spark):
    emb = load_table(spark, SF001, "embeddings")
    model = pca_fit(emb, "embedding", dim=64, k=3)
    scores = pca_transform(emb, model, "embedding", k=3, prefix="pc")
    rows = scores.select("vec_id", "pc1", "pc2", "pc3").collect()
    raw = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    X = np.stack([raw[r["vec_id"]] for r in rows])
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    comps = v[:, order].T.copy()
    for r in comps:
        i = int(np.argmax(np.abs(r)))
        if r[i] < 0:
            r *= -1.0
    expect = (X - mu) @ comps.T
    got = np.array([[r["pc1"], r["pc2"], r["pc3"]] for r in rows])
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-8)


def test_pca_explained_variance_ordering(spark):
    emb = load_table(spark, SF001, "embeddings")
    model = pca_fit(emb, "embedding", dim=64, k=4).collect()[0]
    ev = model["explained"]
    assert len(ev) == 4
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(3))
    assert all(0.0 <= e <= 1.0 for e in ev)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_label_propagation_two_cliques_with_bridge(spark):
    k4a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k4b = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    e = _edges(spark, k4a + k4b + [(4, 5)])
    labels = {r.v: r.label for r in label_propagation(e, max_iterations=10).collect()}
    assert len({labels[v] for v in (1, 2, 3, 4)}) == 1
    assert len({labels[v] for v in (5, 6, 7, 8)}) == 1
    assert labels[1] != labels[5]


def test_label_propagation_deterministic(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    e = _edges(spark, pairs)
    a = sorted((r.v, r.label) for r in label_propagation(e).collect())
    b = sorted((r.v, r.label) for r in label_propagation(e).collect())
    assert a == b
