"""k-core peeling: exact structure on handcrafted graphs."""

from __future__ import annotations

import pytest

from aws_callcenter_delta_lakehouse_spark.operators.components import (
    ConvergenceError,
    kcore,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_triangle_with_tail_2core(spark):
    # triangle 1-2-3 plus tail 3-4: the 2-core is exactly the triangle
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    core = {r.vertex: r.degree for r in kcore(e, k=2).collect()}
    assert set(core) == {1, 2, 3}
    assert all(d == 2 for d in core.values())


def test_k4_survives_3core_tails_dont(spark):
    # complete K4 on 1..4, plus pendant chains hanging off it
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _edges(spark, k4 + [(4, 5), (5, 6), (6, 7)])
    core3 = {r.vertex for r in kcore(e, k=3).collect()}
    assert core3 == {1, 2, 3, 4}
    # 2-core: the chain is still degree-1 after symmetrization -> only K4
    core2 = {r.vertex for r in kcore(e, k=2).collect()}
    assert core2 == {1, 2, 3, 4}


def test_empty_core(spark):
    # a path has no 2-core
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert kcore(e, k=2).count() == 0


def test_cascading_peel(spark):
    # 1-2-3 triangle; removing pendant 4 drops 3's degree but the
    # triangle still stands; then attach 5 to make 4's removal cascade:
    # chain 4-5 peels in two rounds
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    core = {r.vertex for r in kcore(e, k=2).collect()}
    assert core == {1, 2, 3}


def test_self_loops_ignored(spark):
    e = _edges(spark, [(1, 1), (1, 2), (2, 3), (1, 3)])
    core = {r.vertex for r in kcore(e, k=2).collect()}
    assert core == {1, 2, 3}
