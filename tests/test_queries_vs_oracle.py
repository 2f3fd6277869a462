"""Differential test: every registered query with an oracle must match
DuckDB at sf=0.01 (the driver's t2 gate, run locally)."""

from __future__ import annotations

import pytest

from aws_callcenter_delta_lakehouse_spark.plans.all import REGISTRY
from tests.conftest import SF01
from tests.oracle import compare, duckdb_conn

WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF01)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    compare(spec.fn(spark, SF01), con, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF01)
    assert df.count() >= 0
    assert len(df.schema) > 0
