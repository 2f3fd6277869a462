"""Driver-contract smoke: entry() returns >0 rows with a stable schema."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_flagship(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert "total_calls" in df.columns


def test_contract_shapes(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert e.FLAGSHIP in qs
    assert set(oracles) <= set(qs)
