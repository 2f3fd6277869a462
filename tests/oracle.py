"""Local replica of the driver's DuckDB differential correctness gate.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column-name set, and (order-insensitive)
values. Mirrors ``__spark_entry__`` semantics so a green run here
predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from aws_callcenter_delta_lakehouse_spark.catalog import TPCH_TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype(float).round(6)
        elif s.dtype == object:
            first = s.dropna().iloc[0] if s.notna().any() else None
            if hasattr(first, "isoformat"):
                out[c] = s.map(lambda v: None if v is None else pd.Timestamp(v).strftime("%Y-%m-%dT%H:%M:%S.%f"))
            elif isinstance(first, (list, tuple)) or type(first).__name__ == "ndarray":
                out[c] = s.map(lambda v: None if v is None else str([round(float(x), 6) for x in v]))
            else:
                out[c] = s.astype(str).where(s.notna(), None)
        else:
            out[c] = s
    res = pd.DataFrame(out)
    res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)
    return res


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"):
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, want.columns)), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    got.columns = [c.lower() for c in got.columns]
    want.columns = [c.lower() for c in want.columns]
    g, w = _canon(got), _canon(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9, obj=name)
