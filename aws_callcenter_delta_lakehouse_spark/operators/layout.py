"""Data-layout operators: Z-order clustering keys for multi-column
data skipping.

The reference stores Delta tables partitioned by (year, month)
(01_silver_delta_upsert.py:118-121) — one-dimensional pruning. Delta's
``OPTIMIZE ... ZORDER BY`` generalizes this: interleave the bits of
several columns into one sort key so that range-partitioning + per-file
min/max statistics prune on EVERY interleaved column, not just the
leading one. This module computes the key with pure integer bit
arithmetic (whole-stage-codegen; no UDF) — writing is just
``repartitionByRange(zkey).sortWithinPartitions(zkey)``.

At 100 TB this is the difference between scanning a full date partition
and scanning the handful of files whose (custkey, date) rectangles
intersect the query box; the skip-effectiveness test in
tests/test_layout.py measures per-file span shrinkage directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (masked, so
    out-of-range values wrap rather than error) into a single Morton
    code. Column j's bit b lands at position ``b * len(cols) + j``.
    Unrolled into ``bits * len(cols)`` codegen-friendly integer terms —
    no loop at runtime, no shuffle, no UDF."""
    m = len(cols)
    z: Column = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * m + j
            )
    return z


def zorder_oracle_expr(col_sqls: list[str], bits: int = 16) -> str:
    """The identical Morton code as a DuckDB SQL expression (generated
    once at import; the oracle string stays static)."""
    m = len(col_sqls)
    terms = []
    for j, c in enumerate(col_sqls):
        v = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(f"((({v} >> {b}) & 1) << {b * m + j})")
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame, cols: list[str], num_files: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Morton key
    into ``num_files`` output files and sort within each, so per-file
    min/max statistics are tight on every clustered column."""
    keyed = df.withColumn("__z", zorder_key([F.col(c) for c in cols], bits))
    return (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
