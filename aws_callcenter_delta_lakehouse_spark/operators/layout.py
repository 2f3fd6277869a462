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


def with_hilbert_key(
    df: DataFrame,
    x: str | Column,
    y: str | Column,
    out: str = "hilbert_key",
    order: int = 16,
) -> DataFrame:
    """Append the Hilbert-curve index of ``(x, y)`` (each taken modulo
    2^order) — the locality-preserving alternative to the Morton code:
    consecutive Hilbert positions are always unit-step neighbors, so
    per-file bounding boxes from a Hilbert sort are tighter than
    Z-order's (no Morton "seam jumps"), which is why newer clustering
    schemes (e.g. liquid-style layouts) prefer it.

    The per-bit-level state recurrence (quadrant flip + swap) is laid
    down as ONE CHAINED PROJECTION PER LEVEL — linear plan size, pure
    integer arithmetic in whole-stage codegen. A single folded
    expression would double in size per level (the next level's x and
    y each reference both previous coordinates), and a struct-fold
    oracle is off the table: DuckDB 1.0's list_reduce miscomputes
    row-varying STRUCT accumulators (scalar accumulators are fine —
    verified), so the oracle mirrors the same chained projections as
    chained CTEs via :func:`hilbert_oracle_sql`.
    """
    n = 1 << order
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    base = [c for c in df.columns]
    cur = df.select(
        *base,
        xc.cast("long").bitwiseAND(F.lit(n - 1)).alias("__hx"),
        yc.cast("long").bitwiseAND(F.lit(n - 1)).alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for k in range(order - 1, -1, -1):
        s = 1 << k
        rx = F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        cur = cur.select(
            *base,
            rx.alias("__rx"),
            ry.alias("__ry"),
            "__hx",
            "__hy",
            "__hd",
        ).select(
            *base,
            F.when(
                F.col("__ry") == 0,
                F.when(
                    F.col("__rx") == 1, F.lit(s - 1) - F.col("__hy")
                ).otherwise(F.col("__hy")),
            )
            .otherwise(F.col("__hx"))
            .alias("__hx"),
            F.when(
                F.col("__ry") == 0,
                F.when(
                    F.col("__rx") == 1, F.lit(s - 1) - F.col("__hx")
                ).otherwise(F.col("__hx")),
            )
            .otherwise(F.col("__hy"))
            .alias("__hy"),
            (
                F.col("__hd")
                + F.lit(s).cast("long")
                * F.lit(s)
                * (F.lit(3) * F.col("__rx")).bitwiseXOR(F.col("__ry"))
            ).alias("__hd"),
        )
    return cur.select(*base, F.col("__hd").alias(out))


def hilbert_oracle_sql(
    src: str, id_cols: str, x_sql: str, y_sql: str, order: int = 16
) -> str:
    """The identical Hilbert index as a DuckDB chained-CTE expression
    (one CTE per bit level, mirroring the engine's chained
    projections)."""
    n = 1 << order
    parts = [
        f"h{order} AS (SELECT {id_cols}, "
        f"CAST({x_sql} AS BIGINT) & {n - 1} AS hx, "
        f"CAST({y_sql} AS BIGINT) & {n - 1} AS hy, "
        f"CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    for k in range(order - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        parts.append(
            f"h{k} AS (SELECT {id_cols}, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hy "
            f"ELSE hy END) ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hx "
            f"ELSE hx END) ELSE hy END AS hy, "
            f"hd + {s} * {s} * xor(3 * {rx}, {ry}) AS hd "
            f"FROM h{k + 1})"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT {id_cols}, hd AS hilbert_key FROM h0"
    )


def hilbert_layout(
    df: DataFrame, x: str, y: str, num_files: int, order: int = 16
) -> DataFrame:
    """Cluster for writing on the Hilbert key: range-partition into
    ``num_files`` files and sort within each — same writer shape as
    :func:`zorder_layout`, tighter per-file boxes."""
    keyed = with_hilbert_key(df, x, y, out="__h", order=order)
    return (
        keyed.repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
    )
