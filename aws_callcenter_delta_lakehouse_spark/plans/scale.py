"""Scale-pattern queries: operators whose NAIVE formulation works on a
laptop but concentrates data on one task at 100 TB, re-expressed with the
distributed formulation as the registered (and oracle-checked) path.

The reference's engine exposes unpartitioned analytics the same way any
SQL surface does (``SUM() OVER (ORDER BY ...)`` with no PARTITION BY);
these queries prove the engine computes identical answers without ever
planning a single-partition WindowExec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.prefix import global_running_sum
from .registry import query


@query(
    "global_running_revenue",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               OVER (ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_revenue_cents
    FROM orders
    """,
)
def global_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (UNPARTITIONED) running revenue over the full order history
    — the cumulative-bookings curve every finance dashboard wants.

    The oracle is the textbook single-sequence window; the engine side is
    ``operators.prefix.global_running_sum``: range-repartition on the
    order key, per-partition prefix, broadcast offset join. No row ever
    sees a single-partition WindowExec. Revenue is summed in integer
    CENTS (floor(x*100+0.5), trap #3/#8): bigint addition is associative,
    so the two-phase reassociation is bit-identical to DuckDB's
    sequential scan.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    out = global_running_sum(
        orders,
        order_keys=["o_orderdate", "o_orderkey"],
        value_col="__cents",
        out_col="running_revenue_cents",
    )
    return out.select("o_orderkey", "o_orderdate", "running_revenue_cents")


@query(
    "global_running_revenue_arrow",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               OVER (ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_revenue_cents
    FROM orders
    """,
)
def global_running_revenue_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same global prefix sum through the one-shuffle Arrow backend
    (per-partition cumsum carried across batches in ``mapInPandas``),
    oracle-checked against the identical sequential-window SQL — the
    Pandas-tier parity proof for ``global_running_sum``."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    out = global_running_sum(
        orders,
        order_keys=["o_orderdate", "o_orderkey"],
        value_col="__cents",
        out_col="running_revenue_cents",
        backend="arrow",
    )
    return out.select("o_orderkey", "o_orderdate", "running_revenue_cents")
