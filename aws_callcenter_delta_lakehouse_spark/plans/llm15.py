"""Round-4 batch 3: SQL pipe syntax (Spark 4 `|>` operator chains),
Welch two-sample t-test A/B battery. Oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_all
from ..functions.scalars import round_portable
from .registry import query


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           floor(SUM(l_extendedprice) * 1e2 + 0.5) / 1e2 AS revenue
    FROM lineitem
    WHERE l_quantity > 10
    GROUP BY 1, 2
    HAVING COUNT(*) > 100
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe-operator syntax (`|>`, Spark 4's linear query chaining
    — filter |> aggregate |> post-filter reads top-to-bottom instead of
    inside-out). Same Catalyst plan as the ANSI equivalent the oracle
    runs; purely a SQL-surface parity row."""
    register_all(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 10
        |> AGGREGATE COUNT(*) AS n_rows,
                     floor(SUM(l_extendedprice) * 1e2 + 0.5) / 1e2 AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_rows > 100
        """
    )


@query(
    "ab_test_welch_t",
    oracle="""
    WITH s AS (
      SELECT
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_a,
        CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_b,
        floor(AVG(CASE WHEN event_type = 'purchase' THEN value END) * 1e6 + 0.5) / 1e6 AS mean_a,
        floor(AVG(CASE WHEN event_type = 'view' THEN value END) * 1e6 + 0.5) / 1e6 AS mean_b,
        floor(var_samp(CASE WHEN event_type = 'purchase' THEN value END) * 1e6 + 0.5) / 1e6 AS var_a,
        floor(var_samp(CASE WHEN event_type = 'view' THEN value END) * 1e6 + 0.5) / 1e6 AS var_b
      FROM events)
    SELECT n_a, n_b, mean_a, mean_b,
           floor((mean_a - mean_b)
                 / sqrt(var_a / n_a + var_b / n_b) * 1e4 + 0.5) / 1e4 AS t_stat,
           floor(
             (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
             / ( (var_a / n_a) * (var_a / n_a) / (n_a - 1)
               + (var_b / n_b) * (var_b / n_b) / (n_b - 1) )
             * 1e2 + 0.5) / 1e2 AS df_welch
    FROM s
    """,
)
def ab_test_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic + Welch-Satterthwaite degrees of
    freedom comparing purchase vs view event values — the A/B-test
    primitive, computed in ONE aggregate pass over the fact (conditional
    moments), no per-group subqueries. Cross-engine determinism: the
    moments are rounded FIRST, then both engines evaluate the identical
    closed-form expression on identical doubles."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    a = F.when(F.col("event_type") == "purchase", F.col("value"))
    b = F.when(F.col("event_type") == "view", F.col("value"))
    s = ev.agg(
        F.count(a).alias("n_a"),
        F.count(b).alias("n_b"),
        round_portable(F.avg(a), 6).alias("mean_a"),
        round_portable(F.avg(b), 6).alias("mean_b"),
        round_portable(F.var_samp(a), 6).alias("var_a"),
        round_portable(F.var_samp(b), 6).alias("var_b"),
    )
    se2_a = F.col("var_a") / F.col("n_a")
    se2_b = F.col("var_b") / F.col("n_b")
    pooled = se2_a + se2_b
    return s.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        round_portable(
            (F.col("mean_a") - F.col("mean_b")) / F.sqrt(pooled), 4
        ).alias("t_stat"),
        round_portable(
            pooled * pooled
            / (
                se2_a * se2_a / (F.col("n_a") - 1)
                + se2_b * se2_b / (F.col("n_b") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


def _hilbert_oracle() -> str:
    from ..operators.layout import hilbert_oracle_sql

    return hilbert_oracle_sql(
        "orders", "o_orderkey", "o_orderkey % 1024", "o_custkey % 1024", order=10
    )


@query("layout_hilbert_orders", oracle=_hilbert_oracle())
def layout_hilbert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (orderkey, custkey) —
    operators/layout.py:with_hilbert_key, one chained integer
    projection per bit level (no UDF, no shuffle); the locality-
    preserving alternative to the Morton key whose per-file boxes a
    range-partitioned write keeps tighter. Oracle = the same recurrence
    as chained CTEs (DuckDB's struct-fold lambda miscomputes, so both
    engines unroll)."""
    from ..operators.layout import with_hilbert_key

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    keyed = with_hilbert_key(
        orders,
        F.col("o_orderkey") % 1024,
        F.col("o_custkey") % 1024,
        order=10,
    )
    return keyed.select("o_orderkey", "hilbert_key")
