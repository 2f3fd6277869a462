"""Third relational batch: the full window-function battery, datetime
functions, TPC-H Q18 (grouped-HAVING IN-subquery), and a funnel
conversion query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, register_all
from ..functions.scalars import round_portable
from .registry import query


@query(
    "window_ranking_battery",
    oracle="""
    SELECT o_orderkey, o_custkey,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           CAST(floor(PERCENT_RANK() OVER w * 1e4 + 0.5) / 1e4 AS DOUBLE) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank over a deterministic
    per-customer ordering."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        round_portable(F.percent_rank().over(w), 4).alias("pct_rank"),
    )


@query(
    "window_value_battery",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_order,
           LEAD(o_orderkey) OVER w AS next_order,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_value_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value (full frame) / lead / nth_value."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING)
           AS n_similar_priced
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers within +-50k of each order's price (value-based
    frame, not row-based)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, 50000)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_similar_priced"),
    )


@query(
    "datetime_battery",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(EXTRACT(isodow FROM o_orderdate) AS INTEGER) AS iso_weekday,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
    FROM orders
    """,
)
def datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / add_months / last_day / weekday / quarter / datediff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus_3m"),
        F.last_day("o_orderdate").alias("month_end"),
        F.weekday("o_orderdate").cast("int").alias("iso_weekday_0based"),
        F.quarter("o_orderdate").alias("qtr"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    ).withColumn("iso_weekday", F.col("iso_weekday_0based") + 1).drop(
        "iso_weekday_0based"
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c_custkey, o_orderkey,
           floor((SUM(l_quantity)) * 1e2 + 0.5) / 1e2 AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN-subquery over a grouped HAVING (plans as a
    semi-join against the aggregated subquery)."""
    register_all(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey,
               floor((SUM(l_quantity)) * 1e2 + 0.5) / 1e2 AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150)
        GROUP BY c_custkey, o_orderkey
        """
    )


@query(
    "funnel_view_to_purchase",
    oracle="""
    WITH per_user_day AS (
        SELECT CAST(ts AS DATE) AS event_date, user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
        FROM events GROUP BY 1, 2)
    SELECT event_date,
           CAST(SUM(viewed) AS BIGINT) AS n_viewers,
           CAST(SUM(CASE WHEN viewed = 1 AND purchased = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CASE WHEN SUM(viewed) > 0
                THEN floor((SUM(CASE WHEN viewed = 1 AND purchased = 1 THEN 1 ELSE 0 END) * 100.0
                           / SUM(viewed)) * 1e2 + 0.5) / 1e2
                ELSE 0.0 END AS conversion_pct
    FROM per_user_day GROUP BY event_date
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage funnel: per-day share of viewers who also purchased —
    the conditional-count pattern (A4) composed over a per-user rollup."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("event_date"), "user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "viewed"
            ),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "purchased"
            ),
        )
    )
    converted = F.sum(
        F.when((F.col("viewed") == 1) & (F.col("purchased") == 1), 1).otherwise(0)
    )
    return per_user.groupBy("event_date").agg(
        F.sum("viewed").alias("n_viewers"),
        converted.alias("n_converted"),
        F.when(
            F.sum("viewed") > 0,
            round_portable(converted * 100.0 / F.sum("viewed"), 2),
        )
        .otherwise(F.lit(0.0))
        .alias("conversion_pct"),
    )


@query(
    "profile_lineitem",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_nonnull,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           floor((MIN(l_quantity)) * 1e4 + 0.5) / 1e4 AS min_value,
           floor((MAX(l_quantity)) * 1e4 + 0.5) / 1e4 AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount), COUNT(DISTINCT l_discount),
           floor((MIN(l_discount)) * 1e4 + 0.5) / 1e4,
           floor((MAX(l_discount)) * 1e4 + 0.5) / 1e4
    FROM lineitem
    """,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (DQ observability): row/non-null/distinct counts
    + min/max per numeric column, one output row per column — the
    monitoring companion to the validation rule engine."""
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("column_name"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            round_portable(F.min(col), 4).alias("min_value"),
            round_portable(F.max(col), 4).alias("max_value"),
        )

    return profile("l_quantity").unionByName(profile("l_discount"))
