"""Sixth batch: model-based quality filtering, Z-order layout, and
declarative data-quality expectations.

- text_quality_classifier — fastText-shaped hashed-feature linear
  scorer (the model-based quality-filter surface),
- layout_zorder_orders — Morton (Z-order) clustering key over
  (custkey, order day): the Delta OPTIMIZE ZORDER analogue, pure bit
  arithmetic,
- dq_orders_expectations — Delta-Live-Tables-style expectation report:
  per-rule violation counts in ONE aggregate pass.

All three oracle-checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from ..functions.scalars import round_portable
from ..functions.validation import expectation_report
from ..operators.layout import zorder_key, zorder_oracle_expr
from ..operators.text import hashed_linear_quality
from .registry import query


@query(
    "text_quality_classifier",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    s AS (SELECT doc_id, CAST(len(l) AS INT) AS n_words,
                 list_transform(l, x ->
                    (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2001
                     - 1000) / 1000.0) AS wts
          FROM w),
    r AS (SELECT doc_id, n_words, list_sum(wts) / n_words AS raw FROM s)
    SELECT doc_id, n_words,
           floor(raw * 1e4 + 0.5) / 1e4 AS raw_score,
           floor((1.0 / (1.0 + exp(-raw))) * 1e4 + 0.5) / 1e4 AS keep_prob
    FROM r
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality score + sigmoid keep-probability
    per document — zero-shuffle projection, engine-portable weights."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    scored = hashed_linear_quality(docs, "doc_id", "text", buckets=2001)
    return scored.select(
        "doc_id",
        "n_words",
        round_portable(F.col("raw_score"), 4).alias("raw_score"),
        round_portable(F.col("keep_prob"), 4).alias("keep_prob"),
    )


_Z_ORACLE_EXPR = zorder_oracle_expr(
    ["o_custkey", "date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)"]
)


@query(
    "layout_zorder_orders",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                AS BIGINT) AS order_day,
           {_Z_ORACLE_EXPR} AS zkey
    FROM orders
    """,
)
def layout_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key interleaving (o_custkey, days-since-epoch-start) —
    the clustering key a lakehouse writes range-partitioned so per-file
    min/max stats prune on BOTH dimensions. Pure codegen bit math."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        day.alias("order_day"),
        zorder_key([F.col("o_custkey"), day], bits=16).alias("zkey"),
    )


@query(
    "dq_orders_expectations",
    oracle="""
    SELECT 'orderkey_not_null' AS expectation,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS violations,
           CAST(COUNT(*) AS BIGINT) AS total FROM orders
    UNION ALL
    SELECT 'totalprice_positive',
           CAST(SUM(CASE WHEN NOT (o_totalprice > 0)
                          OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           CAST(SUM(CASE WHEN NOT (o_orderstatus IN ('O', 'F', 'P'))
                          OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'priority_format',
           CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                          OR o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orderdate_in_range',
           CAST(SUM(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1992-01-01'
                               AND o_orderdate < TIMESTAMP '1999-01-01')
                          OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM orders
    """,
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule violation dashboard over orders — five expectations,
    ONE aggregate scan (sum(when) per rule, unpivoted driver-free from
    the 1-row aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    return expectation_report(
        orders,
        [
            ("orderkey_not_null", F.col("o_orderkey").isNotNull()),
            ("totalprice_positive", F.col("o_totalprice") > 0),
            ("status_in_domain", F.col("o_orderstatus").isin("O", "F", "P")),
            ("priority_format", F.col("o_orderpriority").rlike("^[1-5]-")),
            (
                "orderdate_in_range",
                (F.col("o_orderdate") >= F.lit("1992-01-01"))
                & (F.col("o_orderdate") < F.lit("1999-01-01")),
            ),
        ],
    )
