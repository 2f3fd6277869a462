"""Relational operator inventory as named, oracle-checked queries.

Covers SURVEY.md §2 over the testdata star schema: projections/filters
(P1-P11), aggregates (A1-A8 + engine extensions), joins (J1 gap-fill:
broadcast/semi/anti/outer/non-equi), windows (§2.5 gap-fill), set ops
(§2.7 gap-fill), sorts/top-k (O1-O4) and scalar functions (F1-F9).
Reference citations in each docstring point at the operator being
re-expressed; the testdata tables stand in for the call-center data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_portable
from .registry import query


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2)
# ---------------------------------------------------------------------------


@query(
    "projection_pruning",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def projection_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: column-pruning projection + pushed filter
    (02_gold_analytics.py:35-38). Both the projection and the predicate
    must reach the parquet scan (ReadSchema/PushedFilters)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < "1996-01-01")
        .select("l_orderkey", "l_extendedprice")
    )


@query(
    "derived_projection",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS event_hour,
           value * 2 AS value_x2
    FROM events
    """,
)
def derived_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3: withColumn derived-column projections
    (02_gold_analytics.py:36-42, 01_silver_delta_upsert.py:83-84)."""
    return (
        load_table(spark, sf_dir, "events")
        .withColumns(
            {"event_hour": F.hour("ts"), "value_x2": F.col("value") * 2}
        )
        .select("event_id", "event_hour", "value_x2")
    )


_EVENT_TYPES_SQL = "('CLICK','ERROR','PURCHASE','SIGNUP','VIEW')"

_VALIDATION_ORACLE_EXPR = """
    NULLIF(concat_ws(' | ',
        CASE WHEN user_id IS NULL THEN 'user_id must not be NULL' END,
        CASE WHEN event_type IS NULL THEN 'event_type must not be NULL'
             WHEN upper(event_type) NOT IN {types} THEN 'invalid event_type values' END,
        CASE WHEN value IS NULL THEN 'value must not be NULL'
             WHEN value < 1 THEN 'value below minimum' END
    ), '')
""".format(types=_EVENT_TYPES_SQL)


def _validated_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DQ rule fold (01_silver_delta_upsert.py:48-78):
    per-column when-chains -> concat_ws ' | ' -> empty-string marker ->
    NULL Reject_reason means valid (quirks Q1/Q2, SURVEY §2.10)."""
    df = load_table(spark, sf_dir, "events")
    all_errors = F.concat_ws(
        " | ",
        F.when(F.col("user_id").isNull(), "user_id must not be NULL"),
        F.when(F.col("event_type").isNull(), "event_type must not be NULL").when(
            ~F.upper(F.col("event_type")).isin(
                ["CLICK", "ERROR", "PURCHASE", "SIGNUP", "VIEW"]
            ),
            "invalid event_type values",
        ),
        F.when(F.col("value").isNull(), "value must not be NULL").when(
            F.col("value") < 1, "value below minimum"
        ),
    )
    return df.withColumn(
        "Reject_reason", F.when(all_errors == "", None).otherwise(all_errors)
    )


@query(
    "validation_valid_split",
    oracle=f"""
    SELECT event_id FROM events
    WHERE {_VALIDATION_ORACLE_EXPR} IS NULL
    """,
)
def validation_valid_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (valid branch): filter(Reject_reason.isNull())
    (01_silver_delta_upsert.py:91)."""
    return (
        _validated_events(spark, sf_dir)
        .filter(F.col("Reject_reason").isNull())
        .select("event_id")
    )


@query(
    "validation_invalid_split",
    oracle=f"""
    SELECT event_id, {_VALIDATION_ORACLE_EXPR} AS Reject_reason FROM events
    WHERE {_VALIDATION_ORACLE_EXPR} IS NOT NULL
    """,
)
def validation_invalid_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (invalid branch) + F1/F2/F3: the folded Reject_reason message
    (01_silver_delta_upsert.py:50-78, 92)."""
    return (
        _validated_events(spark, sf_dir)
        .filter(F.col("Reject_reason").isNotNull())
        .select("event_id", "Reject_reason")
    )


@query(
    "comparison_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def comparison_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: comparison predicate (02_gold_analytics.py:43)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "regex_predicate",
    oracle="""
    SELECT doc_id FROM documents
    WHERE regexp_matches(text, '^key .*table')
    """,
)
def regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: rlike regex predicate (01_silver_delta_upsert.py:48,53)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("^key .*table"))
        .select("doc_id")
    )


@query(
    "membership_predicate",
    oracle="""
    SELECT event_id, event_type FROM events
    WHERE upper(event_type) IN ('PURCHASE', 'SIGNUP', 'VIEW')
    """,
)
def membership_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: F.upper(col).isin([...]) (01_silver_delta_upsert.py:49,73)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.upper(F.col("event_type")).isin(["PURCHASE", "SIGNUP", "VIEW"]))
        .select("event_id", "event_type")
    )


@query(
    "case_sensitivity_counts",
    oracle="""
    SELECT CAST(SUM(CASE WHEN event_type = 'PURCHASE' THEN 1 ELSE 0 END) AS BIGINT) AS sensitive_count,
           CAST(SUM(CASE WHEN upper(event_type) = 'PURCHASE' THEN 1 ELSE 0 END) AS BIGINT) AS insensitive_count
    FROM events
    """,
)
def case_sensitivity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quirk Q3 (SURVEY §2.10): validation is case-insensitive but Gold
    counting is case-sensitive equality (02_gold_analytics.py:57)."""
    return load_table(spark, sf_dir, "events").agg(
        F.sum(F.when(F.col("event_type") == "PURCHASE", 1).otherwise(0)).alias(
            "sensitive_count"
        ),
        F.sum(F.when(F.upper(F.col("event_type")) == "PURCHASE", 1).otherwise(0)).alias(
            "insensitive_count"
        ),
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4 + extensions)
# ---------------------------------------------------------------------------


@query(
    "distinct_count",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
    FROM orders
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension: exact distinct aggregate (SURVEY §2.4 gap row)."""
    return load_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "rollup_aggregate",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((SUM(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension: hierarchical ROLLUP grouping sets (SURVEY §2.4 gap row)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round_portable(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n_rows"))
    )


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((SUM(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty,
           floor((SUM(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_base_price,
           floor((SUM(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2 AS sum_disc_price,
           floor((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 1e2 + 0.5) / 1e2 AS sum_charge,
           floor((AVG(l_quantity)) * 1e2 + 0.5) / 1e2 AS avg_qty,
           floor((AVG(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS avg_price,
           floor((AVG(l_discount)) * 1e4 + 0.5) / 1e4 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3/A5 at full width — TPC-H Q1 shape: the canonical multi-agg
    hash aggregate the engine's Gold layer generalizes."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        round_portable(F.sum("l_quantity"), 2).alias("sum_qty"),
        round_portable(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        round_portable(F.sum(disc), 2).alias("sum_disc_price"),
        round_portable(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        round_portable(F.avg("l_quantity"), 2).alias("avg_qty"),
        round_portable(F.avg("l_extendedprice"), 2).alias("avg_price"),
        round_portable(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3 — engine surface beyond the MERGE-internal join)
# ---------------------------------------------------------------------------


@query(
    "join_broadcast_star",
    oracle="""
    SELECT r_name,
           COUNT(*) AS n_customers,
           floor((AVG(c_acctbal)) * 1e2 + 0.5) / 1e2 AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join with explicit broadcast of the small dims —
    at 100 TB the fact side never shuffles for dimension joins."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            round_portable(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


@query(
    "join_fact_revenue",
    oracle="""
    SELECT o_orderpriority,
           floor((SUM(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2 AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large equi-join (orders x lineitem) + aggregate. Shuffles once on
    the join key; AQE picks broadcast automatically when one side fits."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            round_portable(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — SURVEY §2.3 gap row."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — also the unmatched-target half of the
    MERGE emulation (SURVEY §7.4)."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving customers with zero orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_nonequi",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY p_brand
    """,
)
def join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta conjunct join (SURVEY §2.3 gap row). The equi conjunct
    keeps it a hash join; the theta term is a post-join filter — the
    100 TB-safe way to write range-ish predicates."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            part,
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_quantity") > F.col("p_size")),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5 — engine surface; none in the reference)
# ---------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, rn FROM (
        SELECT c_mktsegment, c_custkey,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ROW_NUMBER — the scalable 'top agents per day'
    extension of sql/athena_queries.sql:45-51 (SURVEY §2.5)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           floor((SUM(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1e2 + 0.5) / 1e2 AS running_qty
    FROM lineitem
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit ROWS frame (deterministic
    tie-break on (shipdate, orderkey, linenumber))."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        round_portable(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


@query(
    "window_lag",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_id) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_event_id
    FROM events
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG over per-user event time (sessionization building block)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.lag("event_id").over(w).alias("prev_event_id")
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7 — engine surface)
# ---------------------------------------------------------------------------


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — ``subtract``, not ``exceptAll``:
    the latter is bag semantics and keeps surplus duplicates. The
    supplier side is filtered so the difference is non-empty at test SFs."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return _cust_nations(spark, sf_dir).subtract(supp)


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# ---------------------------------------------------------------------------


@query(
    "json_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access (§2.8 extension row: events.props)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@query(
    "seconds_of_day",
    oracle="""
    SELECT event_id,
           EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) * 3600
           + EXTRACT(minute FROM CAST(ts AS TIMESTAMP)) * 60
           + CAST(EXTRACT(second FROM date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT)
           AS sec_of_day
    FROM events
    """,
)
def seconds_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: unix_timestamp(col, 'HH:mm:ss') time-of-day parsing
    (02_gold_analytics.py:41-42) — round-trips ts through the reference's
    exact format string."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_timestamp(F.date_format("ts", "HH:mm:ss"), "HH:mm:ss").alias(
            "sec_of_day"
        ),
    )


@query(
    "date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day
    FROM orders
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: year()/month() partition stamps (01_silver_delta_upsert.py:83-84)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
                FROM customer GROUP BY 1),
    sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
           FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join preserving unmatched rows from both sides (the
    MERGE decomposition primitive, SURVEY §2.3 J1)."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cn.join(sn, on="nationkey", how="full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )
