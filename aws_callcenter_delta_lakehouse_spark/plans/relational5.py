"""Fifth relational batch: the modern SQL surface Spark 4 added on top
of the reference's Athena dialect — recursive CTEs, SQL pipe syntax,
LISTAGG, aggregate FILTER clauses, LIMIT/OFFSET pagination, null-safe
equality joins, and GROUP BY ALL / ORDER BY ALL.

The reference's query layer is five Athena SQL statements
(`/root/reference/athena_queries.sql`); these queries extend the same
catalog-backed SQL surface (capability extension, not a port).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_all
from ..functions.scalars import round_portable
from .registry import query


@query(
    "sql_recursive_cte_months",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT m.m AS month,
           COUNT(o.o_orderkey) AS n_orders,
           floor(COALESCE(SUM(o.o_totalprice), 0) * 100 + 0.5) / 100 AS revenue
    FROM months m LEFT JOIN orders o ON month(o.o_orderdate) = m.m
    GROUP BY m.m
    ORDER BY month
    """,
)
def sql_recursive_cte_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4): a recursively generated 1..12 month
    spine LEFT JOINed to order revenue — months with no orders survive
    with zero revenue, which a plain GROUP BY over the fact table drops.
    The recursion materializes 12 rows on the driver side of the plan;
    the fact scan and aggregate stay distributed."""
    register_all(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12
        )
        SELECT m.m AS month,
               COUNT(o.o_orderkey) AS n_orders,
               floor(COALESCE(SUM(o.o_totalprice), 0) * 100 + 0.5) / 100 AS revenue
        FROM months m LEFT JOIN orders o ON month(o.o_orderdate) = m.m
        GROUP BY m.m
        ORDER BY month
        """
    )


@query(
    "sql_pipe_priority_totals",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           floor(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_priority_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the same logical plan as a nested
    SELECT, written as a linear |> dataflow. Compiles to an identical
    Catalyst plan — filter pushdown and partial aggregation are
    unchanged."""
    register_all(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     floor(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    ).select("o_orderpriority", "n_orders", "total")


@query(
    "sql_listagg_region_nations",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def sql_listagg_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (Spark 4): ordered string concatenation
    per group — deterministic because the within-group ORDER BY is a
    unique key. (DuckDB spells it string_agg.)"""
    register_all(spark, sf_dir, ["region", "nation"])
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations,
               COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
        """
    )


@query(
    "sql_filter_clause_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           floor(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0)
                 * 100 + 0.5) / 100 AS filled_revenue
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_filter_clause_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clauses — the ANSI spelling of the
    sum(when(...)) conditional-count idiom the Gold job uses
    (`/root/reference/glue_jobs/02_gold_analytics.py` success/failure
    counts). One scan, N conditional aggregates, map-side partials."""
    register_all(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               floor(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0)
                     * 100 + 0.5) / 100 AS filled_revenue
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "sql_order_offset_page",
    oracle="""
    SELECT o_orderkey, o_custkey,
           floor(o_totalprice * 100 + 0.5) / 100 AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def sql_order_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (page 3 of 20) with a unique tie-break so
    the page boundary is deterministic. Spark plans OFFSET+LIMIT as a
    single bounded TakeOrderedAndProject — no full sort materializes."""
    register_all(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               floor(o_totalprice * 100 + 0.5) / 100 AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH c AS (SELECT NULLIF(c_nationkey % 5, 0) AS k, COUNT(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT NULLIF(s_nationkey % 5, 0) AS k, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT c.k AS k, c.n_cust AS n_cust, s.n_supp AS n_supp
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping, so the NULL bucket
    survives the join. Stays a hash join (null-safe equality is still an
    equi-join key for the shuffle)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("ks"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, cust["k"].eqNullSafe(supp["ks"])).select(
        "k", "n_cust", "n_supp"
    )


@query(
    "sql_group_order_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — group on every non-aggregate output
    column, order on every output column (deterministic here because the
    grouping key set is unique per row)."""
    register_all(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "sql_session_variables",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           floor(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_totalprice > 50000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4): DECLARE + SET VARIABLE hold the
    query's parameters server-side; the query references them like a
    prepared statement. Variables fold to literals at analysis time, so
    predicate pushdown/partition pruning see constants — the plan is
    identical to hand-inlined literals (the oracle inlines them).
    Parameterization surface the reference gets from Athena's execution
    parameters."""
    register_all(spark, sf_dir, ["orders"])
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff_date DATE")
    spark.sql("DECLARE OR REPLACE VARIABLE min_price DOUBLE")
    spark.sql("SET VARIABLE cutoff_date = DATE '1996-01-01'")
    spark.sql("SET VARIABLE min_price = 50000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               floor(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue
        FROM orders
        WHERE o_orderdate >= cutoff_date AND o_totalprice > min_price
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 2
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4): a SQL string executed with named
    parameter markers bound at run time — the dynamic-SQL surface
    (Athena's parameterized queries) without string interpolation, so
    the parameter can never inject syntax. The bound value reaches the
    optimizer as a literal: pushdown and join planning are unaffected."""
    register_all(spark, sf_dir, ["customer", "nation"])
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT n_name, COUNT(*) AS n_customers
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE n_regionkey = :rk
           GROUP BY n_name
           ORDER BY n_name'
          USING 2 AS rk
        """
    )


@query(
    "sql_lateral_topn_per_region",
    oracle="""
    SELECT r.r_name, t.n_name, t.n_customers
    FROM region r, LATERAL (
        SELECT n.n_name, COUNT(c.c_custkey) AS n_customers
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n.n_name
        LIMIT 2
    ) t
    """,
)
def sql_lateral_topn_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True correlated LATERAL join (Spark 4): per outer region row, a
    dependent subquery computes its top-2 nations by customer count.
    Catalyst decorrelates this into a ranked window over one grouped
    aggregate — the same plan as a hand-written row_number() formulation
    — rather than re-executing the subquery per region. The modern SQL
    replacement for loop-over-regions client code."""
    register_all(spark, sf_dir, ["region", "nation", "customer"])
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_customers
        FROM region r, LATERAL (
            SELECT n.n_name, COUNT(c.c_custkey) AS n_customers
            FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
            ORDER BY n_customers DESC, n.n_name
            LIMIT 2
        ) t
        """
    )


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 4): a table name supplied as a BOUND
    PARAMETER instead of string-concatenated SQL — the safe form of
    dynamic-table dispatch (multi-tenant table routing) that cannot
    inject syntax. Resolves at analysis time, so the plan is identical
    to the static query."""
    register_all(spark, sf_dir, ["nation"])
    return spark.sql(
        """
        SELECT n_regionkey, COUNT(*) AS n_nations
        FROM IDENTIFIER(:tbl)
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """,
        args={"tbl": "nation"},
    )


@query(
    "sql_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100
             AS disc_price
    FROM lineitem
    WHERE l_discount > 0.05
    """,
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN
    expr): the discounted-price business rule lives in the catalog, not
    in client code. The body INLINES into the calling plan at analysis
    time — whole-stage codegen, predicate pushdown, and costing all see
    the raw expression, so a catalog UDF costs nothing vs hand-inlined
    SQL (unlike a Python UDF, which would wall off the optimizer)."""
    register_all(spark, sf_dir, ["lineitem"])
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN floor(p * (1.0 - d) * 100 + 0.5) / 100
        """
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               disc_price(l_extendedprice, l_discount) AS disc_price
        FROM lineitem
        WHERE l_discount > 0.05
        """
    )


@query(
    "sql_udf_table",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    WHERE n_regionkey = 1
    GROUP BY n_name
    """,
)
def sql_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table function (CREATE FUNCTION ... RETURNS TABLE): a
    parameterized relation — suppliers-per-nation for a given region —
    invoked in FROM position. The body inlines as a parameterized view,
    so the join strategy and pushdown are identical to the expanded
    query; parameters bind in WHERE (a parameterized LIMIT is rejected
    as unfoldable, which the engine surfaces at CREATE time)."""
    register_all(spark, sf_dir, ["nation", "supplier"])
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION region_suppliers(rk BIGINT)
        RETURNS TABLE (n_name STRING, n_suppliers BIGINT)
        RETURN SELECT n_name, CAST(COUNT(*) AS BIGINT)
               FROM nation JOIN supplier ON s_nationkey = n_nationkey
               WHERE n_regionkey = rk
               GROUP BY n_name
        """
    )
    return spark.sql("SELECT * FROM region_suppliers(1)")


@query(
    "collation_case_insensitive_group",
    oracle="""
    SELECT lower(o_orderpriority) AS prio,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY lower(o_orderpriority)
    ORDER BY prio
    """,
)
def collation_case_insensitive_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): group under UTF8_LCASE so case
    variants land in one group WITHOUT rewriting every predicate with
    lower() — collation travels with the type, so joins, GROUP BY and
    equality all follow it. The input deliberately scrambles case by
    row; the output key is lowercased explicitly because the collated
    group REPRESENTATIVE (which original casing survives) is
    partition-order-dependent — only the grouping itself is the
    collation's job."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority")
        )
        .otherwise(F.lower("o_orderpriority"))
        .alias("p")
    )
    return (
        o.groupBy(F.collate("p", "UTF8_LCASE").alias("k"))
        .agg(F.count("*").alias("n"))
        .select(F.lower("k").cast("string").alias("prio"), "n")
        .orderBy("prio")
    )


@query(
    "hof_exists_forall_zip",
    oracle="""
    WITH qs AS (
        SELECT l_orderkey,
               list(CAST(l_quantity AS BIGINT) ORDER BY l_linenumber, l_quantity) AS q
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(q) AS n_lines,
           len(list_filter(q, x -> x >= 45)) > 0 AS has_big,
           len(list_filter(q, x -> NOT (x > 0))) = 0 AS all_positive,
           COALESCE(list_sum(list_filter(q, x -> x >= 40)), 0) AS sum_big,
           list_sum(list_transform(range(1, len(q) + 1),
                                   i -> i * q[i])) AS idx_weighted
    FROM qs
    """,
)
def hof_exists_forall_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function completeness battery: exists / forall /
    filter+aggregate / zip_with over per-order quantity arrays (built
    with a deterministic in-array order via sorted structs). All
    JVM-side lambdas inside whole-stage codegen; the only shuffle is
    the one collect_list aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("q")
    )
    qs = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "q"))),
            lambda s: s["q"],
        ).alias("q")
    )
    idx = F.sequence(F.lit(1), F.size("q"))
    return qs.select(
        "l_orderkey",
        F.size("q").cast("long").alias("n_lines"),
        F.exists("q", lambda x: x >= 45).alias("has_big"),
        F.forall("q", lambda x: x > 0).alias("all_positive"),
        F.aggregate(
            F.filter("q", lambda x: x >= 40),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_big"),
        F.aggregate(
            F.zip_with(idx, F.col("q"), lambda i, x: i * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("idx_weighted"),
    )


@query(
    "ansi_try_battery",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE floor(o_totalprice / (o_orderkey % 10) * 100 + 0.5) / 100
           END AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit
    FROM orders
    """,
)
def ansi_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety surface: Spark 4 runs with ANSI ON, so division
    by zero and bad casts THROW unless the ``try_`` forms are used —
    the exact failure mode trap #4/#9 documents. try_divide returns
    NULL on the zero rows, try_cast NULL on the unparseable priority
    strings but parses the leading digit — each NULL a row a non-try
    formulation would have killed the whole job with."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        round_portable(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 10), 2
        ).alias("safe_div"),
        F.try_to_number(F.col("o_orderpriority"), F.lit("9")).cast("int").alias(
            "bad_cast"
        ),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
    )


@query(
    "histogram_width_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 25
                ELSE CAST(floor(o_totalprice / 25000.0) AS BIGINT) + 1
           END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           floor(MIN(o_totalprice) * 100 + 0.5) / 100 AS lo,
           floor(MAX(o_totalprice) * 100 + 0.5) / 100 AS hi
    FROM orders
    GROUP BY 1
    """,
)
def histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the profiling scan every
    BI layer runs first. One hash aggregate on the bucket id (24 groups
    + underflow/overflow buckets), exact min/max per bucket for the
    rendered ranges. At 100 TB this is a single map-side-combined pass;
    the bucket count, not the row count, bounds the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(24)
            ).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            round_portable(F.min("o_totalprice"), 2).alias("lo"),
            round_portable(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
