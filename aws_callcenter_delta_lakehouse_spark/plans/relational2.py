"""Second relational batch: reshaping (pivot/unpivot/cube/grouping
sets), percentiles, the spark.sql surface (CTE / EXISTS / correlated
subquery / HAVING — the engine's Athena-equivalent SQL entry point,
SURVEY.md §3.3), and scalar string/array/null-handling functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_all, register_persistent
from ..functions.scalars import round_portable
from .registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# ---------------------------------------------------------------------------
# Reshaping
# ---------------------------------------------------------------------------


@query(
    "pivot_event_counts",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per event type (engine extension of the
    reference's manual pivot-style conditional counts, A4)."""
    df = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("event_date"), "event_type")
        .groupBy("event_date")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    # absent (date, type) combos pivot to NULL; the SQL formulation says 0
    return df.select(
        "event_date",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


@query(
    "unpivot_daily_metrics",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               COUNT(*) AS total, CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        FROM events GROUP BY 1)
    SELECT event_date, 'total' AS metric, total AS metric_value FROM daily
    UNION ALL
    SELECT event_date, 'purchases' AS metric, purchases AS metric_value FROM daily
    """,
)
def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide metrics -> long (metric, value) rows."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "purchases"
            ),
        )
    )
    return daily.unpivot(
        "event_date", ["total", "purchases"], "metric", "metric_value"
    )


@query(
    "cube_aggregate",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "catalog_persistent_table",
    oracle="""
    SELECT n.n_regionkey, r.r_name, COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_regionkey, r.r_name
    """,
)
def catalog_persistent_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metastore-backed tables (Glue Catalog analogue): register dims
    persistently via saveAsTable, then query through
    ``spark.table("lakehouse.x")`` — the cross-session catalog surface
    the reference gets from Glue+Athena."""
    register_persistent(spark, sf_dir, ["nation", "region"])
    nation = spark.table("lakehouse.nation")
    region = spark.table("lakehouse.region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("n_regionkey", "r_name")
        .agg(F.count("*").alias("n_nations"))
    )


@query(
    "sql_events_hourly",
    oracle="""
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
           COUNT(*) AS n_events,
           floor(SUM(value) * 1e2 + 0.5) / 1e2 AS total_value
    FROM events
    GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
    """,
)
def sql_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup via spark.sql over a registered ``events`` VIEW —
    proves register_all applies the TIMESTAMP(NANOS) -> microsecond
    normalization (a raw-parquet view would throw on a vanilla session
    or expose ``ts`` as long nanos and diverge from the oracle)."""
    register_all(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT event_type,
               date_trunc('hour', ts) AS hr,
               COUNT(*) AS n_events,
               floor(SUM(value) * 1e2 + 0.5) / 1e2 AS total_value
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
        """
    )


@query(
    "grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the spark.sql surface (S7: temp views stand in
    for the Glue Catalog)."""
    register_all(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Percentiles
# ---------------------------------------------------------------------------


@query(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           floor((quantile_cont(l_quantity, 0.25)) * 1e4 + 0.5) / 1e4 AS p25,
           floor((quantile_cont(l_quantity, 0.5))  * 1e4 + 0.5) / 1e4 AS p50,
           floor((quantile_cont(l_quantity, 0.75)) * 1e4 + 0.5) / 1e4 AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (percentile_cont)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_portable(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25"),
        round_portable(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
        round_portable(F.percentile("l_quantity", F.lit(0.75)), 4).alias("p75"),
    )


@query("approx_distinct_parts")  # approximate by design — rows-only
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the 100 TB cardinality tool;
    accuracy asserted against the exact count in unit tests."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# ---------------------------------------------------------------------------
# spark.sql surface: CTE, EXISTS, correlated subquery, HAVING
# ---------------------------------------------------------------------------


@query(
    "sql_cte_exists",
    oracle="""
    WITH big_orders AS (
        SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000)
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM big_orders b WHERE b.o_custkey = c_custkey)
    """,
)
def sql_cte_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + EXISTS through spark.sql (plans to a left-semi join)."""
    register_all(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000)
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM big_orders b WHERE b.o_custkey = c_custkey)
        """
    )


@query(
    "sql_correlated_scalar_subquery",
    oracle="""
    SELECT o.o_orderkey FROM orders o
    WHERE o.o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def sql_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join)."""
    register_all(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o.o_orderkey FROM orders o
        WHERE o.o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                                FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "sql_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders FROM orders
    GROUP BY o_custkey HAVING COUNT(*) >= 12
    """,
)
def sql_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING through spark.sql."""
    register_all(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        GROUP BY o_custkey HAVING COUNT(*) >= 12
        """
    )


# ---------------------------------------------------------------------------
# Scalar string / array / null-handling functions
# ---------------------------------------------------------------------------


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 5) AS name_prefix,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           replace(p_type, ' ', '_') AS type_snake,
           length(p_brand) AS brand_len
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (upper/substring/regexp_extract/replace/
    length) — F3 plus engine extensions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.length("p_brand").alias("brand_len"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           floor((CAST(embedding[1] AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS first_val,
           floor((CAST(list_max(embedding) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS max_val,
           floor((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))) * 1e4 + 0.5) / 1e4 AS sum_val
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery over the embedding column (size/
    element_at/array_max/aggregate) — §2.8 extension row."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round_portable(F.element_at("embedding", 1).cast("double"), 4).alias(
            "first_val"
        ),
        round_portable(F.array_max("embedding").cast("double"), 4).alias("max_val"),
        round_portable(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, v: acc + v.cast("double")
            ),
            4,
        ).alias("sum_val"),
    )


@query(
    "null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           (l_returnflag IS NOT DISTINCT FROM l_linestatus) AS flag_eq_status
    FROM lineitem
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: nullif/coalesce/null-safe equality."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.col("l_returnflag").eqNullSafe(F.col("l_linestatus")).alias(
            "flag_eq_status"
        ),
    )


@query(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           floor((SUM(value)) * 1e2 + 0.5) / 1e2 AS sum_value
    FROM events GROUP BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) — identical
    results to a plain groupBy (the oracle), skew-safe task balance."""
    from ..operators.skew import salted_agg

    out = salted_agg(
        load_table(spark, sf_dir, "events"), ["event_type"], sums=["value"]
    )
    return out.select(
        "event_type", "n_rows", round_portable(F.col("sum_value"), 2).alias("sum_value")
    )


@query("hll_sketch_distinct")  # sketch estimate — rows-only
def hll_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL datasketch build + estimate (mergeable across partitions /
    days — the 100 TB distinct-count tool); accuracy asserted vs the
    exact count in unit tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@query(
    "salted_skew_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           floor(SUM(e.value) * 1e2 + 0.5) / 1e2 AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skewed join feeding an aggregate (operators/skew.py
    salted_join): the fact side carries a salt, the dimension is
    replicated once per salt value, so a zipfian-hot user cannot
    funnel through one task — the explicit form of what AQE's
    skew-split does for sort-merge joins, usable where AQE can't
    reach (aggregation-feeding joins). Results identical to the
    plain join (the oracle)."""
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on=["user_id"], num_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        round_portable(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "events_exact_median",
    oracle="""
    WITH s AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, n AS n_rows, value AS exact_median
    FROM s WHERE rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
    """,
)
def events_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type median via two-pass bracket-and-rank
    (operators/percentiles.py): an approx_percentile sketch brackets
    the median with ~500x rank margin, a second pass ranks only the
    ~10% of rows inside the bracket — exact answer, no global sort.
    Discrete percentile (lower middle for even n): a value that occurs,
    selected not computed, hence bit-portable across engines. The
    oracle is the brute-force window formulation."""
    from ..operators.percentiles import exact_group_percentile

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return exact_group_percentile(
        ev, "event_type", "value", p=0.5, out_col="exact_median"
    )
