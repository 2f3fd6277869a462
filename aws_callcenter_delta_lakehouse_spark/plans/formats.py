"""Format & governance surface: scalar XML/CSV codecs and masked views.

The reference ingests CSV files and serves Athena consumers
(`/root/reference/README.md`); engines in that seat also receive
embedded payloads (XML/CSV fields inside columns) and publish
privacy-masked projections. Each query here round-trips or masks with
built-in expressions only — JVM-side, codegen-friendly, no UDFs.

Oracle strategy: the engine side serializes THEN parses (proving the
codec plumbing end to end); the oracle selects the same values
directly, so any asymmetry between the serializer and parser fails the
hash diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions.scalars import round_portable
from .registry import query


@query(
    "xml_roundtrip_extract",
    oracle="""
    SELECT c_custkey,
           c_name AS name,
           c_nationkey AS nk,
           c_acctbal AS bal
    FROM customer
    WHERE c_custkey % 7 = 0
    """,
)
def xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-XML decode (Spark 4 ``from_xml``): serialize each row to
    an XML fragment, parse it back with a typed schema, and return the
    extracted fields. Doubles survive because Spark's double->string is
    the shortest round-trip representation. Pure projection — the codec
    runs inside whole-stage codegen, no Python."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 == 0
    )
    xml = cust.select(
        "c_custkey",
        F.concat(
            F.lit("<c><name>"),
            F.col("c_name"),
            F.lit("</name><nk>"),
            F.col("c_nationkey").cast("string"),
            F.lit("</nk><bal>"),
            F.col("c_acctbal").cast("string"),
            F.lit("</bal></c>"),
        ).alias("payload"),
    )
    schema = "name STRING, nk BIGINT, bal DOUBLE"
    parsed = xml.select(
        "c_custkey", F.from_xml("payload", schema).alias("x")
    )
    return parsed.select(
        "c_custkey",
        F.col("x.name").alias("name"),
        F.col("x.nk").alias("nk"),
        F.col("x.bal").alias("bal"),
    )


@query(
    "csv_scalar_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_orderpriority AS prio,
           o_custkey AS ck,
           o_totalprice AS price
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def csv_scalar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-CSV decode: ``to_csv`` a struct, ``from_csv`` it back
    with a typed schema. The serializer/parser pair must agree on
    quoting and numeric formatting for the oracle diff to pass —
    which is exactly what this query verifies."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 11 == 0
    )
    line = orders.select(
        "o_orderkey",
        F.to_csv(
            F.struct("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")
        ).alias("payload"),
    )
    schema = "status STRING, prio STRING, ck BIGINT, price DOUBLE"
    parsed = line.select("o_orderkey", F.from_csv("payload", schema).alias("c"))
    return parsed.select(
        "o_orderkey",
        F.col("c.status").alias("status"),
        F.col("c.prio").alias("prio"),
        F.col("c.ck").alias("ck"),
        F.col("c.price").alias("price"),
    )


@query(
    "masked_customer_view",
    oracle="""
    SELECT substr(sha256(CAST(c_custkey AS VARCHAR) || ':lakehouse'), 1, 16)
             AS pseudonym,
           substr(c_name, 1, 9) || '***' AS name_masked,
           CAST(c_nationkey // 5 AS BIGINT) AS geo_bucket,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS balance_tier
    FROM customer
    """,
)
def masked_customer_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-masked governance view — the privacy projection a
    lakehouse publishes to analysts who may not see raw PII (pairs with
    ``text_pii_redact`` on the documents side). Deterministic masking
    only: a salted-SHA256 pseudonymous join key (stable across tables,
    irreversible without the salt), prefix-preserving name mask,
    k-anonymous geo bucketing, balance tiering. All built-in
    expressions, so the masked view costs one projection and keeps
    predicate pushdown on the unmasked columns."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.substring(
            F.sha2(F.concat(F.col("c_custkey").cast("string"), F.lit(":lakehouse")), 256),
            1,
            16,
        ).alias("pseudonym"),
        F.concat(F.substring("c_name", 1, 9), F.lit("***")).alias("name_masked"),
        F.floor(F.col("c_nationkey") / 5).cast("long").alias("geo_bucket"),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("balance_tier"),
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->part' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for three
    foreign-key edges, each a LEFT ANTI join + count (the multi-table
    complement of the single-table expectation report). Anti joins
    broadcast the smaller key side where stats allow; each check is one
    shuffle-free-or-single-shuffle probe, and the three counts union
    into one tiny result."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    def orphans(child, key_child, parent, key_parent, label):
        return (
            child.join(
                parent.select(key_parent),
                child[key_child] == parent[key_parent],
                "left_anti",
            )
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionAll(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .unionAll(orphans(li, "l_partkey", p, "p_partkey", "lineitem->part"))
    )


@query(
    "dq_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                        / 100000.0) AS BIGINT) AS bal_k
      FROM customer),
    classes AS (
      SELECT c_nationkey, c_mktsegment, bal_k,
             CAST(COUNT(*) AS BIGINT) AS class_size
      FROM q GROUP BY 1, 2, 3)
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           bal_k, class_size
    FROM classes WHERE class_size < 5
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity re-identification risk report (Sweeney 2002): group
    customers by the quasi-identifier tuple (nation, market segment,
    account-balance band in thousands) and surface every equivalence
    class smaller than k=5 — rows in those classes are linkable by an
    adversary holding the quasi-identifiers. One hash aggregate +
    HAVING; the balance band goes through integer cents so bucket
    edges can't flip cross-engine. The release gate is: generalize or
    suppress until this report is empty."""
    q = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_mktsegment",
        F.floor(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
            / F.lit(100000.0)
        ).cast("bigint").alias("bal_k"),
    )
    return (
        q.groupBy("c_nationkey", "c_mktsegment", "bal_k")
        .agg(F.count("*").cast("bigint").alias("class_size"))
        .filter(F.col("class_size") < 5)
    )


@query(
    "dq_l_diversity",
    oracle="""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(c_acctbal < 0 AS INTEGER) AS in_debt
      FROM customer),
    classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT in_debt) AS BIGINT) AS l
      FROM q GROUP BY 1, 2)
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           class_size, l
    FROM classes WHERE l < 2
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    necessary complement: a class can be large yet still leak when
    every member shares the SAME sensitive value (here the in-debt
    flag). Surfaces quasi-identifier classes with fewer than l=2
    distinct sensitive values: an adversary who locates anyone in such
    a class learns their debt status with certainty regardless of
    class size. Same single-aggregate shape as ``dq_k_anonymity``."""
    q = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_mktsegment",
        (F.col("c_acctbal") < 0).cast("int").alias("in_debt"),
    )
    return (
        q.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("class_size"),
            F.countDistinct("in_debt").cast("bigint").alias("l"),
        )
        .filter(F.col("l") < 2)
    )


@query(
    "dq_dp_noisy_counts",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(LEAST(GREATEST(
                 CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT),
                 0), 500000)) AS cs
      FROM customer GROUP BY 1, 2),
    u AS (
      SELECT *,
        (CAST('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || chr(31)
             || c_mktsegment || chr(31) || '7'), 1, 15) AS BIGINT) + 0.5)
          / 1152921504606846976.0 AS u_n,
        (CAST('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || chr(31)
             || c_mktsegment || chr(31) || '11'), 1, 15) AS BIGINT) + 0.5)
          / 1152921504606846976.0 AS u_s
      FROM g)
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment, n,
      floor((CAST(n AS DOUBLE)
             + CASE WHEN u_n - 0.5 >= 0
                    THEN -2.0 * ln(1.0 - 2.0 * abs(u_n - 0.5))
                    ELSE  2.0 * ln(1.0 - 2.0 * abs(u_n - 0.5)) END)
            * 1e6 + 0.5) / 1e6 AS noisy_n,
      CAST(cs AS BIGINT) AS clipped_cents,
      floor((CAST(cs AS DOUBLE)
             + CASE WHEN u_s - 0.5 >= 0
                    THEN -250000.0 * ln(1.0 - 2.0 * abs(u_s - 0.5))
                    ELSE  250000.0 * ln(1.0 - 2.0 * abs(u_s - 0.5)) END)
            * 1e6 + 0.5) / 1e6 AS noisy_cents
    FROM u
    """,
)
def dq_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of customer counts and clipped
    account-balance sums per (nation, market segment) — the Laplace
    mechanism (Dwork et al. 2006) from ``operators/privacy.py``.
    Count: n + Laplace(1/0.5). Sum: balances in integer cents clipped
    to [0, 500000] (sensitivity bound), + Laplace(500000/2.0). Noise
    is a seeded inverse-CDF draw from the PORTABLE low-60-bit-md5
    uniform (repo PORTABLE-HASH pattern), so the oracle reproduces the
    exact deviates; cents-integer sums keep the pre-noise aggregate
    reduce-order-exact (trap 13). One hash aggregate per release —
    noise is a per-group scalar expression, no extra shuffle."""
    from ..operators.privacy import dp_noisy_counts, dp_noisy_sums

    keys = ["c_nationkey", "c_mktsegment"]
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("double") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    counts = dp_noisy_counts(cust, keys, epsilon=0.5, seed=7, portable=True)
    sums = dp_noisy_sums(
        cust, keys, "cents", clip=500000.0, epsilon=2.0, seed=11,
        portable=True,
    )
    return counts.join(sums, on=keys).select(
        *keys,
        "n",
        round_portable(F.col("noisy_n"), 6).alias("noisy_n"),
        F.col("clipped_sum").cast("bigint").alias("clipped_cents"),
        round_portable(F.col("noisy_sum"), 6).alias("noisy_cents"),
    )


@query(
    "dq_profile_columns",
    oracle="""
    SELECT 'c_custkey' AS column_name, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(c_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(c_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_nationkey) AS BIGINT),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
           CAST(MIN(c_nationkey) AS DOUBLE), CAST(MAX(c_nationkey) AS DOUBLE),
           NULL, NULL
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT),
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT),
           CAST(MIN(c_acctbal) AS DOUBLE), CAST(MAX(c_acctbal) AS DOUBLE),
           NULL, NULL
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           NULL, NULL, MIN(c_mktsegment), MAX(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_name', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_name) AS BIGINT),
           CAST(COUNT(DISTINCT c_name) AS BIGINT),
           NULL, NULL, MIN(c_name), MAX(c_name)
    FROM customer
    """,
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling report (the Deequ/Glue-DataBrew 'profile this
    table' primitive): per column — row count, null count, exact
    distinct count, min/max (numeric columns as DOUBLE, string columns
    as-is; min/max are SELECTIONS, never accumulations, so they are
    engine-exact). ONE pass over the table: all metrics for all
    profiled columns in a single hash-free global aggregate, then a
    driver-side unpivot of the 1-row result into the long report —
    never one scan per column (the oracle re-scans per column only
    because DuckDB reads the small sf0.01 parquet)."""
    cust = load_table(spark, sf_dir, "customer")
    num_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    str_cols = ["c_mktsegment", "c_name"]
    aggs = [F.count("*").alias("__n")]
    for c in num_cols + str_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    one = cust.agg(*aggs)
    row = one.first()
    out = []
    for c in num_cols:
        out.append((c, row["__n"], row["__n"] - row[f"{c}__nn"],
                    row[f"{c}__nd"], float(row[f"{c}__mn"]),
                    float(row[f"{c}__mx"]), None, None))
    for c in str_cols:
        out.append((c, row["__n"], row["__n"] - row[f"{c}__nn"],
                    row[f"{c}__nd"], None, None,
                    row[f"{c}__mn"], row[f"{c}__mx"]))
    return spark.createDataFrame(
        out,
        "column_name string, n bigint, n_null bigint, n_distinct bigint, "
        "min_num double, max_num double, min_str string, max_str string",
    )
