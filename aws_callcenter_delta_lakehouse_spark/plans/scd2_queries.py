"""SCD2 registry query with a full DuckDB oracle: one update batch
applied to a customer-segment dimension snapshot."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.scd2 import scd2_apply, scd2_init
from .registry import query

D0, D1 = dt.date(2026, 1, 1), dt.date(2026, 2, 1)


@query(
    "scd2_customer_segments",
    oracle="""
    WITH snap AS (SELECT c_custkey, c_mktsegment FROM customer),
    upd AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal > 5000 THEN 'PREMIUM' ELSE c_mktsegment END
               AS c_mktsegment
        FROM customer WHERE c_custkey <= 100),
    changed AS (
        SELECT s.c_custkey, u.c_mktsegment AS new_seg
        FROM snap s JOIN upd u USING (c_custkey)
        WHERE s.c_mktsegment <> u.c_mktsegment)
    SELECT s.c_custkey, s.c_mktsegment,
           DATE '2026-01-01' AS effective_from,
           CASE WHEN c.c_custkey IS NOT NULL THEN DATE '2026-02-01'
                ELSE DATE '9999-12-31' END AS effective_to,
           c.c_custkey IS NULL AS is_current
    FROM snap s LEFT JOIN changed c USING (c_custkey)
    UNION ALL
    SELECT c_custkey, new_seg, DATE '2026-02-01', DATE '9999-12-31', TRUE
    FROM changed
    """,
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 close/carry/open over the customer dimension: customers with
    custkey <= 100 and acctbal > 5000 move to segment PREMIUM at D1;
    identical updates produce no new version (see operators/scd2.py)."""
    cust = load_table(spark, sf_dir, "customer")
    snapshot = cust.select("c_custkey", "c_mktsegment")
    updates = cust.filter(F.col("c_custkey") <= 100).select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "PREMIUM")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    history = scd2_init(snapshot, D0)
    return scd2_apply(history, updates, ["c_custkey"], D1)
