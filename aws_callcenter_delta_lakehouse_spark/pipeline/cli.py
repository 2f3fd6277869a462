"""Command-line entry points mirroring the reference's two Glue jobs and
its Athena query surface, so a reference user can run the exact same
workflow against this engine:

    python -m aws_callcenter_delta_lakehouse_spark.pipeline.cli silver \
        --source raw.csv --silver ./silver --exception ./exception
    python -m aws_callcenter_delta_lakehouse_spark.pipeline.cli gold \
        --silver ./silver --gold ./gold
    python -m aws_callcenter_delta_lakehouse_spark.pipeline.cli analytics \
        --gold ./gold [--query 1..5]

``analytics`` registers the three Gold tables as temp views and runs the
five queries of ``/root/reference/sql/athena_queries.sql`` (same SQL,
database prefix dropped — Spark's session catalog replaces Glue+Athena).
"""

from __future__ import annotations

import argparse
import datetime as dt

from pyspark.sql import SparkSession

from ..session import get_spark
from ..sources import managed_table
from .gold_job import gold_job
from .silver import silver_job

GOLD_TABLES = (
    "gold_call_daily_summary",
    "gold_agent_performance",
    "gold_call_duration_metrics",
)

# The reference's five Athena queries (sql/athena_queries.sql:7-63),
# verbatim except the `callcenter_analytics.` catalog prefix.
ANALYTICS_QUERIES = {
    1: """
        SELECT call_date, total_calls, completed_calls, dropped_calls,
               failed_calls, completion_rate
        FROM gold_call_daily_summary
        ORDER BY call_date DESC LIMIT 10
    """,
    2: """
        SELECT agent_id, call_date, total_calls, completed_calls,
               dropped_calls, failed_calls, completion_rate
        FROM gold_agent_performance
        ORDER BY call_date DESC, agent_id LIMIT 20
    """,
    3: """
        SELECT call_date, avg_call_duration_seconds,
               min_call_duration_seconds, max_call_duration_seconds
        FROM gold_call_duration_metrics
        ORDER BY call_date DESC LIMIT 10
    """,
    4: """
        SELECT agent_id, AVG(completion_rate) AS avg_completion_rate
        FROM gold_agent_performance
        GROUP BY agent_id
        ORDER BY avg_completion_rate DESC LIMIT 5
    """,
    5: """
        SELECT call_date, failed_calls, total_calls,
               ROUND((failed_calls * 100.0) / total_calls, 2) AS failure_rate_pct
        FROM gold_call_daily_summary
        WHERE total_calls > 0
        ORDER BY failure_rate_pct DESC LIMIT 10
    """,
}


# The reference's five queries VERBATIM — catalog prefix and all
# (sql/athena_queries.sql:7-63; the database IS `callcenter_analytics`).
# Runnable because `register_gold_catalog` binds the Gold tables in the
# name registry and exposes them to spark.sql by their qualified names.
ANALYTICS_QUERIES_CATALOG = {
    i: q.replace("FROM gold_", "FROM callcenter_analytics.gold_")
    for i, q in ANALYTICS_QUERIES.items()
}

CATALOG_DB = "callcenter_analytics"


def register_gold_views(spark: SparkSession, gold_root: str) -> None:
    for t in GOLD_TABLES:
        managed_table.read(spark, f"{gold_root}/{t}").createOrReplaceTempView(t)


def register_gold_catalog(spark: SparkSession, gold_root: str) -> str:
    """Name-first registration (r9): bind the three Gold tables in the
    Gold root's name registry as ``callcenter_analytics.<table>`` and
    expose each to ``spark.sql`` — after this the reference's Athena
    SQL runs VERBATIM, catalog prefix included (the Glue+Athena
    database becomes the engine's registry + session views). Returns
    the registry directory."""
    from ..sources import txn_catalog
    from ..sources.delta_api import register_sql_view

    registry = f"{gold_root}/_name_registry"
    for t in GOLD_TABLES:
        txn_catalog.register_table_name(
            registry, f"{CATALOG_DB}.{t}", f"{gold_root}/{t}", replace=True
        )
        register_sql_view(spark, f"{CATALOG_DB}.{t}", registry_dir=registry)
    return registry


def run_analytics(
    spark: SparkSession,
    gold_root: str,
    query: int | None = None,
    catalog: bool = False,
):
    """``catalog=False``: session temp views + the prefix-less SQL.
    ``catalog=True``: name-registry + qualified views + the reference
    SQL verbatim (``callcenter_analytics.`` prefix kept)."""
    if catalog:
        register_gold_catalog(spark, gold_root)
        queries = ANALYTICS_QUERIES_CATALOG
    else:
        register_gold_views(spark, gold_root)
        queries = ANALYTICS_QUERIES
    ids = [query] if query else sorted(queries)
    return {i: spark.sql(queries[i]) for i in ids}


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="aws_callcenter_delta_lakehouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("silver", help="CSV -> DQ -> Silver MERGE + exception sink")
    s.add_argument("--source", required=True)
    s.add_argument("--silver", required=True)
    s.add_argument("--exception", required=True)
    s.add_argument("--processing-date", type=dt.date.fromisoformat, default=None)
    s.add_argument("--run-id", default=None)

    g = sub.add_parser("gold", help="Silver -> three Gold tables (MERGE)")
    g.add_argument("--silver", required=True)
    g.add_argument("--gold", required=True)
    g.add_argument("--processing-date", type=dt.date.fromisoformat, default=None)

    a = sub.add_parser("analytics", help="run the five analytics queries")
    a.add_argument("--gold", required=True)
    a.add_argument("--query", type=int, choices=sorted(ANALYTICS_QUERIES), default=None)
    a.add_argument(
        "--catalog", action="store_true",
        help="register callcenter_analytics.* names and run the "
        "reference SQL verbatim (catalog prefix kept)",
    )

    args = p.parse_args(argv)
    spark = get_spark(app_name=f"cli-{args.cmd}")
    if args.cmd == "silver":
        out = silver_job(
            spark, args.source, args.silver, args.exception,
            processing_date=args.processing_date, run_id=args.run_id,
        )
        print(out)
    elif args.cmd == "gold":
        print(gold_job(spark, args.silver, args.gold, processing_date=args.processing_date))
    else:
        for i, df in run_analytics(
            spark, args.gold, args.query, catalog=args.catalog
        ).items():
            print(f"-- query {i}")
            df.show(truncate=False)


if __name__ == "__main__":
    main()
