"""End-to-end CLI journey — the reference user's actual workflow
(README 'Running'): silver ingest -> late-data reprocess -> gold build
-> analytics, all through the argparse entry point, then the lakehouse
lifecycle ops (constraint, time travel, CDF, vacuum) on the resulting
tables. Proves the pieces COMPOSE, not just pass their own suites."""

from __future__ import annotations

import datetime as dt

from aws_callcenter_delta_lakehouse_spark.pipeline.cli import main
from aws_callcenter_delta_lakehouse_spark.sources import managed_table as mt
from aws_callcenter_delta_lakehouse_spark.sources.maintenance import vacuum
from tests.fixtures import make_call_center_csv, make_reprocess_csv

PDATE = "2024-03-15"


def test_cli_full_workflow(spark, tmp_path):
    csv1 = str(tmp_path / "raw.csv")
    csv2 = str(tmp_path / "raw_v2.csv")
    silver = str(tmp_path / "silver")
    exc = str(tmp_path / "exception")
    gold = str(tmp_path / "gold")
    make_call_center_csv(csv1)
    make_reprocess_csv(csv2)

    # initial load, then the late-data MERGE — both via the CLI
    main(["silver", "--source", csv1, "--silver", silver,
          "--exception", exc, "--processing-date", PDATE, "--run-id", "r1"])
    v0 = mt.table_version(silver)
    main(["silver", "--source", csv2, "--silver", silver,
          "--exception", exc, "--processing-date", PDATE, "--run-id", "r2"])
    assert mt.table_version(silver) == v0 + 1

    # gold + analytics run off the merged silver
    main(["gold", "--silver", silver, "--gold", gold,
          "--processing-date", PDATE])
    main(["analytics", "--gold", gold, "--query", "1"])

    # the reference's Athena SQL VERBATIM — catalog prefix kept (r9):
    # name-registry + qualified views make `callcenter_analytics.<t>`
    # resolvable, and results equal the prefix-less session-view path
    from aws_callcenter_delta_lakehouse_spark.pipeline.cli import (
        run_analytics,
    )

    try:
        plain = run_analytics(spark, gold)
        qualified = run_analytics(spark, gold, catalog=True)
        for i in plain:
            a = [tuple(r) for r in plain[i].collect()]
            b = [tuple(r) for r in qualified[i].collect()]
            assert a == b, f"query {i} differs between view paths"
        main(["analytics", "--gold", gold, "--query", "4", "--catalog"])
    finally:
        spark.sql("DROP DATABASE IF EXISTS callcenter_analytics CASCADE")

    # lifecycle on the live tables: CHECK constraint holds on real data
    mt.add_constraint(spark, silver, "call_id_present", "call_id IS NOT NULL")
    assert "call_id_present" in mt.table_constraints(silver)

    # time travel: the pre-merge snapshot is still readable and smaller
    # or equal (reprocess can only update/insert)
    n_old = mt.read(spark, silver, version=v0).count()
    n_new = mt.read(spark, silver).count()
    assert n_old <= n_new

    # CDF between the two versions classifies the reprocessed rows
    changes = mt.read_changes(spark, silver, v0, keys=("call_id",))
    kinds = {r._change_type for r in changes.select("_change_type").distinct().collect()}
    assert "update_postimage" in kinds or "insert" in kinds

    # vacuum sweeps history + leftovers; live table unaffected
    vacuum(silver)
    assert mt.read(spark, silver).count() == n_new

    d = dt.date.fromisoformat(PDATE)
    daily = mt.read(spark, f"{gold}/gold_call_daily_summary")
    assert daily.filter(daily.call_date == d).count() == 1
