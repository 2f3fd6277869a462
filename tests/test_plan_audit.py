"""Registry-wide physical-plan sweep: the anti-pattern rules the
engine claims (no cartesian joins, no row-at-a-time Python UDFs) are
ASSERTED over every registered query's executed plan, not spot-checked.

A new query that silently plans a CartesianProduct or a BatchEvalPython
fails here by name — this mechanizes the per-round reviewer grep."""

from __future__ import annotations

import pytest

from aws_callcenter_delta_lakehouse_spark.plans.all import REGISTRY
from aws_callcenter_delta_lakehouse_spark.plans.audit import plan_audit
from tests.conftest import SF001


@pytest.mark.slow
def test_registry_has_no_cartesian_or_row_python(spark):
    offenders: list[tuple[str, str, int]] = []
    audits: dict[str, dict] = {}
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, SF001)
        a = plan_audit(df)
        audits[name] = a
        if a["cartesian"]:
            offenders.append((name, "CartesianProduct", a["cartesian"]))
        if a["python_row_udf"]:
            offenders.append((name, "BatchEvalPython", a["python_row_udf"]))
        # keep one JVM healthy across 250+ plan builds (iterative query
        # construction leaves localCheckpoint blocks behind)
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    assert offenders == [], offenders
    # sanity: the sweep actually saw the registry, and the sanctioned
    # Arrow-batched Python tier is present somewhere (multimodal /
    # grouped-map ops) while the row tier is nowhere
    assert len(audits) == len(REGISTRY)
    assert any(
        a["python_arrow_udf"] or a["python_map_in_arrow"]
        for a in audits.values()
    )


# Unpartitioned-window governance (verdict r11 item 2). Two layers:
#
# 1. PLAN-LEVEL (test_registry_global_windows_bounded_and_allowlisted):
#    every registered query's optimized plan is swept for Window nodes
#    with an EMPTY partition spec. A global window over raw
#    (unbounded) input is banned outright — the scale-safe formulation
#    is the two-phase distributed prefix sum (operators/prefix.py).
#    A global window over a cardinality-BOUNDED input (an aggregate /
#    limit below it) is legitimate but must be allowlisted HERE with a
#    cardinality note, so a new query adding one fails by name until a
#    human writes down why the frame stays small at 100 TB.
#
# 2. SOURCE-LEVEL (test_global_window_source_census): windows executed
#    on INTERMEDIATE actions (localCheckpoint'd subplans) never appear
#    in the final plan — events_autocorrelation's windows are invisible
#    to layer 1 — so the census pins the exact per-file count of
#    global-window construction sites in the package source.
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    "eval_classifier_auc": (
        "frame = one row per DISTINCT quality score on the fixed 1e-4 "
        "grid (<= ~1e4 rows regardless of corpus size)"
    ),
    "events_stl_decompose": (
        "frame = one row per calendar DAY (groupBy to_date before the "
        "rangeBetween window); series length is the calendar span, "
        "independent of event volume"
    ),
    "survival_kaplan_meier": (
        "frame = one row per distinct event TIME after the groupBy(t) "
        "rollup (daily grid -> calendar-bounded)"
    ),
    "text_zipf_slope": (
        "frame = the top-1000 head selected by distributed top-k "
        "(orderBy+limit -> TakeOrderedAndProject) BEFORE the window; "
        "GlobalLimit bounds it at 1000 rows by construction"
    ),
}
# (funnel_latency_percentiles and orders_abc_analysis carried global
# windows until round 12; both now rank through operators/prefix.py,
# which plans NO unpartitioned window — the offsets come from a
# broadcast triangular join.)


@pytest.mark.slow
def test_registry_global_windows_bounded_and_allowlisted(spark):
    from aws_callcenter_delta_lakehouse_spark.plans.audit import (
        global_window_audit,
    )

    raw_offenders: list[tuple[str, str]] = []
    unlisted: list[str] = []
    seen_global: set[str] = set()
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, SF001)
        for site in global_window_audit(df):
            seen_global.add(name)
            if not site["agg_bounded"]:
                raw_offenders.append((name, site["order"]))
            elif name not in GLOBAL_WINDOW_ALLOWLIST:
                unlisted.append(name)
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
    # hard rule: no unpartitioned window over unbounded input, ever
    assert raw_offenders == [], raw_offenders
    # soft rule: bounded ones must carry a written cardinality note
    assert sorted(set(unlisted)) == [], sorted(set(unlisted))
    # allowlist hygiene: no dead entries for queries that no longer
    # plan a global window (events_autocorrelation's windows live on an
    # intermediate localCheckpoint and are pinned by the source census)
    dead = set(GLOBAL_WINDOW_ALLOWLIST) - seen_global
    assert dead == set(), dead


# every global-window construction site in the package source, pinned
# per file (counts, not line numbers — those shift). prefix.py's
# Window.partitionBy("__pid") is PARTITIONED and does not match.
GLOBAL_WINDOW_SOURCE_CENSUS = {
    "plans/llm4.py": 1,      # text_zipf_slope: 1000-row head rank
    "plans/llm15.py": 2,     # survival_kaplan_meier: day-grid KM product
    "plans/llm16.py": 1,     # events_autocorrelation: day-series lead
    "plans/llm20.py": 1,     # eval_classifier_auc: 1e-4 score grid
    "plans/timeseries_queries.py": 1,  # events_stl_decompose: day grid
}


def test_global_window_source_census():
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(__file__), "..", "aws_callcenter_delta_lakehouse_spark"
    )
    pat = re.compile(r"Window\.orderBy\(|Window\.partitionBy\(\)")
    found: dict[str, int] = {}
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            full = os.path.join(root, fn)
            rel = os.path.relpath(full, pkg).replace(os.sep, "/")
            if rel == "plans/audit.py":  # docstring mentions the shape
                continue
            with open(full) as fh:
                n = len(pat.findall(fh.read()))
            if n:
                found[rel] = n
    assert found == GLOBAL_WINDOW_SOURCE_CENSUS, (
        "global-window sites changed — every Window.orderBy / "
        "Window.partitionBy() site must either use the distributed "
        "prefix sum (operators/prefix.py) or be re-pinned here WITH a "
        f"cardinality note in GLOBAL_WINDOW_ALLOWLIST: {found}"
    )
