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
