"""Physical-plan audit: extract the scale-relevant operator counts
from a DataFrame's executed plan so anti-pattern rules can be ASSERTED
across the whole registry instead of spot-checked.

The two hard rules (``tests/test_plan_audit.py`` sweeps every
registered query):

- no ``CartesianProduct`` — an unconditioned big×big join is never
  acceptable at scale;
- no ``BatchEvalPython`` — row-at-a-time Python UDFs do not belong on
  any data path (Arrow-batched ``mapInPandas``/``ArrowEvalPython``
  tiers are the sanctioned Python boundary).

``BroadcastNestedLoopJoin`` is reported but not banned: it is the
physical shape of the deliberate tiny-broadcast patterns (a one-row
query vector joined onto a corpus, a 5-row anchor set) where the
nested loop's outer side has O(1) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MARKERS = {
    "cartesian": "CartesianProduct",
    "python_row_udf": "BatchEvalPython",
    "python_arrow_udf": "ArrowEvalPython",
    "python_map_in_arrow": "MapInPandas",
    "bnl_join": "BroadcastNestedLoopJoin",
    "broadcast_hash_join": "BroadcastHashJoin",
    "sortmerge_join": "SortMergeJoin",
    "shuffled_hash_join": "ShuffledHashJoin",
    "hash_exchange": "Exchange hashpartitioning",
    "range_exchange": "Exchange rangepartitioning",
    "single_exchange": "Exchange SinglePartition",
    "window": "Window",
    "scan": "Scan parquet",
}


def plan_audit(df: DataFrame) -> dict[str, int]:
    """Operator-marker counts from the EXECUTED (post-AQE-planning)
    physical plan string. Counts are occurrence counts in the plan
    text — comparable across queries, not exact node counts (formatted
    plans repeat expressions in detail sections; marker strings here
    are node names, which appear once per node)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {key: plan.count(marker) for key, marker in _MARKERS.items()}
