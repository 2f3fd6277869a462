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


# logical nodes that BOUND the cardinality flowing into a window frame:
# an aggregate's output is one row per group, a limit is explicit, and
# a distinct is an aggregate in disguise. An unpartitioned window whose
# input subtree contains none of these would single-task the full input
# at scale — that shape is banned registry-wide (the scale-safe
# formulation is the two-phase distributed prefix sum,
# ``operators/prefix.py``).
_BOUNDING_NODES = frozenset(
    {
        "Aggregate",
        "GlobalLimit",
        "LocalLimit",
        "Deduplicate",
        # driver-embedded literal relations are bounded by construction
        "LocalRelation",
        "OneRowRelation",
    }
)


def global_window_audit(df: DataFrame) -> list[dict]:
    """Unpartitioned Window nodes in the OPTIMIZED LOGICAL plan (the
    shape is decided there; the physical WindowExec inherits it), each
    classified by whether its input subtree contains a cardinality-
    bounding node (:data:`_BOUNDING_NODES`). Returns one dict per
    offending Window: ``{"agg_bounded": bool, "order": str}``.

    ``Window.partitionBy()`` / ``Window.orderBy(...)`` with no
    partition key moves ALL input rows to a single task (Spark itself
    warns ``WindowExec: No Partition Defined``). Over a post-
    aggregation frame whose group count is documented-bounded that is
    a deliberate, cheap choice; over raw data it is a scale bug. The
    registry-wide test enforces: raw (unbounded-input) global windows
    are banned outright, agg-bounded ones must be allowlisted by query
    name with a cardinality note
    (``tests/test_plan_audit.py::GLOBAL_WINDOW_ALLOWLIST``)."""
    jplan = df._jdf.queryExecution().optimizedPlan()

    def _subtree_has_bound(node) -> bool:
        """Cardinality-bounded iff a bounding node caps EVERY path from
        the window down to the leaves: a join/union with one bounded
        branch and one raw branch is NOT bounded (the raw side drives
        the output cardinality), so `all()` over children, with leaves
        (relations) returning False."""
        name = node.getClass().getSimpleName()
        if name in _BOUNDING_NODES:
            return True
        kids = node.children()
        if kids.size() == 0:
            return False
        return all(
            _subtree_has_bound(kids.apply(i)) for i in range(kids.size())
        )

    out: list[dict] = []

    def _walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            child = node.child()
            out.append(
                {
                    "agg_bounded": _subtree_has_bound(child),
                    "order": node.orderSpec().toString()[:200],
                }
            )
        kids = node.children()
        for i in range(kids.size()):
            _walk(kids.apply(i))
        # subqueries (scalar/IN) hang off expressions, not children;
        # windows inside them still execute — sweep those plans too
        for sub in _j_subqueries(node):
            _walk(sub)

    _walk(jplan)
    return out


def _j_subqueries(node) -> list:
    """Logical plans nested inside a node's subquery expressions."""
    try:
        it = node.subqueries().iterator()
    except Exception:  # pragma: no cover - node without subqueries()
        return []
    subs = []
    while it.hasNext():
        subs.append(it.next())
    return subs
