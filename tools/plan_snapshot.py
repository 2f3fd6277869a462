#!/usr/bin/env python
"""Snapshot a compact physical-plan signature for every registry query
and diff against a committed baseline — the structural companion to
tools/bench_diff.py (which catches cost regressions empirically; this
catches the PLAN change that caused them: a broadcast decaying to a
sort-merge join, a new exchange, a Generate picking up an inlined
size-filter like the r5 winnow regression).

Usage:
    python tools/plan_snapshot.py               # write PLAN_SNAPSHOT.json
    python tools/plan_snapshot.py --diff        # diff current vs committed
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_SNAPSHOT.json",
)

_OPS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "Generate",
    "Window",
    "TakeOrderedAndProject",
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)


def signature(plan: str) -> dict:
    sig = {op: plan.count(op) for op in _OPS if plan.count(op)}
    # the winnow-regression tell: a big size() filter over the scan
    big_size_filter = any(
        len(line) > 600
        for line in plan.splitlines()
        if line.strip().startswith(("Filter (size(", "+- Filter (size("))
    )
    if big_size_filter:
        sig["INLINED_SIZE_FILTER"] = 1
    return sig


def snapshot() -> dict:
    from aws_callcenter_delta_lakehouse_spark.plans.all import REGISTRY
    from aws_callcenter_delta_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="plan-snapshot")
    out = {}
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            out[name] = signature(
                df._jdf.queryExecution().optimizedPlan().toString()
            )
        except Exception as e:  # streaming setup quirks etc.
            out[name] = {"ERROR": type(e).__name__}
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--diff", action="store_true")
    args = ap.parse_args()
    cur = snapshot()
    if not args.diff:
        with open(OUT, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
        print(f"wrote {OUT} ({len(cur)} queries)")
        return
    with open(OUT) as fh:
        base = json.load(fh)
    changed = []
    for name in sorted(set(base) | set(cur)):
        b, c = base.get(name), cur.get(name)
        if b != c:
            changed.append((name, b, c))
    if not changed:
        print(f"{len(cur)} plans match the committed snapshot")
        return
    for name, b, c in changed:
        print(f"{name}:\n  base: {b}\n  now:  {c}")
    sys.exit(1)


if __name__ == "__main__":
    main()
