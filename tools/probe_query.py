#!/usr/bin/env python
"""Isolated query probe: warm + time one or more registry queries the
way bench.py does (noop sink, same session factory, cleanup between
runs), and optionally dump ``explain("formatted")`` to a file.

Usage:
    python tools/probe_query.py QUERY [QUERY ...] [--reps N] [--plan-dir DIR]
    python tools/probe_query.py QUERY --plan-only --plan-dir plans/r13 --suffix before

Timing methodology matches the guide (§1.1/§1.4): warm once untimed
(JIT + codegen), then report each warm rep; host loadavg is printed so
a contaminated probe self-describes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_callcenter_delta_lakehouse_spark.plans.all import REGISTRY  # noqa: E402
from aws_callcenter_delta_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--plan-only", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="probe")

    def _cleanup() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    print("loadavg %.2f %.2f %.2f" % os.getloadavg())
    for name in args.queries:
        fn = REGISTRY[name].fn
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"{name}: plan -> {out}")
            _cleanup()
            if args.plan_only:
                continue
        # warm untimed
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        _cleanup()
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"probe:{name}:{rep}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            _cleanup()
        print(
            "%s: warm reps %s  min %.3f"
            % (name, " ".join("%.3f" % t for t in times), min(times))
        )
    spark.stop()


if __name__ == "__main__":
    main()
