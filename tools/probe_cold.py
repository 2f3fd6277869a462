#!/usr/bin/env python
"""Cold + warm isolated probe: fresh session, time the FIRST execution
(what a bench sweep pays) and then warm reps. One query per process so
JIT/code-cache state can't leak between arms.

Usage: python tools/probe_cold.py QUERY [--reps N]
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
    ap.add_argument("query")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="probe-cold")

    def _cleanup() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    print("loadavg %.2f %.2f %.2f" % os.getloadavg(), flush=True)
    fn = REGISTRY[args.query].fn
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    cold = time.perf_counter() - t0
    _cleanup()
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        times.append(time.perf_counter() - t0)
        _cleanup()
    print(
        "%s: cold %.3f  warm %s"
        % (args.query, cold, " ".join("%.3f" % t for t in times)),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
