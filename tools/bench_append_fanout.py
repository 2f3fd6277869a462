#!/usr/bin/env python
"""Measure the append-commit hardlink fan-out curve (r12 verdict item 5).

SCALING.md (round 9) documents the O(existing files) hardlink term of
every append commit as inherent to directory-granular snapshots; this
tool MEASURES it so the practical table-width bound is a number, not a
guess:

- at widths 100 / 1,000 / 10,000 the table is built with REAL parquet
  files (one commit_overwrite of an N-partition frame) and a timed
  `append_rows` runs the full commit protocol;
- at width 100,000 building 100k real Spark output files is slower than
  the signal is worth, so the snapshot is widened by hardlink-cloning
  the data file under distinct names (valid parquet, self-identical
  content) before the timed append — the fan-out cost being measured is
  identical either way (os.link + dirent listing per existing file).

Prints one JSON line: {"widths": {N: {"append_sec": ..., "per_file_us":
...}}, "link_only_us_per_file": ...}.

Run on an idle host (same gating as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_callcenter_delta_lakehouse_spark.session import get_spark  # noqa: E402
from aws_callcenter_delta_lakehouse_spark.sources import (  # noqa: E402
    managed_table as mt,
)


def main() -> None:
    spark = get_spark(app_name="bench_append_fanout")
    base = tempfile.mkdtemp(prefix="fanout_")
    results: dict[str, dict[str, float]] = {}
    try:
        for width, synthetic in ((100, False), (1_000, False), (10_000, False), (100_000, True)):
            path = os.path.join(base, f"t{width}")
            build_n = 1 if synthetic else width
            df = spark.range(build_n).selectExpr("id", "id * 2 AS v")
            mt.commit_overwrite(df.repartition(build_n), path, keys=("id",))
            if synthetic:
                # widen by hardlink-cloning the single data file: the
                # timed append's fan-out work (one os.link + one dirent
                # per existing file) is identical to real-file width
                snap = path  # the table dir IS the live snapshot
                src = [
                    f
                    for f in os.listdir(snap)
                    if f.endswith(".parquet") and not f.startswith("_")
                ][0]
                # spread clones across fresh source inodes: ext4 caps
                # links/inode at ~65000, and the timed append links
                # every name AGAIN into the staged snapshot (2x names
                # per inode) — 20k per inode leaves ample headroom.
                # (A real table never gets near this: each data file is
                # its own inode, linked once per retained snapshot.)
                cur = os.path.join(snap, src)
                for i in range(width - 1):
                    dst = os.path.join(snap, f"clone-{i:06d}.parquet")
                    if i % 20_000 == 19_999:
                        shutil.copyfile(cur, dst)
                        cur = dst
                    else:
                        os.link(cur, dst)
            add = spark.createDataFrame([(10**9, 7)], "id LONG, v LONG").coalesce(1)
            t0 = time.perf_counter()
            mt.append_rows(spark, add, path)
            dt = time.perf_counter() - t0
            results[str(width)] = {
                "append_sec": round(dt, 3),
                "per_file_us": round(dt / width * 1e6, 2),
            }
            shutil.rmtree(path, ignore_errors=True)

        # raw os.link cost floor at 100k (no commit protocol around it)
        d1 = os.path.join(base, "raw_src")
        d2 = os.path.join(base, "raw_dst")
        os.makedirs(d1)
        os.makedirs(d2)
        probe = os.path.join(d1, "f0")
        with open(probe, "wb") as fh:
            fh.write(b"x" * 1024)
        cur = probe
        for i in range(1, 100_000):
            dst = os.path.join(d1, f"f{i}")
            if i % 20_000 == 19_999:  # stay far below the EMLINK cap
                shutil.copyfile(cur, dst)
                cur = dst
            else:
                os.link(cur, dst)
        names = os.listdir(d1)
        t0 = time.perf_counter()
        for n in names:
            os.link(os.path.join(d1, n), os.path.join(d2, n))
        link_us = (time.perf_counter() - t0) / len(names) * 1e6
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(
        json.dumps(
            {
                "widths": results,
                "link_only_us_per_file": round(link_us, 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
