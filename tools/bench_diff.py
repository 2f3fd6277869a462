#!/usr/bin/env python
"""Diff two bench detail files query-by-query (CLAUDE.md perf trap 6:
never conclude a regression from one run — and when comparing runs,
look for UNIFORM drift, which is host noise, vs isolated spikes, which
are real plan changes).

Usage:
    python tools/bench_diff.py BENCH_DETAIL_r04.json bench_detail.json
    python tools/bench_diff.py old.json new.json --threshold 1.5

Prints queries whose ratio new/old exceeds the threshold (or is below
its inverse), the median ratio (the host-drift estimate), and
drift-corrected outliers (ratio normalized by the median)."""

from __future__ import annotations

import argparse
import json
import statistics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    with open(args.old) as fh:
        old = json.load(fh)["queries"]
    with open(args.new) as fh:
        new = json.load(fh)["queries"]

    common = sorted(set(old) & set(new))
    ratios = {n: new[n] / old[n] for n in common if old[n] > 0.05}
    if not ratios:
        print("no comparable queries")
        return
    med = statistics.median(ratios.values())
    print(
        f"{len(common)} common queries; median ratio {med:.2f} "
        f"(host-drift estimate — uniform drift is the box, not the code)"
    )
    print(f"only-in-new: {sorted(set(new) - set(old))}")
    print(f"only-in-old: {sorted(set(old) - set(new))}")
    flagged = []
    for n, r in ratios.items():
        corrected = r / med
        if corrected >= args.threshold or corrected <= 1 / args.threshold:
            flagged.append((corrected, r, n))
    for corrected, raw, n in sorted(flagged, reverse=True):
        print(
            f"  {n}: {old[n]:.2f}s -> {new[n]:.2f}s "
            f"(raw x{raw:.2f}, drift-corrected x{corrected:.2f})"
        )
    if not flagged:
        print("no drift-corrected outliers past threshold")


if __name__ == "__main__":
    main()
