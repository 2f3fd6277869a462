"""Seeded call-center CSV fixture per FIXTURES.md §B — exercises every
DQ rule and reference quirk (SURVEY.md §2.10)."""

from __future__ import annotations

import csv
import random

HEADER = ["call_id", "caller_id", "agent_id", "call_start_time", "call_end_time", "call_status"]


def _hms(sec: int) -> str:
    sec %= 86400
    return f"{sec // 3600:02d}:{sec % 3600 // 60:02d}:{sec % 60:02d}"


def make_call_center_csv(path: str, n_valid: int = 200, seed: int = 42) -> dict:
    """Write call_center_raw.csv; returns expected-count bookkeeping."""
    rng = random.Random(seed)
    rows: list[list] = []

    # --- valid rows -------------------------------------------------------
    n_midnight = 0
    for call_id in range(1, n_valid + 1):
        start = rng.randint(0, 86399)
        dur = rng.randint(0, 3600)
        end = start + dur
        if end >= 86400:
            n_midnight += 1  # wraps: end-of-day string < start (quirk Q4)
        status = rng.choices(["COMPLETED", "DROPPED", "FAILED"], [0.7, 0.2, 0.1])[0]
        rows.append(
            [call_id, rng.randint(1000, 9999), rng.randint(1, 50), _hms(start), _hms(end), status]
        )

    # Edge: mixed-case status — passes validation, counted only in
    # total_calls at Gold (quirk Q3).
    rows.append([n_valid + 1, 5555, 7, "10:00:00", "10:05:00", "Completed"])
    # Edge: 25:61:99 passes the 2-digit regex but parses to NULL at Gold.
    rows.append([n_valid + 2, 5556, 7, "25:61:99", "10:05:00", "COMPLETED"])
    n_valid_total = n_valid + 2

    # --- invalid rows (expected Reject_reason fragments) ------------------
    invalid: list[tuple[list, str]] = [
        ([None, 2000, 3, "10:00:00", "10:10:00", "COMPLETED"], "call_id must not be NULL"),
        (["ABC12", 2000, 3, "10:00:00", "10:10:00", "COMPLETED"], "call_id must not be NULL"),
        ([9001, None, 3, "10:00:00", "10:10:00", "DROPPED"], "caller_id must not be NULL"),
        ([9002, 2000, None, "10:00:00", "10:10:00", "FAILED"], "agent_id must not be NULL"),
        ([-5, 2000, 3, "10:00:00", "10:10:00", "COMPLETED"], "call_id must be numeric"),
        ([-6, 2000, 3, "10:00:00", "10:10:00", "COMPLETED"], "call_id must be numeric"),
        ([9003, 2000, 3, None, "10:10:00", "COMPLETED"], "call_start_time must not be NULL"),
        ([9004, 2000, 3, "10:00:00", None, "COMPLETED"], "call_end_time must not be NULL"),
        ([9005, 2000, 3, "9:05:00", "10:10:00", "COMPLETED"], "invalid call_start_time"),
        ([9006, 2000, 3, "10:00:00", "12:5:00", "COMPLETED"], "invalid call_end_time"),
        ([9007, 2000, 3, "120500", "13:00:00", "COMPLETED"], "invalid call_start_time"),
        ([9008, 2000, 3, "10:00:00", "10:10:00", None], "call_status must not be NULL"),
        ([9009, 2000, 3, "10:00:00", "10:10:00", "BUSY"], "invalid call_status values"),
        ([9010, 2000, 3, "10:00:00", "10:10:00", "UNKNOWN"], "invalid call_status values"),
        # multi-error: null call_id + bad status, joined by " | "
        ([None, 2000, 3, "10:00:00", "10:10:00", "BUSY"],
         "call_id must not be NULL | invalid call_status values"),
    ]
    for r, _ in invalid:
        rows.append(r)

    rng.shuffle(rows)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])

    return {
        "n_valid": n_valid_total,
        "n_invalid": len(invalid),
        "n_midnight": n_midnight,
        # 'ABC12' reads as NULL under the INT schema, so only integer ids
        # are addressable in the exception sink.
        "expected_reasons": {str(r[0]): reason for r, reason in invalid if isinstance(r[0], int)},
    }


def make_reprocess_csv(path: str, n_updates: int = 20, seed: int = 43) -> dict:
    """call_center_raw_v2.csv — overlapping call_ids with changed status
    (MERGE updateAll test, quirk Q6) plus some brand-new ids."""
    rng = random.Random(seed)
    rows = []
    for call_id in range(1, n_updates + 1):  # overlap: update existing
        rows.append([call_id, rng.randint(1000, 9999), rng.randint(1, 50),
                     "01:00:00", "01:30:00", "DROPPED"])
    for call_id in range(100001, 100011):  # new: insert
        rows.append([call_id, rng.randint(1000, 9999), rng.randint(1, 50),
                     "02:00:00", "02:15:00", "COMPLETED"])
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)
    return {"n_updates": n_updates, "n_inserts": 10}
