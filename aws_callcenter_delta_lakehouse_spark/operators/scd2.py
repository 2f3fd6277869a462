"""SCD Type-2 upsert — versioned-history MERGE.

The reference's MERGE is Type-1 (update-in-place,
``01_silver_delta_upsert.py:109``); warehouses routinely need Type-2
(keep history with effective_from/effective_to). Delta spells this a
multi-clause MERGE; without delta-spark it decomposes into pure
DataFrame algebra:

  close   — current rows whose key matches an update with different
            attributes get effective_to = batch_date;
  carry   — current rows unmatched, or matched with identical
            attributes, pass through;
  open    — update rows that are brand new or differ from the current
            row are inserted with effective_from = batch_date;
  history — already-closed rows never participate.

One shuffle on the key per join; at scale keep is_current as a
partition column so the closed history is pruned from every batch.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META = ("effective_from", "effective_to", "is_current")
OPEN_END = dt.date(9999, 12, 31)


def scd2_init(snapshot: DataFrame, effective_from: dt.date) -> DataFrame:
    """Seed a history table from an initial snapshot."""
    return snapshot.select(
        "*",
        F.lit(effective_from).alias("effective_from"),
        F.lit(OPEN_END).alias("effective_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    batch_date: dt.date,
) -> DataFrame:
    """Apply a key-unique update batch to an SCD2 history table; returns
    the new history (same schema: attributes + effective_from/
    effective_to/is_current)."""
    keys = list(keys)
    attrs = [c for c in updates.columns if c not in keys]

    current = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    u = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.lit(True).alias("__u_exists"),
    )
    on = reduce(
        lambda a, b: a & b, [F.col(k) == F.col(f"__u_{k}") for k in keys]
    )
    joined = current.join(u, on=on, how="left")

    differs = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attrs],
    )
    matched = F.coalesce(F.col("__u_exists"), F.lit(False))

    to_close = (
        joined.filter(matched & differs)
        .select(*keys, *attrs, "effective_from")
        .withColumns(
            {"effective_to": F.lit(batch_date), "is_current": F.lit(False)}
        )
    )
    carried = joined.filter(~matched | ~differs).select(*keys, *attrs, *META)

    c = current.select(
        *keys,
        *[F.col(a).alias(f"__c_{a}") for a in attrs],
        F.lit(True).alias("__c_exists"),
    )
    upd_j = updates.join(c, on=keys, how="left")
    same = reduce(
        lambda a, b: a & b,
        [F.col(a).eqNullSafe(F.col(f"__c_{a}")) for a in attrs],
    )
    existed = F.coalesce(F.col("__c_exists"), F.lit(False))
    new_rows = (
        upd_j.filter(~existed | ~same)
        .select(*keys, *attrs)
        .withColumns(
            {
                "effective_from": F.lit(batch_date),
                "effective_to": F.lit(OPEN_END),
                "is_current": F.lit(True),
            }
        )
    )
    return closed.unionByName(carried).unionByName(to_close).unionByName(new_rows)


def scd2_from_changes(
    history: DataFrame | None,
    changes: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
) -> DataFrame:
    """SCD2 from a CDC FEED — the Delta Live Tables
    ``APPLY CHANGES ... STORED AS SCD TYPE 2`` shape, which
    :func:`scd2_apply` (snapshot batches, key-unique, date-stamped)
    cannot express:

    - a key may appear MANY times in one feed: its changes chain into
      consecutive versions, each valid [seq_i, seq_{i+1}) — ``lead``
      over the per-key sequence order closes each version with the next
      change's sequence, in one pass;
    - ``delete`` closes the chain without opening a version;
    - validity bounds are the SEQUENCE VALUES themselves
      (``__start_at`` / ``__end_at``, NULL = current), DLT's contract,
      so replaying the feed rebuilds identical history.

    ``history`` is a prior output (or None to start). Within a feed any
    row order works; ACROSS calls feed chunks in nondecreasing sequence
    order per key — a change older than a key's current ``__start_at``
    raises rather than corrupting history (DLT demands backfills go
    through a full re-apply too).

    Scale: one key shuffle drives the chain window and the close join;
    closed history passes through untouched (partition by
    ``__end_at IS NULL`` at write time and batches never scan it)."""
    from pyspark.sql import Window

    key_list = list(keys)
    seq = sequence_col
    live = changes.filter(F.col("_change_type") != "update_preimage")
    attrs = [
        c for c in live.columns
        if c not in (*key_list, seq, "_change_type")
    ]
    w = Window.partitionBy(*key_list).orderBy(
        # ties: "delete" sorts first alphabetically, so a tied upsert
        # becomes the surviving open version — the same upsert-beats-
        # delete rule apply_changes uses
        F.col("__start_at").asc(), F.col("__ct").asc()
    )
    chain = (
        live.select(
            *key_list, *attrs,
            F.col(seq).alias("__start_at"),
            F.col("_change_type").alias("__ct"),
        )
        .withColumn("__end_at", F.lead("__start_at").over(w))
    )
    new_rows = chain.filter(F.col("__ct") != "delete").drop("__ct")
    if history is None:
        return new_rows
    first_seq = live.groupBy(*key_list).agg(F.min(seq).alias("__fs"))
    cur = history.filter(F.col("__end_at").isNull())
    stale = (
        cur.join(first_seq, on=key_list)
        .filter(F.col("__fs") <= F.col("__start_at"))
        .limit(1)
        .collect()
    )
    if stale:
        r = stale[0]
        raise ValueError(
            "scd2_from_changes: change sequence "
            f"{r['__fs']!r} is not after the current version's start "
            f"{r['__start_at']!r} for key "
            f"{tuple(r[k] for k in key_list)} — feed chunks must be "
            "nondecreasing in sequence per key (backfills need a full "
            "re-apply)"
        )
    closed_now = (
        cur.join(first_seq, on=key_list)
        .withColumn("__end_at", F.col("__fs"))
        .drop("__fs")
    )
    untouched_cur = cur.join(first_seq, on=key_list, how="left_anti")
    old_closed = history.filter(F.col("__end_at").isNotNull())
    return (
        old_closed.unionByName(untouched_cur)
        .unionByName(closed_now)
        .unionByName(new_rows)
    )
