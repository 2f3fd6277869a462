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
