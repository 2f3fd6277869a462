"""Managed table with Delta-MERGE-equivalent upsert semantics.

The reference relies on ``delta.tables.DeltaTable`` for
``merge(...).whenMatchedUpdateAll().whenNotMatchedInsertAll()``
(``/root/reference/glue_jobs/01_silver_delta_upsert.py:99-112``) and
``DeltaTable.isDeltaTable`` existence probes. ``delta-spark`` is not
installed here, so this module provides one API with two backends:

- **delta** (used automatically when importable): real Delta Lake.
- **parquet emulation**: MERGE re-expressed in DataFrame algebra —
      merged = target LEFT ANTI JOIN source ON keys   (unmatched target)
               UNION ALL source                       (updateAll+insertAll)
  then an atomic directory swap. With a key-unique source this is
  exactly ``whenMatchedUpdateAll/whenNotMatchedInsertAll``.

Scale notes (100 TB): the anti-join shuffles on the merge keys — the
same cost Delta MERGE pays for its inner join; when the source is small
(incremental loads — the reference's late-data scenario) broadcast it.
The emulation rewrites the whole table (Delta rewrites only matched
files); a production deployment would use real Delta/Iceberg — the
engine API is identical either way, which is the point.

Local-FS note: the swap is ``os.rename`` based (atomic on POSIX). On
object stores swap via a manifest/log commit — exactly what the Delta
backend does.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - depends on environment
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except ImportError:
    DeltaTable = None
    HAS_DELTA = False

_MARKER = "_engine_table.json"


def is_table(spark: SparkSession, path: str) -> bool:
    """Existence probe (DeltaTable.isDeltaTable analogue,
    01_silver_delta_upsert.py:99)."""
    if HAS_DELTA and DeltaTable.isDeltaTable(spark, path):
        return True
    return os.path.exists(os.path.join(path, _MARKER))


def _write_marker(path: str, keys: Sequence[str], partition_by: Sequence[str]) -> None:
    with open(os.path.join(path, _MARKER), "w") as f:
        json.dump(
            {"keys": list(keys), "partition_by": list(partition_by), "ts": time.time()},
            f,
        )


def read(spark: SparkSession, path: str) -> DataFrame:
    if HAS_DELTA and DeltaTable.isDeltaTable(spark, path):
        return spark.read.format("delta").load(path)
    return spark.read.parquet(path)


def initial_write(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    keys: Sequence[str] = (),
) -> None:
    """First-time load: overwrite, partitioned (S3-sink shape,
    01_silver_delta_upsert.py:115-121)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if HAS_DELTA:
        writer.format("delta").save(path)
    else:
        writer.parquet(path)
        _write_marker(path, keys, partition_by)


def merge_upsert(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
    broadcast_source: bool = False,
    schema_evolution: bool = False,
) -> None:
    """UPSERT keyed on ``keys`` — whenMatchedUpdateAll +
    whenNotMatchedInsertAll (01_silver_delta_upsert.py:103-112).

    The caller must supply a key-unique source (true for the reference:
    one row per call_id per file; Delta MERGE throws on duplicate source
    matches anyway).

    ``schema_evolution=True`` mirrors Delta's mergeSchema: source
    columns missing from the target are added (existing rows get NULL);
    target columns missing from the source are kept (source rows get
    NULL). Off by default — silent widening should be a choice.
    """
    keys = list(keys)
    if HAS_DELTA and DeltaTable.isDeltaTable(spark, path):  # pragma: no cover
        target = DeltaTable.forPath(spark, path).alias("t")
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        (
            target.merge(source.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    target = read(spark, path)
    src = F.broadcast(source) if broadcast_source else source
    untouched = target.join(src, on=keys, how="left_anti")
    if schema_evolution:
        merged = untouched.unionByName(source, allowMissingColumns=True)
    else:
        extra = set(source.columns) - set(target.columns)
        if extra:
            raise ValueError(
                f"source has columns {sorted(extra)} not in the target; "
                "pass schema_evolution=True to widen the table"
            )
        merged = untouched.unionByName(source.select(*target.columns))

    # Stage-and-swap: never leave the table half-written.
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    _write_marker(staging, keys, partition_by)

    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)


def write_or_merge(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
) -> str:
    """The reference's initial-load-vs-upsert branch
    (01_silver_delta_upsert.py:99-121). Returns which path was taken."""
    if is_table(spark, path):
        merge_upsert(spark, path, df, keys, partition_by)
        return "merged"
    initial_write(df, path, partition_by, keys)
    return "initial"


def append_partitioned(
    df: DataFrame, path: str, partition_by: Sequence[str] = ()
) -> None:
    """Append-only audit sink (exception/quarantine parquet,
    01_silver_delta_upsert.py:125-129). Re-runs intentionally duplicate
    rows (reference quirk Q6)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
